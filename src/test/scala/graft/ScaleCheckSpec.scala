package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Scale-up ratio gate (round 11): pins the big/base wall-time ratio of
  * the heavy query set against graft.tools.ScalePlan's per-query
  * ceilings, so a rewrite that silently changes a query's scaling class
  * (linear → quadratic) fails CI instead of surfacing at the next data
  * bump — the r8 mm_phash_pairs lesson (0.4 s at sf0.01, 210 s at
  * sf0.1) made measured super-linearity checks part of the bar.
  *
  * GATED like the kafka suite: runs only when `SPARK_GRAFT_SCALE_DIR`
  * points at a [[graft.tools.ScaleGen]] output (base defaults to
  * /root/testdata/sf0.1, override with `SPARK_GRAFT_SCALE_BASE`);
  * cancels cleanly otherwise — a factor-10 sweep of the heavy set is a
  * deliberate ~12-minute run, not an every-commit cost. The ratio
  * mostly cancels sustained host load (both sides time in one
  * session); ceilings are calibrated per ScalePlan's own doc (≈ 2–3×
  * the round-11 measured ratios, floored at the class minimum), and
  * the measurement discipline is ScaleCheck.measureRatio — ONE shared
  * definition, so this gate always pins the same statistic the
  * artifact records. */
class ScaleCheckSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  private val bigDir = sys.env.get("SPARK_GRAFT_SCALE_DIR")
  private val big32Dir = sys.env.get("SPARK_GRAFT_SCALE32_DIR")
  private val big32eDir = sys.env.get("SPARK_GRAFT_SCALE32E_DIR")

  lazy val spark = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = GraftSession.create(s"local[$cpus]", 32)
    s.sparkContext.setLogLevel("ERROR")
    s.conf.set("spark.graft.lint", "off")
    s
  }

  override def afterAll(): Unit =
    if (bigDir.isDefined || big32Dir.isDefined || big32eDir.isDefined) spark.stop()

  private def gate(checks: Seq[(String, Double)], big: String): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SCALE_BASE", "/root/testdata/sf0.1")
    val over = checks.flatMap { case (id, ceiling) =>
      var (baseSec, bigSec, ratio) =
        tools.ScaleCheck.measureRatio(spark, base, big, id)
      // Single-capture armor (round 13): a shared-VM stall on EITHER
      // side can push one capture through a ceiling (or under the 0.67
      // floor) without any class change — the r13 calibration sessions
      // caught dd_lsh_tuning at 14.3× and dd_ppjoin at 19.1× in two
      // consecutive gate runs whose quiet-host artifact prices were
      // 2.1× and 3.5×. Re-measure ONCE (minutes later, the Bench rerun
      // discipline), keep the min of each side; a breach that stands
      // after the rerun fails the gate as a real class change.
      var remeasured = false
      if (ratio >= 0 && (ratio > ceiling || ratio < 0.67)) {
        remeasured = true
        val (b2, g2, _) = tools.ScaleCheck.measureRatio(spark, base, big, id)
        if (b2 > 0) baseSec = if (baseSec > 0) math.min(baseSec, b2) else b2
        if (g2 >= 0) bigSec = if (bigSec >= 0) math.min(bigSec, g2) else g2
        ratio = if (baseSec > 0 && bigSec >= 0) bigSec / baseSec else -1.0
      }
      info(f"$id%-18s base=$baseSec%8.3f s  big=$bigSec%8.3f s  ratio=$ratio%7.2f  ceiling=$ceiling${if (remeasured) "  (remeasured)" else ""}")
      if (ratio < 0) Some(s"$id: measurement FAILED")
      else if (ratio > ceiling) Some(f"$id: ratio $ratio%.1f > ceiling $ceiling%.1f")
      else None
    }
    withClue(over.mkString("; ")) { over shouldBe empty }
  }

  behavior of "heavy-query scale ratios"

  it should "stay at or below every audited big/base ratio ceiling" in {
    assume(bigDir.isDefined,
      "SPARK_GRAFT_SCALE_DIR not set — generate a corpus with graft.tools.ScaleGen to run the scale gate")
    gate(tools.ScalePlan.checks, bigDir.get)
  }

  // Factor-32 documents-only slope gate (round 12, r11 verdict item 6):
  // at factor 10 the linear class measures 0.2–3.9x (ScaleCheck's class
  // doc — the calibration record) where per-job fixed overheads
  // dominate, so a hidden N·log N (or worse) could hide inside the
  // band. 32x the documents table puts real slope on the claim — the
  // ceilings in ScalePlan.checks32 are slope-aware (≈2x the measured
  // factor-32 ratios, all far under the 32x a linear-in-wall profile
  // would only reach once data dominates overheads).
  it should "hold the linear class at or below its factor-32 slope ceilings" in {
    assume(big32Dir.isDefined,
      "SPARK_GRAFT_SCALE32_DIR not set — generate with ScaleGen <src> <out> 32 documents to run the slope gate")
    gate(tools.ScalePlan.checks32, big32Dir.get)
  }

  // Factor-32 embeddings-only slope gate (round 13, r12 verdict item 1):
  // the ANN build-side measurement — 32x the embeddings table exposes
  // the √N IVF family's assignment class (two-level coarse assignment)
  // and pins the fixed-budget cards to the linear band once vector data
  // dominates overheads.
  it should "hold the ANN class at or below its factor-32 embeddings slope ceilings" in {
    assume(big32eDir.isDefined,
      "SPARK_GRAFT_SCALE32E_DIR not set — generate with ScaleGen <src> <out> 32 embeddings to run the ANN slope gate")
    gate(tools.ScalePlan.checks32e, big32eDir.get)
  }
}
