package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Scale-up smoke harness (round 11, r10 verdict item 1): time the
  * heavy query set at the base scale factor and at [[ScaleGen]]'s
  * factor-scaled corpus, and report the big/base wall-time RATIO per
  * query — the measured super-linearity check behind every "would this
  * hold at 100 TB" claim in SURVEY §4. The ratio mostly cancels
  * sustained host load (both sides run in one session minutes apart);
  * ScaleCheckSpec pins per-query ratio ceilings so a rewrite that goes
  * quadratic fails CI instead of surfacing at the next data bump.
  *
  * Scaling classes, with the round-11 factor-10 measurements that
  * calibrated the ceilings in [[ScalePlan.checks]]:
  * - `linear` — record-local kernels + partial-agg collapse: measured
  *   1.07–2.35× (fixed per-job overheads still dominate at these
  *   absolute sizes, so wall ratios sit well under the data factor).
  * - `shuffle` — keyed joins, prefix-filtered self-joins, fixpoints:
  *   measured 0.83–5.2× (cl_dbscan < 1 rides the shared pair memo).
  * - `pruned-quad` — evaluation cards whose query set grows WITH the
  *   corpus (vec_id % 4) but whose candidate lists are index-pruned
  *   (IVF cells, hash buckets, NN-descent neighborhoods): measured
  *   2.0–5.4× at factor 10 — the shapes that SURVIVE a corpus bump.
  * - `adc-scan` — the full-scan ADC cards (ann_pq, ann_opq): PQ is a
  *   COMPRESSED LINEAR SCAN per query, so with Q ∝ N the card is
  *   Θ(factor²) BY CONTRACT — measured 17–44× at factor 10, the
  *   harness's headline super-linearity finding. That is the measured
  *   "switch to IVF-PQ" trigger (ann_ivfpq: 3.7× on the same data),
  *   priced in the artifact, never hidden under a linear claim.
  *
  * Usage: `ScaleCheck <baseSfDir> <bigSfDir> <factor> <outJson> [ids…]`
  * — base side times warm + min-of-2 (the Bench discipline); the big
  * side takes min-of-2 only while a single run stays under 60 s
  * (quad-class cards pay one run — their ceilings carry the margin). */
object ScaleCheck {

  def timeOnce(spark: SparkSession, d: String, id: String): Double = {
    val t0 = System.nanoTime()
    SparkEntry.queries(id)(spark, d).count()
    (System.nanoTime() - t0) / 1e9
  }

  /** THE measurement discipline, shared by the artifact run and the
    * ScaleCheckSpec gate so the CI ceiling always pins the same
    * statistic the artifact records: base = warm pass + min-of-2
    * (the Bench discipline); big = min-of-2 only while a single run
    * stays under 60 s (the adc-scan cards pay one run — their ceilings
    * carry the margin). Returns (baseSec, bigSec, ratio); a failed side
    * reports -1 and ratio -1. */
  def measureRatio(spark: SparkSession, base: String, big: String,
      id: String): (Double, Double, Double) = {
    val baseSec = try {
      timeOnce(spark, base, id) // warm codegen/JIT for this plan shape
      math.min(timeOnce(spark, base, id), timeOnce(spark, base, id))
    } catch { case e: Throwable =>
      System.err.println(s"[scalecheck] $id base FAILED: ${e.getMessage}"); -1.0
    }
    val bigSec = try {
      val first = timeOnce(spark, big, id)
      if (first < 60.0) math.min(first, timeOnce(spark, big, id)) else first
    } catch { case e: Throwable =>
      System.err.println(s"[scalecheck] $id big FAILED: ${e.getMessage}"); -1.0
    }
    val ratio = if (baseSec > 0 && bigSec >= 0) bigSec / baseSec else -1.0
    (baseSec, bigSec, ratio)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: ScaleCheck <baseSfDir> <bigSfDir> <factor> <outJson> [ids...]")
    val (base, big, factor, outJson) = (args(0), args(1), args(2).toInt, args(3))
    val ids = if (args.length > 4) args.drop(4).toSeq else ScalePlan.checks.map(_._1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.create(s"local[$cpus]", 32)
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.lint", "off")
    val rows = ids.map { id =>
      val (baseSec, bigSec, ratio) = measureRatio(spark, base, big, id)
      println(f"[scalecheck] $id%-18s base=$baseSec%8.3f s  big=$bigSec%8.3f s  ratio=$ratio%7.2f")
      (id, baseSec, bigSec, ratio)
    }
    def fmt(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val ceil = ScalePlan.checks.toMap
    val qs = rows.map { case (id, b, g, r) =>
      s""""$id":{"base_sec":${fmt(b)},"big_sec":${fmt(g)},"ratio":${fmt(r)},"ceiling":${ceil.getOrElse(id, -1.0)}}"""
    }.mkString("{", ",", "}")
    val line = s"""{"artifact":"scalecheck","factor":$factor,"base":"$base","big":"$big","queries":$qs}"""
    println(line)
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson), (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}

/** The heavy-set scale plan: (query id, big/base ratio ceiling at
  * factor 10). Ceilings are CALIBRATED from the round-11 measured run
  * (≈ 2–3× the measured ratio, floored at the class minimum) — they
  * exist to catch a REWRITE changing a query's scaling class (linear →
  * quadratic), not to be tight timing bounds. Shared by the
  * [[ScaleCheck]] artifact and ScaleCheckSpec. */
object ScalePlan {
  val checks: Seq[(String, Double)] = Seq(
    // linear class (measured 1.07-2.35x at factor 10)
    "dd_substring" -> 6.0,
    "dd_line_dup" -> 6.0,
    "dd_dup_span" -> 6.0,
    "ta_dsir" -> 6.0,
    "mm_phash" -> 6.0,
    // shuffle class (measured 0.83-5.2x)
    "dd_ppjoin" -> 12.0,
    // dd_sig_width pays the heaviest CPU kernel of the set (32-perm md5
    // signatures over every doc) ON TOP of the truth build — measured
    // band 4.4-13.1x across round-11 runs (isolated floor ~6x; the tail
    // is shared-host scheduling of a saturating CPU pass, not shape)
    "dd_sig_width" -> 20.0,
    "dd_sig_plan" -> 12.0,
    "dd_lsh_tuning" -> 12.0,
    "dd_lsh_recall" -> 12.0,
    "dd_dup_groups" -> 12.0,
    "cl_kcenter" -> 12.0,
    "cl_pagerank" -> 12.0,
    "cl_dbscan" -> 12.0,
    "ev_sessions" -> 12.0,
    // pruned-quad evaluation cards (measured 2.0-5.4x): query set grows
    // with the corpus, candidates index-pruned — the surviving shapes
    "mm_phash_pairs" -> 20.0,
    "ann_ivfpq" -> 20.0,
    "ann_recall_card" -> 20.0,
    "ann_nndescent" -> 20.0,
    // adc-scan cards (measured 17-44x): Θ(factor²) by contract — the
    // ceiling bounds the CONSTANT, the class is the documented price
    "ann_pq" -> 70.0,
    "ann_opq" -> 70.0,
    // same class: three truncated-dim Q×N scans (at w/64 the flops each)
    "ann_dim_trunc" -> 70.0)
}
