package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** graft_span_trim contract: merge consecutive flagged windows into
  * runs, cut every token covered by a run of minTokens+ tokens (a run
  * of windows [p, q] at width w covers tokens p .. q+w−1), keep the
  * rest in order. Pinned against an INDEPENDENT set-based reference
  * (fold-grouped runs → covered-index set → filter), interpreted
  * (LocalRelation constant-fold) AND codegen'd (parquet scan), plus the
  * boundary/null/clamp edge contracts. */
class SpanTrimSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-span-trim-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Independent reference: group flagged window indexes into runs by a
    * fold, expand qualifying runs to a covered-token-index SET, filter.
    * Structurally different from the kernel's mark-array sweep. */
  private def refTrim(toks: Seq[String], flags: Seq[Boolean],
      width: Int, minTok: Int): Seq[String] = {
    val runs = flags.zipWithIndex.filter(_._1).map(_._2)
      .foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, i) if i == e + 1 => (s, i) :: rest
        case (acc, i) => (i, i) :: acc
      }
    val cut = runs.filter { case (s, e) => e - s + width >= minTok }
      .flatMap { case (s, e) => s to (e + width - 1) }.toSet
    toks.zipWithIndex.collect { case (t, i) if !cut(i) => t }
  }

  // fixed-seed fixtures: varied lengths, clustered flags (so real runs
  // form), plus all-true / all-false rows
  private def fixtures: Seq[(Long, Seq[String], Seq[Boolean])] = {
    val r = new scala.util.Random(7)
    (0 until 150).map { i =>
      val n = r.nextInt(40)
      val toks = (0 until n).map(j => s"t${r.nextInt(12)}_$j")
      val nw = math.max(0, n - 7)
      val flags =
        if (i % 10 == 0) Seq.fill(nw)(true)
        else if (i % 10 == 1) Seq.fill(nw)(false)
        else {
          // clustered: flip state with p=0.2 so consecutive runs appear
          var st = r.nextBoolean()
          (0 until nw).map { _ => if (r.nextDouble() < 0.2) st = !st; st }
        }
      (i.toLong, toks, flags)
    }
  }

  behavior of "graft_span_trim"

  it should "equal the set-based reference, interpreted and codegen'd" in {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-spantrim").toString
    fixtures.toDF("id", "tk", "fl").write.mode("overwrite").parquet(dir)
    Seq((8, 12), (8, 50), (4, 4), (1, 1), (8, 8)).foreach { case (w, m) =>
      val want = fixtures.map { case (id, tk, fl) => id -> refTrim(tk, fl, w, m) }.toMap
      def check(df: org.apache.spark.sql.DataFrame, clue: String): Unit = {
        val sel = df.select(col("id"),
          call_function("graft_span_trim", col("tk"), col("fl"),
            lit(w), lit(m)).as("kept"))
        withClue(s"$clue (w=$w m=$m) ") {
          val got = sel.collect()
            .map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
          got shouldBe want
        }
      }
      check(fixtures.toDF("id", "tk", "fl"), "interpreted")
      check(spark.read.parquet(dir), "codegen")
    }
    // codegen actually runs: the kernel call sits inside a WSCG project
    val plan = spark.read.parquet(dir).select(
      call_function("graft_span_trim", col("tk"), col("fl"), lit(8), lit(12)))
      .queryExecution.executedPlan.toString
    plan should include regex """\*\(\d+\) Project .*graft_span_trim"""
  }

  it should "honor the boundary, clamp and null contracts" in {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def toks(ts: String*): ArrayData =
      ArrayData.toArrayData(ts.map(t =>
        if (t == null) null else UTF8String.fromString(t)).toArray)
    def fl(bs: Boolean*): ArrayData = ArrayData.toArrayData(bs.toArray)
    def run(t: ArrayData, f: ArrayData, w: Int, m: Int): Seq[String] = {
      val out = SpanTrimKernel.compute(t, f, w, m)
      (0 until out.numElements()).map(i =>
        if (out.isNullAt(i)) null else out.getUTF8String(i).toString)
    }
    val t10 = toks((1 to 10).map(i => s"w$i"): _*)
    // run of 3 windows at width 8 = 10 tokens: cut at m=10, kept at m=11
    run(t10, fl(true, true, true), 8, 10) shouldBe Seq.empty
    run(t10, fl(true, true, true), 8, 11) shouldBe (1 to 10).map(i => s"w$i")
    // a gap splits runs: two 1-window runs of 8 tokens each, not one of 10
    run(t10, fl(true, false, true), 8, 9) shouldBe (1 to 10).map(i => s"w$i")
    run(t10, fl(true, false, true), 8, 8) shouldBe Seq.empty // overlap covers all 10
    // coverage clamps to the token range even if flags run long
    run(toks("a", "b"), fl(true, true, true), 2, 2) shouldBe Seq.empty
    // empty flags: identity
    run(t10, fl(), 8, 1) shouldBe (1 to 10).map(i => s"w$i")
    // null flag elements read as not-duplicated
    val withNullFlag = ArrayData.toArrayData(
      Array[Any](true, null, true))
    run(t10, withNullFlag, 8, 9) shouldBe (1 to 10).map(i => s"w$i")
    // null token elements ride through a kept region and die in a cut one
    run(toks("a", null, "c"), fl(true), 2, 2) shouldBe Seq("c")
    run(toks("a", null, "c"), fl(false), 2, 2) shouldBe Seq("a", null, "c")
    // null ARRAY inputs -> null result (BinaryExpression null intolerance)
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val df = Seq((1L, Option.empty[Seq[String]], Option(Seq(true))),
      (2L, Option(Seq("a", "b")), Option.empty[Seq[Boolean]]))
      .toDF("id", "tk", "fl")
      .select(col("id"), call_function("graft_span_trim",
        col("tk"), col("fl"), lit(8), lit(8)).as("kept"))
    df.collect().foreach(r => r.isNullAt(1) shouldBe true)
  }
}
