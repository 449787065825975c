package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Pins [[PlanLint]] twice over: unit fixtures proving each rule fires
  * on the hazard and stays silent on the sound twin, and the
  * whole-engine audit — every SparkEntry query lints FREE OF ERRORS,
  * which is the repo's own scale discipline (r5–r7 window rewrites,
  * scan audits) restated as a single machine-checked sentence. */
class PlanLintSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-plan-lint-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def corpus = graft.Tables.events(spark, sf)

  behavior of "single-partition-window"

  it should "fire on a partition-less window over a corpus frame" in {
    val df = corpus.withColumn("r",
      row_number().over(Window.orderBy(col("event_id"))))
    PlanLint.lint(df).map(_.rule) should contain("single-partition-window")
  }

  it should "stay silent on a keyed window and on a reduced frame" in {
    val keyed = corpus.withColumn("r", row_number().over(
      Window.partitionBy(col("user_id")).orderBy(col("event_id"))))
    PlanLint.lint(keyed).map(_.rule) should not contain "single-partition-window"
    val reducedFrame = corpus.groupBy(col("event_type")).count()
      .withColumn("r", row_number().over(Window.orderBy(col("count"))))
    PlanLint.lint(reducedFrame).map(_.rule) should not contain "single-partition-window"
  }

  behavior of "cartesian-product"

  it should "fire on an unhinted corpus x corpus cross join" in {
    val df = corpus.select(col("event_id").as("a"))
      .crossJoin(corpus.select(col("event_id").as("b")))
    PlanLint.lint(df).map(_.rule) should contain("cartesian-product")
  }

  it should "stay silent when a side is reduced, broadcast-hinted, or limited" in {
    val scalar = corpus.agg(max(col("event_id")).as("mx"))
    PlanLint.lint(corpus.crossJoin(scalar)).map(_.rule) should
      not contain "cartesian-product"
    val hinted = corpus.crossJoin(
      broadcast(corpus.select(col("event_id").as("b")).limit(5)))
    PlanLint.lint(hinted).map(_.rule) should not contain "cartesian-product"
  }

  behavior of "repartition-to-one"

  it should "fire on coalesce(1) over the corpus and stay silent post-aggregate" in {
    PlanLint.lint(corpus.coalesce(1)).map(_.rule) should
      contain("repartition-to-one")
    PlanLint.lint(corpus.groupBy(col("event_type")).count().coalesce(1))
      .map(_.rule) should not contain "repartition-to-one"
  }

  behavior of "unbounded-collect"

  it should "warn on corpus-frame collect_list and stay silent on a reduced frame" in {
    val df = corpus.groupBy(col("event_type"))
      .agg(collect_list(col("event_id")).as("ids"))
    PlanLint.lint(df).map(_.rule) should contain("unbounded-collect")
    val post = corpus.groupBy(col("event_type"), col("user_id")).count()
      .groupBy(col("event_type")).agg(collect_list(col("count")).as("cs"))
    PlanLint.lint(post).map(_.rule) should not contain "unbounded-collect"
  }

  behavior of "scala-udf"

  it should "warn on a Scala UDF in the plan" in {
    val f = udf((x: Long) => x + 1)
    PlanLint.lint(corpus.select(f(col("event_id")))).map(_.rule) should
      contain("scala-udf")
    PlanLint.lint(corpus.select(col("event_id") + 1)).map(_.rule) should
      not contain "scala-udf"
  }

  it should "warn on a UDF inside a node another rule already matched" in {
    // Regression (r7 advice): the UDF check used to be a fall-through arm
    // of the same match as the structural rules, so a UDF inside an
    // Aggregate (matched by the collect arm) or a Window never reached it.
    val f = udf((x: Long) => x + 1)
    val inAgg = corpus.groupBy(col("event_type")).agg(sum(f(col("event_id"))).as("s"))
    PlanLint.lint(inAgg).map(_.rule) should contain("scala-udf")
    val inWin = corpus.withColumn("r",
      row_number().over(Window.orderBy(f(col("event_id")))))
    val winRules = PlanLint.lint(inWin).map(_.rule)
    winRules should contain("scala-udf")
    winRules should contain("single-partition-window")
  }

  behavior of "global-sort"

  it should "warn on a mid-pipeline global sort and excuse ORDER BY + LIMIT" in {
    PlanLint.lint(corpus.orderBy(col("event_id"))).map(_.rule) should
      contain("global-sort")
    PlanLint.lint(corpus.orderBy(col("event_id")).limit(10)).map(_.rule) should
      not contain "global-sort"
  }

  behavior of "the engine itself"

  it should "lint every registered query free of error-severity findings" in {
    // global-sort WARNS are expected (every query ends in a deterministic
    // presentation ORDER BY — the driver contract); zero ERRORS is the
    // claim: no single-task window, cartesian blowup, or 1-partition
    // funnel anywhere in 175 registered plans.
    val offenders = graft.SparkEntry.queries.toSeq.flatMap { case (name, q) =>
      val errs = try PlanLint.errors(q(spark, sf)) catch {
        case e: Throwable => Seq(PlanLint.Finding("lint-crash", "error",
          s"${e.getClass.getSimpleName}: ${e.getMessage}"))
      }
      errs.map(f => s"$name -> $f")
    }
    withClue(offenders.mkString("\n")) { offenders shouldBe empty }
  }
}
