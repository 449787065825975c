package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Null-input robustness: every registered operator must plan and run
  * (never throw) when nullable payload columns actually carry nulls —
  * dirty corpora are the NORM for a training-data pipeline: scraped
  * documents with missing text/lang, events with unparsed values,
  * embedding rows whose vector failed to compute upstream. Keys and
  * event timestamps stay non-null (a loader assigns those); everything
  * downstream of decode is fair game. The functions-level NullSafetySpec
  * pins each custom expression's null contract; this spec pins the
  * OPERATOR compositions end to end.
  */
class NullInputSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-null-input-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Copies of the sf0.001 tables with ~10% of the nullable payload
    * columns nulled (deterministic by key, so failures reproduce). */
  lazy val nullDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-nulls").toString
    def load(t: String): DataFrame = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
    def nullify(df: DataFrame, key: String, cols: String*): DataFrame =
      cols.foldLeft(df) { (acc, c) =>
        acc.withColumn(c, when(pmod(col(key), lit(10)) === 3, lit(null)).otherwise(col(c)))
      }
    val tweaked: Map[String, DataFrame] = Map(
      "documents" -> nullify(load("documents"), "doc_id", "text", "lang", "source"),
      "events" -> nullify(load("events"), "event_id", "event_type", "value", "props"),
      "embeddings" -> nullify(load("embeddings"), "vec_id", "embedding", "label"),
      "orders" -> nullify(load("orders"), "o_orderkey", "o_orderpriority"),
      "lineitem" -> nullify(load("lineitem"), "l_orderkey", "l_returnflag"))
    Tables.names.foreach { t =>
      tweaked.getOrElse(t, load(t))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  behavior of "every registered operator"

  it should "run to completion with nulls in payload columns" in {
    val failures = TestSweep.collectFailures(
        SparkEntry.queries.toSeq.sortBy(_._1)) { case (name, fn) =>
      try { fn(spark, nullDir).collect(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    withClue(s"operators crashing on null payloads:\n${failures.mkString("\n")}\n") {
      failures shouldBe empty
    }
  }

  // Cross-engine presentation order under null lang (ADVICE r11): Spark's
  // default ASC sort puts NULL first while DuckDB's puts it last, so every
  // lang-keyed presentation sort carries asc_nulls_last. Pin the property
  // on the operator the advice named — null-lang groups must trail.
  it should "sort null-lang groups last in lang-keyed presentation orders" in {
    Seq(
      operators.TextAnalysis.queries("ta_script_langid"),
      operators.TextAnalysis.queries("ta_langid"),
      operators.Pipeline.queries("pipe_datacard")
    ).foreach { fn =>
      val langs = fn(spark, nullDir).collect().map(r =>
        Option(r.getAs[String]("lang")))
      withClue(s"lang order ${langs.mkString(",")}: ") {
        langs.count(_.isEmpty) should be > 0 // the fixture does null lang
        // once the first null lang appears, no non-null lang may follow
        langs.dropWhile(_.isDefined).forall(_.isEmpty) shouldBe true
      }
    }
  }
}
