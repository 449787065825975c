package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Empty-input robustness: every registered operator must PLAN AND RUN
  * (returning zero or more rows, never throwing) against schema-identical
  * but EMPTY tables. At 100 TB this is not an edge case — a time/partition
  * predicate that matches nothing, a fresh tenant, a replay window past
  * the head of the stream all hand every operator an empty frame, and an
  * engine that NPEs on `collect().head` or divides by a zero count in
  * that state cannot be scheduled unattended. (The driver's oracle gate
  * never exercises this: its tables are always populated.)
  */
class EmptyInputSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-empty-input-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Schema-identical empty copies of every testdata table. */
  lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    Tables.names.foreach { t =>
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .limit(0).coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  behavior of "every registered operator"

  it should "run to completion on empty tables" in {
    val failures = TestSweep.collectFailures(
        SparkEntry.queries.toSeq.sortBy(_._1)) { case (name, fn) =>
      try { fn(spark, emptyDir).collect(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    withClue(s"operators crashing on empty input:\n${failures.mkString("\n")}\n") {
      failures shouldBe empty
    }
  }
}
