package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Dirty-event-stream robustness: replay duplicates, same-microsecond
  * collisions, and clock-skew outliers are the standing reality of any
  * at-least-once ingest path (the reference's replay window and offset
  * gap monitoring exist precisely because of them). Every event operator
  * must complete AND be deterministic on such a stream — an operator
  * whose output flips between runs on duplicate rows cannot be
  * hash-verified or replayed. Outlier timestamps additionally stretch
  * every densified time spine (ev_resample / ev_forecast /
  * ev_ts_similarity / ev_concurrency build min..max hour sequences): ±5
  * years of skew must degrade to a longer-but-bounded spine, never an
  * explosion or a throw.
  */
class DirtyEventsSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-dirty-events-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  lazy val dirtyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-dirty-ev").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    // (a) 50 exact replay duplicates (same event_id, same everything)
    val dups = ev.filter(col("event_id") % 200 === 0).limit(50)
    // (b) 20 same-microsecond collisions: distinct ids sharing one user+ts
    val collide = ev.filter(col("event_id") < 20)
      .withColumn("event_id", col("event_id") + 100000L)
      .withColumn("user_id", lit(3L))
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-06-01 12:00:00"))
        .cast(ev.schema("ts").dataType))
    // (c) clock-skew outliers: explicitly one 5 years EARLY and one 5
    // years LATE — direction assigned by construction, not by the parity
    // of whatever two rows an unordered limit happens to return (both
    // landing on one side would silently untest positive skew)
    val early = ev.orderBy(col("event_id")).limit(1)
      .withColumn("event_id", col("event_id") + 200000L)
      .withColumn("ts", lit("2019-06-01 00:00:00").cast("timestamp")
        .cast(ev.schema("ts").dataType))
    val late = ev.orderBy(col("event_id").desc).limit(1)
      .withColumn("event_id", col("event_id") + 300000L)
      .withColumn("ts", lit("2031-06-01 00:00:00").cast("timestamp")
        .cast(ev.schema("ts").dataType))
    val outliers = early.unionByName(late)
    ev.unionByName(dups).unionByName(collide).unionByName(outliers)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables.names.filter(_ != "events").foreach { t =>
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def eventOps: Seq[(String, (SparkSession, String) => DataFrame)] =
    SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      n.startsWith("ev_") || n.startsWith("sl_") ||
        Set("q_gaps_islands", "q_pivot", "q_percentiles", "q_distinct_agg",
          "q_window_dist", "q_approx_distinct").contains(n)
    }

  behavior of "event-family operators"

  it should "run deterministically on a stream with replays, ties, and clock skew" in {
    val failures = TestSweep.collectFailures(eventOps) { case (name, fn) =>
      try {
        val a = fn(spark, dirtyDir).collect().map(_.toString).sorted
        val b = fn(spark, dirtyDir).collect().map(_.toString).sorted
        if (a.toSeq != b.toSeq) Some(s"$name: NONDETERMINISTIC under duplicate rows")
        else None
      } catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}")
      }
    }
    withClue(s"operators failing on the dirty stream:\n${failures.mkString("\n")}\n") {
      failures shouldBe empty
    }
  }

  it should "label pre-epoch hours with in-range calendar buckets" in {
    // 1969-12-31 12:00 UTC is a Wednesday, hour 12. Under truncating
    // `div`/`%` (both engines truncate toward zero) the old formulation
    // labeled it hod −12 and a negative dow; the pmod arithmetic used by
    // ev_forecast must land in [0,7)/[0,24): dow 3 under the epoch-day-0
    // = Thursday = 4 convention (0 = Sunday), hod 12.
    val row = spark.sql(
      "SELECT pmod(((h - pmod(h, 24)) div 24) + 4, 7) AS dow, pmod(h, 24) AS hod " +
        "FROM (SELECT unix_micros(TIMESTAMP'1969-12-31 12:00:00Z') div 3600000000 AS h)")
      .collect()(0)
    row.getLong(0) shouldBe 3L
    row.getLong(1) shouldBe 12L
  }

  it should "run ev_forecast end to end over a corpus with a pre-epoch outlier" in {
    val dir = java.nio.file.Files.createTempDirectory("graft-preepoch-ev").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val preEpoch = ev.orderBy(col("event_id")).limit(1)
      .withColumn("event_id", col("event_id") + 500000L)
      .withColumn("ts", lit("1965-03-01 06:30:00").cast("timestamp")
        .cast(ev.schema("ts").dataType))
    ev.unionByName(preEpoch)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = operators.EventValue.evForecast(spark, dir).collect()
    out should not be empty
    out.foreach(r => r.getAs[Long]("n_test_hours") should be > 0L)
  }

  it should "bound the densified spines by the skewed corpus span" in {
    import org.apache.spark.sql.functions.{max => smax, min => smin}
    // ~12 years of hourly spine (2019..2031) — longer, never explosive
    val hours = operators.EventAnalytics.evResample(spark, dirtyDir)
      .agg(count(lit(1))).collect()(0).getLong(0)
    val span = Tables.events(spark, dirtyDir)
      .agg((smax(unix_micros(col("ts"))) - smin(unix_micros(col("ts")))) / 3600000000L)
      .collect()(0).getDouble(0).toLong
    hours should be <= (span + 2) * 5 // per-type spine ≤ corpus span
    hours should be > 100000L // the outliers really did stretch it
  }
}
