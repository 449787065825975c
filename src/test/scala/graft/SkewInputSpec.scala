package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Skew robustness: the testdata is benign (uniform users, near-unique
  * docs), so the skew defenses the scale design leans on — the LSH
  * hot-bucket cap, the salted aggregation, per-user windows under a
  * dominant key — never actually FIRE in the oracle gate. This spec
  * builds deliberately degenerate corpora (one user owning half the
  * events; a boilerplate document cloned past the bucket cap) and pins
  * the behavior contracts: deterministic truncation, exact tie-out with
  * an independent census, no crash.
  */
class SkewInputSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-skew-input-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  behavior of "LSH hot-bucket cap"

  it should "truncate a boilerplate bucket to the smallest doc_ids, deterministically" in {
    // 60 clones of one boilerplate doc + 40 unique docs; cap of 8 members
    // per (band, key) bucket. Contract: the clones' candidate pairs are
    // exactly C(8,2) over the 8 SMALLEST clone ids — bounded memory AND
    // reproducible output when a real corpus hits degenerate boilerplate.
    val boiler = "the quick brown fox jumps over the lazy dog again and again"
    val docs = spark.range(100).select(col("id").as("doc_id"),
      when(col("id") < 60, lit(boiler))
        .otherwise(concat(lit("unique text body number "), col("id"),
          lit(" with its own distinct words "), col("id") * 7)).as("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft-skew-docs").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = operators.Dedup.lshPairsUnsorted(spark, dir, maxBucketSize = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val clonePairs = pairs.filter { case (a, b) => a < 60 && b < 60 }
    val expected = (for {
      a <- 0L until 8L; b <- (a + 1) until 8L
    } yield (a, b)).toSet
    clonePairs shouldBe expected
    // run twice: identical truncation (the cap keeps SMALLEST ids, not
    // an arbitrary partition-order subset)
    val again = operators.Dedup.lshPairsUnsorted(spark, dir, maxBucketSize = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    again shouldBe pairs
  }

  it should "keep dd_cascade stage counts monotone when the default cap fires" in {
    // 1100 exact clones blow past the DEFAULT 1024 bucket cap, so LSH
    // leaves 76 clones unpaired as singleton reps — without the n_norm
    // clamp the near-dup "survivor" count would EXCEED the norm stage's
    // and the cascade would report negative stage-3 shrinkage.
    val boiler = "the quick brown fox jumps over the lazy dog again and again"
    val docs = spark.range(1140).select(col("id").as("doc_id"),
      when(col("id") < 1100, lit(boiler))
        .otherwise(concat(lit("unique text body number "), col("id"),
          lit(" with its own distinct words "), col("id") * 7)).as("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft-skew-cascade").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = operators.Dedup.ddCascade(spark, dir).collect().head
    val (nRaw, nExact, nNorm, nNear) =
      (r.getAs[Long]("n_raw"), r.getAs[Long]("n_exact"),
        r.getAs[Long]("n_norm"), r.getAs[Long]("n_neardup"))
    nRaw shouldBe 1140L
    nExact shouldBe 41L // 1 boilerplate hash + 40 uniques
    nNorm should be <= nExact
    nNear should be <= nNorm // the clamp: stage 3 only sees stage-2 survivors
    val (exactDrop, totalDrop) =
      (r.getAs[Double]("exact_drop_rate"), r.getAs[Double]("total_drop_rate"))
    totalDrop should be >= exactDrop
  }

  it should "census a corpus-hot boilerplate line with exact counts" in {
    // every doc carries the same banner line — the hot-hash shape where
    // a Window.partitionBy(h) would serialize into one task; the
    // (h, doc)-keyed partial agg + join-back must stay exact AND the
    // report must name the banner with full counts
    val banner = "accept cookies to continue reading this site"
    val docs = spark.range(1000).select(col("id").as("doc_id"),
      concat(lit(banner + "\n"), lit("body number "), col("id"),
        lit(" words "), col("id") * 13).as("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft-skew-line").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = operators.Dedup.ddLineDup(spark, dir).collect()
    rows.length shouldBe 1000
    rows.foreach { r => // 2 lines each: the hot banner + a unique body
      r.getAs[Long]("n_lines") shouldBe 2L
      r.getAs[Long]("dup_lines") shouldBe 1L
      r.getAs[Long]("remove_flag") shouldBe 1L // 0.5 >= 0.3
    }
    val top = operators.Dedup.ddLineCensus(spark, dir).collect().head
    top.getAs[String]("line") shouldBe banner
    top.getAs[Long]("n_docs") shouldBe 1000L
    top.getAs[Long]("n_copies") shouldBe 1000L
    // the removal half on the same hot-hash corpus: the banner line is
    // trimmed from every doc, each unique body survives verbatim
    val trims = operators.Dedup.ddLineTrim(spark, dir).collect()
    trims.length shouldBe 1000
    trims.foreach { r =>
      r.getAs[Long]("removed_lines") shouldBe 1L
      r.getAs[Long]("kept_lines") shouldBe 1L
      val id = r.getAs[Long]("doc_id")
      r.getAs[String]("cleaned_text") shouldBe s"body number $id words ${id * 13}"
    }
  }

  behavior of "event operators under a dominant user"

  lazy val skewDir: String = {
    // one user owns ~half the stream (timestamps untouched — the sf0.001
    // density already puts user 7 far past the per-hour throttle cap)
    val dir = java.nio.file.Files.createTempDirectory("graft-skew-ev").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val skewed = ev.withColumn("user_id",
      when(col("event_id") % 2 === 0, lit(7L)).otherwise(col("user_id")))
    skewed.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables.names.filter(_ != "events").foreach { t =>
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  it should "keep the salted aggregation exact under skew" in {
    // ev_salted_agg's contract is oracle-proved on uniform data; the
    // two-phase salted identity (salted ≡ direct groupBy) must also
    // survive a corpus where one user dominates the row distribution
    val salted = operators.EventAnalytics.evSaltedAgg(spark, skewDir).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n_events")).toMap
    val direct = Tables.events(spark, skewDir).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    salted shouldBe direct
    // and the injected user skew is real
    val byUser = Tables.events(spark, skewDir).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byUser(7L) should be >= byUser.values.sum / 3
  }

  it should "throttle the dominant user without losing accounting" in {
    val rep = operators.EventAnalytics.evThrottle(spark, skewDir).collect()
    rep.map(_.getAs[Long]("n_events")).sum shouldBe
      Tables.events(spark, skewDir).count()
    rep.foreach { r =>
      r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped") shouldBe r.getAs[Long]("n_events")
    }
    // the burst user's tail actually gets dropped (the cap fires)
    rep.map(_.getAs[Long]("n_dropped")).sum should be > 0L
  }

  it should "keep RFM segment totals exact under skew" in {
    val rows = operators.EventValue.evRfm(spark, skewDir).collect()
    rows.map(_.getAs[Long]("n_users")).sum shouldBe
      Tables.events(spark, skewDir)
        .select(countDistinct("user_id")).collect()(0).getLong(0)
  }
}
