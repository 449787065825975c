package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Pins the ScaleGen invariants every scale-harness ratio RELIES on —
  * if any of these drift, the big/base ratios stop measuring the
  * operators and start measuring generator artifacts:
  *
  * 1. copy 0 is the source VERBATIM (row-set equality);
  * 2. counts scale exactly ×factor, ids stay unique;
  * 3. cross-copy document vocabularies are DISJOINT (so no artificial
  *    clone groups manufacture a quadratic truth set);
  * 4. the true near-dup pair set scales EXACTLY linearly — the PPJoin
  *    J ≥ 0.9 truth count at factor k is k × the source's (token
  *    renaming preserves every within-copy Jaccard; disjoint vocabs
  *    make cross-copy J = 0);
  * 5. embedding norms are preserved (rotation + sign flips permute the
  *    squared terms — equal up to summation-order rounding);
  * 6. events replicate per-user timelines: users ×factor, and the
  *    per-type hourly densities scale exactly ×factor.
  *
  * Runs ALWAYS (factor 3 over sf0.001 — seconds), unlike the gated
  * factor-10 ratio sweep in ScaleCheckSpec. */
class ScaleGenSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = GraftSession.create("local[4]", 4)
    s.sparkContext.setLogLevel("ERROR")
    s.conf.set("spark.graft.lint", "off")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private val src = "/root/testdata/sf0.001"
  private val factor = 3

  private lazy val out: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-scalegen").toString
    tools.ScaleGen.generate(spark, src, dir, factor)
    dir
  }

  behavior of "ScaleGen invariants"

  it should "replicate copy 0 verbatim and scale counts exactly with unique ids" in {
    for (t <- Seq("documents", "embeddings", "events")) {
      val s0 = spark.read.parquet(s"$src/$t.parquet")
      val g = spark.read.parquet(s"$out/$t.parquet")
      withClue(s"$t: ") {
        g.count() shouldBe factor * s0.count()
        val idCol = t match {
          case "documents" => "doc_id"; case "embeddings" => "vec_id"
          case _ => "event_id"
        }
        g.select(idCol).distinct().count() shouldBe g.count()
        // copy 0 = rows whose id is below the source's id ceiling
        val m = s0.agg(max(col(idCol))).collect()(0).getLong(0) + 1
        val copy0 = g.filter(col(idCol) < m)
        copy0.count() shouldBe s0.count()
        copy0.exceptAll(s0.select(copy0.columns.map(col): _*)).count() shouldBe 0L
      }
    }
  }

  it should "copy unscaled tables verbatim in table-subset mode" in {
    // the factor-32 documents-only slope run relies on this: the corpus
    // directory stays a COMPLETE sf layout, but only the named table
    // scales — everything else must be the source byte-for-byte (row-set
    // equality; file layout may differ)
    val dir = java.nio.file.Files.createTempDirectory("graft-scalegen-sub").toString
    tools.ScaleGen.generate(spark, src, dir, factor, Some(Set("documents")))
    spark.read.parquet(s"$dir/documents.parquet").count() shouldBe
      factor * spark.read.parquet(s"$src/documents.parquet").count()
    for (t <- Seq("embeddings", "events", "lineitem")) {
      val s0 = spark.read.parquet(s"$src/$t.parquet")
      val g = spark.read.parquet(s"$dir/$t.parquet")
      withClue(s"$t: ") {
        g.count() shouldBe s0.count()
        g.exceptAll(s0).count() shouldBe 0L
        s0.exceptAll(g).count() shouldBe 0L
      }
    }
  }

  it should "keep cross-copy vocabularies disjoint" in {
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val m = spark.read.parquet(s"$src/documents.parquet")
      .agg(max(col("doc_id"))).collect()(0).getLong(0) + 1
    val tok = docs.select((col("doc_id") / m).cast("long").as("copy"),
        explode(graft.functions.TextFns.tokens(col("text"))).as("t"))
      .distinct()
    // a token string appearing in two copies would collide vocabularies
    tok.groupBy(col("t")).agg(countDistinct(col("copy")).as("nc"))
      .filter(col("nc") > 1).count() shouldBe 0L
  }

  it should "scale the exact PPJoin truth-pair set linearly" in {
    val base = operators.Dedup.ddPpjoin(spark, src).count()
    val big = operators.Dedup.ddPpjoin(spark, out).count()
    big shouldBe factor * base
  }

  it should "preserve embedding norms through rotation and sign flips" in {
    val emb = spark.read.parquet(s"$out/embeddings.parquet")
    val m = spark.read.parquet(s"$src/embeddings.parquet")
      .agg(max(col("vec_id"))).collect()(0).getLong(0) + 1
    graft.plans.GraftFunctions.register(spark)
    val nrm = emb.select(pmod(col("vec_id"), lit(m)).as("base_id"),
      graft.functions.VecFns.l2norm(col("embedding")).as("n"))
    // every copy of a vector has the source copy's norm up to
    // summation-order rounding of the permuted squared terms
    nrm.groupBy(col("base_id"))
      .agg((max(col("n")) - min(col("n"))).as("spread"),
        count(lit(1)).as("nc"))
      .filter(col("nc") =!= factor || col("spread") > 1e-4).count() shouldBe 0L
  }

  it should "replicate per-user event timelines at scaled density" in {
    val s0 = spark.read.parquet(s"$src/events.parquet")
    val g = spark.read.parquet(s"$out/events.parquet")
    g.select("user_id").distinct().count() shouldBe
      factor * s0.select("user_id").distinct().count()
    // hourly per-type densities scale EXACTLY (timestamps are verbatim)
    val h0 = s0.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .count().withColumnRenamed("count", "c0")
    val hg = g.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .count().withColumnRenamed("count", "cg")
    h0.join(hg, Seq("event_type", "h"), "full")
      .filter(coalesce(col("cg"), lit(-1L)) =!= lit(factor.toLong) * coalesce(col("c0"), lit(-1L)))
      .count() shouldBe 0L
  }
}
