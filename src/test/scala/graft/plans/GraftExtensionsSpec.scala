package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Pins the [[GraftExtensions]] session hook end to end on a session
  * built purely from `spark.sql.extensions` config — the way a user's
  * spark-submit wires it: injected functions resolve in plain SQL with
  * no register() call, and the [[GraftLintRule]] honors its
  * off/warn/enforce contract (off by default, enforce fails a hazardous
  * plan at PLANNING time and still passes clean plans). */
class GraftExtensionsSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-extensions-spec")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def afterAll(): Unit = spark.stop()

  private def hazardous = spark.read.parquet(s"$sf/documents.parquet")
    .withColumn("r", row_number().over(Window.orderBy(col("doc_id"))))

  behavior of "GraftExtensions"

  it should "resolve injected functions in plain SQL without register()" in {
    val r = spark.sql(
      "SELECT graft_gram_buckets(array('a', 'b', 'c'), 2, 8, 0) AS b").collect()
    r.length shouldBe 1
    r.head.getSeq[Long](0).length shouldBe 2 // two bigrams from three tokens
  }

  it should "reject a non-literal or out-of-range salt count for graft_minhash_tokens_w" in {
    // the salt count is baked into the kernel at plan time, so anything
    // but an in-range integer literal must fail loudly at analysis
    val nonLiteral = intercept[Exception] {
      // a column reference is unresolved-to-non-foldable at the point the
      // builder runs (a foldable EXPRESSION like length('xx') is fine —
      // the guard is about row-varying salt counts, not literal syntax)
      spark.sql("SELECT graft_minhash_tokens_w(array('a','b','c'), x) AS s " +
        "FROM (SELECT 2 AS x)").collect()
    }
    nonLiteral.getMessage should include ("integer literal")
    val outOfRange = intercept[Exception] {
      spark.sql("SELECT graft_minhash_tokens_w(array('a','b','c'), 65) AS s").collect()
    }
    outOfRange.getMessage should include ("[1, 64]")
    // a Long that would WRAP to a valid Int (4294967299L.toInt == 3) must
    // still be rejected — range check happens before any narrowing
    val longWrap = intercept[Exception] {
      spark.sql("SELECT graft_minhash_tokens_w(array('a','b','c'), 4294967299) AS s").collect()
    }
    longWrap.getMessage should include ("[1, 64]")
    // and the legal form resolves in plain SQL with the right width
    spark.sql("SELECT graft_minhash_tokens_w(array('a','b','c','d'), 4) AS s")
      .collect().head.getSeq[String](0).length shouldBe 16
  }

  it should "pass hazardous plans when lint is off (the default)" in {
    spark.conf.unset("spark.graft.lint")
    hazardous.count() should be > 0L
  }

  it should "pass hazardous plans in warn mode" in {
    spark.conf.set("spark.graft.lint", "warn")
    try hazardous.count() should be > 0L
    finally spark.conf.unset("spark.graft.lint")
  }

  it should "fail hazardous plans at planning time in enforce mode" in {
    spark.conf.set("spark.graft.lint", "enforce")
    try {
      val thrown = intercept[Throwable] { hazardous.collect() }
      // the optimizer may wrap rule exceptions; accept it anywhere in
      // the cause chain
      val chain = Iterator.iterate(thrown)(_.getCause).takeWhile(_ != null).toSeq
      withClue(chain.map(_.getClass.getName).mkString(" <- ")) {
        chain.exists(t => t.isInstanceOf[GraftLintException] ||
          String.valueOf(t.getMessage).contains("graft lint")) shouldBe true
      }
    } finally spark.conf.unset("spark.graft.lint")
  }

  it should "pass clean plans in enforce mode" in {
    spark.conf.set("spark.graft.lint", "enforce")
    try {
      spark.read.parquet(s"$sf/documents.parquet")
        .groupBy(col("lang")).count().collect().length should be > 0
    } finally spark.conf.unset("spark.graft.lint")
  }

  // The engine's own session factory ships with planning-time screening
  // on (r8 verdict: `off` is the one default a 100 TB engine shouldn't
  // ship). The raw-rule default stays `off` — pinned above — so
  // externally-built sessions are unaffected. Sessions here share the
  // spec's SparkContext; they must NOT be stopped.
  it should "default factory sessions to spark.graft.lint=warn" in {
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    try {
      val s = graft.GraftSession.create("local[4]", 4)
      s.conf.get("spark.graft.lint") shouldBe "warn"
    } finally {
      SparkSession.setActiveSession(spark); SparkSession.setDefaultSession(spark)
    }
  }

  it should "honor an explicit lint=off override on the factory builder" in {
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    try {
      val s = graft.GraftSession.builder("local[4]", 4)
        .config("spark.graft.lint", "off").getOrCreate()
      s.conf.get("spark.graft.lint") shouldBe "off"
    } finally {
      SparkSession.setActiveSession(spark); SparkSession.setDefaultSession(spark)
    }
  }
}
