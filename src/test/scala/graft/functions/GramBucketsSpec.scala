package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** The one contract that matters: graft_gram_buckets(toks, n, hex, mod)
  * is BIT-FOR-BIT the composed column chain
  * `conv(substring(md5(concat_ws(' ', gram)), 1, hex), 16, 10)
  * .cast("long") [% mod]` — every oracle in the n-gram family is
  * written against that chain, so any divergence is an oracle break.
  * Plus the edge contracts (short arrays, no-modulo mode, unicode,
  * null elements) and codegen execution through a parquet scan. */
class GramBucketsSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-gram-buckets-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // fixed-seed random token frames: varied lengths, repeated tokens,
  // unicode, empties-adjacent content
  private def fixtures: Seq[(Long, Seq[String])] = {
    val r = new scala.util.Random(42)
    val vocab = Vector("the", "quick", "brown", "fox", "naïve", "héllo",
      "日本語", "x", "longertoken_with_underscores", "123", "a b".replace(" ", ""),
      "…", "zz")
    (0 until 120).map { i =>
      i.toLong -> Seq.fill(r.nextInt(20))(vocab(r.nextInt(vocab.length)))
    }
  }

  /** The composed chain the kernel must equal, as a Column over `tk`. */
  private def composedChain(n: Int, hex: Int, mod: Int): org.apache.spark.sql.Column = {
    val gram = (i: org.apache.spark.sql.Column) =>
      concat_ws(" ", (0 until n).map(j => element_at(col("tk"), i + j)): _*)
    val raw = (i: org.apache.spark.sql.Column) =>
      conv(substring(md5(gram(i).cast("binary")), 1, hex), 16, 10).cast("long")
    val v = (i: org.apache.spark.sql.Column) =>
      if (mod > 0) raw(i) % mod else raw(i)
    // scalatest's Matchers.size(Long) shadows functions.size — qualify
    val sz = org.apache.spark.sql.functions.size(col("tk"))
    when(sz >= n,
      transform(sequence(lit(1), sz - (n - 1)), i => v(i)))
      .otherwise(array().cast("array<long>"))
  }

  behavior of "graft_gram_buckets"

  it should "equal the composed md5/conv chain for every (n, hexDigits, mod) shape, codegen'd" in {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    // parquet round-trip: a LocalRelation projection constant-folds
    // driver-side (doGenCode never runs) — the scan stage forces codegen
    val dir = java.nio.file.Files.createTempDirectory("graft-gram-codegen").toString
    fixtures.toDF("id", "tk").write.mode("overwrite").parquet(dir)
    val base = spark.read.parquet(dir)
    Seq((1, 8, 1024), (2, 8, 1024), (8, 8, 0), (3, 15, 0), (2, 1, 7), (5, 8, 2)).foreach {
      case (n, hex, mod) =>
        // two separate projections: the composed chain's transform()
        // lambda is not codegen-able and would drag the shared Project
        // (and the kernel with it) onto the interpreted path
        val got = base.select(col("id"),
          call_function("graft_gram_buckets", col("tk"), lit(n), lit(hex), lit(mod)).as("arr"))
        val want = base.select(col("id"), composedChain(n, hex, mod).as("arr"))
        withClue(s"(n=$n hex=$hex mod=$mod) ") {
          got.queryExecution.executedPlan.toString should
            include regex """\*\(\d+\) Project .*graft_gram_buckets"""
          val g = got.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
          val w = want.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
          g shouldBe w
        }
    }
  }

  it should "honor the edge contracts" in {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(toks: String*): ArrayData =
      ArrayData.toArrayData(toks.map(t => if (t == null) null else UTF8String.fromString(t)).toArray)
    def run(a: ArrayData, n: Int, hex: Int, mod: Int): Seq[Long] =
      GramBucketsKernel.compute(a, n, hex, mod).toLongArray().toSeq

    // fewer than n tokens -> empty
    run(arr("a"), 2, 8, 0) shouldBe Seq.empty
    run(arr(), 1, 8, 0) shouldBe Seq.empty
    // no-modulo mode returns the raw hex-prefix value: bounded by 16^hex
    val raw = run(arr("a", "b", "c"), 1, 8, 0)
    raw.foreach { v => v should be >= 0L; v should be < (1L << 32) }
    // modulo mode reduces exactly
    run(arr("a", "b", "c"), 1, 8, 1024) shouldBe raw.map(_ % 1024)
    // a null element hashes as the empty string (callers never produce
    // one; the kernel must not throw)
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = md.digest("a ".getBytes("UTF-8")).take(4)
      .foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xff))
    run(arr("a", null), 2, 8, 0) shouldBe Seq(expect)
    // driver-side MD5 cross-check on a known unicode gram
    val md2 = java.security.MessageDigest.getInstance("MD5")
    val e2 = md2.digest("naïve 日本語".getBytes("UTF-8")).take(4)
      .foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xff))
    run(arr("naïve", "日本語"), 2, 8, 0) shouldBe Seq(e2)
  }
}
