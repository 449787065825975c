package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** graft_bpe_fuse contracts: (1) bit-equal to the composed-HOF fold
  * chain TextAnalysis.bpeEncodeHof for every table shape the trainer
  * can produce (and adversarial ones it can't), executed CODEGEN'd
  * through a parquet scan; (2) a production-sized merge table (1,200
  * entries — the HOF chain would blow plan compilation far below this)
  * compiles to an O(1)-size plan and matches an independent driver-side
  * fold; (3) kernel edge contracts (identity on empty table, length
  * mismatch and empty-symbol rejection, null elements, strict
  * leftmost-non-overlap). */
class BpeFuseSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-bpe-fuse-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // fixed-seed words: repeated letters (overlap traps), shared prefixes
  // (chain merges), BMP unicode (é/日本語 — split("") and the kernel must
  // agree on the same symbol arrays)
  private def words: Seq[(Long, String)] = {
    val r = new scala.util.Random(7)
    val alphabet = "aabbccdeéfgh日本語"
    (0 until 200).map { i =>
      i.toLong -> (0 until (1 + r.nextInt(12))).map(_ => alphabet(r.nextInt(alphabet.length))).mkString
    }
  }

  /** The sequential rank-order greedy fold, independently in plain
    * Scala — the semantics both the HOF chain and the kernel implement. */
  private def refEncode(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(word.map(_.toString).toVector) { case (syms, (l, r)) =>
      syms.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
        else acc :+ x
      }
    }

  behavior of "graft_bpe_fuse"

  it should "equal the composed-HOF chain for trainer-shaped and adversarial tables, codegen'd" in {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-codegen").toString
    words.toDF("id", "w").write.mode("overwrite").parquet(dir)
    val base = spark.read.parquet(dir)
    val tables: Seq[(String, Seq[(String, String)])] = Seq(
      "single" -> Seq("a" -> "b"),
      "chain" -> Seq("a" -> "b", "ab" -> "c", "abc" -> "d"), // trainer shape: parts exist before use
      "overlap" -> Seq("a" -> "a", "aa" -> "a", "b" -> "b"),
      "unicode" -> Seq("é" -> "f", "日" -> "本", "日本" -> "語"),
      "adversarial" -> Seq("ab" -> "c", "a" -> "b", "b" -> "c", "bc" -> "bc"), // un-trainable order
      "dense" -> (for (l <- "abcde".map(_.toString); r <- "abc".map(_.toString)) yield l -> r))
    tables.foreach { case (name, merges) =>
      // separate projections: the HOF chain blocks whole-stage codegen
      // for its Project; sharing one would drag the kernel interpreted
      val got = base.select(col("id"),
        graft.operators.TextAnalysis.bpeEncode(col("w"), merges).as("p"))
      val want = base.select(col("id"),
        graft.operators.TextAnalysis.bpeEncodeHof(col("w"), merges).as("p"))
      withClue(s"table=$name ") {
        got.queryExecution.executedPlan.toString should
          include regex """\*\(\d+\) Project .*graft_bpe_fuse"""
        val g = got.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
        val h = want.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
        g shouldBe h
        // and both equal the independent driver fold
        val wmap = words.toMap
        g.foreach { case (id, pieces) =>
          pieces shouldBe refEncode(wmap(id), merges)
        }
      }
    }
  }

  it should "compile and match the driver fold at a production-sized 1,200-merge table" in {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    // realistic shape: a long applicable chain (aa, aaa, …), pair merges
    // over the fixture alphabet, padded with merges whose symbols never
    // occur (most of a shipped table is inapplicable to any one word —
    // the kernel's skip set earns its keep here)
    val chain = (1 until 40).map(i => ("a" * i) -> "a")
    val pairs = for (l <- "abcdefgh".map(_.toString); r <- "abcdefgh".map(_.toString)) yield l -> r
    val padding = (0 until 1200).map(i => s"zq$i" -> s"xk$i")
    val big = (chain ++ pairs ++ padding).distinct.take(1200)
    big.size shouldBe 1200
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-big").toString
    words.toDF("id", "w").write.mode("overwrite").parquet(dir)
    val base = spark.read.parquet(dir)
    val t0 = System.nanoTime()
    val got = base.select(col("id"),
      graft.operators.TextAnalysis.bpeEncode(col("w"), big).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    // generous ceiling: the point is the HOF chain would not finish plan
    // compilation at K=1200 at all; the kernel path is interactive
    secs should be < 60.0
    val wmap = words.toMap
    got.foreach { case (id, pieces) => pieces shouldBe refEncode(wmap(id), big) }
  }

  it should "honor the kernel edge contracts" in {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(xs: String*): ArrayData =
      ArrayData.toArrayData(xs.map(x => if (x == null) null else UTF8String.fromString(x)).toArray)
    def run(syms: ArrayData, merges: (String, String)*): Seq[String] =
      BpeFuseKernel.compute(syms, arr(merges.map(_._1): _*), arr(merges.map(_._2): _*))
        .toArray[UTF8String](org.apache.spark.sql.types.StringType).map(_.toString).toSeq

    // empty table = identity
    run(arr("a", "b")) shouldBe Seq("a", "b")
    // strict leftmost-non-overlap: aaa under (a,a) -> [aa, a]
    run(arr("a", "a", "a"), "a" -> "a") shouldBe Seq("aa", "a")
    // merged symbol participates in LATER merges only
    run(arr("a", "b", "c"), "a" -> "b", "ab" -> "c") shouldBe Seq("abc")
    // null element folds as empty string, does not throw
    run(arr("a", null, "b"), "a" -> "b") shouldBe Seq("a", "", "b")
    // length mismatch and empty merge symbols are rejected
    an[IllegalArgumentException] should be thrownBy
      BpeFuseKernel.compute(arr("a"), arr("a", "b"), arr("b"))
    an[IllegalArgumentException] should be thrownBy
      BpeFuseKernel.compute(arr("a"), arr(""), arr("b"))
  }

  it should "never trust instance identity for non-constant tables" in {
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.unsafe.types.UTF8String
    def arr(xs: String*): ArrayData =
      ArrayData.toArrayData(xs.map(UTF8String.fromString).toArray)
    def out(ad: ArrayData): Seq[String] =
      ad.toArray[UTF8String](org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    // a MUTABLE container reused across rows with different content — the
    // hazard class the foldable gate exists for: identity says "same
    // table", content says otherwise
    val left = new Array[Any](1); val right = new Array[Any](1)
    left(0) = UTF8String.fromString("a"); right(0) = UTF8String.fromString("b")
    val lArr = new GenericArrayData(left); val rArr = new GenericArrayData(right)
    // prime the per-thread cache through the cacheable (foldable) path
    out(BpeFuseKernel.compute(arr("a", "b"), lArr, rArr, cacheTable = true)) shouldBe Seq("ab")
    // mutate the SAME containers in place
    left(0) = UTF8String.fromString("x"); right(0) = UTF8String.fromString("y")
    // the guarded path (what non-foldable children are pinned to) must
    // re-decode and see the new content, not the cached stale table
    out(BpeFuseKernel.compute(arr("x", "y"), lArr, rArr, cacheTable = false)) shouldBe Seq("xy")
  }

  it should "apply per-row (non-foldable) merge tables correctly through the expression" in {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    // column-valued tables: second/third children are NOT foldable, so
    // the expression pins cacheTable=false and every row decodes its own
    // table — two rows, two different tables, both correct
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-perrow").toString
    Seq(
      (1L, Seq("a", "b", "c"), Seq("a"), Seq("b")),
      (2L, Seq("a", "b", "c"), Seq("b"), Seq("c")))
      .toDF("id", "s", "l", "r").write.mode("overwrite").parquet(dir)
    val got = spark.read.parquet(dir)
      .selectExpr("id", "graft_bpe_fuse(s, l, r) AS p")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    got(1L) shouldBe Seq("ab", "c")
    got(2L) shouldBe Seq("a", "bc")
  }

  it should "pin the documented null-element divergence from the HOF chain" in {
    graft.plans.GraftFunctions.register(spark)
    // kernel: canonical null→"" coercion (licenses containsNull=false);
    // HOF chain: Catalyst's null-propagating equality passes the null
    // element through. Production symbol arrays are null-free (split of
    // non-empty tokens) so the divergence is unreachable there — this
    // pins WHICH behavior is canonical and that the difference is known
    val df = spark.sql("SELECT array('a', CAST(NULL AS STRING), 'b') AS s")
    val kernel = df.selectExpr("graft_bpe_fuse(s, array('a'), array('b')) AS p")
      .collect()(0).getSeq[String](0)
    kernel shouldBe Seq("a", "", "b")
    val hof = df.select(graft.operators.TextAnalysis.bpeFuse(
        org.apache.spark.sql.functions.col("s"), "a", "b").as("p"))
      .collect()(0).getSeq[String](0)
    hof shouldBe Seq("a", null, "b")
  }
}
