package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Degenerate-input behavior: the testdata contains no nulls/empties, but
  * 100 TB of real documents will. Pins that the text pipeline drops (not
  * crashes on) null/empty/short docs and that the native functions are
  * null-safe.
  */
class NullSafetySpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  behavior of "text pipeline on degenerate documents"

  it should "drop null, empty and sub-shingle docs from the minhash path" in {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val docs = Seq(
      (0L, null.asInstanceOf[String]),
      (1L, ""),
      (2L, "   "),
      (3L, "one two"),              // < 3 tokens → no shingles
      (4L, "one two three four"))   // survives
    .toDF("doc_id", "text")
    val sigs = docs
      .select(col("doc_id"), TextFns.tokens(col("text")).as("tk"))
      .filter(org.apache.spark.sql.functions.size(col("tk")) >= 3)
      .select(col("doc_id"), call_function("graft_minhash",
        TextFns.shingles3(col("tk"))).as("sig"))
    sigs.collect().map(_.getLong(0)).toSeq shouldBe Seq(4L)
    sigs.collect()(0).getSeq[String](1).forall(_ != null) shouldBe true
  }

  it should "keep token counting null-safe" in {
    import spark.implicits._
    val docs = Seq((0L, null.asInstanceOf[String]), (1L, ""), (2L, "a b")).toDF("doc_id", "text")
    val counted = docs.select(col("doc_id"), org.apache.spark.sql.functions.size(TextFns.tokens(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -99 else r.getInt(1))).toMap
    counted(0L) shouldBe -99 // null text → null count, not a crash
    counted(1L) shouldBe 0
    counted(2L) shouldBe 2
  }

  it should "treat null embeddings as null dot products" in {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val vecs = Seq(
      (0L, Array(1.0f, 2.0f), Array(3.0f, 4.0f)),
      (1L, null.asInstanceOf[Array[Float]], Array(1.0f, 1.0f)))
      .toDF("id", "a", "b")
    val out = vecs.select(col("id"), call_function("graft_dot", col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    out(0L) shouldBe Some(11.0)
    out(1L) shouldBe None
  }

  it should "keep the dot-product HOF fallback aligned with graft_dot" in {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    // null elements and unequal lengths are where a naive zip_with fold
    // diverges (null product poisons the whole sum to NULL); the native
    // expression zero-fills nulls and min-truncates
    val vecs = Seq(
      (0L, Array[java.lang.Float](1.0f, null, 3.0f), Array[java.lang.Float](2.0f, 5.0f, 4.0f)),
      (1L, Array[java.lang.Float](1.0f, 2.0f), Array[java.lang.Float](3.0f, 4.0f, 99.0f)))
      .toDF("id", "a", "b")
    val both = vecs.select(col("id"),
      call_function("graft_dot", col("a"), col("b")).as("native"),
      VecFns.dotHof(col("a"), col("b")).as("hof")).collect()
    both.foreach { r =>
      r.isNullAt(1) shouldBe false
      r.getDouble(2) shouldBe r.getDouble(1) +- 1e-9
    }
  }

  behavior of "binary encoders on out-of-range and mis-declared values"

  it should "fail loudly on out-of-range DateTime/Date instead of wrapping" in {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    // 1969-12-31 23:59:59 → epoch seconds -1 → would wrap to year 2106
    val pre1970 = Seq(Tuple1(java.sql.Timestamp.valueOf("1969-12-31 23:59:59")))
      .toDF("ts").selectExpr("named_struct('ts', ts) AS s")
    val ex = intercept[Throwable](
      pre1970.selectExpr("graft_rowbinary(s) AS b").collect())
    Iterator.iterate(ex)(_.getCause).takeWhile(_ != null).take(10)
      .exists(e => Option(e.getMessage).exists(_.contains("DateTime range"))) shouldBe true
  }

  it should "fail loudly on an out-of-range Date instead of wrapping" in {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    // day 65744 (year 2150) would wrap through the uint16 to day 208
    val far = Seq(Tuple1(java.sql.Date.valueOf("2150-01-01")))
      .toDF("d").selectExpr("named_struct('d', d) AS s")
    val ex = intercept[Throwable](far.selectExpr("graft_rowbinary(s) AS b").collect())
    Iterator.iterate(ex)(_.getCause).takeWhile(_ != null).take(10)
      .exists(e => Option(e.getMessage).exists(_.contains("Date range"))) shouldBe true
  }

  it should "fail loudly on a runtime null in a non-nullable field" in {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    // a mis-propagated nullability (joins/UDFs can mark a genuinely
    // nullable column non-null) reaches the expression as an InternalRow
    // with a null in a non-nullable slot — the DataFrame encoder would
    // reject it first, so drive the expression directly
    val schema = StructType(Seq(StructField("v", LongType, nullable = false)))
    val ex = intercept[IllegalArgumentException](
      RowBinaryEncode(Literal.create(Row(null), schema)).eval(null))
    ex.getMessage should include("non-nullable")
  }
}
