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
}
