package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Pins the [[Exact]] cross-engine idioms on the Spark side. The DuckDB
  * side of each claim was probed directly (decimal round is HALF_UP away
  * from zero in both engines, including negatives and the exact x.xx5
  * boundary; 2-dp/3-dp doubles cast to the same decimal under string- and
  * binary-based casts) — these tests keep the SPARK half of the contract
  * from drifting under version changes. */
class ExactSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def one(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c.as("v")).head().get(0)

  behavior of "Exact"

  it should "round decimals HALF_UP away from zero at the exact boundary" in {
    // the q11_share driver failure value: 363524.215 must round UP
    one(Exact.decRound(lit("363524.215").cast("decimal(13,3)"), 2)) shouldBe 363524.22
    one(Exact.decRound(lit("2.005").cast("decimal(13,3)"), 2)) shouldBe 2.01
    one(Exact.decRound(lit("-2.005").cast("decimal(13,3)"), 2)) shouldBe -2.01
    one(Exact.decRound(lit("-2.015").cast("decimal(13,3)"), 2)) shouldBe -2.02
  }

  it should "recover exact decimals from 2-dp and 3-dp doubles" in {
    // 0.04 and 137115.8 are binary-inexact; the casts must land on the
    // true decimal, not the binary expansion
    one(Exact.dec2(lit(0.04d)).cast("string")) shouldBe "0.04"
    one(Exact.dec2(lit(-994.28d)).cast("string")) shouldBe "-994.28"
    one(Exact.dec3(lit(137115.8d)).cast("string")) shouldBe "137115.800"
    val rev = spark.range(1)
      .withColumn("l_extendedprice", lit(100.01d))
      .withColumn("l_discount", lit(0.04d))
      .select(Exact.revD.cast("string").as("v")).head().getString(0)
    rev shouldBe "96.0096"
  }

  it should "make money sums order-independent" in {
    import spark.implicits._
    // doubles whose naive sum depends on order (classic cancellation mix)
    val vals = Seq.tabulate(4000)(i => ((i % 997) - 498).toDouble + 0.01 * (i % 100))
    val df = vals.toDF("v")
    val a = df.repartition(1).agg(Exact.sumRound(Exact.dec2(col("v")), 2)).head().getDouble(0)
    val b = df.repartition(32).agg(Exact.sumRound(Exact.dec2(col("v")), 2)).head().getDouble(0)
    val exact = vals.map(v => BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
    a shouldBe b
    BigDecimal(a) shouldBe exact.setScale(2, BigDecimal.RoundingMode.HALF_UP)
  }

  it should "floor-round bit-identically to the documented semantics" in {
    // 2.005's double is below the decimal boundary (2.00499…89) but the
    // ×100 multiply rounds back onto 200.5 within half an ulp → 2.01.
    // The pinned value documents the DETERMINISTIC double chain both
    // engines share — determinism, not any decimal convention, is the
    // point. 0.125 is exactly representable → true half → up.
    one(Exact.floorRound(lit(2.005d), 2)) shouldBe 2.01
    one(Exact.floorRound(lit(0.1234d), 2)) shouldBe 0.12
    one(Exact.floorRound(lit(0.125d), 2)) shouldBe 0.13
    // negatives: half-toward-+infinity (pinned, both oracle sides use it)
    one(Exact.floorRound(lit(-0.125d), 2)) shouldBe -0.12
    one(Exact.floorRound(lit(-2.006d), 2)) shouldBe -2.01
    // SQL mirror emits the same constants
    Exact.floorRoundSql("x", 4) shouldBe "floor((x) * 10000 + 0.5) / 10000"
  }
}
