package graft.functions

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Byte-level vectors for the Vertica-native encoder, hand-computed from
  * the format spec (int32 row size, MSB-first null bitmap, LE values,
  * int32-length varchars, 2000-01-01 epoch). */
class VerticaNativeSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def encodeHex(df: org.apache.spark.sql.DataFrame, structCols: String): String = {
    graft.plans.GraftFunctions.register(spark)
    df.selectExpr(s"hex(graft_verticarow($structCols)) AS h").collect()(0).getString(0)
  }

  behavior of "graft_verticarow"

  it should "frame rows with size + null bitmap and encode varchars" in {
    import spark.implicits._
    val df = Seq((1L, "ab")).toDF("l", "s")
    // body = int64 LE (8) + len int32 (4) + "ab" (2) = 14 = 0x0E
    encodeHex(df, "struct(l, s)") shouldBe
      "0E000000" + "00" + "0100000000000000" + "02000000" + "6162"
  }

  it should "omit null payloads and set MSB-first bitmap bits" in {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String])).toDF("l", "s")
    // col 1 null → bit 0x40; body = just the int64
    encodeHex(df, "struct(l, s)") shouldBe "08000000" + "40" + "0100000000000000"
  }

  it should "encode timestamps as microseconds since 2000-01-01" in {
    import spark.implicits._
    val df = Seq(Tuple1(Timestamp.valueOf("2000-01-01 00:00:01"))).toDF("t")
    // 1s past the Vertica epoch = 1_000_000 µs = 0x0F4240 LE
    encodeHex(df, "struct(t)") shouldBe "08000000" + "00" + "40420F0000000000"
  }

  it should "produce identical bytes from the interpreted and codegen paths" in {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.expressions.Literal
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("l", LongType, nullable = false),
      StructField("s", StringType, nullable = true),
      StructField("d", DoubleType, nullable = true)))
    val interpreted = VerticaNativeEncode(
      Literal.create(Row(7L, null, 2.5), schema)).eval(null).asInstanceOf[Array[Byte]]
    graft.plans.GraftFunctions.register(spark)
    val viaCodegen = Seq((7L, Option.empty[String], 2.5)).toDF("l", "s", "d")
      .selectExpr("graft_verticarow(struct(l, s, d)) AS b")
      .collect()(0).getAs[Array[Byte]]("b")
    viaCodegen shouldBe interpreted
  }

  it should "emit the native file header with magic and column sizes" in {
    val schema = StructType(Seq(
      StructField("l", LongType), StructField("s", StringType)))
    val hex = VerticaNativeEncode.fileHeader(schema).map("%02X".format(_)).mkString
    hex shouldBe
      "4E41544956450AFF0D0A00" + // magic
      "0D000000" +               // header area size = 2+1+2+4*2
      "0100" + "00" +            // version + filler
      "0200" +                   // column count
      "08000000" + "FFFFFFFF"    // sizes: int64=8, varchar=-1
  }
}
