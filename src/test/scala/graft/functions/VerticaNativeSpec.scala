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

  it should "bound VARCHAR(N), pad CHAR(N) with spaces and encode UUIDs big-endian" in {
    import spark.implicits._
    // varchar(4): int32 len 4 + "abcd" → body 8 bytes
    encodeHex(Seq(Tuple1("abcdef")).toDF("s"), "struct(s), 's:varchar(4)'") shouldBe
      "08000000" + "00" + "04000000" + "61626364"
    // CHAR(4): no prefix, space padding (Vertica pads CHAR with ' ')
    encodeHex(Seq(Tuple1("ab")).toDF("s"), "struct(s), 's:fixed(4)'") shouldBe
      "04000000" + "00" + "61622020"
    // UUID: 16 bytes, msb then lsb, big-endian on the Vertica wire
    val df = Seq(Tuple1("00112233-4455-6677-8899-aabbccddeeff")).toDF("u")
    encodeHex(df, "struct(u), 'u:uuid'") shouldBe
      "10000000" + "00" + "0011223344556677" + "8899AABBCCDDEEFF"
  }

  it should "report fixed/uuid column widths in the file header" in {
    val schema = StructType(Seq(
      StructField("u", StringType), StructField("c", StringType),
      StructField("s", StringType)))
    val header = VerticaNativeEncode.fileHeader(schema, "u:uuid, c:fixed(5)")
    val widths = header.takeRight(12).grouped(4).map(b =>
      (b(0) & 0xff) | ((b(1) & 0xff) << 8) | ((b(2) & 0xff) << 16) | ((b(3) & 0xff) << 24)).toSeq
    widths shouldBe Seq(16, 5, -1)
  }

  it should "keep interpreted/codegen parity for varchar, fixed and uuid directives" in {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.expressions.Literal
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("v", StringType, nullable = true),
      StructField("f", StringType, nullable = true),
      StructField("u", StringType, nullable = true)))
    val spec = "v:varchar(4), f:fixed(6), u:uuid"
    val row = Row("abcdéf", "xy", "00112233-4455-6677-8899-aabbccddeeff")
    val interpreted = VerticaNativeEncode(Literal.create(row, schema), spec)
      .eval(null).asInstanceOf[Array[Byte]]
    graft.plans.GraftFunctions.register(spark)
    val viaCodegen = Seq(("abcdéf", "xy", "00112233-4455-6677-8899-aabbccddeeff"))
      .toDF("v", "f", "u")
      .selectExpr(s"graft_verticarow(struct(v, f, u), '$spec') AS b")
      .collect()(0).getAs[Array[Byte]]("b")
    viaCodegen shouldBe interpreted
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
