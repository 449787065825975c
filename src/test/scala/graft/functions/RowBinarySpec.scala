package graft.functions

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Byte-level vectors for the RowBinary encoder, hand-computed from the
  * format spec (LE primitives, LEB128 strings, int32-seconds DateTime,
  * 0x01/0x00 null flags). */
class RowBinarySpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def encodeHex(df: org.apache.spark.sql.DataFrame, structCols: String): String = {
    graft.plans.GraftFunctions.register(spark)
    df.selectExpr(s"hex(graft_rowbinary($structCols)) AS h").collect()(0).getString(0)
  }

  behavior of "graft_rowbinary"

  it should "encode non-nullable primitives little-endian" in {
    import spark.implicits._
    val df = Seq((1L, 2, "ab")).toDF("l", "i", "s")
    // schema from toDF: l and i are non-nullable, s is nullable (ref type)
    // 1L → 0100000000000000, 2 → 02000000, "ab" → flag 00, len 02, 6162
    encodeHex(df, "struct(l, i, s)") shouldBe
      "0100000000000000" + "02000000" + "00" + "02" + "6162"
  }

  it should "encode nulls as a 0x01 flag with no payload" in {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String])).toDF("l", "s")
    encodeHex(df, "struct(l, s)") shouldBe "0100000000000000" + "01"
  }

  it should "encode timestamps as int32 epoch seconds" in {
    import spark.implicits._
    val df = Seq(Tuple1(Timestamp.valueOf("1970-01-01 00:00:10"))).toDF("t")
    encodeHex(df, "struct(t)") shouldBe "00" + "0A000000"
  }

  it should "use multi-byte LEB128 lengths for long strings" in {
    import spark.implicits._
    val s200 = "x" * 200 // 200 = 0xC8 → LEB128: C8 01
    val df = Seq(Tuple1(s200)).toDF("s")
    val hex = encodeHex(df, "struct(s)")
    hex.take(6) shouldBe "00" + "C801"
    hex.length shouldBe 6 + 200 * 2
  }

  it should "encode doubles as IEEE-754 LE" in {
    import spark.implicits._
    val df = Seq(Tuple1(1.0)).toDF("d")
    // 1.0 = 0x3FF0000000000000 big-endian → LE bytes reversed
    encodeHex(df, "struct(d)") shouldBe "000000000000F03F"
  }

  it should "truncate bounded varchar at the byte budget and char boundary" in {
    import spark.implicits._
    // plain truncation: 6 bytes into varchar(4) → LEB len 04 + "abcd"
    encodeHex(Seq(Tuple1("abcdef")).toDF("s"), "struct(s), 's:varchar(4)'") shouldBe
      "00" + "04" + "61626364"
    // UTF-8 boundary: "aé" = 61 C3A9; a 2-byte budget cannot split é → "a"
    encodeHex(Seq(Tuple1("aé")).toDF("s"), "struct(s), 's:varchar(2)'") shouldBe
      "00" + "01" + "61"
    // truncate=false (the ! form) fails loudly when the value does not fit
    val ex = intercept[Throwable] {
      encodeHex(Seq(Tuple1("abcdef")).toDF("s"), "struct(s), 's:varchar(4)!'")
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    msgs(ex).exists(_.contains("does not fit")) shouldBe true
  }

  it should "encode FixedString(N) zero-padded with no length prefix" in {
    import spark.implicits._
    encodeHex(Seq(Tuple1("ab")).toDF("s"), "struct(s), 's:fixed(4)'") shouldBe
      "00" + "61620000"
  }

  it should "encode UUIDs as msb+lsb little-endian (ClickHouse wire)" in {
    import spark.implicits._
    val df = Seq(Tuple1("00112233-4455-6677-8899-aabbccddeeff")).toDF("u")
    encodeHex(df, "struct(u), 'u:uuid'") shouldBe
      "00" + "7766554433221100" + "FFEEDDCCBBAA9988"
  }

  it should "reject zero widths, junk UTF-8 cuts and non-canonical uuids" in {
    // fixed(0)/varchar(0) would desync the byte stream — refused at parse
    intercept[IllegalArgumentException](FieldSpec.parse("s:fixed(0)"))
    intercept[IllegalArgumentException](FieldSpec.parse("s:varchar(0)"))
    // a duplicated field must error, not last-win: a config merge could
    // silently swap a fail-fast varchar(N)! for the truncating form
    intercept[IllegalArgumentException](
      FieldSpec.parse("s:varchar(64)!,s:varchar(64)"))
    // invalid UTF-8 (continuation bytes all the way down): cut at the raw
    // budget instead of underflowing the boundary scan
    BinaryRowWriters.utf8SafeLen(Array[Byte](0x80.toByte, 0x80.toByte, 0x80.toByte), 2) shouldBe 2
    // JDK UUID.fromString pads short hex groups; that silent mutation is refused
    val out = new java.io.ByteArrayOutputStream()
    intercept[IllegalArgumentException](BinaryRowWriters.writeUuid(out, "1-2-3-4-5", littleEndian = true))
    // canonical forms pass in either case
    BinaryRowWriters.writeUuid(out, "00112233-4455-6677-8899-AABBCCDDEEFF", littleEndian = true)
  }

  it should "reject field specs naming unknown fields or wrong types" in {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    intercept[Throwable] {
      Seq(Tuple1("x")).toDF("s").selectExpr("graft_rowbinary(struct(s), 'zz:uuid')").collect()
    }
    intercept[Throwable] {
      Seq(Tuple1(1L)).toDF("l").selectExpr("graft_rowbinary(struct(l), 'l:varchar(4)')").collect()
    }
  }

  it should "encode a null in a directive-shaped field as the flag alone" in {
    import spark.implicits._
    // nullable varchar/fixed/uuid fields: 0x01 flag, NO payload bytes
    encodeHex(Seq((1L, Option.empty[String])).toDF("l", "s"),
      "struct(l, s), 's:fixed(4)'") shouldBe "0100000000000000" + "01"
    encodeHex(Seq((1L, Option.empty[String])).toDF("l", "s"),
      "struct(l, s), 's:uuid'") shouldBe "0100000000000000" + "01"
  }

  it should "keep interpreted/codegen parity for varchar, fixed and uuid directives" in {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("v", StringType, nullable = true),
      StructField("f", StringType, nullable = true),
      StructField("u", StringType, nullable = true)))
    val spec = "v:varchar(4), f:fixed(6), u:uuid"
    val row = Row("abcdéf", "xy", "00112233-4455-6677-8899-aabbccddeeff")
    val interpreted = RowBinaryEncode(Literal.create(row, schema), spec)
      .eval(null).asInstanceOf[Array[Byte]]
    graft.plans.GraftFunctions.register(spark)
    val viaCodegen = Seq(("abcdéf", "xy", "00112233-4455-6677-8899-aabbccddeeff"))
      .toDF("v", "f", "u")
      .selectExpr(s"graft_rowbinary(struct(v, f, u), '$spec') AS b")
      .collect()(0).getAs[Array[Byte]]("b")
    viaCodegen shouldBe interpreted
  }

  it should "produce identical bytes from the interpreted and codegen paths" in {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("l", LongType, nullable = false),
      StructField("s", StringType, nullable = true),
      StructField("d", DoubleType, nullable = true)))
    val interpreted = RowBinaryEncode(
      Literal.create(Row(42L, "héllo", null), schema)).eval(null).asInstanceOf[Array[Byte]]
    // df execution goes through whole-stage codegen (doGenCode)
    graft.plans.GraftFunctions.register(spark)
    val viaCodegen = Seq((42L, "héllo", Option.empty[Double])).toDF("l", "s", "d")
      .selectExpr("graft_rowbinary(struct(l, s, d)) AS b")
      .collect()(0).getAs[Array[Byte]]("b")
    viaCodegen shouldBe interpreted
  }
}
