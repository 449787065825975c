package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Byte-level vectors for the protobuf wire-format codec, hand-computed
  * from the published encoding spec, plus round-trip, forward-compat and
  * interpreted≡codegen parity checks. */
class ProtoWireSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def hexOf(df: org.apache.spark.sql.DataFrame, structCols: String): String = {
    graft.plans.GraftFunctions.register(spark)
    df.selectExpr(s"hex(graft_proto($structCols)) AS h").collect()(0).getString(0)
  }

  behavior of "graft_proto encoding"

  it should "encode varint fields with correct tags" in {
    import spark.implicits._
    // field 1 (long 150): tag 08, varint 9601 — the canonical spec example
    val df = Seq(Tuple1(150L)).toDF("a")
    hexOf(df, "struct(a)") shouldBe "08" + "9601"
  }

  it should "encode strings length-delimited" in {
    import spark.implicits._
    // field 2 string "testing": tag 12, len 07, bytes — spec example 2
    val df = Seq((0L, "testing")).toDF("a", "b")
    // a=0 is non-null → explicitly present: tag 08 varint 00
    hexOf(df, "struct(a, b)") shouldBe "08" + "00" + "12" + "07" + "74657374696E67"
  }

  it should "encode negative int64 as ten varint bytes" in {
    import spark.implicits._
    val df = Seq(Tuple1(-1L)).toDF("a")
    hexOf(df, "struct(a)") shouldBe "08" + "FFFFFFFFFFFFFFFFFF01"
  }

  it should "encode doubles as fixed64 LE with wire type 1" in {
    import spark.implicits._
    val df = Seq(Tuple1(1.0)).toDF("a")
    // tag = (1<<3)|1 = 09; 1.0 bits LE
    hexOf(df, "struct(a)") shouldBe "09" + "000000000000F03F"
  }

  it should "omit null fields entirely" in {
    import spark.implicits._
    val df = Seq((7L, Option.empty[String])).toDF("a", "b")
    hexOf(df, "struct(a, b)") shouldBe "08" + "07"
  }

  it should "encode packed repeated numerics" in {
    import spark.implicits._
    val df = Seq(Tuple1(Seq(3L, 270L))).toDF("a")
    // spec's packed example: tag 0A (field 1 wire 2), len 03, 03 8E02
    hexOf(df, "struct(a)") shouldBe "0A" + "03" + "03" + "8E02"
  }

  behavior of "graft_proto_decode"

  private def roundTrip(sql: String): org.apache.spark.sql.Row = {
    graft.plans.GraftFunctions.register(spark)
    spark.sql(sql).collect()(0)
  }

  it should "round-trip all supported scalar types" in {
    val r = roundTrip(
      """SELECT graft_proto_decode(graft_proto(struct(
        |  CAST(-42 AS BIGINT), CAST(7 AS INT), true, CAST(2.5 AS DOUBLE),
        |  CAST(1.5 AS FLOAT), 'héllo', CAST('ab' AS BINARY),
        |  TIMESTAMP'2024-01-02 03:04:05.123456', DATE'2024-01-02')),
        | 'a BIGINT, b INT, c BOOLEAN, d DOUBLE, e FLOAT, f STRING, g BINARY, h TIMESTAMP, i DATE') AS rec
        |""".stripMargin).getStruct(0)
    r.getLong(0) shouldBe -42L
    r.getInt(1) shouldBe 7
    r.getBoolean(2) shouldBe true
    r.getDouble(3) shouldBe 2.5
    r.getFloat(4) shouldBe 1.5f
    r.getString(5) shouldBe "héllo"
    new String(r.getAs[Array[Byte]](6)) shouldBe "ab"
    r.getTimestamp(7).toString shouldBe "2024-01-02 03:04:05.123456"
    r.getDate(8).toString shouldBe "2024-01-02"
  }

  it should "return null for absent fields and [] for present-empty arrays" in {
    val r = roundTrip(
      """SELECT graft_proto_decode(graft_proto(struct(
        |  CAST(NULL AS BIGINT), array(CAST(1.0 AS FLOAT)), CAST(array() AS ARRAY<BIGINT>))),
        | 'a BIGINT, v ARRAY<FLOAT>, w ARRAY<BIGINT>') AS rec""".stripMargin).getStruct(0)
    r.isNullAt(0) shouldBe true
    r.getSeq[Float](1) shouldBe Seq(1.0f)
    // a present empty array still writes a zero-length packed field →
    // decodes to [] (present), distinct from null (absent)
    r.getSeq[Long](2) shouldBe Seq.empty
  }

  it should "fail loudly on a null array element" in {
    graft.plans.GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_proto(struct(array(CAST(NULL AS BIGINT)))) AS r").collect()
    }
    e.getMessage should include("null element")
  }

  it should "skip unknown field numbers (forward compatibility)" in {
    // encode 3 fields, decode with a 2-field schema: field 3 skipped
    val r = roundTrip(
      """SELECT graft_proto_decode(graft_proto(struct(CAST(5 AS BIGINT), 'x', CAST(9.0 AS DOUBLE))),
        | 'a BIGINT, b STRING') AS rec""".stripMargin).getStruct(0)
    r.getLong(0) shouldBe 5L
    r.getString(1) shouldBe "x"
  }

  it should "take the last occurrence of a duplicated scalar field" in {
    // two encodings of field 1 concatenated — proto merge semantics
    val r = roundTrip(
      """SELECT graft_proto_decode(concat(graft_proto(struct(CAST(1 AS BIGINT))),
        |                                 graft_proto(struct(CAST(2 AS BIGINT)))),
        | 'a BIGINT') AS rec""".stripMargin).getStruct(0)
    r.getLong(0) shouldBe 2L
  }

  it should "concatenate repeated array occurrences" in {
    val r = roundTrip(
      """SELECT graft_proto_decode(concat(graft_proto(struct(array(CAST(1 AS BIGINT)))),
        |                                 graft_proto(struct(array(CAST(2 AS BIGINT), CAST(3 AS BIGINT))))),
        | 'a ARRAY<BIGINT>') AS rec""".stripMargin).getStruct(0)
    r.getSeq[Long](0) shouldBe Seq(1L, 2L, 3L)
  }

  it should "skip a field number beyond Int range instead of aliasing it onto a small index" in {
    // tag for field 2^32+1 (wire 0): naive (tag >>> 3).toInt wraps to 1
    // and would land the payload in schema field 1
    val out = new java.io.ByteArrayOutputStream()
    ProtoWire.writeVarint(out, ((1L << 32) + 1L) << 3) // tag, wire 0
    ProtoWire.writeVarint(out, 99L) // payload that must NOT reach field 1
    val schema = org.apache.spark.sql.types.StructType.fromDDL("a BIGINT")
    val row = ProtoWire.decodeRow(out.toByteArray, schema)
    row.isNullAt(0) shouldBe true
  }

  it should "fail loudly on corrupt bytes" in {
    graft.plans.GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_proto_decode(CAST('' AS BINARY), 'a BIGINT') AS r").collect()
    }
    e.getMessage should include("truncated varint")
  }

  it should "reject a non-literal schema DDL" in {
    graft.plans.GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_proto_decode(CAST(NULL AS BINARY), CAST(rand() AS STRING))").collect()
    }
    e.getMessage should include("string literal")
  }

  it should "agree between interpreted and codegen paths" in {
    val fields = Array(
      StructField("a", LongType), StructField("b", StringType, nullable = true),
      StructField("c", DoubleType), StructField("v", ArrayType(FloatType)))
    val row = InternalRow(
      -3L, org.apache.spark.unsafe.types.UTF8String.fromString("zq"), 2.25,
      new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(1.5f, -0.5f)))
    val bytes = ProtoWire.encodeRow(row, fields)
    // decodeRow (the shared kernel both paths call) inverts it
    val schema = StructType(fields.map(_.copy(nullable = true)))
    val back = ProtoWire.decodeRow(bytes, schema)
    back.getLong(0) shouldBe -3L
    back.getUTF8String(1).toString shouldBe "zq"
    back.getDouble(2) shouldBe 2.25
    back.getArray(3).toFloatArray().toSeq shouldBe Seq(1.5f, -0.5f)
    // and the SQL path (whole-stage codegen) produces identical bytes
    graft.plans.GraftFunctions.register(spark)
    import spark.implicits._
    val hex = Seq((-3L, "zq", 2.25, Seq(1.5f, -0.5f))).toDF("a", "b", "c", "v")
      .selectExpr("hex(graft_proto(struct(a, b, c, v))) AS h").collect()(0).getString(0)
    hex shouldBe bytes.map("%02X".format(_)).mkString
  }
}
