package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Schema-shape regression gate for the driver-generated testdata.
  *
  * Round 4 lost 38 queries + the whole bench to one silent testdata change
  * (events.ts: TIMESTAMP(NANOS) → timestamp[us]) that surfaced as 19
  * identical cryptic analysis errors. This spec makes the next such change
  * fail loudly with a named assertion instead:
  *
  *  - `Tables.events` must load ALL THREE historical ts shapes (fixtures in
  *    src/test/resources/fixtures) to identical TimestampType values;
  *  - every real testdata table's loaded schema is pinned field-by-field.
  */
class TableSchemaSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-table-schema-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def fixtureDir(fixture: String): String = {
    val url = getClass.getResource(s"/fixtures/$fixture")
    require(url != null, s"missing test fixture $fixture")
    val dir = Files.createTempDirectory("graft-events-shape")
    Files.copy(Paths.get(url.toURI), dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  behavior of "Tables.events shape adaptation"

  // All three fixtures encode the same three instants, 1 s apart.
  private val expectedMicros = Seq(0L, 1000000L, 2000000L).map(1700000000000000L + _)

  for (fixture <- Seq("events_ts_us.parquet", "events_ts_long.parquet", "events_ts_ns.parquet")) {
    it should s"load $fixture with ts as TIMESTAMP and correct values" in {
      val df = Tables.events(spark, fixtureDir(fixture))
      df.schema("ts").dataType shouldBe TimestampType
      val got = df.selectExpr("unix_micros(ts)").collect().map(_.getLong(0)).sorted.toSeq
      got shouldBe expectedMicros
      df.columns.toSeq shouldBe Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    }
  }

  behavior of "testdata schemas"

  private val pinned: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType, "p_brand" -> StringType,
      "p_type" -> StringType, "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType, "o_orderstatus" -> StringType,
      "o_totalprice" -> DoubleType, "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
      "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType, "l_returnflag" -> StringType,
      "l_linestatus" -> StringType, "l_shipdate" -> TimestampNTZType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType, "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType)
  )

  for (name <- Tables.names) {
    it should s"pin the loaded schema of $name" in {
      val df = if (name == "events") Tables.events(spark, sf) else Tables.load(spark, sf, name)
      val got = df.schema.fields.map(f => f.name -> f.dataType).toSeq
      withClue(s"testdata table $name changed shape — adapt Tables.$name and re-pin:\n") {
        got shouldBe pinned(name)
      }
    }
  }
}
