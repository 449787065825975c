package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Scale evidence (SURVEY §4): bucketed tables co-locate repeat joins —
  * the fact⋈fact join plans with ZERO exchanges when both sides are
  * bucketed on the join key. This is the cluster-scale answer for joins
  * too big to broadcast; the spec pins the plan shape so regressions in
  * our write path or session config surface immediately.
  */
class BucketedJoinSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", Files.createTempDirectory("graft-wh").toString)
    // force a sort-merge join: at 100 TB neither fact side broadcasts
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  behavior of "bucketed fact-fact join"

  it should "plan with no Exchange when both sides are bucketed on the key" in {
    import graft.plans.Bucketing
    Bucketing.writeBucketed(Tables.lineitem(spark, sf), "li_bucketed",
      Seq("l_orderkey"), 4, sortCols = Seq("l_orderkey"))
    Bucketing.writeBucketed(Tables.orders(spark, sf), "ord_bucketed",
      Seq("o_orderkey"), 4, sortCols = Seq("o_orderkey"))

    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("qty"))

    val plan = joined.queryExecution.executedPlan.toString
    plan should include("SortMergeJoin")
    // the only exchange allowed is the one for the final groupBy
    Bucketing.exchanges(joined) should be <= 1
    plan should include("SelectedBucketsCount")

    // and the unbucketed twin DOES shuffle both join sides
    val unbucketed = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("qty"))
    Bucketing.exchanges(unbucketed) should be >= 2

    joined.count() shouldBe unbucketed.count()
  }
}
