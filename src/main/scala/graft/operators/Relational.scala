package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational suite (SURVEY.md §2a): TPC-H-style queries exercising
  * grouped aggregation, star joins, window functions, semi/anti joins,
  * distinct aggregation, rollup, set ops, top-k and subqueries.
  *
  * Scale notes: dimension tables are broadcast explicitly so the fact
  * table never shuffles for star joins; aggregations are declarative so
  * Catalyst plans partial (map-side) aggregation; filters/projections sit
  * directly on the scan for parquet pushdown + column pruning. Every
  * query ends in a deterministic ORDER BY with unique tiebreaks so the
  * driver's hash compare is stable.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1: pricing summary. One shuffle on tiny group keys; partial agg.
    * Sums are decimal-exact end-to-end and averages are exact-sum-over-count
    * quotients with engine-agnostic floor rounding (Exact idioms 1 and 2) —
    * the double-sum + round() shape is the cross-engine x.xx5 boundary trap
    * that failed q11 at the round-3 driver gate. */
  def q1Pricing: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Exact.sumRound(Exact.dec2(col("l_quantity")), 2).as("sum_qty"),
        Exact.sumRound(Exact.dec2(col("l_extendedprice")), 2).as("sum_base_price"),
        Exact.sumRound(Exact.revD, 2).as("sum_disc_price"),
        Exact.sumRound(Exact.chargeD, 2).as("sum_charge"),
        Exact.floorRound(sum(Exact.dec0(col("l_quantity"))).cast("double") / count(lit(1)), 4).as("avg_qty"),
        Exact.floorRound(sum(Exact.dec2(col("l_extendedprice"))).cast("double") / count(lit(1)), 4).as("avg_price"),
        Exact.floorRound(sum(Exact.rate2(col("l_discount"))).cast("double") / count(lit(1)), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1PricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity::DECIMAL(12,2)), 2)::DOUBLE AS sum_qty,
      |  round(sum(l_extendedprice::DECIMAL(12,2)), 2)::DOUBLE AS sum_base_price,
      |  round(sum(l_extendedprice::DECIMAL(12,2) * (1.00 - l_discount::DECIMAL(4,2))), 2)::DOUBLE AS sum_disc_price,
      |  round(sum(l_extendedprice::DECIMAL(12,2) * (1.00 - l_discount::DECIMAL(4,2)) * (1.00 + l_tax::DECIMAL(4,2))), 2)::DOUBLE AS sum_charge,
      |  floor((sum(l_quantity::DECIMAL(12,0))::DOUBLE / count(*)) * 10000 + 0.5) / 10000 AS avg_qty,
      |  floor((sum(l_extendedprice::DECIMAL(12,2))::DOUBLE / count(*)) * 10000 + 0.5) / 10000 AS avg_price,
      |  floor((sum(l_discount::DECIMAL(4,2))::DOUBLE / count(*)) * 10000 + 0.5) / 10000 AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3 (adapted to schema): top-10 unshipped orders by revenue.
    * customer is broadcast; orders⋈lineitem is the only shuffle pair. */
  def q3TopkJoin: Q = (s, d) => {
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, d).filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val li = Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(Exact.sumRound(Exact.revD, 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3TopkJoinSql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  round(sum(l_extendedprice::DECIMAL(12,2) * (1.00 - l_discount::DECIMAL(4,2))), 2)::DOUBLE AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND l_shipdate > TIMESTAMP '1997-01-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5 (adapted): revenue per nation for one region+year. All dims
    * broadcast — lineitem⋈orders is the only distributed join. */
  def q5RegionJoin: Q = (s, d) => {
    val dims = Tables.customer(s, d)
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    Tables.lineitem(s, d)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(Exact.sumRound(Exact.revD, 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5RegionJoinSql: String =
    """SELECT n_name, round(sum(l_extendedprice::DECIMAL(12,2) * (1.00 - l_discount::DECIMAL(4,2))), 2)::DOUBLE AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q6: forecast revenue — selective scan, all predicates pushed to
    * parquet, 4-column read, single global agg. */
  def q6FilterAgg: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(Exact.sumRound(Exact.dec2(col("l_extendedprice")) * Exact.rate2(col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_items"))

  val q6FilterAggSql: String =
    """SELECT round(sum(l_extendedprice::DECIMAL(12,2) * l_discount::DECIMAL(4,2)), 2)::DOUBLE AS revenue, count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** TPC-H Q10 (adapted): top-20 customers by returned-item revenue. */
  def q10Returns: Q = (s, d) => {
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
    Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(Exact.sumRound(Exact.revD, 2).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10ReturnsSql: String =
    """SELECT c_custkey, c_name, n_name,
      |  round(sum(l_extendedprice::DECIMAL(12,2) * (1.00 - l_discount::DECIMAL(4,2))), 2)::DOUBLE AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** Window functions: per-customer order sequence with row_number, lag and
    * running sum. Partition key (custkey) is high-cardinality → state per
    * partition stays bounded at scale. */
  def qWindowRank: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
      .withColumn("seq", row_number().over(w).cast("long"))
      .withColumn("prev_orderdate", lag(col("o_orderdate"), 1).over(w))
      // o_totalprice is a 3-dp-exact column, so both the running sum and
      // the display round-to-2 are decimal-exact (Exact idiom 1) — a
      // double round() sits on the x.xx5 cross-engine boundary trap
      .withColumn("running_spend",
        round(sum(Exact.dec3(col("o_totalprice"))).over(w), 2).cast("double"))
      .drop("o_orderdate")
      .withColumn("o_totalprice", Exact.decRound(Exact.dec3(col("o_totalprice")), 2))
      .orderBy(col("o_custkey"), col("seq"))
  }

  val qWindowRankSql: String =
    """SELECT o_orderkey, o_custkey, round(o_totalprice::DECIMAL(13,3), 2)::DOUBLE AS o_totalprice,
      |  row_number() OVER w AS seq,
      |  lag(o_orderdate, 1) OVER w AS prev_orderdate,
      |  round(sum(o_totalprice::DECIMAL(13,3)) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)::DOUBLE AS running_spend
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, seq""".stripMargin

  /** Distribution window functions — ntile / percent_rank / cume_dist —
    * quartile and rank position of every event's value within its type
    * (the remaining ANSI window family after rank/lag/frames). Ties
    * break on event_id so the full order is unique and both engines
    * rank identically.
    *
    * NOT a `Window.partitionBy(event_type)`: with ~5 event types that
    * window puts corpus/|types| RAW rows in each partition's sort — a
    * fifth of 100 TB per task. Instead one
    * [[graft.plans.DistributedRank.withGlobalRank]] over the COMPOSITE
    * order (type, value, id) — range partitions balance on the full key,
    * immune to type skew — then per-type rank = composite rank − the
    * type's start rank + 1, with the per-type (start, count) a
    * #types-row broadcast off the same ranked frame. ntile/percent_rank/
    * cume_dist all derive record-locally from (type rank, type count):
    * the order is unique, so pct = (r−1)/(n−1) (0 when n = 1, the ANSI
    * degenerate case) and cume = r/n exactly as the window defines. */
  def qWindowDist: Q = (s, d) => {
    val ranked = graft.plans.DistributedRank.withGlobalRank(
      Tables.events(s, d).select(col("event_type"), col("event_id"), col("value")),
      Seq(col("event_type"), col("value"), col("event_id")), "__r")
    // per-type start/count: null-safe join key (null is a partition of
    // its own under window semantics and must stay one here)
    val tc = ranked.groupBy(col("event_type").as("__et"))
      .agg(min(col("__r")).as("__tstart"), count(lit(1)).as("__tn"))
    ranked.join(broadcast(tc), col("event_type") <=> col("__et"))
      .withColumn("__lr", col("__r") - col("__tstart") + lit(1L))
      .withColumn("quartile",
        graft.plans.DistributedRank.ntileFromRank(col("__lr"), col("__tn"), 4))
      // rank/count quotients are identical doubles in both engines; the
      // floor idiom pins the 6-dp rounding against the engines' differing
      // round() boundary behavior (Exact idiom 2)
      .withColumn("pct_rank", Exact.floorRound(
        when(col("__tn") > 1, (col("__lr") - lit(1L)) / (col("__tn") - lit(1L)))
          .otherwise(lit(0.0)), 6))
      .withColumn("cume", Exact.floorRound(col("__lr") / col("__tn"), 6))
      // ranking used the RAW value (same as the oracle's WINDOW clause,
      // where the alias is not visible); round for display only
      .withColumn("value", round(col("value"), 6))
      .drop("__et", "__r", "__tstart", "__tn", "__lr")
      .orderBy(col("event_type"), col("event_id"))
  }

  val qWindowDistSql: String =
    """SELECT event_type, event_id, round(value, 6) AS value,
      |  ntile(4) OVER w AS quartile,
      |  floor((percent_rank() OVER w) * 1000000 + 0.5) / 1000000 AS pct_rank,
      |  floor((cume_dist() OVER w) * 1000000 + 0.5) / 1000000 AS cume
      |FROM events
      |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
      |ORDER BY event_type, event_id""".stripMargin

  /** Left-semi + left-anti joins: per-nation counts of customers with and
    * without orders. Both sides aggregated before the final tiny union. */
  def qSemiAnti: Q = (s, d) => {
    val cust = Tables.customer(s, d)
    val ord = Tables.orders(s, d).select(col("o_custkey"))
    val nat = broadcast(Tables.nation(s, d))
    def cnt(j: DataFrame, tag: String) = j
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name")).agg(count(lit(1)).as("n_customers"))
      .withColumn("kind", lit(tag))
    cnt(cust.join(ord, col("c_custkey") === col("o_custkey"), "left_semi"), "with_orders")
      .unionByName(cnt(cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti"), "without_orders"))
      .orderBy(col("kind"), col("n_name"))
  }

  val qSemiAntiSql: String =
    """SELECT n_name, count(*) AS n_customers, 'with_orders' AS kind
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY n_name
      |UNION ALL
      |SELECT n_name, count(*) AS n_customers, 'without_orders' AS kind
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY n_name
      |ORDER BY kind, n_name""".stripMargin

  /** Distinct aggregation: exact distinct users/days per event type.
    * (Spark plans this as expand + two-level agg — still one shuffle.) */
  def qDistinctAgg: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(date_trunc("day", col("ts"))).as("n_days"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  val qDistinctAggSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_users,
      |  count(DISTINCT date_trunc('day', ts)) AS n_days, count(*) AS n_events
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Rollup aggregation over returnflag × linestatus (subtotals + total). */
  def qRollup: Q = (s, d) =>
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(Exact.sumRound(Exact.dec2(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))
      .orderBy(col("returnflag"), col("linestatus"))

  val qRollupSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |  coalesce(l_linestatus, 'ALL') AS linestatus,
      |  round(sum(l_quantity::DECIMAL(12,2)), 2)::DOUBLE AS sum_qty, count(*) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  /** Explicit GROUPING SETS — the custom set list ((flag, status),
    * (flag), (status)) that neither rollup (no (status) set) nor cube
    * (no way to exclude the grand total) expresses; Spark plans it as
    * ONE Expand + one shuffle, same as rollup/cube. */
  def qGroupingSets: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(Exact.sumRound(Exact.dec2(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))
      .orderBy(col("returnflag"), col("linestatus"))

  val qGroupingSetsSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |  coalesce(l_linestatus, 'ALL') AS linestatus,
      |  round(sum(l_quantity::DECIMAL(12,2)), 2)::DOUBLE AS sum_qty, count(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
      |ORDER BY returnflag, linestatus""".stripMargin

  /** Set operations: customers active in 1996 vs 1997 (intersect/except). */
  def qUnionSet: Q = (s, d) => {
    def buyers(year: Int) = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit(f"$year-01-01").cast("timestamp") &&
        col("o_orderdate") < lit(f"${year + 1}-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    val both = buyers(1996).intersect(buyers(1997)).withColumn("kind", lit("both_years"))
    val only96 = buyers(1996).except(buyers(1997)).withColumn("kind", lit("only_1996"))
    both.unionByName(only96).orderBy(col("kind"), col("o_custkey"))
  }

  val qUnionSetSql: String =
    """WITH b96 AS (SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'),
      |b97 AS (SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01')
      |SELECT o_custkey, 'both_years' AS kind FROM (SELECT o_custkey FROM b96 INTERSECT SELECT o_custkey FROM b97)
      |UNION ALL
      |SELECT o_custkey, 'only_1996' AS kind FROM (SELECT o_custkey FROM b96 EXCEPT SELECT o_custkey FROM b97)
      |ORDER BY kind, o_custkey""".stripMargin

  /** Global top-k: TakeOrderedAndProject — no full sort, no single-node
    * shuffle; each partition contributes its local top 25. */
  def qTopkGlobal: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), round(col("l_extendedprice"), 2).as("price"))
      .orderBy(col("price").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(25)

  val qTopkGlobalSql: String =
    """SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
      |FROM lineitem ORDER BY price DESC, l_orderkey, l_linenumber LIMIT 25""".stripMargin

  /** Correlated scalar subquery, expressed decorrelated (window avg per
    * customer) — the plan Catalyst would rewrite the subquery into. */
  def qCorrSubquery: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
    // decimal-exact average: a double avg depends on summation order, and
    // the strict > boundary would flip rows between engines whenever a
    // price lands exactly on 1.5x the mean. o_totalprice is 3-dp exact,
    // so decimal(13,3) is lossless AND unambiguous in both engines —
    // unlike decimal(38,18), where Spark's string-based and DuckDB's
    // binary-based double→decimal casts diverge at the 1e-17 level.
    val custAvg = (sum(Exact.dec3(col("o_totalprice"))).over(w)
      .cast("double") / count(lit(1)).over(w))
    Tables.orders(s, d)
      .withColumn("cust_avg", custAvg)
      .filter(col("o_totalprice") > col("cust_avg") * 1.5)
      .select(col("o_orderkey"), col("o_custkey"),
        Exact.decRound(Exact.dec3(col("o_totalprice")), 2).as("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  val qCorrSubquerySql: String =
    """SELECT o_orderkey, o_custkey, round(o_totalprice::DECIMAL(13,3), 2)::DOUBLE AS o_totalprice
      |FROM orders o
      |WHERE o_totalprice > 1.5 * (SELECT sum(o_totalprice::DECIMAL(13,3))::DOUBLE / count(*)
      |                            FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey""".stripMargin

  /** TPC-H Q4 (adapted): order-priority check — EXISTS semi-join with a
    * non-equi condition (late-shipped line item). */
  def q4OrderPriority: Q = (s, d) => {
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q4OrderPrioritySql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q14 (adapted): promo revenue share — ratio of conditional sums
    * over one scan (no separate pass per condition). */
  def q14PromoShare: Q = (s, d) => {
    // decimal-exact conditional sums → identical doubles in both engines →
    // the ratio is bit-identical with mirrored operator order, and the
    // floor idiom rounds it engine-agnostically (Exact idiom 2)
    val promoSum = sum(when(col("p_type") === "PROMO", Exact.revD)
      .otherwise(lit(0).cast("decimal(3,2)"))).cast("double")
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-02-01").cast("timestamp"))
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .agg(
        // lit(100) * x / y mirrors the oracle's operator order exactly
        // (IEEE doubles: (100*x)/y != (x/y)*100 in the last ulp)
        Exact.floorRound(lit(100) * promoSum / sum(Exact.revD).cast("double"), 4)
          .as("promo_share_pct"),
        Exact.sumRound(Exact.revD, 2).as("total_revenue"),
        count(lit(1)).as("n_items"))
  }

  val q14PromoShareSql: String =
    """SELECT
      |  floor((100 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice::DECIMAL(12,2) * (1.00 - l_discount::DECIMAL(4,2)) ELSE 0.00 END)::DOUBLE
      |        / sum(l_extendedprice::DECIMAL(12,2) * (1.00 - l_discount::DECIMAL(4,2)))::DOUBLE) * 10000 + 0.5) / 10000 AS promo_share_pct,
      |  round(sum(l_extendedprice::DECIMAL(12,2) * (1.00 - l_discount::DECIMAL(4,2))), 2)::DOUBLE AS total_revenue,
      |  count(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-02-01'""".stripMargin

  /** Pivot: daily event counts spread into one column per event type
    * (explicit value list → single shuffle, no value-discovery pass). */
  def qPivot: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("day"))

  val qPivotSql: String =
    """SELECT date_trunc('day', ts::TIMESTAMP) AS day,
      |  count(*) FILTER (event_type = 'click') AS click,
      |  count(*) FILTER (event_type = 'view') AS view,
      |  count(*) FILTER (event_type = 'purchase') AS purchase,
      |  count(*) FILTER (event_type = 'signup') AS signup,
      |  count(*) FILTER (event_type = 'error') AS error
      |FROM events GROUP BY 1 ORDER BY day""".stripMargin

  /** Sketch-based distinct counting (HLL++): the scale path when exact
    * distinct is too expensive — no oracle (approximate by design; bounds
    * are pinned in OperatorsSpec at <5% error vs exact). */
  def qApproxDistinct: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  /** Sketch-based percentiles (Greenwald-Khanna): the single-pass,
    * constant-memory, mergeable-partials scale path where
    * [[qPercentiles]]' exact interpolation must buffer each group's full
    * value distribution. No oracle (sketch internals are approximate by
    * design; DuckDB's approx_quantile is a different sketch) — the error
    * bound vs the exact percentiles is pinned in OperatorsSpec, the same
    * treatment as `q_approx_distinct`. Accuracy 10000 ⇒ rank error
    * ≤ 1/10000 of each group. */
  def qApproxQuantiles: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D), 10000)").as("q"),
        count(lit(1)).as("n_items"))
      .select(col("l_returnflag"), col("q").getItem(0).as("p50_price"),
        col("q").getItem(1).as("p90_price"), col("q").getItem(2).as("p99_price"),
        col("n_items"))
      .orderBy(col("l_returnflag"))

  /** Exact percentiles (linear interpolation — same algorithm in Spark's
    * `percentile` and DuckDB's `quantile_cont`). */
  def qPercentiles: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(round(expr("percentile(value, 0.5)"), 6).as("median_value"),
        round(expr("percentile(value, 0.9)"), 6).as("p90_value"),
        round(min(col("value")), 6).as("min_value"),
        round(max(col("value")), 6).as("max_value"))
      .orderBy(col("event_type"))

  val qPercentilesSql: String =
    """SELECT event_type,
      |  round(quantile_cont(value, 0.5), 6) AS median_value,
      |  round(quantile_cont(value, 0.9), 6) AS p90_value,
      |  round(min(value), 6) AS min_value,
      |  round(max(value), 6) AS max_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  def queries: Map[String, Q] = Map(
    "q4_order_priority" -> q4OrderPriority,
    "q14_promo_share" -> q14PromoShare,
    "q_percentiles" -> qPercentiles,
    "q_approx_distinct" -> qApproxDistinct,
    "q_approx_quantiles" -> qApproxQuantiles,
    "q_pivot" -> qPivot,
    "q1_pricing" -> q1Pricing,
    "q3_topk_join" -> q3TopkJoin,
    "q5_region_join" -> q5RegionJoin,
    "q6_filter_agg" -> q6FilterAgg,
    "q10_returns" -> q10Returns,
    "q_window_rank" -> qWindowRank,
    "q_semi_anti" -> qSemiAnti,
    "q_distinct_agg" -> qDistinctAgg,
    "q_rollup" -> qRollup,
    "q_grouping_sets" -> qGroupingSets,
    "q_window_dist" -> qWindowDist,
    "q_union_set" -> qUnionSet,
    "q_topk_global" -> qTopkGlobal,
    "q_corr_subquery" -> qCorrSubquery)

  def oracleSql: Map[String, String] = Map(
    "q4_order_priority" -> q4OrderPrioritySql,
    "q14_promo_share" -> q14PromoShareSql,
    "q_percentiles" -> qPercentilesSql,
    "q_pivot" -> qPivotSql,
    "q1_pricing" -> q1PricingSql,
    "q3_topk_join" -> q3TopkJoinSql,
    "q5_region_join" -> q5RegionJoinSql,
    "q6_filter_agg" -> q6FilterAggSql,
    "q10_returns" -> q10ReturnsSql,
    "q_window_rank" -> qWindowRankSql,
    "q_semi_anti" -> qSemiAntiSql,
    "q_distinct_agg" -> qDistinctAggSql,
    "q_rollup" -> qRollupSql,
    "q_grouping_sets" -> qGroupingSetsSql,
    "q_window_dist" -> qWindowDistSql,
    "q_union_set" -> qUnionSetSql,
    "q_topk_global" -> qTopkGlobalSql,
    "q_corr_subquery" -> qCorrSubquerySql)
}
