package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Extended relational suite (SURVEY.md §2a, second tranche): the
  * remaining TPC-H query shapes expressible on the testdata schema —
  * nation-pair volume, market share, late-shipment priority mix,
  * customer-order distribution, argmax subquery, correlated-average
  * filter, big-order HAVING semi-join, disjunctive multi-predicate scan,
  * exists/not-exists self-joins, and scalar-subquery + anti-join.
  * (Q2/Q9/Q11/Q16/Q20 canonically need the partsupp table, which the
  * testdata doesn't ship — see [[RelationalSupply]] for adaptations that
  * derive the supply relation from lineitem; Q12/Q17/Q19/Q21/Q22 are
  * adapted to the columns that exist with the plan shape preserved.)
  *
  * Scale notes mirror Relational: dims broadcast, facts shuffle at most
  * once on their join key, self-joins key on l_orderkey (bounded groups
  * — ≤7 lines/order at any SF), aggregates are partial-agg friendly.
  */
object RelationalExt {

  type Q = (SparkSession, String) => DataFrame

  /** Revenue term shared by the relational suites (one definition, so a
    * formula change cannot silently diverge the q7/q8 and q9/q11 families). */
  private[operators] def rev = col("l_extendedprice") * (lit(1) - col("l_discount"))

  /** TPC-H Q7: volume shipped between two nations, per direction per year.
    * Both nation dims are pre-filtered to the pair, so the disjunction
    * collapses to one cross-direction filter after broadcast joins. */
  def q7NationVolume: Q = (s, d) => {
    val pair = Seq("NATION_2", "NATION_3")
    val suppN = Tables.supplier(s, d)
      .join(Tables.nation(s, d).filter(col("n_name").isin(pair: _*)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val custN = Tables.customer(s, d)
      .join(Tables.nation(s, d).filter(col("n_name").isin(pair: _*)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(custN), col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(Exact.sumRound(Exact.revD, 2).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q7NationVolumeSql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  year(l_shipdate) AS l_year,
      |  round(sum(l_extendedprice::DECIMAL(12,2) * (1.00 - l_discount::DECIMAL(4,2))), 2)::DOUBLE AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE n1.n_name IN ('NATION_2', 'NATION_3')
      |  AND n2.n_name IN ('NATION_2', 'NATION_3')
      |  AND n1.n_name <> n2.n_name
      |  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** TPC-H Q8: market share of one supplier nation within one customer
    * region for one part type, per order year — a conditional-sum ratio
    * over a 7-table star, every dimension broadcast. */
  def q8MarketShare: Q = (s, d) => {
    val custAsia = Tables.customer(s, d)
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val suppN = Tables.supplier(s, d)
      .join(Tables.nation(s, d).select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")),
        col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_nation"))
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_type") === "STANDARD")
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custAsia), col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        // exact decimal conditional sums → identical quotient doubles →
        // engine-agnostic floor rounding (Exact idiom 2)
        Exact.floorRound(
          sum(when(col("supp_nation") === "NATION_5", Exact.revD)
            .otherwise(lit(0).cast("decimal(3,2)"))).cast("double") /
            sum(Exact.revD).cast("double"), 6)
          .as("mkt_share"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_year"))
  }

  val q8MarketShareSql: String =
    """SELECT year(o_orderdate) AS o_year,
      |  floor((sum(CASE WHEN n2.n_name = 'NATION_5' THEN l_extendedprice::DECIMAL(12,2) * (1.00 - l_discount::DECIMAL(4,2)) ELSE 0.00 END)::DOUBLE
      |        / sum(l_extendedprice::DECIMAL(12,2) * (1.00 - l_discount::DECIMAL(4,2)))::DOUBLE) * 1000000 + 0.5) / 1000000 AS mkt_share,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |JOIN region ON n1.n_regionkey = r_regionkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin

  /** TPC-H Q12 (adapted: lateness from l_shipdate vs o_orderdate — the
    * testdata has no commit/receipt dates): priority mix of late
    * shipments per linestatus, conditional counts in one pass. */
  def q12LateShip: Q = (s, d) => {
    val urgent = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(urgent, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(urgent, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }

  val q12LateShipSql: String =
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  /** TPC-H Q13: distribution of customers by order count, zeros included
    * (left join, count non-null keys, re-aggregate the counts). */
  def q13CustDist: Q = (s, d) =>
    Tables.customer(s, d).select(col("c_custkey"))
      .join(Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  val q13CustDistSql: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |      GROUP BY c_custkey) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q15: top supplier(s) by quarterly revenue — argmax via a
    * broadcast scalar max joined back, no window over a single partition.
    *
    * The explicit isNotNull below matters: the later supplier join pushes
    * `isnotnull(l_suppkey)` into the main branch's scan but not the max
    * branch's, making the two shuffle subtrees canonically different —
    * AQE's ReuseExchange then re-scans lineitem for the scalar max.
    * Filtering up front keeps both branches identical → one scan. */
  def q15TopSupplier: Q = (s, d) => {
    val revenue = Tables.lineitem(s, d)
      .filter(col("l_suppkey").isNotNull &&
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(Exact.sumRound(Exact.revD, 2).as("total_revenue"))
    revenue
      .join(broadcast(revenue.agg(max(col("total_revenue")).as("mx"))),
        col("total_revenue") === col("mx"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val q15TopSupplierSql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey, round(sum(l_extendedprice::DECIMAL(12,2) * (1.00 - l_discount::DECIMAL(4,2))), 2)::DOUBLE AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
      |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q17 (adapted: brand only — no container column): revenue from
    * below-average-quantity lines of one brand; the correlated per-part
    * average decorrelates to a window over p_partkey on the brand slice
    * (l_quantity is integral, so the avg is float-deterministic across
    * engines). The agg+join-back shape scans lineitem twice (the
    * broadcast-join branches share no exchange, so nothing is reusable);
    * the window scans once, over only the brand-filtered slice. */
  def q17SmallQty: Q = (s, d) => {
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_brand") === "Brand#11")
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      .withColumn("qty_thresh",
        avg(col("l_quantity")).over(Window.partitionBy(col("p_partkey"))) * 0.2)
      .filter(col("l_quantity") < col("qty_thresh"))
      // exact decimal sum → identical double → /7.0 quotient is identical
      // → floor idiom rounds it engine-agnostically (Exact idiom 2)
      .agg(Exact.floorRound(sum(Exact.dec2(col("l_extendedprice"))).cast("double") / 7.0, 2)
        .as("avg_yearly"),
        count(lit(1)).as("n_items"))
  }

  val q17SmallQtySql: String =
    """SELECT floor((sum(l_extendedprice::DECIMAL(12,2))::DOUBLE / 7.0) * 100 + 0.5) / 100 AS avg_yearly, count(*) AS n_items
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#11'
      |  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
      |                    WHERE l2.l_partkey = part.p_partkey)""".stripMargin

  /** TPC-H Q18: large-volume orders — HAVING sum(qty) > 300 as a derived
    * fact joined back (the big-order key set is tiny → broadcast). */
  def q18BigOrders: Q = (s, d) => {
    val big = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 300)
    Tables.orders(s, d)
      .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_orderdate"),
        // o_totalprice is 3-dp exact → decimal round (Exact idiom 1);
        // sum_qty is an integral sum, already exact in double
        Exact.decRound(Exact.dec3(col("o_totalprice")), 2).as("o_totalprice"),
        round(col("sum_qty"), 2).as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val q18BigOrdersSql: String =
    """SELECT c_custkey, c_name, o_orderkey, o_orderdate,
      |  round(o_totalprice::DECIMAL(13,3), 2)::DOUBLE AS o_totalprice, round(b.sum_qty, 2) AS sum_qty
      |FROM orders
      |JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty FROM lineitem
      |      GROUP BY l_orderkey HAVING sum(l_quantity) > 300) b
      |  ON o_orderkey = b.l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  /** TPC-H Q19 (adapted: size in place of container): revenue under three
    * OR'd brand/size/quantity band predicates — one scan, the disjunction
    * evaluated post-broadcast-join in a single codegen stage. */
  def q19Disjunctive: Q = (s, d) => {
    def band(brand: String, szHi: Int, qLo: Int, qHi: Int) =
      col("p_brand") === brand && col("p_size").between(1, szHi) &&
        col("l_quantity").between(qLo, qHi)
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_brand"), col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      .filter(band("Brand#12", 15, 1, 20) || band("Brand#23", 25, 10, 30) ||
        band("Brand#4", 35, 20, 40))
      .agg(Exact.sumRound(Exact.revD, 2).as("revenue"), count(lit(1)).as("n_items"))
  }

  val q19DisjunctiveSql: String =
    """SELECT round(sum(l_extendedprice::DECIMAL(12,2) * (1.00 - l_discount::DECIMAL(4,2))), 2)::DOUBLE AS revenue, count(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
      |   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)""".stripMargin

  /** TPC-H Q21 (adapted: lateness from l_shipdate vs o_orderdate):
    * suppliers who were the sole late shipper on a multi-supplier order —
    * EXISTS (another supplier on the order) + NOT EXISTS (another LATE
    * supplier), decorrelated to per-order counts instead of self-joins:
    * per (order, supplier) late-line counts, then two windows over the
    * order key — n_supp ("another supplier exists" ⇔ n_supp > 1) and
    * n_late_supp ("no other late supplier" ⇔ n_late_supp == 1 for a late
    * supplier). The self-join formulation scans lineitem 3× (late side +
    * EXISTS side + NOT EXISTS side, filters too different for exchange
    * reuse); this shape scans it ONCE, and the window runs over the
    * aggregated frame (≤7 rows per order at any scale) co-partitioned
    * with the order join — one lineitem shuffle total. */
  def q21WaitingSupplier: Q = (s, d) => {
    val lines = Tables.lineitem(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")).as("late"))
    // one shuffle for agg AND windows: hash-partitioning on l_orderkey
    // alone satisfies the (l_orderkey, l_suppkey) aggregation's required
    // distribution and the window's, so neither adds an exchange — the
    // default plan shuffles twice ((ok, sk) for the agg, ok again for
    // the windows) for a (ok, sk) partial-agg that barely collapses
    // (1–2 lines per supplier per order)
    val perSupp = lines
      .repartition(col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(sum(when(col("late"), 1L).otherwise(0L)).as("n_late_lines"))
    val w = Window.partitionBy(col("l_orderkey"))
    perSupp
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_late_supp",
        sum(when(col("n_late_lines") > 0, 1).otherwise(0)).over(w))
      .filter(col("n_late_lines") > 0 && col("n_supp") > 1 && col("n_late_supp") === 1)
      .groupBy(col("l_suppkey"))
      .agg(sum(col("n_late_lines")).as("numwait"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  val q21WaitingSupplierSql: String =
    """SELECT s_name, count(*) AS numwait
      |FROM lineitem l1
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |JOIN supplier ON s_suppkey = l1.l_suppkey
      |WHERE o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 20""".stripMargin

  /** TPC-H Q22 (adapted: nation in place of phone prefix): dormant
    * high-balance customers per nation — above-average balance (scalar
    * subquery, broadcast) with no orders since 1999 (anti join against
    * the filtered orders, mirroring Q22's "no orders for N years"). */
  def q22Dormant: Q = (s, d) => {
    val cust = Tables.customer(s, d)
    // decimal-exact mean (see qCorrSubquery): the strict > against a
    // summation-order-dependent double avg could flip boundary customers
    // between engines. c_acctbal is 2-dp exact, so decimal(12,2) is
    // lossless and unambiguous in both engines (decimal(38,18) is not:
    // Spark casts doubles via the shortest string, DuckDB via binary).
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg((sum(Exact.dec2(col("c_acctbal"))).cast("double") /
        count(lit(1))).as("abal"))
    cust
      .join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("abal"))
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
        .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("numcust"),
        Exact.sumRound(Exact.dec2(col("c_acctbal")), 2).as("totacctbal"))
      .orderBy(col("n_name"))
  }

  val q22DormantSql: String =
    """SELECT n_name, count(*) AS numcust, round(sum(c_acctbal::DECIMAL(12,2)), 2)::DOUBLE AS totacctbal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE c_acctbal > (SELECT sum(c_acctbal::DECIMAL(12,2))::DOUBLE / count(*)
      |                   FROM customer WHERE c_acctbal > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate >= TIMESTAMP '1999-01-01')
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** Full-outer join: per-nation deep-debt customers vs high-balance
    * suppliers. The balance filters guarantee BOTH unmatched sides occur
    * at every shipped scale factor (verified: sf0.001 → 1 supplier-only
    * + 4 customer-only nations; sf0.01 → 6 + 3), so the null-filling
    * coalesce paths are actually exercised by the oracle gate.
    * Aggregate-then-join keeps the outer join tiny. */
  def qFullOuter: Q = (s, d) => {
    val c = Tables.customer(s, d).filter(col("c_acctbal") < -700)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"))
    val sp = Tables.supplier(s, d).filter(col("s_acctbal") > 5000)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"))
    c.join(sp, col("c_nationkey") === col("s_nationkey"), "full_outer")
      .select(coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
      .orderBy(col("nationkey"))
  }

  val qFullOuterSql: String =
    """SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey,
      |  coalesce(c.n_customers, 0) AS n_customers,
      |  coalesce(s.n_suppliers, 0) AS n_suppliers
      |FROM (SELECT c_nationkey, count(*) AS n_customers FROM customer
      |      WHERE c_acctbal < -700 GROUP BY 1) c
      |FULL OUTER JOIN (SELECT s_nationkey, count(*) AS n_suppliers FROM supplier
      |      WHERE s_acctbal > 5000 GROUP BY 1) s
      |  ON c.c_nationkey = s.s_nationkey
      |ORDER BY nationkey""".stripMargin

  /** Cube aggregation: all four grouping combinations of returnflag ×
    * linestatus in one pass (expand + single shuffle, like rollup). */
  /** Ordered string aggregation (LISTAGG / string_agg): suppliers per
    * nation as one sorted CSV cell. `collect_list` order is
    * partition-arrival nondeterministic, so the sort happens INSIDE the
    * aggregate result (`sort_array`) — the only way the cell is stable
    * across engines and runs. Dim broadcast, one keyed agg; the cell is
    * bounded by group size (report-shaped groups, not the fact table). */
  def qListagg: Q = (s, d) =>
    Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        array_join(sort_array(collect_list(col("s_name"))), ",").as("suppliers"))
      .orderBy(col("n_name"))

  val qListaggSql: String =
    """SELECT n_name, count(*) AS n_suppliers,
      |  string_agg(s_name, ',' ORDER BY s_name) AS suppliers
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Equi-width histogram of l_quantity (5-unit buckets): the profiling
    * primitive behind skew diagnosis and bucket-count tuning. Bucket
    * assignment is record-local integer math (quantities are integral-
    * valued doubles, so floor(q/5) is exact in both engines); the groupBy
    * partial-aggregates into ≤11 groups — one scan, kilobyte shuffle. */
  def qHistogram: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(floor(col("l_quantity") / 5).cast("long").as("bucket"), col("l_quantity"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("l_quantity")).as("lo"),
        max(col("l_quantity")).as("hi"))
      .orderBy(col("bucket"))

  val qHistogramSql: String =
    """SELECT CAST(floor(l_quantity / 5) AS BIGINT) AS bucket, count(*) AS n,
      |  min(l_quantity) AS lo, max(l_quantity) AS hi
      |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin

  /** Customer spend deciles: NTILE(10) over exact-decimal lifetime spend
    * (desc, custkey tiebreak — the deterministic total order both engines
    * share), then per-decile count and min/max/total spend. NTILE's
    * floor-division bucket split is the same standard-SQL definition in
    * Spark and DuckDB. Scale: spend is one keyed agg off orders; the
    * decile comes from [[graft.plans.DistributedRank.withNtile]] — a
    * range-partitioned distributed rank with record-local remainder-exact
    * bucket math, NOT a `Window.orderBy` whose physical plan sorts every
    * customer on one task (10⁸–10⁹ customers at 100 TB). OperatorsSpec
    * pins the bucketing ≡ Spark's own ntile window at test scale. */
  def qNtile: Q = (s, d) =>
    graft.plans.DistributedRank.withNtile(
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(sum(Exact.dec3(col("o_totalprice"))).as("spend_d")),
      10, Seq(col("spend_d").desc, col("o_custkey")), "decile")
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"),
        round(min(col("spend_d")), 2).cast("double").as("min_spend"),
        round(max(col("spend_d")), 2).cast("double").as("max_spend"),
        round(sum(col("spend_d")), 2).cast("double").as("sum_spend"))
      .orderBy(col("decile"))

  val qNtileSql: String =
    """WITH sp AS (SELECT o_custkey, sum(o_totalprice::DECIMAL(13,3)) AS spend_d
      |  FROM orders GROUP BY 1),
      |dk AS (SELECT *, CAST(ntile(10) OVER (ORDER BY spend_d DESC, o_custkey) AS BIGINT)
      |    AS decile FROM sp)
      |SELECT decile, count(*) AS n_customers,
      |  round(min(spend_d), 2)::DOUBLE AS min_spend,
      |  round(max(spend_d), 2)::DOUBLE AS max_spend,
      |  round(sum(spend_d), 2)::DOUBLE AS sum_spend
      |FROM dk GROUP BY decile ORDER BY decile""".stripMargin

  def qCube: Q = (s, d) =>
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(Exact.sumRound(Exact.dec2(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))
      .orderBy(col("returnflag"), col("linestatus"))

  val qCubeSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |  coalesce(l_linestatus, 'ALL') AS linestatus,
      |  round(sum(l_quantity::DECIMAL(12,2)), 2)::DOUBLE AS sum_qty, count(*) AS n
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  /** RANGE-frame window: trailing-30-day spend per customer — the frame
    * is value-based (days), not row-based, so same-day peer orders are
    * included regardless of row order. Day numbers are ints, making the
    * range arithmetic identical across engines. */
  def qWindowRange: Q = (s, d) => {
    val dayNum = datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp")).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("day_num"))
      .rangeBetween(-30, 0)
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), dayNum.as("day_num"),
        col("o_totalprice"))
      // o_totalprice is 3-dp exact → decimal window sum + decimal round
      // (Exact idiom 1)
      .withColumn("spend_30d",
        round(sum(Exact.dec3(col("o_totalprice"))).over(w), 2).cast("double"))
      .withColumn("n_orders_30d", count(lit(1)).over(w))
      .select(col("o_orderkey"), col("o_custkey"), col("day_num"),
        col("spend_30d"), col("n_orders_30d"))
      .orderBy(col("o_orderkey"))
  }

  val qWindowRangeSql: String =
    """WITH t AS (
      |  SELECT o_orderkey, o_custkey,
      |    date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS day_num,
      |    o_totalprice
      |  FROM orders)
      |SELECT o_orderkey, o_custkey, day_num,
      |  round(sum(o_totalprice::DECIMAL(13,3)) OVER w, 2)::DOUBLE AS spend_30d,
      |  count(*) OVER w AS n_orders_30d
      |FROM t
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY day_num
      |             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
      |ORDER BY o_orderkey""".stripMargin

  /** Value-navigation windows: first_value / last_value / nth_value over
    * each customer's order history in (date, key) order — the remaining
    * window-function family the suite didn't yet exercise (q_window_rank
    * covers ranking, q_window_dist distribution, q_window_range frames).
    * The full-frame last/nth need UNBOUNDED FOLLOWING; one row per
    * customer survives via row_number. Prices pass through unaggregated
    * (bit-identical doubles from the same parquet), so no rounding idiom
    * is needed. Scale: one custkey-partitioned window — high-cardinality
    * key, bounded rows per customer. */
  def qWindowFirstLast: Q = (s, d) => {
    val ord = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("first_price", first(col("o_totalprice")).over(full))
      .withColumn("last_price", last(col("o_totalprice")).over(full))
      .withColumn("second_price", nth_value(col("o_totalprice"), 2).over(full))
      .withColumn("n_orders", count(lit(1)).over(full))
      .withColumn("rn", row_number().over(ord))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("n_orders"), col("first_price"),
        col("last_price"), col("second_price"))
      .orderBy(col("o_custkey"))
  }

  val qWindowFirstLastSql: String =
    """SELECT o_custkey, n_orders, first_price, last_price, second_price
      |FROM (
      |  SELECT o_custkey,
      |    count(*) OVER wf AS n_orders,
      |    first_value(o_totalprice) OVER wf AS first_price,
      |    last_value(o_totalprice) OVER wf AS last_price,
      |    nth_value(o_totalprice, 2) OVER wf AS second_price,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      |  FROM orders
      |  WINDOW wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
      |WHERE rn = 1 ORDER BY o_custkey""".stripMargin

  /** Skyline (Pareto frontier) of parts minimizing (size, price) — the
    * multi-objective "no part is both smaller and cheaper" query Spark
    * has no native operator for (Börzsönyi et al. 2001). The naive
    * definition is a quadratic NOT EXISTS self-join (the oracle states
    * it that way); the engine computes it in linear passes through the
    * 2-D sorted-prefix identity: group to per-price minimum sizes, take
    * the strict-prefix running min over ascending price, and a part is
    * dominated iff a strictly cheaper price reached its size
    * (`pmin ≤ size`) or its own price group holds a strictly smaller
    * size (`size > gmin`). Exact duplicates dominate nothing and both
    * survive, per the skyline definition.
    *
    * Scale shape: one partial-agged groupBy to the |distinct price|
    * frame, the strict-prefix min via [[graft.plans.ChunkedPrefix]]
    * (price-range chunks — a continuous price domain makes the grouped
    * frame corpus-sized in the worst case, so no single-task
    * Window.orderBy), one keyed join back. All comparisons, no
    * arithmetic — double values hash exactly. */
  def qSkyline: Q = (s, d) =>
    qSkylineFor(Tables.part(s, d)
      .select(col("p_partkey").as("part_key"),
        col("p_size").cast("long").as("size"), col("p_retailprice").as("price")))

  /** Chunking for [[qSkylineFor]]'s strict-prefix pass, derived from the
    * DATA (one sizing agg over `f` at plan construction, like every
    * other autoWidth consumer): ~√|distinct price| chunks anchored on 32
    * approx-percentile cells of the observed price distribution, each
    * cell split uniformly. A fixed integer width would collapse any
    * price domain narrower than the width (fractional prices) into ONE
    * chunk — the single-task hazard ChunkedPrefix exists to avoid —
    * and percentile anchoring additionally bounds chunk mass to ~N/32
    * under VALUE skew (a price distribution concentrated in a sliver of
    * the span), which pure min/max quantization would re-concentrate.
    * Returns (chunkColumn, nChunks); nChunks is exposed so the spec can
    * pin that a narrow domain still splits. */
  def skylineChunks(f: DataFrame): (org.apache.spark.sql.Column, Long) = {
    val cp = graft.plans.ChunkedPrefix
    val cells = 32
    val probs = (1 until cells).map(_.toDouble / cells).toArray
    val stats = f.agg(min(col("price")).cast("double"),
      max(col("price")).cast("double"),
      approx_count_distinct(col("price")),
      percentile_approx(col("price").cast("double"), lit(probs), lit(10000)))
      .collect()(0)
    if (stats.isNullAt(0)) (lit(0L), 1L) // empty input: one (empty) chunk
    else {
      val nd = stats.getLong(2)
      val n = math.max(1L, math.ceil(nd.toDouble / cp.autoWidth(nd)).toLong)
      // nChunks == 1 delegates to rangeChunks' degenerate branch so the
      // null-placement convention stays defined in ONE place
      if (n == 1L)
        (cp.rangeChunks(col("price"), stats.getDouble(0), stats.getDouble(1), 1L), 1L)
      else {
        val bs = stats.getSeq[Double](3).toSeq.sorted
        val sub = math.max(1L, math.ceil(n.toDouble / cells).toLong)
        (cp.percentileChunks(col("price"), bs,
          stats.getDouble(0), stats.getDouble(1), sub), cells.toLong * sub)
      }
    }
  }

  /** General 2-D min-min skyline over (part_key, size, price). */
  def qSkylineFor(f: DataFrame): DataFrame = {
    val cp = graft.plans.ChunkedPrefix
    val gm = f.groupBy(col("price")).agg(min(col("size")).as("gmin"))
    // strict-prefix running MIN over price asc = −(exclusive runningMax
    // of −gmin); each price appears once in gm, so the exclusive row
    // prefix IS the strictly-cheaper set
    val withPrefix = cp.runningMax(gm,
        keys = Seq.empty, order = Seq(col("price").asc),
        chunk = skylineChunks(f)._1,
        value = -col("gmin"), out = "__nmin", inclusive = false)
      .select(col("price"), col("gmin"), (-col("__nmin")).as("pmin"))
    f.join(withPrefix, Seq("price"))
      .filter(!(col("pmin").isNotNull && col("pmin") <= col("size")) &&
        col("size") <= col("gmin"))
      .select(col("part_key"), col("size"), col("price"))
      .orderBy(col("price"), col("size"), col("part_key"))
  }

  val qSkylineSql: String =
    """WITH f AS (SELECT p_partkey AS part_key, CAST(p_size AS BIGINT) AS size,
      |    p_retailprice AS price FROM part)
      |SELECT part_key, size, price FROM f x
      |WHERE NOT EXISTS (SELECT 1 FROM f y
      |  WHERE y.size <= x.size AND y.price <= x.price
      |    AND (y.size < x.size OR y.price < x.price))
      |ORDER BY price, size, part_key""".stripMargin

  def queries: Map[String, Q] = Map(
    "q_skyline" -> qSkyline,
    "q_window_firstlast" -> qWindowFirstLast,
    "q_full_outer" -> qFullOuter,
    "q_listagg" -> qListagg,
    "q_histogram" -> qHistogram,
    "q_ntile" -> qNtile,
    "q_cube" -> qCube,
    "q_window_range" -> qWindowRange,
    "q7_nation_volume" -> q7NationVolume,
    "q8_market_share" -> q8MarketShare,
    "q12_late_ship" -> q12LateShip,
    "q13_cust_dist" -> q13CustDist,
    "q15_top_supplier" -> q15TopSupplier,
    "q17_small_qty" -> q17SmallQty,
    "q18_big_orders" -> q18BigOrders,
    "q19_disjunctive" -> q19Disjunctive,
    "q21_waiting_supplier" -> q21WaitingSupplier,
    "q22_dormant" -> q22Dormant)

  def oracleSql: Map[String, String] = Map(
    "q_skyline" -> qSkylineSql,
    "q_window_firstlast" -> qWindowFirstLastSql,
    "q_full_outer" -> qFullOuterSql,
    "q_listagg" -> qListaggSql,
    "q_histogram" -> qHistogramSql,
    "q_ntile" -> qNtileSql,
    "q_cube" -> qCubeSql,
    "q_window_range" -> qWindowRangeSql,
    "q7_nation_volume" -> q7NationVolumeSql,
    "q8_market_share" -> q8MarketShareSql,
    "q12_late_ship" -> q12LateShipSql,
    "q13_cust_dist" -> q13CustDistSql,
    "q15_top_supplier" -> q15TopSupplierSql,
    "q17_small_qty" -> q17SmallQtySql,
    "q18_big_orders" -> q18BigOrdersSql,
    "q19_disjunctive" -> q19DisjunctiveSql,
    "q21_waiting_supplier" -> q21WaitingSupplierSql,
    "q22_dormant" -> q22DormantSql)
}
