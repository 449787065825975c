package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Supply-side relational suite (SURVEY.md §2a, third tranche): the five
  * TPC-H shapes that canonically need `partsupp` — Q2 (min-cost supplier),
  * Q9 (product profit), Q11 (inventory-value concentration), Q16
  * (supplier-count distribution), Q20 (surplus-quantity suppliers) —
  * adapted to the testdata schema by deriving the part↔supplier supply
  * relation from `lineitem` (`groupBy(l_partkey, l_suppkey)`). The plan
  * shapes (correlated min, groupwise HAVING over a global share, distinct
  * counting with an anti-joined exclusion list, correlated per-part
  * average) are preserved.
  *
  * Scale notes: every query shuffles the fact at most twice (supply
  * derivation keyed on (partkey, suppkey), then one keyed re-agg) and
  * joins dims via broadcast. Groupwise minima/averages use windows over
  * the already-aggregated supply frame — orders of magnitude smaller
  * than the fact — never a second fact shuffle. Q11's global threshold
  * is a broadcast scalar crossJoin, not a single-partition window.
  */
object RelationalSupply {

  type Q = (SparkSession, String) => DataFrame

  private def rev = RelationalExt.rev

  /** Eligible suppliers in one region, with nation names (dim-only). */
  private def regionSuppliers(s: SparkSession, d: String, region: String): DataFrame =
    Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))

  /** TPC-H Q2 (adapted): for each small LARGE-type part, the ASIA
    * supplier(s) offering the minimum unit cost, where unit cost is the
    * cheapest observed `l_extendedprice / l_quantity` for that
    * (part, supplier) pair. The part filter is pushed below the
    * groupwise-min (same per-part minima, far less window work), and the
    * correlated min subquery becomes a window min over the aggregated
    * supply frame — no second shuffle of lineitem. */
  def q2MinCost: Q = (s, d) => {
    val supply = Tables.lineitem(s, d)
      .groupBy(col("l_partkey").as("partkey"), col("l_suppkey").as("suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
    val pFiltered = Tables.part(s, d)
      .filter(col("p_size") <= 12 && col("p_type") === "LARGE")
      .select(col("p_partkey"), col("p_type"))
    val w = Window.partitionBy(col("partkey"))
    supply
      .join(broadcast(pFiltered), col("partkey") === col("p_partkey"))
      .join(broadcast(regionSuppliers(s, d, "ASIA")), col("suppkey") === col("s_suppkey"))
      .withColumn("min_cost", min(col("unit_cost")).over(w))
      .filter(col("unit_cost") === col("min_cost"))
      // NOT round(x, 2): unit_cost = 2-dp-price / small-int divides land
      // EXACTLY on x.xx5 boundaries (.97/2 = .485), where Spark rounds the
      // shortest decimal string (up) and DuckDB rounds the binary value
      // (down) — found at sf0.1 row 684 (1164.985). floor(x*100 + 0.5)/100
      // is pure double math, bit-identical in both engines either way.
      .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
        col("p_type"), (floor(col("min_cost") * 100 + 0.5) / 100).as("min_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
  }

  val q2MinCostSql: String =
    """WITH supply AS (
      |  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
      |         min(l_extendedprice / l_quantity) AS unit_cost
      |  FROM lineitem GROUP BY 1, 2),
      |eligible AS (
      |  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      |  FROM supplier s JOIN nation n ON s_nationkey = n_nationkey
      |  JOIN region r ON n_regionkey = r_regionkey WHERE r.r_name = 'ASIA'),
      |mins AS (
      |  SELECT partkey, min(unit_cost) AS min_cost
      |  FROM supply JOIN eligible ON suppkey = s_suppkey GROUP BY 1)
      |SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_type,
      |  floor(m.min_cost * 100 + 0.5) / 100 AS min_cost
      |FROM supply sp
      |JOIN eligible e ON sp.suppkey = e.s_suppkey
      |JOIN mins m ON sp.partkey = m.partkey AND sp.unit_cost = m.min_cost
      |JOIN part p ON p.p_partkey = sp.partkey
      |WHERE p.p_size <= 12 AND p.p_type = 'LARGE'
      |ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey""".stripMargin

  /** TPC-H Q9 (adapted): profit by supplier nation and ship year over
    * one part family, with supply cost proxied as a retail-price
    * fraction (no partsupp.ps_supplycost in the testdata). Single fact
    * shuffle on the (nation, year) group keys; both dims broadcast.
    * Profit is an exact-decimal sum (Exact idiom 1): the double sum was
    * order-dependent and its round-to-2 sat on the cross-engine x.xx5
    * boundary trap that failed q11 at the round-3 driver gate. */
  def q9Profit: Q = (s, d) => {
    val pWidget = Tables.part(s, d).filter(col("p_name").like("%widget%"))
      .select(col("p_partkey"), col("p_retailprice"))
    val suppNation = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val cost = lit(0.6).cast("decimal(2,1)") *
      Exact.dec2(col("p_retailprice")) * Exact.dec0(col("l_quantity"))
    Tables.lineitem(s, d)
      .join(broadcast(pWidget), col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("l_shipdate")).cast("long").as("o_year"))
      .agg(Exact.sumRound(Exact.revD - cost, 2).as("profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q9ProfitSql: String =
    """SELECT n_name AS nation, year(l_shipdate) AS o_year,
      |  round(sum(l_extendedprice::DECIMAL(12,2) * (1.00 - l_discount::DECIMAL(4,2))
      |            - 0.6 * p_retailprice::DECIMAL(12,2) * l_quantity::DECIMAL(12,0)), 2)::DOUBLE AS profit
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON n_nationkey = s_nationkey
      |WHERE p_name LIKE '%widget%'
      |GROUP BY 1, 2 ORDER BY 1, 2 DESC""".stripMargin

  /** TPC-H Q11 (adapted): parts whose revenue through a three-nation
    * supplier group exceeds a fixed share of the group total. The
    * threshold is a broadcast scalar (crossJoin of a 1-row agg over the
    * per-part frame), so no single-partition window. Revenue is an
    * exact-decimal sum end-to-end (Exact idiom 1): the round-3 driver
    * gate caught the double-sum variant on partkey 1329
    * (363524.21499999997 — Spark rounded .21, DuckDB .22). The share
    * comparison multiplies the part value by 1000 instead of the total
    * by 0.001, keeping every operand an exact decimal (a 0.001 decimal
    * product would overflow precision 38 and force engine-specific
    * scale reduction). */
  def q11Share: Q = (s, d) => {
    val nations = Seq("NATION_1", "NATION_2", "NATION_3")
    val suppN = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d).filter(col("n_name").isin(nations: _*))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val perPart = Tables.lineitem(s, d)
      .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey").as("partkey"))
      .agg(sum(Exact.revD).as("v"))
    perPart
      .crossJoin(broadcast(perPart.agg(sum(col("v")).as("total"))))
      .filter(col("v") * lit(1000) > col("total"))
      .select(col("partkey"), Exact.decRound(col("v"), 2).as("value"))
      .orderBy(col("value").desc, col("partkey"))
  }

  val q11ShareSql: String =
    """WITH val AS (
      |  SELECT l_partkey AS partkey,
      |    sum(l_extendedprice::DECIMAL(12,2) * (1.00 - l_discount::DECIMAL(4,2))) AS v
      |  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation ON n_nationkey = s_nationkey
      |  WHERE n_name IN ('NATION_1','NATION_2','NATION_3')
      |  GROUP BY 1)
      |SELECT partkey, round(v, 2)::DOUBLE AS value FROM val
      |WHERE v * 1000 > (SELECT sum(v) FROM val)
      |ORDER BY value DESC, partkey""".stripMargin

  /** TPC-H Q16 (adapted): distinct supplier counts per (brand, type,
    * size) over selected sizes, excluding one brand, one type family and
    * suppliers with negative balances (anti-joined exclusion list, the
    * NOT IN of the original). countDistinct shuffles once on the group
    * keys; the exclusion list is a broadcast anti join. */
  def q16SupplierCnt: Q = (s, d) => {
    val pFiltered = Tables.part(s, d)
      .filter(col("p_brand") =!= "Brand#3" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val flagged = Tables.supplier(s, d).filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    Tables.lineitem(s, d)
      .join(broadcast(pFiltered), col("l_partkey") === col("p_partkey"))
      .join(broadcast(flagged), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  val q16SupplierCntSql: String =
    """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** TPC-H Q20 (adapted): suppliers who shipped well above the per-part
    * average of 'red' parts in 1996. The correlated average is a window
    * over the aggregated (suppkey, partkey) frame; quantities are
    * integral so sums and averages are exact — the strict `>` cannot
    * straddle float noise. One fact shuffle; semi join back to the
    * supplier dim. */
  def q20QtySurplus: Q = (s, d) => {
    val pRed = Tables.part(s, d).filter(col("p_name").like("red%"))
      .select(col("p_partkey"))
    val shipped = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(broadcast(pRed), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey").as("suppkey"), col("l_partkey").as("partkey"))
      .agg(sum(col("l_quantity")).as("qty"))
    val heavy = shipped
      .withColumn("avg_qty", avg(col("qty")).over(Window.partitionBy(col("partkey"))))
      .filter(col("qty") > lit(1.5) * col("avg_qty"))
      .select(col("suppkey")).distinct()
    Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(heavy), col("s_suppkey") === col("suppkey"), "left_semi")
      .select(col("s_name"), col("n_name"))
      .orderBy(col("s_name"))
  }

  val q20QtySurplusSql: String =
    """WITH shipped AS (
      |  SELECT l_suppkey AS suppkey, l_partkey AS partkey, sum(l_quantity) AS qty
      |  FROM lineitem JOIN part ON p_partkey = l_partkey
      |  WHERE p_name LIKE 'red%'
      |    AND l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-01-01'
      |  GROUP BY 1, 2),
      |avgs AS (SELECT partkey, avg(qty) AS avg_qty FROM shipped GROUP BY 1),
      |heavy AS (
      |  SELECT DISTINCT suppkey FROM shipped JOIN avgs USING (partkey)
      |  WHERE qty > 1.5 * avg_qty)
      |SELECT s_name, n_name FROM supplier JOIN nation ON n_nationkey = s_nationkey
      |WHERE s_suppkey IN (SELECT suppkey FROM heavy)
      |ORDER BY s_name""".stripMargin

  def queries: Map[String, Q] = Map(
    "q2_min_cost" -> q2MinCost,
    "q9_profit" -> q9Profit,
    "q11_share" -> q11Share,
    "q16_supplier_cnt" -> q16SupplierCnt,
    "q20_qty_surplus" -> q20QtySurplus)

  def oracleSql: Map[String, String] = Map(
    "q2_min_cost" -> q2MinCostSql,
    "q9_profit" -> q9ProfitSql,
    "q11_share" -> q11ShareSql,
    "q16_supplier_cnt" -> q16SupplierCntSql,
    "q20_qty_surplus" -> q20QtySurplusSql)
}
