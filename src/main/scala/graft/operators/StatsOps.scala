package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical profiling suite (SURVEY.md §2a, third tranche): the
  * column-profiling aggregates an analytics engine is expected to ship —
  * higher moments (variance/skewness/kurtosis), per-group OLS regression,
  * modal values, bitwise/boolean aggregates, and gaps-and-islands
  * sequence profiling. The reference exposes per-batch counter stats and
  * monotonic-sequence (offset continuity) checks on its loader side
  * (`KafkaMetricsReporter`-style counters, offset-gap monitoring in
  * `source/KafkaSource.scala`); these are the corpus-wide batch twins.
  *
  * Numeric discipline (see [[Exact]]): every aggregate here is built from
  * EXACT power sums — l_quantity is an integral double ≤50 and money
  * columns are 2-dp exact, so x, x², x³, x⁴ and x·y are all exactly
  * representable as decimals. Decimal sums are order-independent; the
  * derived moments are then pure double arithmetic with identical
  * operator trees on the Spark and DuckDB side, pinned by floorRound.
  *
  * Scale: all of these are single-scan partial aggregates into tiny
  * groups (≤ |returnflag| or |month| rows); no window touches a
  * corpus-sized frame except q_gaps_islands, whose per-type row_number
  * is documented below.
  */
object StatsOps {

  type Q = (SparkSession, String) => DataFrame

  /** Higher-moment profile of l_quantity per return flag: mean, population
    * variance, skewness, excess kurtosis — derived from exact integer
    * power sums (q ≤ 50 ⇒ q⁴ ≤ 6.25e6; decimal(38,0) sums hold 1e12 rows
    * with 19 digits to spare). The double formula is the standard
    * moment expansion; dividing by (sd·sd·sd) instead of pow(var, 1.5)
    * keeps every operation an IEEE-exact-rounded primitive (sqrt is
    * correctly rounded; pow is NOT guaranteed identical across libm
    * implementations). One scan, partial agg, 3-row output. */
  def qMoments: Q = (s, d) => {
    val q = col("l_quantity").cast("long")
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), q.as("q"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("q"))).as("s1"),
        sum(dec(col("q") * col("q"))).as("s2"),
        sum(dec(col("q") * col("q") * col("q"))).as("s3"),
        sum(dec(col("q") * col("q") * col("q") * col("q"))).as("s4"))
      .select(col("l_returnflag"), col("n"),
        col("s1").cast("double").as("s1"), col("s2").cast("double").as("s2"),
        col("s3").cast("double").as("s3"), col("s4").cast("double").as("s4"),
        col("n").cast("double").as("nd"))
      .select(col("l_returnflag"), col("n"),
        (col("s1") / col("nd")).as("m"),
        (col("s2") / col("nd")).as("m2"),
        (col("s3") / col("nd")).as("m3"),
        (col("s4") / col("nd")).as("m4"))
      .select(col("l_returnflag"), col("n"), col("m"),
        (col("m2") - col("m") * col("m")).as("varp"),
        col("m2"), col("m3"), col("m4"))
      .select(col("l_returnflag"), col("n"),
        Exact.floorRound(col("m"), 6).as("mean_qty"),
        Exact.floorRound(col("varp"), 6).as("var_pop"),
        Exact.floorRound(
          (col("m3") - lit(3.0) * col("m") * col("m2") + lit(2.0) * col("m") * col("m") * col("m"))
            / (sqrt(col("varp")) * sqrt(col("varp")) * sqrt(col("varp"))), 6).as("skewness"),
        Exact.floorRound(
          (col("m4") - lit(4.0) * col("m") * col("m3") + lit(6.0) * col("m") * col("m") * col("m2")
            - lit(3.0) * col("m") * col("m") * col("m") * col("m"))
            / (col("varp") * col("varp")) - lit(3.0), 6).as("kurtosis"))
      .orderBy(col("l_returnflag"))
  }

  val qMomentsSql: String = {
    val skewNum = "(m3 - 3.0 * m * m2 + 2.0 * m * m * m)"
    val kurtNum = "(m4 - 4.0 * m * m3 + 6.0 * m * m * m2 - 3.0 * m * m * m * m)"
    s"""WITH ps AS (
       |  SELECT l_returnflag, count(*) AS n,
       |    sum(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)) AS s1,
       |    sum(CAST(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) AS HUGEINT)) AS s2,
       |    sum(CAST(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) AS HUGEINT)) AS s3,
       |    sum(CAST(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) AS HUGEINT)) AS s4
       |  FROM lineitem GROUP BY 1),
       |m AS (
       |  SELECT l_returnflag, n,
       |    s1::DOUBLE / n::DOUBLE AS m, s2::DOUBLE / n::DOUBLE AS m2,
       |    s3::DOUBLE / n::DOUBLE AS m3, s4::DOUBLE / n::DOUBLE AS m4
       |  FROM ps),
       |v AS (SELECT l_returnflag, n, m, m2 - m * m AS varp, m2, m3, m4 FROM m)
       |SELECT l_returnflag, n,
       |  ${Exact.floorRoundSql("m", 6)} AS mean_qty,
       |  ${Exact.floorRoundSql("varp", 6)} AS var_pop,
       |  ${Exact.floorRoundSql(s"$skewNum / (sqrt(varp) * sqrt(varp) * sqrt(varp))", 6)} AS skewness,
       |  ${Exact.floorRoundSql(s"$kurtNum / (varp * varp) - 3.0", 6)} AS kurtosis
       |FROM v ORDER BY l_returnflag""".stripMargin
  }

  /** Per-group OLS regression of extendedprice on quantity (slope,
    * intercept, r²) from exact cross-moment sums: Σx and Σx² are integer-
    * exact, Σy and Σxy and Σy² are exact decimals (2-dp money × integer).
    * The closed-form slope/intercept/r² is then mirrored double
    * arithmetic. This is regr_slope/regr_intercept/regr_r2 with the
    * aggregation made order-independent — the built-ins accumulate doubles
    * in partition order and would not hash-match across engines. */
  def qRegr: Q = (s, d) => {
    val x = col("l_quantity").cast("long")
    val y = Exact.dec2(col("l_extendedprice"))
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), x.as("x"), y.as("y"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
        sum(col("y")).as("sy"),
        sum(col("y") * col("x").cast("decimal(20,0)")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("l_returnflag"), col("n"),
        col("n").cast("double").as("nd"),
        col("sx").cast("double").as("sx"), col("sxx").cast("double").as("sxx"),
        col("sy").cast("double").as("sy"), col("sxy").cast("double").as("sxy"),
        col("syy").cast("double").as("syy"))
      .select(col("l_returnflag"), col("n"),
        ((col("nd") * col("sxy") - col("sx") * col("sy"))
          / (col("nd") * col("sxx") - col("sx") * col("sx"))).as("slope"),
        col("nd"), col("sx"), col("sy"), col("sxx"), col("sxy"), col("syy"))
      .select(col("l_returnflag"), col("n"),
        Exact.floorRound(col("slope"), 6).as("slope"),
        Exact.floorRound((col("sy") - col("slope") * col("sx")) / col("nd"), 6).as("intercept"),
        Exact.floorRound(
          ((col("nd") * col("sxy") - col("sx") * col("sy")) * (col("nd") * col("sxy") - col("sx") * col("sy")))
            / ((col("nd") * col("sxx") - col("sx") * col("sx")) * (col("nd") * col("syy") - col("sy") * col("sy"))), 6)
          .as("r2"))
      .orderBy(col("l_returnflag"))
  }

  val qRegrSql: String =
    s"""WITH ps AS (
       |  SELECT l_returnflag, count(*) AS n,
       |    sum(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)) AS sx,
       |    sum(CAST(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) AS HUGEINT)) AS sxx,
       |    sum(l_extendedprice::DECIMAL(12,2)) AS sy,
       |    sum(l_extendedprice::DECIMAL(12,2) * CAST(l_quantity AS BIGINT)::DECIMAL(20,0)) AS sxy,
       |    sum(l_extendedprice::DECIMAL(12,2) * l_extendedprice::DECIMAL(12,2)) AS syy
       |  FROM lineitem GROUP BY 1),
       |dd AS (
       |  SELECT l_returnflag, n, n::DOUBLE AS nd, sx::DOUBLE AS sx, sxx::DOUBLE AS sxx,
       |    sy::DOUBLE AS sy, sxy::DOUBLE AS sxy, syy::DOUBLE AS syy
       |  FROM ps),
       |sl AS (
       |  SELECT *, (nd * sxy - sx * sy) / (nd * sxx - sx * sx) AS slope FROM dd)
       |SELECT l_returnflag, n,
       |  ${Exact.floorRoundSql("slope", 6)} AS slope,
       |  ${Exact.floorRoundSql("(sy - slope * sx) / nd", 6)} AS intercept,
       |  ${Exact.floorRoundSql("((nd * sxy - sx * sy) * (nd * sxy - sx * sy)) / ((nd * sxx - sx * sx) * (nd * syy - sy * sy))", 6)} AS r2
       |FROM sl ORDER BY l_returnflag""".stripMargin

  /** Modal order priority per order month (most frequent value, ties
    * broken to the lexicographically smallest priority — a total order
    * both engines share). Counts groupBy is corpus-sized but partial-
    * aggregated; the ranking window runs over the tiny (month, priority)
    * count table. */
  def qMode: Q = (s, d) => {
    val w = Window.partitionBy(col("month")).orderBy(col("n").desc, col("o_orderpriority"))
    Tables.orders(s, d)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("month"), col("o_orderpriority").as("modal_priority"), col("n").as("n_orders"))
      .orderBy(col("month"))
  }

  val qModeSql: String =
    """WITH c AS (
      |  SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderpriority, count(*) AS n
      |  FROM orders GROUP BY 1, 2),
      |r AS (SELECT *, row_number() OVER (PARTITION BY month ORDER BY n DESC, o_orderpriority) AS rk
      |  FROM c)
      |SELECT month, o_orderpriority AS modal_priority, n AS n_orders
      |FROM r WHERE rk = 1 ORDER BY month""".stripMargin

  /** Bitwise and boolean aggregates per return flag: AND/OR/XOR folds of
    * the partkey bits plus every/any predicates — the loader-flag
    * reduction shape (e.g. "did every batch in this partition commit
    * clean"). All integer/boolean: exact on both engines, one scan. */
  def qBitAgg: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(expr("bit_and(l_partkey)").as("pk_and"),
        expr("bit_or(l_partkey)").as("pk_or"),
        expr("bit_xor(l_partkey)").as("pk_xor"),
        expr("bool_and(l_quantity > 0)").as("all_positive_qty"),
        expr("bool_or(l_discount > 0.05)").as("any_deep_discount"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  val qBitAggSql: String =
    """SELECT l_returnflag, bit_and(l_partkey) AS pk_and, bit_or(l_partkey) AS pk_or,
      |  bit_xor(l_partkey) AS pk_xor, bool_and(l_quantity > 0) AS all_positive_qty,
      |  bool_or(l_discount > 0.05) AS any_deep_discount, count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Gaps-and-islands over the event-id sequence per event type: runs of
    * consecutive ids collapse to one island via the classic
    * id − row_number() grouping key; per type we report island count,
    * longest island, and mean length — the batch twin of the loader's
    * offset-continuity monitoring (`sl_gap_detect` reports the gaps; this
    * profiles the runs between them). The per-type row number is a
    * [[graft.plans.ChunkedPrefix]] two-phase rank over
    * (type, offset-chunk) (r7) — the previous low-cardinality
    * `Window.partitionBy(event_type)` sorted corpus/|types| rows in one
    * unsplittable task; the island key `event_id − rn` is unchanged, so
    * the output contract is identical. */
  def qGapsIslands: Q = (s, d) => {
    import graft.plans.ChunkedPrefix
    ChunkedPrefix.rowNumber(
        Tables.events(s, d).select(col("event_type"), col("event_id")),
        keys = Seq("event_type"), order = Seq(col("event_id")),
        chunk = ChunkedPrefix.idChunks(col("event_id"),
          ChunkedPrefix.autoWidth(Tables.events(s, d).count())), out = "rn")
      .withColumn("grp", col("event_id") - col("rn"))
      .groupBy(col("event_type"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_islands"), max(col("len")).as("max_len"),
        Exact.floorRound(sum(col("len")).cast("double") / count(lit(1)), 4).as("avg_len"))
      .orderBy(col("event_type"))
  }

  val qGapsIslandsSql: String =
    s"""WITH g AS (
       |  SELECT event_type, event_id,
       |    event_id - row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS grp
       |  FROM events),
       |i AS (SELECT event_type, grp, count(*) AS len FROM g GROUP BY 1, 2)
       |SELECT event_type, count(*) AS n_islands, max(len) AS max_len,
       |  ${Exact.floorRoundSql("sum(len)::DOUBLE / count(*)", 4)} AS avg_len
       |FROM i GROUP BY event_type ORDER BY event_type""".stripMargin

  /** One-pass column profile (the ANALYZE TABLE / data-quality census):
    * row count, null count, exact distinct count, and min/max for five
    * lineitem columns, emitted long-format (one row per column) so the
    * schema is stable however many columns are profiled. ALL columns
    * profile in ONE aggregate — the multi-distinct Expand is a single
    * corpus pass (5× row fanout, map-side partial), never one scan per
    * column; at true scale swap exact distincts for approx_count_distinct
    * and the Expand disappears too. min/max stringified with explicit
    * formats (timestamp → 'yyyy-MM-dd HH:mm:ss', quantities → integer
    * string) so the long-format VARCHAR cells are engine-identical. */
  def qProfile: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val agg = li.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("l_returnflag")).as("d_rf"),
      min(col("l_returnflag")).as("mn_rf"), max(col("l_returnflag")).as("mx_rf"),
      countDistinct(col("l_linestatus")).as("d_ls"),
      min(col("l_linestatus")).as("mn_ls"), max(col("l_linestatus")).as("mx_ls"),
      countDistinct(col("l_shipdate")).as("d_sd"),
      date_format(min(col("l_shipdate")), "yyyy-MM-dd HH:mm:ss").as("mn_sd"),
      date_format(max(col("l_shipdate")), "yyyy-MM-dd HH:mm:ss").as("mx_sd"),
      countDistinct(col("l_quantity")).as("d_q"),
      min(col("l_quantity")).cast("long").cast("string").as("mn_q"),
      max(col("l_quantity")).cast("long").cast("string").as("mx_q"),
      countDistinct(col("l_suppkey")).as("d_sk"),
      min(col("l_suppkey")).cast("string").as("mn_sk"),
      max(col("l_suppkey")).cast("string").as("mx_sk"))
    agg.select(col("n_rows"), explode(array(
        struct(lit("l_returnflag").as("col_name"), col("d_rf").as("n_distinct"),
          col("mn_rf").as("min_val"), col("mx_rf").as("max_val")),
        struct(lit("l_linestatus").as("col_name"), col("d_ls").as("n_distinct"),
          col("mn_ls").as("min_val"), col("mx_ls").as("max_val")),
        struct(lit("l_shipdate").as("col_name"), col("d_sd").as("n_distinct"),
          col("mn_sd").as("min_val"), col("mx_sd").as("max_val")),
        struct(lit("l_quantity").as("col_name"), col("d_q").as("n_distinct"),
          col("mn_q").as("min_val"), col("mx_q").as("max_val")),
        struct(lit("l_suppkey").as("col_name"), col("d_sk").as("n_distinct"),
          col("mn_sk").as("min_val"), col("mx_sk").as("max_val")))).as("p"))
      .select(col("p.col_name").as("col_name"), col("n_rows"),
        col("p.n_distinct").as("n_distinct"), col("p.min_val").as("min_val"),
        col("p.max_val").as("max_val"))
      .orderBy(col("col_name"))
  }

  /** Expand-free twin of [[qProfile]] — the 100 TB shape. Five exact
    * `countDistinct`s over different columns force Catalyst to plan an
    * Expand that multiplies every corpus row ×6 before aggregating (one
    * replica per distinct-set plus one for the plain aggregates); the
    * HLL++ swap (`approx_count_distinct`, rsd 1%) collapses the plan to
    * ONE partial→final aggregate pass with NO Expand node — a 6× input
    * reduction on the profile every ingest run computes. Estimates are
    * engine-specific, so this is a rows-only query (no DuckDB oracle);
    * StatsProfileSpec pins n_distinct within ±5% of the exact twin,
    * identical min/max/n_rows, and the Expand-free executed plan. */
  def qProfileApprox: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val agg = li.agg(
      count(lit(1)).as("n_rows"),
      approx_count_distinct(col("l_returnflag"), 0.01).as("d_rf"),
      min(col("l_returnflag")).as("mn_rf"), max(col("l_returnflag")).as("mx_rf"),
      approx_count_distinct(col("l_linestatus"), 0.01).as("d_ls"),
      min(col("l_linestatus")).as("mn_ls"), max(col("l_linestatus")).as("mx_ls"),
      approx_count_distinct(col("l_shipdate"), 0.01).as("d_sd"),
      date_format(min(col("l_shipdate")), "yyyy-MM-dd HH:mm:ss").as("mn_sd"),
      date_format(max(col("l_shipdate")), "yyyy-MM-dd HH:mm:ss").as("mx_sd"),
      approx_count_distinct(col("l_quantity"), 0.01).as("d_q"),
      min(col("l_quantity")).cast("long").cast("string").as("mn_q"),
      max(col("l_quantity")).cast("long").cast("string").as("mx_q"),
      approx_count_distinct(col("l_suppkey"), 0.01).as("d_sk"),
      min(col("l_suppkey")).cast("string").as("mn_sk"),
      max(col("l_suppkey")).cast("string").as("mx_sk"))
    agg.select(col("n_rows"), explode(array(
        struct(lit("l_returnflag").as("col_name"), col("d_rf").as("n_distinct"),
          col("mn_rf").as("min_val"), col("mx_rf").as("max_val")),
        struct(lit("l_linestatus").as("col_name"), col("d_ls").as("n_distinct"),
          col("mn_ls").as("min_val"), col("mx_ls").as("max_val")),
        struct(lit("l_shipdate").as("col_name"), col("d_sd").as("n_distinct"),
          col("mn_sd").as("min_val"), col("mx_sd").as("max_val")),
        struct(lit("l_quantity").as("col_name"), col("d_q").as("n_distinct"),
          col("mn_q").as("min_val"), col("mx_q").as("max_val")),
        struct(lit("l_suppkey").as("col_name"), col("d_sk").as("n_distinct"),
          col("mn_sk").as("min_val"), col("mx_sk").as("max_val")))).as("p"))
      .select(col("p.col_name").as("col_name"), col("n_rows"),
        col("p.n_distinct").as("n_distinct"), col("p.min_val").as("min_val"),
        col("p.max_val").as("max_val"))
      .orderBy(col("col_name"))
  }

  val qProfileSql: String =
    """WITH a AS (
      |  SELECT count(*) AS n_rows,
      |    count(DISTINCT l_returnflag) AS d_rf, min(l_returnflag) AS mn_rf, max(l_returnflag) AS mx_rf,
      |    count(DISTINCT l_linestatus) AS d_ls, min(l_linestatus) AS mn_ls, max(l_linestatus) AS mx_ls,
      |    count(DISTINCT l_shipdate) AS d_sd,
      |    strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S') AS mn_sd,
      |    strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S') AS mx_sd,
      |    count(DISTINCT l_quantity) AS d_q,
      |    CAST(CAST(min(l_quantity) AS BIGINT) AS VARCHAR) AS mn_q,
      |    CAST(CAST(max(l_quantity) AS BIGINT) AS VARCHAR) AS mx_q,
      |    count(DISTINCT l_suppkey) AS d_sk,
      |    CAST(min(l_suppkey) AS VARCHAR) AS mn_sk, CAST(max(l_suppkey) AS VARCHAR) AS mx_sk
      |  FROM lineitem)
      |SELECT col_name, n_rows, n_distinct, min_val, max_val FROM (
      |  SELECT 'l_returnflag' AS col_name, n_rows, d_rf AS n_distinct, mn_rf AS min_val, mx_rf AS max_val FROM a
      |  UNION ALL SELECT 'l_linestatus', n_rows, d_ls, mn_ls, mx_ls FROM a
      |  UNION ALL SELECT 'l_shipdate', n_rows, d_sd, mn_sd, mx_sd FROM a
      |  UNION ALL SELECT 'l_quantity', n_rows, d_q, mn_q, mx_q FROM a
      |  UNION ALL SELECT 'l_suppkey', n_rows, d_sk, mn_sk, mx_sk FROM a)
      |ORDER BY col_name""".stripMargin

  /** Shuffle-skew advisor for a join/aggregation key — the census a
    * 100 TB pipeline runs BEFORE picking a salting factor (the
    * ev_salted_agg treatment): the top-10 hottest keys by row mass,
    * each with its corpus share and the salt factor that would level
    * its shuffle partition back to the average load at P = 32 reducer
    * partitions (salt = ⌈n_key · P / n_total⌉, floored at 1 — a key
    * carrying 3 partitions' worth of rows gets split 3 ways). The
    * reference's loader sizes its sinks by static partition count;
    * this is the data-driven upgrade an analytics engine owes its
    * operators.
    *
    * Scale: one partial-aggregated pass to per-key counts, the top-10
    * via TakeOrderedAndProject (per-partition local top, never a
    * global sort), totals broadcast; the rank window orders 10 rows. */
  def qSkewAdvisor: Q = (s, d) => {
    val counts = Tables.events(s, d)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
    val tot = counts.agg(sum(col("n_events")).as("n_total"),
      count(lit(1)).as("n_keys"))
    val idiv = graft.plans.DistributedRank.idiv _
    counts.orderBy(col("n_events").desc, col("user_id")).limit(10)
      .crossJoin(broadcast(tot))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_events").desc, col("user_id"))).cast("long"))
      .select(col("rank"), col("user_id"), col("n_events"),
        col("n_total"), col("n_keys"),
        (floor(col("n_events") / col("n_total") * 1e6 + 0.5) / 1e6).as("share"),
        greatest(lit(1L),
          idiv(col("n_events") * 32 + col("n_total") - 1, col("n_total")))
          .as("salt_factor"))
      .orderBy(col("rank"))
  }

  val qSkewAdvisorSql: String =
    """WITH c AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY 1),
      |t AS (SELECT sum(n_events)::BIGINT AS n_total, count(*) AS n_keys FROM c),
      |top AS (SELECT user_id, n_events FROM c ORDER BY n_events DESC, user_id LIMIT 10)
      |SELECT row_number() OVER (ORDER BY n_events DESC, user_id) AS rank,
      |  user_id, n_events, n_total, n_keys,
      |  floor(n_events / n_total * 1e6 + 0.5) / 1e6 AS share,
      |  greatest(1, (n_events * 32 + n_total - 1) // n_total) AS salt_factor
      |FROM top CROSS JOIN t ORDER BY rank""".stripMargin

  def queries: Map[String, Q] = Map(
    "q_skew_advisor" -> qSkewAdvisor,
    "q_profile" -> qProfile,
    "q_profile_approx" -> qProfileApprox,
    "q_moments" -> qMoments,
    "q_regr" -> qRegr,
    "q_mode" -> qMode,
    "q_bit_agg" -> qBitAgg,
    "q_gaps_islands" -> qGapsIslands)

  def oracleSql: Map[String, String] = Map(
    "q_skew_advisor" -> qSkewAdvisorSql,
    "q_profile" -> qProfileSql,
    "q_moments" -> qMomentsSql,
    "q_regr" -> qRegrSql,
    "q_mode" -> qModeSql,
    "q_bit_agg" -> qBitAggSql,
    "q_gaps_islands" -> qGapsIslandsSql)
}
