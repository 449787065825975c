package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins (SURVEY.md §2c),
  * composed from existing ops instead of naive inequality joins — the
  * preference order for custom semantics (compose > custom plan node).
  *
  *  - As-of join: each left row matched to the latest right row at or
  *    before its timestamp. The classic implementation is a range join
  *    (O(n·m) comparisons); here it's the union-and-carry pattern — tag
  *    both sides, union, one window pass per key carrying the last seen
  *    right-side attributes forward. One shuffle on the join key, linear
  *    work, no range explosion at 100 TB.
  *  - Range join: count right rows inside a time window around each left
  *    row. Naive is a per-key cross join; here timestamps are bucketed to
  *    window-width bins so each left row probes exactly 2 (key, bin)
  *    buckets, then the exact range predicate filters inside the bucket —
  *    the bin join bounds candidates the same way LSH bounds dedup pairs.
  */
object Joins {

  type Q = (SparkSession, String) => DataFrame

  /** As-of join: for every click, the most recent view (id + ts) of the
    * same user at or before the click — deterministic ties: among views
    * sharing a (user, ts), the max event_id wins.
    *
    * ONE tagged scan (event_type IN (view, click)), not a union of two
    * filtered scans: the window orders by (ts, kind, event_id) so at any
    * click row, `last(view_id, ignoreNulls)` is the max-ts view ≤ the
    * click — and within equal view timestamps the event_id order makes
    * "last" the max event_id, which IS the dedup the old two-scan shape
    * ran as a separate groupBy. At equal ts the view (kind 0) sorts
    * before the click → "at or before" stays inclusive. */
  def evAsofJoin: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("ts"),
        when(col("event_type") === "view", 0).otherwise(1).as("kind"),
        col("event_id"),
        when(col("event_type") === "view", col("event_id")).as("view_id"),
        when(col("event_type") === "view", col("ts")).as("view_ts"))
      .withColumn("last_view_ts", last(col("view_ts"), ignoreNulls = true).over(w))
      .withColumn("last_view_id", last(col("view_id"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("last_view_ts"), col("last_view_id"))
      .orderBy(col("event_id"))
  }

  val evAsofJoinSql: String =
    """WITH v AS (
      |  SELECT user_id, ts::TIMESTAMP AS vts, max(event_id) AS view_id
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
      |c AS (
      |  SELECT event_id, user_id, ts::TIMESTAMP AS cts
      |  FROM events WHERE event_type = 'click'),
      |lv AS (
      |  SELECT c.event_id, c.user_id, c.cts,
      |    (SELECT max(v.vts) FROM v WHERE v.user_id = c.user_id AND v.vts <= c.cts) AS last_view_ts
      |  FROM c)
      |SELECT lv.event_id, lv.user_id, lv.cts AS ts, lv.last_view_ts,
      |  v.view_id AS last_view_id
      |FROM lv LEFT JOIN v ON v.user_id = lv.user_id AND v.vts = lv.last_view_ts
      |ORDER BY event_id""".stripMargin

  /** Range join: for every error, how many clicks the same user made in
    * the preceding 10 minutes (inclusive of the error instant). Bucketed:
    * clicks keyed by 10-min bin, each error probes its bin and the one
    * before, exact (t-10min, t] predicate applied inside the bucket.
    *
    * The probe join is LEFT OUTER so zero-click errors survive as
    * unmatched probe rows and need no join back to the error set — the
    * inner-join + join-back shape scanned the error slice twice. A click
    * bucket equi-matches exactly one of an error's two probe bins, so
    * counting matched click rows per error never double-counts. */
  def evRangeJoin: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val binUs = 600000000L // 10 min in µs = the window width, so 2 probes suffice
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        (unix_micros(col("ts")) / binUs).cast("long").as("c_bin"))
    val probes = ev.filter(col("event_type") === "error")
      .withColumn("e_bin", (unix_micros(col("ts")) / binUs).cast("long"))
      .select(col("event_id"), col("user_id"), col("ts"),
        explode(array(col("e_bin") - 1, col("e_bin"))).as("p_bin"))
    probes
      .join(clicks, col("user_id") === col("c_user") && col("p_bin") === col("c_bin") &&
        col("c_ts") <= col("ts") && col("c_ts") > col("ts") - expr("INTERVAL 10 MINUTES"),
        "left")
      .groupBy(col("event_id"), col("user_id"), col("ts"))
      .agg(count(col("c_user")).as("n_recent_clicks"))
      .orderBy(col("event_id"))
  }

  val evRangeJoinSql: String =
    """SELECT e.event_id, e.user_id, e.ts::TIMESTAMP AS ts,
      |  count(c.user_id) AS n_recent_clicks
      |FROM events e LEFT JOIN events c
      |  ON c.event_type = 'click' AND c.user_id = e.user_id
      |  AND c.ts::TIMESTAMP <= e.ts::TIMESTAMP
      |  AND c.ts::TIMESTAMP > e.ts::TIMESTAMP - INTERVAL 10 MINUTE
      |WHERE e.event_type = 'error'
      |GROUP BY 1, 2, 3
      |ORDER BY 1""".stripMargin

  /** The single-scan funnel frame shared by [[evFunnel]] and
    * [[evFunnelTiming]]: per user, the first view, the first click
    * at-or-after that view, and the first purchase at-or-after that
    * click (nulls where a stage was never reached).
    *
    * ONE corpus pass: events shuffle once on user_id and sort once by
    * (ts, stage); two running-min window columns carry the qualification
    * forward — at any row, `runV` is the user's first view so far (in
    * time order, the first view overall once one is seen), so a click
    * qualifies iff `ts ≥ runV`; `runC` is the first qualifying click so
    * far, qualifying purchases the same way. Stage rank breaks ts ties
    * (view < click < purchase) so an equal-timestamp upstream event is
    * visible to the row that needs it, matching the oracle's `ts ≥`
    * semantics. Both window specs and the final keyed agg share the
    * user_id partitioning — Spark plans one exchange, one sort.
    *
    * The naive formulation (each stage = keyed agg + join back to
    * events) re-scans the corpus per stage — 6 scans for the three-stage
    * count query; this frame does it in 1. */
  private def funnelFrame(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .filter(col("event_type").isin("view", "click", "purchase"))
    val stage = when(col("event_type") === "view", 0)
      .when(col("event_type") === "click", 1).otherwise(2)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), stage)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val runV = min(when(col("event_type") === "view", col("ts"))).over(w)
    ev.withColumn("click_cand",
        when(col("event_type") === "click" && col("ts") >= runV, col("ts")))
      .withColumn("purch_cand",
        when(col("event_type") === "purchase" &&
          col("ts") >= min(col("click_cand")).over(w), col("ts")))
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("ts"))).as("t_view"),
        min(col("click_cand")).as("t_click"),
        min(col("purch_cand")).as("t_purchase"))
  }

  /** Conversion funnel counts: users who viewed, then clicked
    * at-or-after their first view, then purchased at-or-after that
    * click. One corpus scan via [[funnelFrame]]. */
  def evFunnel: Q = (s, d) =>
    funnelFrame(s, d).agg(
      count(col("t_view")).as("n_viewed"),
      count(col("t_click")).as("n_clicked_after"),
      count(col("t_purchase")).as("n_purchased_after"))

  val evFunnelSql: String =
    """WITH v AS (
      |  SELECT user_id, min(ts::TIMESTAMP) AS t_view
      |  FROM events WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, min(e.ts::TIMESTAMP) AS t_click
      |  FROM events e JOIN v ON v.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND e.ts::TIMESTAMP >= v.t_view
      |  GROUP BY 1),
      |p AS (
      |  SELECT e.user_id, min(e.ts::TIMESTAMP) AS t_purchase
      |  FROM events e JOIN c ON c.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts::TIMESTAMP >= c.t_click
      |  GROUP BY 1)
      |SELECT (SELECT count(*) FROM v) AS n_viewed,
      |  (SELECT count(*) FROM c) AS n_clicked_after,
      |  (SELECT count(*) FROM p) AS n_purchased_after""".stripMargin

  /** Funnel timing: latency distribution between funnel stages for users
    * who complete view → click → purchase in order (first view, first
    * click ≥ view, first purchase ≥ click — the same stage chain as
    * [[evFunnel]]). Reports converter count plus median/p90 seconds for
    * view→click, click→purchase and end-to-end — the numbers behind
    * "how long does conversion take", which the funnel counts alone
    * don't answer.
    *
    * Scale: one corpus scan via [[funnelFrame]] (shared shuffle + sort
    * on user_id), converters filtered to `t_purchase` non-null, then ONE
    * global exact percentile over the converter latencies —
    * converter-sized, not event-sized, so the single-reducer percentile
    * is bounded by the funnel's smallest stage.
    *
    * Cross-engine determinism: percentiles run over the INTEGER
    * microsecond deltas (exact in both engines), and the interpolated
    * value's TRUE form is k + j/10 µs (the q=0.5/0.9 weights are exact
    * tenths), so floorRound(·, 1) recovers it exactly on both sides no
    * matter whose interpolation formula computed it (computed error
    * ~1e-9 ≪ the 0.05 margin; the old seconds-valued percentile had a
    * 7-dp true value whose 6-dp display round sat ON the cross-engine
    * boundary). The /1e6 conversion and final 6-dp floor then run on
    * bit-identical doubles. */
  def evFunnelTiming: Q = (s, d) => {
    def pct(c: String, q: String) = Exact.floorRound(
      Exact.floorRound(expr(s"percentile($c, $q)"), 1) / 1e6, 6)
    funnelFrame(s, d)
      .filter(col("t_purchase").isNotNull)
      .select(
        (unix_micros(col("t_click")) - unix_micros(col("t_view"))).as("us_vc"),
        (unix_micros(col("t_purchase")) - unix_micros(col("t_click"))).as("us_cp"),
        (unix_micros(col("t_purchase")) - unix_micros(col("t_view"))).as("us_vp"))
      .agg(count(lit(1)).as("n_converters"),
        pct("us_vc", "0.5").as("p50_view_click_s"),
        pct("us_vc", "0.9").as("p90_view_click_s"),
        pct("us_cp", "0.5").as("p50_click_purchase_s"),
        pct("us_cp", "0.9").as("p90_click_purchase_s"),
        pct("us_vp", "0.5").as("p50_total_s"),
        pct("us_vp", "0.9").as("p90_total_s"))
  }

  val evFunnelTimingSql: String =
    """WITH v AS (
      |  SELECT user_id, min(ts::TIMESTAMP) AS t_view
      |  FROM events WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, v.t_view, min(e.ts::TIMESTAMP) AS t_click
      |  FROM events e JOIN v ON v.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND e.ts::TIMESTAMP >= v.t_view
      |  GROUP BY 1, 2),
      |p AS (
      |  SELECT e.user_id, c.t_view, c.t_click, min(e.ts::TIMESTAMP) AS t_purchase
      |  FROM events e JOIN c ON c.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts::TIMESTAMP >= c.t_click
      |  GROUP BY 1, 2, 3),
      |lat AS (
      |  SELECT (epoch_us(t_click) - epoch_us(t_view)) AS us_vc,
      |    (epoch_us(t_purchase) - epoch_us(t_click)) AS us_cp,
      |    (epoch_us(t_purchase) - epoch_us(t_view)) AS us_vp
      |  FROM p)
      |SELECT count(*) AS n_converters,
      |  floor((floor(quantile_cont(us_vc, 0.5) * 10 + 0.5) / 10 / 1e6) * 1000000 + 0.5) / 1000000 AS p50_view_click_s,
      |  floor((floor(quantile_cont(us_vc, 0.9) * 10 + 0.5) / 10 / 1e6) * 1000000 + 0.5) / 1000000 AS p90_view_click_s,
      |  floor((floor(quantile_cont(us_cp, 0.5) * 10 + 0.5) / 10 / 1e6) * 1000000 + 0.5) / 1000000 AS p50_click_purchase_s,
      |  floor((floor(quantile_cont(us_cp, 0.9) * 10 + 0.5) / 10 / 1e6) * 1000000 + 0.5) / 1000000 AS p90_click_purchase_s,
      |  floor((floor(quantile_cont(us_vp, 0.5) * 10 + 0.5) / 10 / 1e6) * 1000000 + 0.5) / 1000000 AS p50_total_s,
      |  floor((floor(quantile_cont(us_vp, 0.9) * 10 + 0.5) / 10 / 1e6) * 1000000 + 0.5) / 1000000 AS p90_total_s
      |FROM lat""".stripMargin

  def queries: Map[String, Q] = Map(
    "ev_asof_join" -> evAsofJoin,
    "ev_range_join" -> evRangeJoin,
    "ev_funnel" -> evFunnel,
    "ev_funnel_timing" -> evFunnelTiming)

  def oracleSql: Map[String, String] = Map(
    "ev_asof_join" -> evAsofJoinSql,
    "ev_range_join" -> evRangeJoinSql,
    "ev_funnel" -> evFunnelSql,
    "ev_funnel_timing" -> evFunnelTimingSql)
}
