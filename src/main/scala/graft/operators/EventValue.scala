package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Marketing/value analytics over the event stream (SURVEY.md §2c,
  * round-5 tranche): last-touch attribution and RFM segmentation — the
  * two classic "who gets credit / who matters" reductions a loader's
  * downstream warehouse runs on exactly the (user, ts, type, value)
  * shape the reference streams in (`model/StreamRecord` payloads keyed
  * by user and event time).
  *
  * Both are built on the engine's established idioms: the union-and-carry
  * window (ev_asof_join) instead of an event-level self-join, the
  * broadcast-scalar corpus reference instant (ev_decay), exact-decimal
  * money sums (Exact idiom 1), and the deterministic global-NTILE
  * contract (q_ntile: a window over a per-user AGGREGATE, never over raw
  * events; at 100 TB the same contract is served by a range-partitioned
  * rank against a sampled CDF).
  */
object EventValue {

  type Q = (SparkSession, String) => DataFrame

  private val DayUs = 86400000000L

  /** Last-touch attribution: each purchase credits the user's most recent
    * preceding view/click within 24 h, else "none". One window pass per
    * user (ordered by (ts, event_id) — a total order, so "most recent" is
    * unambiguous), carrying the touch row's instant and type as two
    * ignore-nulls `last` columns that by construction come from the same
    * row. No purchase×touch self-join ever materializes: cost is one
    * user-keyed shuffle + sort, the asof-join discipline. */
  def evAttribution: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col("event_type").isin("view", "click")
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("us"))
      .withColumn("touch_us", last(when(isTouch, col("us")), ignoreNulls = true).over(w))
      .withColumn("carried_type", last(when(isTouch, col("event_type")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        when(col("touch_us").isNotNull && col("touch_us") >= col("us") - DayUs,
          col("carried_type")).otherwise(lit("none")).as("touch_type"),
        col("user_id"), col("value"))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_purchases"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(Exact.dec2(col("value"))), 2).cast("double").as("revenue"))
      .orderBy(col("touch_type"))
  }

  val evAttributionSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, event_type, value, epoch_us(ts::TIMESTAMP) AS us
       |  FROM events),
       |t AS (
       |  SELECT *,
       |    last_value(CASE WHEN event_type IN ('view','click') THEN us END IGNORE NULLS)
       |      OVER w AS touch_us,
       |    last_value(CASE WHEN event_type IN ('view','click') THEN event_type END IGNORE NULLS)
       |      OVER w AS carried_type
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
       |SELECT CASE WHEN touch_us IS NOT NULL AND touch_us >= us - $DayUs
       |         THEN carried_type ELSE 'none' END AS touch_type,
       |  count(*) AS n_purchases, count(DISTINCT user_id) AS n_users,
       |  round(sum(value::DECIMAL(12,2)), 2)::DOUBLE AS revenue
       |FROM t WHERE event_type = 'purchase'
       |GROUP BY 1 ORDER BY touch_type""".stripMargin

  /** RFM segmentation: per user — Recency (whole days idle vs the corpus
    * max instant; truncating integer division, ≡ floor since idle ≥ 0),
    * Frequency (event count),
    * Monetary (exact-decimal value sum) — each scored into quintiles
    * (score 1 = best) with user_id tiebreak, then rolled up to segment
    * counts and revenue. The corpus reference instant is a broadcast
    * scalar off the per-user aggregate; the three quintile assignments
    * ride ONE fused [[graft.plans.DistributedRank]] pass over a
    * dimension-exploded frame — NOT three global `Window.orderBy`
    * passes, whose physical plan would sort every user on ONE task,
    * three times (the r5 verdict's named scale hazard at 10⁸–10⁹
    * users). */
  def evRfm: Q = (s, d) => {
    // ONE corpus scan: the per-user aggregate is localCheckpoint-pinned
    // (the dd_ppjoin idiom — O(users) rows, orders of magnitude below
    // the corpus) because the reference-scalar branch and the exploded
    // rank frame both read it. Lazy branches would each re-derive it
    // with their own column pruning — structurally distinct subtrees
    // AQE's ReuseExchange cannot dedup (audited: 3 events scans without
    // the pin). Lazy pin: materializes inside the first job instead of
    // a blocking plan-time job; both consumers still share one RDD.
    val perUser0 = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(max(unix_micros(col("ts"))).as("last_us"),
        count(lit(1)).as("freq"),
        sum(Exact.dec2(col("value"))).as("mon"))
      .localCheckpoint(false)
    val ref = perUser0.agg(max(col("last_us")).as("__ref_us"))
    val perUser = perUser0.crossJoin(broadcast(ref))
      // integer floor division on both engines (truncating here is fine:
      // idle_us ≥ 0 by construction, so floor ≡ truncate) — a double
      // quotient + cast would truncate in Spark but ROUND in DuckDB's
      // CAST, a half-day-boundary hash mismatch
      .withColumn("rec_days", expr(s"(__ref_us - last_us) div $DayUs"))
      .drop("__ref_us", "last_us")
    // ONE fused rank pass over all three dimensions, not three branches
    // (r7; the r6 shape ran three concurrent DistributedRanks + three
    // user-joins — correct and parallel, but ~15 small stages of flat
    // scheduler overhead at toy SF). Each user explodes into three
    // (dim, sortval) rows — descending dimensions negate their value, so
    // one ascending range sort on (dim, sortval, user_id) totals all
    // three orders — and a single global rank over the 3N-row frame
    // yields every per-dim rank arithmetically: each dim holds exactly
    // N = total/3 rows, so rank_in_dim = r − dim·N and NTILE is
    // record-local integer math. The three join-backs collapse into one
    // pivot aggregate on user_id (mon rides the exploded rows). Bytes
    // shuffled are unchanged (3 × N two-column rows before, one 3N-row
    // frame now); stages drop ~3×.
    val dr = graft.plans.DistributedRank
    // sv is a sort key only (never output), so its scale is chosen for
    // HEADROOM, not precision: decimal(38,2) matches mon's native scale
    // (sum of dec2 → decimal(22,2)) and leaves 36 integer digits — a
    // scale-6 cast would shave that to 32 and, under non-ANSI, overflow
    // to NULL sv, silently reordering that user instead of erroring.
    // rec_days and freq are exact Longs (≤ 19 digits) at any scale here.
    val exploded = perUser.select(col("user_id"), col("mon"), explode(array(
        struct(lit(0L).as("dim"), col("rec_days").cast("decimal(38,2)").as("sv")),
        struct(lit(1L).as("dim"), (-col("freq")).cast("decimal(38,2)").as("sv")),
        struct(lit(2L).as("dim"), (-col("mon")).cast("decimal(38,2)").as("sv"))))
        .as("x"))
      .select(col("user_id"), col("mon"), col("x.dim").as("dim"), col("x.sv").as("sv"))
    val nu = dr.idiv(col("__gr_n3"), lit(3L))
    // sv ASC NULLS LAST: the pre-fusion keys sorted descending dims with
    // Spark's DESC default (NULLS LAST), and negation alone would flip a
    // NULL mon from the worst quintile to the best (ASC default is
    // NULLS FIRST) — divergent from the oracle's ORDER BY mon DESC
    dr.withGlobalRankAndTotal(exploded,
        Seq(col("dim"), col("sv").asc_nulls_last, col("user_id")), "__gr_r3", "__gr_n3")
      .withColumn("score",
        dr.ntileFromRank(col("__gr_r3") - col("dim") * nu, nu, 5))
      .groupBy(col("user_id"))
      .agg(max(when(col("dim") === 0L, col("score"))).as("r_score"),
        max(when(col("dim") === 1L, col("score"))).as("f_score"),
        max(when(col("dim") === 2L, col("score"))).as("m_score"),
        max(col("mon")).as("mon"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_users"),
        round(sum(col("mon")), 2).cast("double").as("revenue"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  val evRfmSql: String =
    s"""WITH e AS (SELECT user_id, value, epoch_us(ts::TIMESTAMP) AS us FROM events),
       |ref AS (SELECT max(us) AS ref_us FROM e),
       |pu AS (
       |  SELECT user_id,
       |    (ref_us - max(us)) // $DayUs AS rec_days,
       |    count(*) AS freq, sum(value::DECIMAL(12,2)) AS mon
       |  FROM e CROSS JOIN ref GROUP BY user_id, ref_us),
       |sc AS (
       |  SELECT CAST(ntile(5) OVER (ORDER BY rec_days, user_id) AS BIGINT) AS r_score,
       |    CAST(ntile(5) OVER (ORDER BY freq DESC, user_id) AS BIGINT) AS f_score,
       |    CAST(ntile(5) OVER (ORDER BY mon DESC, user_id) AS BIGINT) AS m_score,
       |    mon
       |  FROM pu)
       |SELECT r_score, f_score, m_score, count(*) AS n_users,
       |  round(sum(mon), 2)::DOUBLE AS revenue
       |FROM sc GROUP BY 1, 2, 3 ORDER BY r_score, f_score, m_score""".stripMargin

  /** Seasonal-naive forecast with backtest — the capacity-planning loop
    * run on ingest volume: split the corpus 80/20 by hour, model each
    * (type, day-of-week, hour-of-day) slot as its train-period mean
    * hourly count, predict the test hours, and report per-type MAE and
    * bias. Everything is INTEGER: hour index = epoch-micros div 3600e6,
    * dow/hod derived by integer arithmetic (epoch day 0 = Thursday ⇒
    * dow = (day+4) mod 7 — Spark's dayofweek and DuckDB's dow disagree
    * on conventions, integer math can't). `div`/`//` TRUNCATE toward
    * zero on both engines (parity holds either way), so day and the
    * mod-7/mod-24 buckets are computed pmod-style — non-negative and
    * calendar-correct even for pre-epoch timestamps, where truncating
    * arithmetic would silently mislabel dow/hod. Predictions held
    * fixed-point
    * ×100 via `div`. The hour spine is DENSIFIED per type (sequence
    * explode from broadcast corpus bounds — the ev_resample pattern):
    * zero-event hours are observations for both model and error, not
    * gaps (the ev_trend lesson). Scale: one corpus hash-agg to (type,
    * hour); spine, slots, and the backtest all run on hour-bucket-sized
    * frames. */
  def evForecast: Q = (s, d) => {
    // ONE corpus scan: bounds and the type list both derive from the
    // (type, hour) bucket table, which is localCheckpoint-pinned because
    // three plan branches read it and nothing about its lineage is
    // reusable across them (audited: the naive formulation re-scanned
    // events 4×). The bucket table is |types|·|hours| rows — kilobytes
    // at any corpus size, the cheapest thing in the plan to pin.
    val hourCounts = Tables.events(s, d)
      .select(expr("unix_micros(ts) div 3600000000").as("h"), col("event_type"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val bounds = hourCounts.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    val types = hourCounts.select(col("event_type")).distinct()
    val dense = types.crossJoin(broadcast(bounds))
      .select(col("event_type"), col("h0"), col("h1"),
        explode(sequence(col("h0"), col("h1"))).as("h"))
      .join(hourCounts, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"), col("h0"), col("h1"),
        coalesce(col("cnt"), lit(0L)).as("cnt"),
        expr("h0 + ((h1 - h0 + 1) * 8) div 10").as("split_h"),
        // floor-div day via pmod (exact multiple ⇒ truncate ≡ floor),
        // then pmod again so dow/hod land in [0,7)/[0,24) at any epoch
        expr("pmod(((h - pmod(h, 24)) div 24) + 4, 7)").as("dow"),
        expr("pmod(h, 24)").as("hod"))
    val model = dense.filter(col("h") < col("split_h"))
      .groupBy(col("event_type"), col("dow"), col("hod"))
      .agg(expr("(100 * sum(cnt)) div count(*)").as("pred_fp"))
    dense.filter(col("h") >= col("split_h"))
      .join(model, Seq("event_type", "dow", "hod"), "left")
      .withColumn("p", coalesce(col("pred_fp"), lit(0L)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_test_hours"),
        sum(col("cnt")).as("total_actual"),
        Exact.floorRound(
          sum(abs(lit(100) * col("cnt") - col("p"))).cast("double") / lit(100.0)
            / count(lit(1)), 4).as("mae"),
        Exact.floorRound(
          sum(lit(100) * col("cnt") - col("p")).cast("double") / lit(100.0)
            / count(lit(1)), 4).as("bias"))
      .orderBy(col("event_type"))
  }

  val evForecastSql: String =
    s"""WITH hc AS (
       |  SELECT event_type, epoch_us(ts::TIMESTAMP) // 3600000000 AS h, count(*) AS cnt
       |  FROM events GROUP BY 1, 2),
       |bounds AS (
       |  SELECT min(epoch_us(ts::TIMESTAMP) // 3600000000) AS h0,
       |    max(epoch_us(ts::TIMESTAMP) // 3600000000) AS h1
       |  FROM events),
       |types AS (SELECT DISTINCT event_type FROM events),
       |dense AS (
       |  SELECT t.event_type, s.h, b.h0, b.h1,
       |    coalesce(hc.cnt, 0) AS cnt,
       |    b.h0 + ((b.h1 - b.h0 + 1) * 8) // 10 AS split_h,
       |    ((((s.h - ((s.h % 24) + 24) % 24) // 24) + 4) % 7 + 7) % 7 AS dow,
       |    ((s.h % 24) + 24) % 24 AS hod
       |  FROM types t CROSS JOIN bounds b
       |  CROSS JOIN (SELECT unnest(generate_series(h0, h1)) AS h FROM bounds) s
       |  LEFT JOIN hc ON hc.event_type = t.event_type AND hc.h = s.h),
       |model AS (
       |  SELECT event_type, dow, hod, (100 * sum(cnt)) // count(*) AS pred_fp
       |  FROM dense WHERE h < split_h GROUP BY 1, 2, 3)
       |SELECT d.event_type, count(*) AS n_test_hours,
       |  CAST(sum(d.cnt) AS BIGINT) AS total_actual,
       |  ${Exact.floorRoundSql("sum(abs(100 * d.cnt - coalesce(m.pred_fp, 0)))::DOUBLE / 100.0 / count(*)", 4)} AS mae,
       |  ${Exact.floorRoundSql("sum(100 * d.cnt - coalesce(m.pred_fp, 0))::DOUBLE / 100.0 / count(*)", 4)} AS bias
       |FROM dense d LEFT JOIN model m
       |  ON m.event_type = d.event_type AND m.dow = d.dow AND m.hod = d.hod
       |WHERE d.h >= d.split_h
       |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin

  /** Session concurrency per hour — the interval-overlap census behind
    * capacity dashboards ("how many sessions were live at once"): build
    * gap-sessions exactly as `ev_sessions` does, then count each hour's
    * overlapping sessions. Overlap counting is BINNED, not swept: a
    * session joins every hour bucket its [start, end] span touches
    * (fanout = duration/hour, bounded by the 30-min-gap session
    * definition), so there is no global-order prefix sum — the same
    * reasoning as ev_range_join's window-width binning. One user-keyed
    * window builds sessions; the bucket join is hour-keyed. */
  def evConcurrency: Q = (s, d) => {
    // the ev_sessions session frame, verbatim (EventAnalytics.sessionized
    // is the one definition of the gap boundary)
    val sess = EventAnalytics.sessionized(
        Tables.events(s, d).select(col("user_id"), col("event_id"), col("ts")))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(unix_micros(col("ts"))).as("s_us"), max(unix_micros(col("ts"))).as("e_us"))
    sess
      .withColumn("hour", explode(sequence(
        expr("s_us div 3600000000"), expr("e_us div 3600000000"))))
      .groupBy(col("hour"))
      .agg(count(lit(1)).as("n_active"),
        countDistinct(col("user_id")).as("n_users"))
      .select(timestamp_micros(col("hour") * 3600000000L).as("hour_start"),
        col("n_active"), col("n_users"))
      .orderBy(col("hour_start"))
  }

  val evConcurrencySql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS us FROM events),
      |flagged AS (
      |  SELECT user_id, event_id, us,
      |    CASE WHEN lag(us, 1) OVER w IS NULL OR us - lag(us, 1) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |sess AS (
      |  SELECT user_id,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id, us
      |  FROM flagged),
      |iv AS (
      |  SELECT user_id, session_id, min(us) // 3600000000 AS h0, max(us) // 3600000000 AS h1
      |  FROM sess GROUP BY 1, 2),
      |hit AS (SELECT user_id, unnest(generate_series(h0, h1)) AS hour FROM iv)
      |SELECT make_timestamp(hour * 3600000000) AS hour_start,
      |  count(*) AS n_active, count(DISTINCT user_id) AS n_users
      |FROM hit GROUP BY 1 ORDER BY hour_start""".stripMargin

  /** Cumulative distinct users by day — running COUNT(DISTINCT) made
    * distributable via the first-seen trick: a distinct window count is
    * not partial-aggregatable, but "new users per day" (min event day
    * per user) is a plain keyed aggregate, and the cumulative sum runs
    * over the tiny day table. The growth curve every ingest dashboard
    * draws. */
  def evCumulativeUsers: Q = (s, d) => {
    val dayW = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(min(expr("unix_micros(ts) div 86400000000")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n_new_users"))
      .withColumn("n_cumulative", sum(col("n_new_users")).over(dayW))
      .select(timestamp_micros(col("day") * 86400000000L).as("day_start"),
        col("n_new_users"), col("n_cumulative"))
      .orderBy(col("day_start"))
  }

  val evCumulativeUsersSql: String =
    """WITH fs AS (
      |  SELECT user_id, min(epoch_us(ts::TIMESTAMP) // 86400000000) AS day
      |  FROM events GROUP BY 1),
      |nd AS (SELECT day, count(*) AS n_new_users FROM fs GROUP BY 1)
      |SELECT make_timestamp(day * 86400000000) AS day_start, n_new_users,
      |  CAST(sum(n_new_users) OVER (ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_cumulative
      |FROM nd ORDER BY day_start""".stripMargin

  /** Pairwise time-series similarity across the event types: Pearson
    * correlation of the DENSIFIED hourly count series (zero hours are
    * observations — the ev_trend/ev_forecast lesson) for every type
    * pair, from exact integer power sums (the q_regr closed form), with
    * a mirrored zero-variance guard. The distributed-similarity-search
    * shape the streaming-similarity literature targets (EDBT'19/SIGMOD
    * '20 retrieved set): align series on the time key, reduce each pair
    * to five exact sums, never materialize the series driver-side.
    * Scale: the hour-keyed self-join fans out |types|² per hour bucket —
    * for thousands of series swap the all-pairs for the sign-LSH
    * bucketing the ANN suite uses; the per-pair sum reduction is
    * unchanged. */
  def evTsSimilarity: Q = (s, d) => {
    val hourCounts = Tables.events(s, d)
      .select(expr("unix_micros(ts) div 3600000000").as("h"), col("event_type"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val bounds = hourCounts.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    val dense = hourCounts.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"), explode(sequence(col("h0"), col("h1"))).as("h"))
      .join(hourCounts, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val paired = dense.select(col("event_type").as("type_a"), col("h"), col("cnt").as("ca"))
      .join(dense.select(col("event_type").as("type_b"), col("h"), col("cnt").as("cb")), "h")
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      // cast to decimal BEFORE the products: a long×long product of two
      // ≥3e9 hourly counts overflows BIGINT before an after-the-fact cast
      // could save it (ANSI throw / silent wrap) — exactly the corpus
      // size this operator's scale note targets
      .agg(count(lit(1)).as("n"),
        sum(dec(col("ca"))).as("sa"), sum(dec(col("cb"))).as("sb"),
        sum(dec(col("ca")) * dec(col("ca"))).as("saa"),
        sum(dec(col("cb")) * dec(col("cb"))).as("sbb"),
        sum(dec(col("ca")) * dec(col("cb"))).as("sab"))
      .select(col("type_a"), col("type_b"), col("n"),
        col("n").cast("double").as("nd"),
        col("sa").cast("double").as("sa"), col("sb").cast("double").as("sb"),
        col("saa").cast("double").as("saa"), col("sbb").cast("double").as("sbb"),
        col("sab").cast("double").as("sab"))
    paired.select(col("type_a"), col("type_b"), col("n"),
        when(
          (col("nd") * col("saa") - col("sa") * col("sa")) > 0 &&
            (col("nd") * col("sbb") - col("sb") * col("sb")) > 0,
          Exact.floorRound(
            (col("nd") * col("sab") - col("sa") * col("sb"))
              / (sqrt(col("nd") * col("saa") - col("sa") * col("sa"))
                * sqrt(col("nd") * col("sbb") - col("sb") * col("sb"))), 6))
          .as("corr"))
      .orderBy(col("type_a"), col("type_b"))
  }

  val evTsSimilaritySql: String =
    s"""WITH hc AS (
       |  SELECT event_type, epoch_us(ts::TIMESTAMP) // 3600000000 AS h, count(*) AS cnt
       |  FROM events GROUP BY 1, 2),
       |bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM hc),
       |dense AS (
       |  SELECT t.event_type, s.h, coalesce(hc.cnt, 0) AS cnt
       |  FROM (SELECT DISTINCT event_type FROM hc) t
       |  CROSS JOIN (SELECT unnest(generate_series(h0, h1)) AS h FROM bounds) s
       |  LEFT JOIN hc ON hc.event_type = t.event_type AND hc.h = s.h),
       |pairsum AS (
       |  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n,
       |    sum(CAST(a.cnt AS HUGEINT)) AS sa, sum(CAST(b.cnt AS HUGEINT)) AS sb,
       |    sum(CAST(a.cnt AS HUGEINT) * CAST(a.cnt AS HUGEINT)) AS saa,
       |    sum(CAST(b.cnt AS HUGEINT) * CAST(b.cnt AS HUGEINT)) AS sbb,
       |    sum(CAST(a.cnt AS HUGEINT) * CAST(b.cnt AS HUGEINT)) AS sab
       |  FROM dense a JOIN dense b ON a.h = b.h AND a.event_type < b.event_type
       |  GROUP BY 1, 2),
       |dd AS (
       |  SELECT type_a, type_b, n, n::DOUBLE AS nd, sa::DOUBLE AS sa, sb::DOUBLE AS sb,
       |    saa::DOUBLE AS saa, sbb::DOUBLE AS sbb, sab::DOUBLE AS sab
       |  FROM pairsum)
       |SELECT type_a, type_b, n,
       |  CASE WHEN (nd * saa - sa * sa) > 0 AND (nd * sbb - sb * sb) > 0
       |    THEN ${Exact.floorRoundSql("(nd * sab - sa * sb) / (sqrt(nd * saa - sa * sa) * sqrt(nd * sbb - sb * sb))", 6)}
       |  END AS corr
       |FROM dd ORDER BY type_a, type_b""".stripMargin

  /** Activity-concentration census: the exact Gini coefficient of
    * per-user event counts, per event type — "is this stream's volume
    * spread across the user base or is one whale generating it", the
    * one-number skew card that says whether per-user keyed work
    * (sessionization, RFM, attribution) will be balanced or hot. Gini is
    * over ACTIVE users (a user absent from a type contributes no row —
    * the zero-count tail is not part of the population), 0 = every
    * active user equally active, → 1 = one user owns the stream.
    *
    * Exact grouped-data identity, no per-user ranking: with the
    * ascending distinct activity values v_k, user counts n_k and
    * cumulative counts N_k, 2·Σᵢ rankᵢ·xᵢ = Σ_k v_k·n_k·(2·N_{k−1} + n_k + 1),
    * and G = 2S/(N·T) − (N+1)/N. All terms are integers folded in
    * decimal(38,0) (exact at any corpus size — v·n·2N is ~10²⁴ at 10⁹
    * users, far past long), so both engines see the identical rationals.
    *
    * Scale shape: one corpus pass into the (type, user) aggregate, a
    * second shrink to the (type, activity-value) HISTOGRAM — bounded by
    * the distinct per-user counts (max user activity), never by users —
    * and the rank window runs over that histogram, not the user base:
    * the per-type window partition is |distinct v| rows where a naive
    * per-user rank would be |users|/|types| (the exact low-cardinality
    * corpus-window hazard this repo eliminated in r7). */
  def evGini: Q = (s, d) => {
    val hist = Tables.events(s, d)
      .filter(col("user_id").isNotNull && col("event_type").isNotNull)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("v"))
      .groupBy(col("event_type"), col("v"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val twoS = sum((col("v").cast("decimal(38,0)") * col("n") *
      (lit(2) * (col("cumn") - col("n")) + col("n") + 1)))
    hist.withColumn("cumn", sum(col("n")).over(w))
      .groupBy(col("event_type"))
      .agg(sum(col("n")).as("n_users"),
        sum(col("v") * col("n")).as("n_events"),
        twoS.as("two_s"))
      .select(col("event_type"), col("n_users"), col("n_events"),
        Exact.floorRound(
          col("two_s").cast("double") /
            (col("n_users").cast("double") * col("n_events").cast("double")) -
            (col("n_users") + 1).cast("double") / col("n_users").cast("double"), 6)
          .as("gini"))
      .orderBy(col("event_type"))
  }

  val evGiniSql: String =
    s"""WITH pu AS (
       |  SELECT event_type, user_id, count(*) AS v
       |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
       |  GROUP BY 1, 2),
       |hist AS (SELECT event_type, v, count(*) AS n FROM pu GROUP BY 1, 2),
       |cum AS (
       |  SELECT event_type, v, n,
       |    sum(n) OVER (PARTITION BY event_type ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumn
       |  FROM hist),
       |agg AS (
       |  SELECT event_type,
       |    CAST(sum(n) AS BIGINT) AS n_users,
       |    CAST(sum(v * n) AS BIGINT) AS n_events,
       |    sum(v::HUGEINT * n * (2 * (cumn - n) + n + 1)) AS two_s
       |  FROM cum GROUP BY 1)
       |SELECT event_type, n_users, n_events,
       |  ${Exact.floorRoundSql(
            "two_s::DOUBLE / (n_users::DOUBLE * n_events::DOUBLE) " +
              "- CAST(n_users + 1 AS DOUBLE) / n_users::DOUBLE", 6)} AS gini
       |FROM agg ORDER BY event_type""".stripMargin

  /** Bot/automation census: the 25 most machine-regular users by
    * inter-arrival coefficient of variation — organic humans arrive
    * bursty (cv ≳ 1, exponential-ish gaps), schedulers and scrapers
    * arrive metronomically (cv → 0) — with the mean gap, the
    * zero-gap share (batched/replayed submissions) and event volume as
    * the supporting evidence columns. The training-data hygiene twin of
    * ta_hapax: this flags the USERS whose traffic is synthetic before
    * their events pollute behavioral corpora. Users need ≥ 10 events
    * (9 gaps) for a stable cv; all-simultaneous users (total gap 0,
    * cv undefined) are excluded — they show up in zero_gap_share of
    * the cap-t census instead.
    *
    * Exactness: gaps are INTEGER micros; Σg and Σg² fold exactly
    * (decimal(38,0)/HUGEINT — for non-negative gaps Σg² ≤ (Σg)² and
    * Σg is bounded by the corpus span ~10¹³ µs, so m·Σg² ≤ 10⁹·10²⁶
    * stays under 10³⁸), cv = √(m·Σg² − (Σg)²)/Σg is one sqrt and
    * one division of bit-identical doubles, ordering uses the ROUNDED
    * cv with a user_id tiebreak so the top-25 cut is cross-engine
    * deterministic.
    *
    * Scale shape: one corpus pass — the lag window partitions on
    * user_id (high-cardinality, AQE-balanceable) and the per-user
    * aggregate rides the same exchange; the top-25 is a
    * TakeOrderedAndProject, never a global sort. */
  def evBotCensus: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val gaps = Tables.events(s, d)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .withColumn("g", col("us") - lag(col("us"), 1).over(w))
    val a = gaps.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), count(col("g")).as("m"),
        sum(col("g")).as("sg"),
        sum(dec(col("g")) * col("g")).as("sg2"),
        sum(when(col("g") === 0, 1L).otherwise(0L)).as("zg"))
      .filter(col("m") >= 9 && col("sg") > 0)
    val d2 = (dec(col("m")) * col("sg2") - dec(col("sg")) * col("sg")).cast("double")
    a.select(col("user_id"), col("n").as("n_events"),
        Exact.floorRound(col("sg").cast("double") / col("m") / lit(1e6), 6)
          .as("mean_gap_s"),
        Exact.floorRound(sqrt(d2) / col("sg").cast("double"), 6).as("cv_gap"),
        Exact.floorRound(col("zg").cast("double") / col("m"), 6).as("zero_gap_share"))
      .orderBy(col("cv_gap"), col("user_id"))
      .limit(25)
  }

  val evBotCensusSql: String =
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts::TIMESTAMP) AS us, event_id
       |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
       |g AS (
       |  SELECT user_id,
       |    us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS g
       |  FROM e),
       |a AS (
       |  SELECT user_id, count(*) AS n, count(g) AS m,
       |    CAST(sum(g) AS BIGINT) AS sg,
       |    sum(g::HUGEINT * g) AS sg2,
       |    CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zg
       |  FROM g GROUP BY 1),
       |f AS (SELECT * FROM a WHERE m >= 9 AND sg > 0)
       |SELECT user_id, n AS n_events,
       |  ${Exact.floorRoundSql("sg::DOUBLE / m / 1e6", 6)} AS mean_gap_s,
       |  ${Exact.floorRoundSql(
            "sqrt((m::HUGEINT * sg2 - sg::HUGEINT * sg)::DOUBLE) / sg::DOUBLE", 6)} AS cv_gap,
       |  ${Exact.floorRoundSql("zg::DOUBLE / m", 6)} AS zero_gap_share
       |FROM f ORDER BY cv_gap, user_id LIMIT 25""".stripMargin

  /** Two-proportion A/B experiment readout — the decision table an
    * experimentation pipeline derives from the same event stream the
    * loader lands: users split into arms by salted content hash
    * (deterministic, re-ingestion-stable — the pipe_split discipline;
    * NEVER `rand()`), per event type the reached-user share per arm,
    * the share difference, and the pooled two-proportion z statistic
    * with its |z| > 1.96 call. The significance flag is tested on the
    * ROUNDED z (the band-on-rounded contract from ta_readability — a
    * boundary z must not flip between engines).
    *
    * Exactness: every input to the doubles is an exact integer count;
    * shares/z are fixed expression trees over those ints (one division,
    * one sqrt — both IEEE-correctly-rounded), floor-rounded for output.
    * Scale: two corpus passes, the structural minimum — one partial-agg
    * distinct for the arm denominators (2-row broadcast), one
    * (type, arm) distinct-user aggregate — then |types|-row arithmetic.
    * No windows, no corpus joins. */
  def evAbtest: Q = (s, d) => {
    import graft.functions.TextFns.hashBucket
    val arm = hashBucket("ab|", col("user_id"), 4, 2)
    val ev = Tables.events(s, d)
    val armSizes = ev.select(col("user_id")).distinct()
      .select(arm.as("arm"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("ua"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("ub"))
    val reached = ev.select(col("event_type"), col("user_id")).distinct()
      .select(col("event_type"), arm.as("arm"))
      .groupBy(col("event_type"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nb"))
    val pa = col("na").cast("double") / col("ua")
    val pb = col("nb").cast("double") / col("ub")
    val pp = (col("na") + col("nb")).cast("double") / (col("ua") + col("ub"))
    val z = (pa - pb) /
      sqrt(pp * (lit(1.0) - pp) * (lit(1.0) / col("ua") + lit(1.0) / col("ub")))
    // every share guards its own arm size: an all-one-arm corpus makes
    // na/ua a 0-division whose result the engines disagree on (Spark
    // NULL vs DuckDB NaN) — the guard makes the degenerate value an
    // agreed NULL on both sides
    reached.crossJoin(broadcast(armSizes))
      .select(col("event_type"), col("na").as("n_users_a"), col("nb").as("n_users_b"),
        col("ua").as("arm_a_users"), col("ub").as("arm_b_users"),
        when(col("ua") > 0, Exact.floorRound(pa, 6)).as("share_a"),
        when(col("ub") > 0, Exact.floorRound(pb, 6)).as("share_b"),
        when(col("ua") > 0 && col("ub") > 0,
          Exact.floorRound(pa - pb, 6)).as("share_diff"),
        when(col("ua") > 0 && col("ub") > 0 && pp > 0 && pp < 1,
          Exact.floorRound(z, 4)).as("z_score"))
      .withColumn("significant",
        col("z_score").isNotNull && abs(col("z_score")) > 1.96)
      .orderBy(col("event_type"))
  }

  val evAbtestSql: String = {
    val armOf = (k: String) =>
      s"CAST(('0x' || substr(md5('ab|' || CAST($k AS VARCHAR)), 1, 4)) AS BIGINT) % 2"
    s"""WITH u AS (SELECT DISTINCT user_id FROM events),
       |arms AS (SELECT
       |    CAST(sum(CASE WHEN ${armOf("user_id")} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ua,
       |    CAST(sum(CASE WHEN ${armOf("user_id")} = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ub
       |  FROM u),
       |r AS (SELECT event_type,
       |    CAST(sum(CASE WHEN ${armOf("user_id")} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
       |    CAST(sum(CASE WHEN ${armOf("user_id")} = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
       |  FROM (SELECT DISTINCT event_type, user_id FROM events) GROUP BY 1),
       |c AS (SELECT event_type, na, nb, ua, ub,
       |    na::DOUBLE / ua AS pa, nb::DOUBLE / ub AS pb,
       |    (na + nb)::DOUBLE / (ua + ub) AS pp
       |  FROM r CROSS JOIN arms)
       |SELECT event_type, na AS n_users_a, nb AS n_users_b,
       |  ua AS arm_a_users, ub AS arm_b_users,
       |  CASE WHEN ua > 0 THEN ${Exact.floorRoundSql("pa", 6)} END AS share_a,
       |  CASE WHEN ub > 0 THEN ${Exact.floorRoundSql("pb", 6)} END AS share_b,
       |  CASE WHEN ua > 0 AND ub > 0 THEN ${Exact.floorRoundSql("pa - pb", 6)} END AS share_diff,
       |  CASE WHEN ua > 0 AND ub > 0 AND pp > 0 AND pp < 1 THEN
       |    ${Exact.floorRoundSql(
              "(pa - pb) / sqrt(pp * (1.0 - pp) * (1.0 / ua + 1.0 / ub))", 4)}
       |  END AS z_score,
       |  CASE WHEN ua > 0 AND ub > 0 AND pp > 0 AND pp < 1 THEN
       |    abs(${Exact.floorRoundSql(
              "(pa - pb) / sqrt(pp * (1.0 - pp) * (1.0 / ua + 1.0 / ub))", 4)}) > 1.96
       |  ELSE FALSE END AS significant
       |FROM c ORDER BY event_type""".stripMargin
  }

  /** Lorenz concentration deciles per event type — [[evGini]]'s curve
    * form: users ranked ascending by their exact-decimal value mass,
    * cut into 10 rank-deciles, cumulative value share at each decile
    * boundary (the "bottom 80% of users hold X% of value" table; Gini
    * is 1 − 2·area under this curve). Exactness: decimal sums
    * throughout, one double division per output row, floor-rounded.
    *
    * Scale: the per-user aggregate is (type, user)-keyed; ranking
    * within type rides ONE fused [[graft.plans.DistributedRank]] pass
    * over the composite (type, value, user) order — per-type ranks are
    * global rank minus the preceding types' row counts (a |types|-row
    * broadcast cumsum), NOT a `Window.partitionBy(type)` over all
    * users (corpus/|types| rows in one task — the hazard class the r7
    * rewrites retired). Decile assignment is record-local integer
    * math; the cumulative windows at the end run over the REDUCED
    * ≤10·|types|-row decile aggregate. */
  def evLorenz: Q = (s, d) => {
    val dr = graft.plans.DistributedRank
    val perUser = Tables.events(s, d)
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(Exact.dec2(col("value"))).as("v"))
    val ranked = dr.withGlobalRankAndTotal(perUser,
      Seq(col("event_type"), col("v").asc_nulls_last, col("user_id")), "__r", "__n")
    // per-type offsets: rows of lexicographically earlier types
    val typeW = Window.orderBy(col("event_type"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cnt = perUser.groupBy(col("event_type")).agg(count(lit(1)).as("n_t"))
      .withColumn("off", coalesce(sum(col("n_t")).over(typeW), lit(0L)))
    val deciled = ranked.join(broadcast(cnt), "event_type")
      .withColumn("rk", col("__r") - col("off"))
      .withColumn("decile", dr.idiv((col("rk") - 1) * 10, col("n_t")) + 1)
      .groupBy(col("event_type"), col("decile"))
      .agg(count(lit(1)).as("n_users"), sum(col("v")).as("dv"))
    val decW = Window.partitionBy(col("event_type")).orderBy(col("decile"))
    deciled
      .withColumn("cumv", sum(col("dv")).over(
        decW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("totv", sum(col("dv")).over(
        decW.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("event_type"), col("decile"), col("n_users"),
        when(col("totv") > 0, Exact.floorRound(
          col("cumv").cast("double") / col("totv").cast("double"), 6))
          .as("cum_value_share"))
      .orderBy(col("event_type"), col("decile"))
  }

  val evLorenzSql: String =
    s"""WITH pu AS (
       |  SELECT event_type, user_id, sum(value::DECIMAL(12,2)) AS v
       |  FROM events GROUP BY 1, 2),
       |r AS (SELECT event_type, v,
       |    row_number() OVER (PARTITION BY event_type ORDER BY v, user_id) AS rk,
       |    count(*) OVER (PARTITION BY event_type) AS n_t
       |  FROM pu),
       |g AS (SELECT event_type, CAST(((rk - 1) * 10) // n_t + 1 AS BIGINT) AS decile,
       |    count(*) AS n_users, sum(v) AS dv
       |  FROM r GROUP BY 1, 2),
       |c AS (SELECT *,
       |    sum(dv) OVER (PARTITION BY event_type ORDER BY decile) AS cumv,
       |    sum(dv) OVER (PARTITION BY event_type) AS totv
       |  FROM g)
       |SELECT event_type, decile, n_users,
       |  CASE WHEN totv > 0 THEN
       |    ${Exact.floorRoundSql("cumv::DOUBLE / totv::DOUBLE", 6)}
       |  END AS cum_value_share
       |FROM c ORDER BY event_type, decile""".stripMargin

  def queries: Map[String, Q] = Map(
    "ev_lorenz" -> evLorenz,
    "ev_abtest" -> evAbtest,
    "ev_bot_census" -> evBotCensus,
    "ev_ts_similarity" -> evTsSimilarity,
    "ev_attribution" -> evAttribution,
    "ev_concurrency" -> evConcurrency,
    "ev_cumulative_users" -> evCumulativeUsers,
    "ev_forecast" -> evForecast,
    "ev_gini" -> evGini,
    "ev_rfm" -> evRfm)

  def oracleSql: Map[String, String] = Map(
    "ev_lorenz" -> evLorenzSql,
    "ev_abtest" -> evAbtestSql,
    "ev_bot_census" -> evBotCensusSql,
    "ev_ts_similarity" -> evTsSimilaritySql,
    "ev_attribution" -> evAttributionSql,
    "ev_concurrency" -> evConcurrencySql,
    "ev_cumulative_users" -> evCumulativeUsersSql,
    "ev_forecast" -> evForecastSql,
    "ev_gini" -> evGiniSql,
    "ev_rfm" -> evRfmSql)
}
