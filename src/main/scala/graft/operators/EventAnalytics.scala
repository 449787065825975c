package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics (SURVEY.md §2c) — the batch twins of the
  * Structured Streaming operators in `graft.streaming`: tumbling windows,
  * gap sessionization and late-data accounting against the running
  * watermark (RewindingPartitionGroupSinker's replay window, re-expressed).
  */
object EventAnalytics {

  type Q = (SparkSession, String) => DataFrame

  /** Tumbling 1-hour window aggregation per event type. At scale this is a
    * single shuffle on (window, type) with partial aggregation. */
  def evTumbling: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        // value is 2-dp exact → decimal sum (Exact idiom 1): double sums
        // are order-dependent and their round() is the cross-engine
        // boundary trap that failed q11 at the round-3 driver gate
        Exact.sumRound(Exact.dec2(col("value")), 4).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("hour_start"), col("event_type"))

  val evTumblingSql: String =
    """SELECT date_trunc('hour', ts::TIMESTAMP) AS hour_start, event_type,
      |  count(*) AS n_events, round(sum(value::DECIMAL(12,2)), 4)::DOUBLE AS sum_value,
      |  count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin

  /** Gap-based sessionization: a new session starts after >30 min of user
    * inactivity. Partitioned by user_id (high cardinality → bounded state). */
  /** 30-minute inactivity gap shared by every sessionizing operator. */
  val SessionGapUs = 1800000000L

  /** Gap-sessionized event rows: the input columns plus `session_id`
    * (per-user running counter in (ts, event_id) order). ONE definition —
    * [[evSessions]], [[evSessionStats]] and `EventValue.evConcurrency`
    * must share the session boundary; a gap-width or tie-break change in
    * one copy would silently de-sync their session frames. */
  private[operators] def sessionized(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > SessionGapUs, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("prev_us", "new_session")
  }

  def evSessions: Q = (s, d) => {
    sessionized(Tables.events(s, d))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        Exact.sumRound(Exact.dec2(col("value")), 4).as("session_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val evSessionsSql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts::TIMESTAMP AS ts, value,
      |    CASE WHEN lag(epoch_us(ts::TIMESTAMP), 1) OVER w IS NULL
      |           OR epoch_us(ts::TIMESTAMP) - lag(epoch_us(ts::TIMESTAMP), 1) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id)),
      |sessions AS (
      |  SELECT user_id, event_id, ts, value,
      |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM flagged)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  min(ts) AS session_start, max(ts) AS session_end,
      |  round(sum(value::DECIMAL(12,2)), 4)::DOUBLE AS session_value
      |FROM sessions GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin

  /** Session-distribution report over [[evSessions]]' session frame —
    * the health summary a product team reads daily: session count,
    * singleton (bounce) share, mean events per session, and duration
    * percentiles. One row.
    *
    * Shares/means are exact-long quotients (bit-identical doubles) with
    * the floor round; duration percentiles follow the [[evAnomaly]]
    * pinning — both engines interpolate linearly but can differ in the
    * last ulp, so the 6-dp round lands them on the identical double.
    * Same scale caveat as evAnomaly: `percentile()` is exact and
    * buffers per-group values — the final agg sees ONE group with every
    * session's duration, fine at test scale and cross-engine-checkable;
    * at 100 TB swap in approx_percentile (t-digest, constant memory).
    * Everything before that is the user-keyed session window chain
    * (high-cardinality partitions, bounded per-user state). */
  def evSessionStats: Q = (s, d) => {
    val sess = sessionized(Tables.events(s, d))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        ((max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))) / lit(1e6)).as("dur_s"))
    sess.agg(
      count(lit(1)).as("n_sessions"),
      coalesce(count(when(col("n_events") === 1, lit(1))), lit(0L)).as("n_singleton"),
      sum(col("n_events")).as("tot_events"),
      round(expr("percentile(dur_s, 0.5)"), 6).as("p50_dur_s"),
      round(expr("percentile(dur_s, 0.9)"), 6).as("p90_dur_s"),
      round(expr("percentile(dur_s, 0.99)"), 6).as("p99_dur_s"))
      // a global agg over an empty corpus still yields ONE row
      // (n_sessions = 0) and the share quotients divide by zero under
      // ANSI — an empty stream reports no rows, not a crash
      .filter(col("n_sessions") > 0)
      .select(col("n_sessions"), col("n_singleton"),
        Exact.floorRound(col("n_singleton") / col("n_sessions"), 4).as("singleton_share"),
        Exact.floorRound(col("tot_events") / col("n_sessions"), 4).as("avg_events"),
        col("p50_dur_s"), col("p90_dur_s"), col("p99_dur_s"))
  }

  val evSessionStatsSql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts::TIMESTAMP AS ts,
      |    CASE WHEN lag(epoch_us(ts::TIMESTAMP), 1) OVER w IS NULL
      |           OR epoch_us(ts::TIMESTAMP) - lag(epoch_us(ts::TIMESTAMP), 1) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id)),
      |sessions AS (
      |  SELECT user_id,
      |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id,
      |    ts
      |  FROM flagged),
      |sess AS (
      |  SELECT user_id, session_id, count(*) AS n_events,
      |    (max(epoch_us(ts)) - min(epoch_us(ts))) / 1e6 AS dur_s
      |  FROM sessions GROUP BY 1, 2),
      |agg AS (
      |  SELECT count(*) AS n_sessions,
      |    coalesce(count(*) FILTER (n_events = 1), 0) AS n_singleton,
      |    sum(n_events) AS tot_events,
      |    round(quantile_cont(dur_s, 0.5), 6) AS p50_dur_s,
      |    round(quantile_cont(dur_s, 0.9), 6) AS p90_dur_s,
      |    round(quantile_cont(dur_s, 0.99), 6) AS p99_dur_s
      |  FROM sess)
      |SELECT CAST(n_sessions AS BIGINT) AS n_sessions,
      |  CAST(n_singleton AS BIGINT) AS n_singleton,
      |  floor(n_singleton / n_sessions * 1e4 + 0.5) / 1e4 AS singleton_share,
      |  floor(tot_events / n_sessions * 1e4 + 0.5) / 1e4 AS avg_events,
      |  p50_dur_s, p90_dur_s, p99_dur_s
      |FROM agg WHERE n_sessions > 0""".stripMargin

  /** Per-type traffic trend: OLS slope of hourly event counts over the
    * hour index — "is this event type growing or dying", the first
    * derivative every traffic dashboard draws. Hours with zero events
    * are real observations, so the hour spine is densified from the
    * per-type min..max hour range before the regression (a slope fitted
    * only over non-empty hours systematically overestimates dying
    * traffic).
    *
    * Scale shape: ONE corpus aggregate to (type, hour) counts — map-side
    * partial combine, output bounded by types × hours, not events; the
    * spine explode and the regression run on that tiny frame. Slope
    * arithmetic follows the [[TextAnalysis.taZipf]] idiom: decimal(38,18)
    * Σx/Σy/Σxy/Σx² partials (order-independent across engines), the
    * final slope computed in double on bit-identical inputs and
    * floor-rounded. x is the hour offset from the type's first hour
    * (exact small integers), y the hourly count. */
  def evTrend: Q = (s, d) => {
    val dec = (e: Column) => e.cast("decimal(38,18)")
    // localCheckpoint: the spine (min/max per type) and the dense join
    // both consume this frame, but the spine's re-aggregation
    // canonicalizes to a different exchange, so without materialization
    // the corpus aggregate — the only corpus-sized work here — runs
    // twice (ScanAudit showed events=2). The frame is types × hours
    // rows (KBs at any corpus size), so checkpointing is free.
    val hours = Tables.events(s, d)
      .groupBy(col("event_type"),
        // integral div (micros are post-1970 positive, so trunc ≡ duck's
        // floor //); Column./ would divide in double and re-truncate
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("hr"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val spine = hours.groupBy(col("event_type"))
      .agg(min(col("hr")).as("hr0"), max(col("hr")).as("hr1"))
      .select(col("event_type"), col("hr0"),
        explode(sequence(col("hr0"), col("hr1"))).as("hr"))
    val dense = spine.join(hours, Seq("event_type", "hr"), "left")
      .select(col("event_type"), (col("hr") - col("hr0")).cast("double").as("x"),
        coalesce(col("n"), lit(0L)).cast("double").as("y"))
    val nH = col("n_hours").cast("double")
    dense
      .select(col("event_type"), dec(col("x")).as("x"), dec(col("y")).as("y"),
        dec(col("x") * col("y")).as("xy"), dec(col("x") * col("x")).as("xx"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"), sum(col("y")).cast("long").as("n_events"),
        sum(col("x")).cast("double").as("sx"), sum(col("y")).cast("double").as("sy"),
        sum(col("xy")).cast("double").as("sxy"), sum(col("xx")).cast("double").as("sxx"))
      .select(col("event_type"), col("n_hours"), col("n_events"),
        Exact.floorRound((nH * col("sxy") - col("sx") * col("sy")) /
          (nH * col("sxx") - col("sx") * col("sx")), 6).as("slope_per_hour"))
      .orderBy(col("event_type"))
  }

  val evTrendSql: String =
    """WITH hrs AS (
      |  SELECT event_type,
      |    epoch_us(date_trunc('hour', ts::TIMESTAMP)) // 3600000000 AS hr,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |spine AS (
      |  SELECT event_type, hr0, unnest(range(hr0, hr1 + 1)) AS hr
      |  FROM (SELECT event_type, min(hr) AS hr0, max(hr) AS hr1 FROM hrs GROUP BY 1)),
      |dense AS (
      |  SELECT s.event_type, (s.hr - s.hr0)::DOUBLE AS x, coalesce(h.n, 0)::DOUBLE AS y
      |  FROM spine s LEFT JOIN hrs h ON h.event_type = s.event_type AND h.hr = s.hr),
      |t AS (
      |  SELECT event_type, x::DECIMAL(38,18) AS x, y::DECIMAL(38,18) AS y,
      |    (x * y)::DECIMAL(38,18) AS xy, (x * x)::DECIMAL(38,18) AS xx
      |  FROM dense),
      |agg AS (
      |  SELECT event_type, count(*) AS n_hours, sum(y)::BIGINT AS n_events,
      |    sum(x)::DOUBLE AS sx, sum(y)::DOUBLE AS sy,
      |    sum(xy)::DOUBLE AS sxy, sum(xx)::DOUBLE AS sxx
      |  FROM t GROUP BY 1)
      |SELECT event_type, n_hours, n_events,
      |  floor((n_hours::DOUBLE * sxy - sx * sy) /
      |        (n_hours::DOUBLE * sxx - sx * sx) * 1e6 + 0.5) / 1e6 AS slope_per_hour
      |FROM agg ORDER BY event_type""".stripMargin

  /** Late-data accounting: a record is late if its event time trails the
    * running watermark (max ts over earlier offsets in its partition) by
    * more than the allowed lateness (10 min).
    *
    * Scale: the running watermark is a [[graft.plans.ChunkedPrefix]]
    * two-phase prefix max over (event_type, offset-chunk) — never a
    * corpus-sized `Window.partitionBy(event_type)`, which with ~5 types
    * would sort corpus/5 rows in ONE unsplittable task. Chunk width
    * hard-bounds the local window partitions (offsets are dense), and
    * the cross-chunk carry rides a metadata-sized summary frame. */
  def evLateData: Q = (s, d) => {
    import graft.plans.ChunkedPrefix
    val marked = ChunkedPrefix.runningMax(
      Tables.events(s, d),
      keys = Seq("event_type"), order = Seq(col("event_id")),
      chunk = ChunkedPrefix.idChunks(col("event_id"),
        ChunkedPrefix.autoWidth(Tables.events(s, d).count())),
      value = unix_micros(col("ts")), out = "wm_us", inclusive = false)
    marked
      .withColumn("late",
        when(col("wm_us").isNotNull &&
          unix_micros(col("ts")) < col("wm_us") - 600000000L, 1).otherwise(0))
      .groupBy(col("event_type"))
      .agg(sum(col("late")).as("n_late"), count(lit(1)).as("n_total"))
      .orderBy(col("event_type"))
  }

  val evLateDataSql: String =
    """WITH marked AS (
      |  SELECT event_type,
      |    CASE WHEN max(epoch_us(ts::TIMESTAMP)) OVER (PARTITION BY event_type ORDER BY event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NOT NULL
      |      AND epoch_us(ts::TIMESTAMP) <
      |          max(epoch_us(ts::TIMESTAMP)) OVER (PARTITION BY event_type ORDER BY event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - 600000000
      |      THEN 1 ELSE 0 END AS late
      |  FROM events)
      |SELECT event_type, CAST(sum(late) AS BIGINT) AS n_late, count(*) AS n_total
      |FROM marked GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Gap-filled hourly resample: build the full hour spine per event type
    * (min..max hour), left-join the actual hourly aggregates, fill gaps
    * with zeros — the time-series densify operator. The spine is generated
    * distributed (sequence+explode per type), never on the driver. */
  def evResample: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val hourly = ev.groupBy(date_trunc("hour", col("ts")).as("hour_start"),
        col("event_type").as("et"))
      .agg(count(lit(1)).as("n_events_raw"), sum(Exact.dec2(col("value"))).as("sum_value_raw"))
    val spine = ev.groupBy(col("event_type"))
      .agg(min(date_trunc("hour", col("ts"))).as("h0"),
        max(date_trunc("hour", col("ts"))).as("h1"))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("hour_start"))
    spine.join(hourly,
        spine("event_type") === hourly("et") && spine("hour_start") === hourly("hour_start"),
        "left")
      .select(spine("hour_start"), col("event_type"),
        coalesce(col("n_events_raw"), lit(0L)).as("n_events"),
        round(coalesce(col("sum_value_raw"), lit(0).cast("decimal(12,2)")), 4)
          .cast("double").as("sum_value"))
      .orderBy(col("event_type"), spine("hour_start"))
  }

  val evResampleSql: String =
    """WITH hourly AS (
      |  SELECT date_trunc('hour', ts::TIMESTAMP) AS hour_start, event_type,
      |    count(*) AS n_events, sum(value::DECIMAL(12,2)) AS sum_value
      |  FROM events GROUP BY 1, 2),
      |bounds AS (
      |  SELECT event_type, min(date_trunc('hour', ts::TIMESTAMP)) AS h0,
      |    max(date_trunc('hour', ts::TIMESTAMP)) AS h1
      |  FROM events GROUP BY event_type),
      |spine AS (
      |  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour_start
      |  FROM bounds)
      |SELECT s.hour_start, s.event_type,
      |  coalesce(h.n_events, 0) AS n_events,
      |  round(coalesce(h.sum_value, 0), 4)::DOUBLE AS sum_value
      |FROM spine s LEFT JOIN hourly h
      |  ON h.event_type = s.event_type AND h.hour_start = s.hour_start
      |ORDER BY s.event_type, s.hour_start""".stripMargin

  /** Skew-proof aggregation: two-phase salted groupBy (partial per
    * (key, salt), then final per key). Result is identical to the direct
    * groupBy — the oracle proves it — while the shuffle spreads hot keys
    * over 16 salt buckets (the pattern for skewed keys at 100 TB). */
  def evSaltedAgg: Q = (s, d) => {
    val salted = Tables.events(s, d)
      .withColumn("salt", pmod(col("event_id"), lit(16)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(Exact.dec2(col("value"))).as("psum"))
    salted.groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n_events"),
        round(sum(col("psum")), 2).cast("double").as("sum_value"))
      .orderBy(col("event_type"))
  }

  val evSaltedAggSql: String =
    """WITH partial AS (
      |  SELECT event_type, event_id % 16 AS salt, count(*) AS pn,
      |    sum(value::DECIMAL(12,2)) AS psum
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, CAST(sum(pn) AS BIGINT) AS n_events, round(sum(psum), 2)::DOUBLE AS sum_value
      |FROM partial GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Hopping (sliding) windows: 1-hour windows every 30 minutes — each
    * event lands in exactly two windows, generated distributed via
    * explode (the batch twin of window(ts, "1 hour", "30 minutes")). */
  def evHopping: Q = (s, d) => {
    // floor division, not `div`: integer division truncates toward zero,
    // so a pre-1970 timestamp would land in the WRONG hop windows (and the
    // oracle's `//` truncated identically, hiding it from the gate)
    val grid = timestamp_micros(
      floor(unix_micros(col("ts")) / 1800000000.0).cast("long") * 1800000000L)
    Tables.events(s, d)
      .withColumn("g", grid)
      .select(col("event_type"), col("value"),
        explode(array(col("g"), col("g") - expr("INTERVAL 30 MINUTE"))).as("window_start"))
      .groupBy(col("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        Exact.sumRound(Exact.dec2(col("value")), 4).as("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
  }

  val evHoppingSql: String =
    """WITH g AS (
      |  SELECT event_type, value,
      |    make_timestamp(CAST(floor(epoch_us(ts::TIMESTAMP) / 1800000000.0) AS BIGINT) * 1800000000) AS g0
      |  FROM events),
      |expanded AS (
      |  SELECT event_type, value, g0 AS window_start FROM g
      |  UNION ALL
      |  SELECT event_type, value, g0 - INTERVAL 30 MINUTE FROM g)
      |SELECT window_start, event_type, count(*) AS n_events,
      |  round(sum(value::DECIMAL(12,2)), 4)::DOUBLE AS sum_value
      |FROM expanded GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  /** Day-over-day retention: per day, active users and how many return
    * the next day. The (user, day) grain is deduped FIRST, so the
    * self-join is keyed on user with one row per day — integer counts
    * only, no float drift, bounded join groups (≤ days per user). */
  def evRetention: Q = (s, d) => {
    val days = Tables.events(s, d)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day")).distinct()
    val next = days.select(col("user_id").as("u2"), col("day").as("next_day"))
    days.join(next, col("u2") === col("user_id") &&
        col("next_day") === col("day") + expr("INTERVAL 1 DAY"), "left")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"), count(col("u2")).as("n_retained"))
      .orderBy(col("day"))
  }

  val evRetentionSql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id, date_trunc('day', ts::TIMESTAMP) AS day FROM events)
      |SELECT d.day, count(*) AS n_active, count(n.user_id) AS n_retained
      |FROM days d LEFT JOIN days n
      |  ON n.user_id = d.user_id AND n.day = d.day + INTERVAL 1 DAY
      |GROUP BY d.day ORDER BY d.day""".stripMargin

  /** Robust outlier detection per partition (loader/stream monitoring):
    * flag events whose value deviates from the partition median by more
    * than 3× the median absolute deviation. Median/MAD instead of
    * mean/stddev for two reasons: robustness (one bad sensor cannot
    * drag the threshold), and DETERMINISM — exact percentiles are
    * order-independent, while a distributed stddev's sum-of-squares
    * depends on partition combine order and drifts across engines. Two
    * small aggregates broadcast back onto the stream — no sort, no
    * low-cardinality window.
    *
    * Scale caveat: `percentile()` is EXACT and buffers the group's
    * distinct values in one aggregation buffer — fine for the bounded
    * per-type value distributions here, but at truly unbounded distinct
    * counts swap in `approx_percentile` (t-digest, constant memory);
    * the oracle then needs the same sketch, so the exact form stays the
    * cross-engine-checkable default. */
  def evAnomaly: Q = (s, d) => {
    val ev = Tables.events(s, d).select(col("event_type"), col("event_id"), col("value"))
    // med/mad are rounded to 6 dp BEFORE the threshold comparison, not
    // just for display: the engines' percentile interpolation formulas
    // can differ in the last ulp, and the strict > would flip boundary
    // rows on that ulp. The true med is 3-dp (midpoints of 2-dp values)
    // and the true mad 4-dp, so the 6-dp round lands BOTH engines on
    // the identical double and every downstream comparison is exact.
    val med = ev.groupBy(col("event_type"))
      .agg(round(expr("percentile(value, 0.5)"), 6).as("med"))
    val withMed = ev.join(broadcast(med), "event_type")
    val mad = withMed.groupBy(col("event_type"))
      .agg(round(expr("percentile(abs(value - med), 0.5)"), 6).as("mad"))
    withMed.join(broadcast(mad), "event_type")
      .filter(abs(col("value") - col("med")) > lit(3) * col("mad"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_outliers"),
        min(col("event_id")).as("first_outlier"),
        max(col("event_id")).as("last_outlier"),
        max(col("med")).as("med"),
        max(col("mad")).as("mad"))
      .orderBy(col("event_type"))
  }

  val evAnomalySql: String =
    """WITH med AS (
      |  SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med FROM events GROUP BY 1),
      |mad AS (
      |  SELECT e.event_type, round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
      |  FROM events e JOIN med m USING (event_type) GROUP BY 1)
      |SELECT e.event_type, count(*) AS n_outliers,
      |  min(e.event_id) AS first_outlier, max(e.event_id) AS last_outlier,
      |  max(m.med) AS med, max(d.mad) AS mad
      |FROM events e JOIN med m USING (event_type) JOIN mad d USING (event_type)
      |WHERE abs(e.value - m.med) > 3 * d.mad
      |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin

  /** Time-decayed engagement: per user, Σ value·exp(-Δhours/24) against
    * the corpus max timestamp — recency-weighted scoring with a 24-hour
    * mean lifetime (the "freshness" feature every ranking/curation
    * pipeline derives). One scan + one keyed shuffle; the reference
    * instant is a broadcast scalar. Exponent inputs are exact integral
    * microsecond deltas, so both engines feed libm the same doubles. */
  def evDecay: Q = (s, d) => {
    val ev = Tables.events(s, d)
    ev.crossJoin(broadcast(ev.agg(max(unix_micros(col("ts"))).as("ref_us"))))
      .withColumn("decayed",
        col("value") * exp(-(col("ref_us") - unix_micros(col("ts"))) / lit(3.6e9) / lit(24.0)))
      .groupBy(col("user_id"))
      // decimal(38,18) before the sum: the decayed terms are transcendental
      // doubles, so the SUM must be order-independent (Exact idiom 3); the
      // residual cross-engine cast divergence is ~1e-14, far inside the
      // 6-dp rounding margin
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("decayed").cast("decimal(38,18)")).cast("double"), 6)
          .as("decay_score"))
      .orderBy(col("user_id"))
  }

  val evDecaySql: String =
    """WITH ev AS (SELECT user_id, value, epoch_us(ts::TIMESTAMP) AS us FROM events),
      |ref AS (SELECT max(us) AS ref_us FROM ev)
      |SELECT user_id, count(*) AS n_events,
      |  round(sum((value * exp(-(ref_us - us) / 3.6e9 / 24.0))::DECIMAL(38,18))::DOUBLE, 6) AS decay_score
      |FROM ev CROSS JOIN ref
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Count-min-sketch heavy hitters: estimate per-user event counts from
    * a d=4 × w=32 sketch and report the top 10 (estimate ≥ exact always;
    * collisions only inflate). The SKETCH BUILD is the scale story:
    * counters are a FIXED 128 cells however large the corpus, built as a
    * partially-aggregated groupBy over (row, bucket) — each executor
    * pre-collapses its shard to ≤128 rows before the shuffle. The exact
    * per-user counts joined alongside exist only as the overestimate
    * audit for the oracle/spec; they (and the candidate-probe side) do
    * group by the full user cardinality, which a production deployment
    * would drop or restrict to a candidate set. Hashing is md5-derived
    * on both engines, so the whole sketch is deterministic and
    * oracle-checkable. */
  def evHeavyHitters: Q = (s, d) => {
    val ev = Tables.events(s, d)
    import graft.functions.SketchFns.cmPairs
    val rows = ev.select(col("user_id"), explode(cmPairs(col("user_id"))).as("rb"))
    val counters = rows.groupBy(col("rb.j").as("j"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("c"))
    val users = ev.groupBy(col("user_id")).agg(count(lit(1)).as("exact_n"))
    val est = users
      .select(col("user_id"), col("exact_n"),
        explode(cmPairs(col("user_id"))).as("q"))
      .join(broadcast(counters), col("q.j") === col("j") && col("q.b") === col("b"))
      .groupBy(col("user_id"), col("exact_n"))
      .agg(min(col("c")).as("est_n"))
    est.orderBy(col("est_n").desc, col("user_id")).limit(10)
      .orderBy(col("est_n").desc, col("user_id"))
  }

  val evHeavyHittersSql: String = {
    def h(j: Int, key: String) =
      s"CAST(('0x' || substr(md5('cm$j|' || CAST($key AS VARCHAR)), 1, 8)) AS BIGINT) % 32"
    val counterRows = (0 until 4)
      .map(j => s"SELECT $j AS j, ${h(j, "user_id")} AS b FROM events")
      .mkString("\n  UNION ALL ")
    val estRows = (0 until 4)
      .map(j => s"SELECT user_id, exact_n, $j AS j, ${h(j, "user_id")} AS b FROM users")
      .mkString("\n  UNION ALL ")
    s"""WITH rows_ AS (
       |  $counterRows),
       |counters AS (SELECT j, b, count(*) AS c FROM rows_ GROUP BY 1, 2),
       |users AS (SELECT user_id, count(*) AS exact_n FROM events GROUP BY 1),
       |probes AS (
       |  $estRows),
       |est AS (
       |  SELECT p.user_id, p.exact_n, min(c.c) AS est_n
       |  FROM probes p JOIN counters c USING (j, b)
       |  GROUP BY 1, 2)
       |SELECT user_id, exact_n, est_n FROM est
       |ORDER BY est_n DESC, user_id LIMIT 10""".stripMargin
  }

  /** Event-type transition matrix: per-user consecutive event pairs
    * (ordered by event time with the offset as tiebreak), counted per
    * (from, to) with the row-normalized transition probability — the
    * Markov-chain prep behind session-flow analysis and next-event
    * models. One window pass keyed on user_id (high cardinality,
    * bounded per-user state) and one small keyed agg; the probability
    * denominator is a window sum over the 5×5 matrix, not the corpus. */
  def evMarkov: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(s, d)
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    pairs
      // count/count quotient: both engines compute the identical double,
      // but their round() can disagree at an exact 6-dp boundary (possible
      // when the denominator divides a power of 10) — floor idiom instead
      .withColumn("p", Exact.floorRound(col("n") / sum(col("n")).over(
        Window.partitionBy(col("from_type"))), 6))
      .orderBy(col("from_type"), col("to_type"))
  }

  val evMarkovSql: String =
    """WITH pairs AS (
      |  SELECT lag(event_type, 1) OVER (PARTITION BY user_id
      |           ORDER BY ts::TIMESTAMP, event_id) AS from_type,
      |    event_type AS to_type
      |  FROM events),
      |counts AS (
      |  SELECT from_type, to_type, count(*) AS n
      |  FROM pairs WHERE from_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  floor((n / sum(n) OVER (PARTITION BY from_type)) * 1000000 + 0.5) / 1000000 AS p
      |FROM counts ORDER BY from_type, to_type""".stripMargin

  /** Fixed-point iterations for [[evMarkovStationary]]. */
  val MarkovIters = 8

  /** Stationary distribution of the [[evMarkov]] transition chain — the
    * long-run state-occupancy vector ("where do user journeys spend
    * their time"), the decision number behind capacity and funnel
    * prioritization that raw transition probabilities do not give. Same
    * teleport treatment as cl_pagerank (15% restart) so the chain is
    * ergodic even with absorbing/dangling states, and the same exact
    * FIXED-POINT integer arithmetic (1e-12 units; per-cell contribution
    * `n·(π div rowsum)` — bounded by π at any corpus scale, no overflow;
    * `div` truncation only LOSES mass, identically in both engines).
    *
    * Scale: ONE corpus pass builds the |types|² transition counts — the
    * state space is config-sized by definition (the anomalyAlerts
    * contract) — and the [[MarkovIters]] fixed iterations then run on
    * the ≤|types|²-row frame: metadata-shaped joins, no further corpus
    * work. States = types observed in transitions (from ∪ to). */
  def evMarkovStationary: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val counts = Tables.events(s, d)
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // |types|² rows: every iteration reads it
    val states = counts.select(col("from_type").as("state"))
      .union(counts.select(col("to_type")))
      .distinct().localCheckpoint()
    val nStates = states.count()
    if (nStates == 0) {
      // empty corpus / no transitions: empty frame, stable schema
      states.select(col("state"), lit(0L).as("n_out"),
        lit(0L).as("pi_fp"), lit(0.0).as("pi_share"))
    } else {
      val base = Clustering.PrScale / nStates
      val tele = 15L * base / 100L
      val rowsums = counts.groupBy(col("from_type")).agg(sum(col("n")).as("total"))
      var pi = states.select(col("state"), lit(base).as("pi"))
      for (_ <- 1 to MarkovIters) {
        val inflow = counts
          .join(pi.withColumnRenamed("state", "from_type"), "from_type")
          .join(rowsums, "from_type")
          .groupBy(col("to_type"))
          .agg(sum(col("n") * expr("pi div total")).as("infl"))
        pi = states
          .join(inflow.withColumnRenamed("to_type", "state"), Seq("state"), "left")
          .select(col("state"),
            (lit(tele) + expr("(85 * coalesce(infl, 0)) div 100")).as("pi"))
      }
      pi.join(rowsums.withColumnRenamed("from_type", "state"), Seq("state"), "left")
        .select(col("state"), coalesce(col("total"), lit(0L)).as("n_out"),
          col("pi").as("pi_fp"),
          Exact.floorRound(col("pi").cast("double") / Clustering.PrScale, 6).as("pi_share"))
        .orderBy(col("state"))
    }
  }

  val evMarkovStationarySql: String = {
    val scale = Clustering.PrScale
    val iters = (1 to MarkovIters).map { k =>
      s"""i$k AS (
         |  SELECT c.to_type AS s, sum(c.n * (p.pi // rs.total)) AS infl
         |  FROM counts c JOIN p${k - 1} p ON p.s = c.from_type
         |  JOIN rowsums rs ON rs.from_type = c.from_type
         |  GROUP BY 1),
         |p$k AS (
         |  SELECT st.s, (SELECT tele FROM consts) + (85 * coalesce(i.infl, 0)) // 100 AS pi
         |  FROM states st LEFT JOIN i$k i ON i.s = st.s)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (
       |  SELECT lag(event_type, 1) OVER (PARTITION BY user_id
       |           ORDER BY ts::TIMESTAMP, event_id) AS from_type,
       |    event_type AS to_type
       |  FROM events),
       |counts AS (
       |  SELECT from_type, to_type, count(*) AS n
       |  FROM pairs WHERE from_type IS NOT NULL GROUP BY 1, 2),
       |states AS (
       |  SELECT from_type AS s FROM counts UNION SELECT to_type FROM counts),
       |rowsums AS (SELECT from_type, sum(n) AS total FROM counts GROUP BY 1),
       |consts AS (SELECT $scale // count(*) AS base,
       |    (15 * ($scale // count(*))) // 100 AS tele FROM states),
       |p0 AS (SELECT s, (SELECT base FROM consts) AS pi FROM states),
       |$iters
       |SELECT st.s AS state, CAST(coalesce(rs.total, 0) AS BIGINT) AS n_out,
       |  CAST(p.pi AS BIGINT) AS pi_fp,
       |  floor(p.pi::DOUBLE / $scale * 1e6 + 0.5) / 1e6 AS pi_share
       |FROM states st JOIN p$MarkovIters p ON p.s = st.s
       |LEFT JOIN rowsums rs ON rs.from_type = st.s
       |ORDER BY state""".stripMargin
  }

  /** Daily/weekly active users with the DAU/WAU stickiness ratio — the
    * standard engagement health metric. One distinct pass compresses the
    * corpus to (day, user) pairs; DAU is a count over that table; WAU
    * explodes each pair over offsets 0..6 (a (day, user) pair is in the
    * trailing-7-day window of exactly the days day+0..day+6), so each
    * compressed pair fans out at most 7× and the distinct count
    * partial-aggregates on (window day, user) before the fanout ever
    * shuffles. No day-spine join is needed: window days with no activity
    * of their own (including the ones past the corpus edge) have no DAU
    * row, and the final inner join drops them — exactly the oracle's
    * active-day spine. Catalyst collapses distinct-of-explode-of-
    * distinct, so the two branches each scan events with their own
    * map-side partial distinct (two narrow 2-column scans); what crosses
    * the wire is still only the compressed (day, user) table and its
    * ≤7× fanout. No event-level self-join, no global sort, no broadcast
    * dependency. */
  def evDauWau: Q = (s, d) => {
    val dayUser = Tables.events(s, d)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(date_trunc("day", col("ts")).as("day"), col("user_id")).distinct()
    val dau = dayUser.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = dayUser
      .select(explode(sequence(lit(0), lit(6))).as("o"), col("day"), col("user_id"))
      .select(expr("day + make_dt_interval(o)").as("d"), col("user_id"))
      .groupBy(col("d")).agg(countDistinct(col("user_id")).as("wau"))
    dau.join(wau, col("day") === col("d"))
      .select(col("day"), col("dau"), col("wau"),
        Exact.floorRound(col("dau") / col("wau"), 4).as("stickiness"))
      .orderBy(col("day"))
  }

  val evDauWauSql: String =
    """WITH du AS (
      |  SELECT DISTINCT date_trunc('day', ts::TIMESTAMP) AS day, user_id FROM events
      |  WHERE ts IS NOT NULL AND user_id IS NOT NULL),
      |dau AS (SELECT day, count(*) AS dau FROM du GROUP BY 1),
      |spine AS (SELECT DISTINCT day AS d FROM du),
      |wau AS (
      |  SELECT s.d, count(DISTINCT du.user_id) AS wau
      |  FROM du JOIN spine s ON du.day <= s.d AND du.day > s.d - INTERVAL 7 DAY
      |  GROUP BY 1)
      |SELECT dau.day, dau.dau, wau.wau,
      |  floor((dau.dau / wau.wau) * 10000 + 0.5) / 10000 AS stickiness
      |FROM dau JOIN wau ON wau.d = dau.day ORDER BY day""".stripMargin

  /** Cohort retention matrix: users grouped by their first-activity day
    * (the cohort), counted at every day offset they return on — the
    * general form of [[evRetention]]'s day-over-day diagonal. Two keyed
    * aggregations (first-day per user, distinct (day, user)) and one
    * keyed join on user_id; after the join each user contributes one row
    * per active day, so the matrix agg counts rows — no second distinct.
    * Nothing broadcasts the corpus and nothing sorts it; output is
    * O(days²) regardless of user count. */
  def evCohortMatrix: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val firstDay = ev.groupBy(col("user_id"))
      .agg(min(date_trunc("day", col("ts"))).as("cohort_day"))
    val active = ev
      .select(col("user_id"), date_trunc("day", col("ts")).as("day")).distinct()
    active.join(firstDay, "user_id")
      .withColumn("offset_days", datediff(col("day"), col("cohort_day")).cast("long"))
      .groupBy(col("cohort_day"), col("offset_days"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_day"), col("offset_days"))
  }

  val evCohortMatrixSql: String =
    """WITH fd AS (
      |  SELECT user_id, min(date_trunc('day', ts::TIMESTAMP)) AS cohort_day
      |  FROM events GROUP BY 1),
      |active AS (
      |  SELECT DISTINCT user_id, date_trunc('day', ts::TIMESTAMP) AS day FROM events)
      |SELECT fd.cohort_day, date_diff('day', fd.cohort_day, a.day) AS offset_days,
      |  count(*) AS n_users
      |FROM active a JOIN fd USING (user_id)
      |GROUP BY 1, 2 ORDER BY cohort_day, offset_days""".stripMargin

  /** Records kept per (user, hour) by [[evThrottle]] before the rest are
    * dropped. 2 is calibrated to the synthetic corpus (bursts reach 3-4
    * events/user-hour at sf≥0.01) — production ingest uses the same plan
    * with a config-sized cap. */
  val ThrottleCap = 2

  /** Deterministic per-user rate limiting — the ingest throttle every
    * abuse-resistant event pipeline runs before storage: keep the first
    * [[ThrottleCap]] events per (user, hour) in (ts, event_id) arrival
    * order, drop the burst tail, and report the throttle's bite per
    * event type. The keep/drop decision is a row_number over the
    * (user, hour) window — high-cardinality partitions, bounded state
    * per key, no skew (a single user's burst is capped by their own
    * event rate); the report is one partial-aggregated groupBy. The
    * deterministic total order makes the same events survive on every
    * run and engine — a throttle that keeps an arbitrary subset cannot
    * be audited or replayed. */
  def evThrottle: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"), date_trunc("hour", col("ts")))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        count(when(col("rn") <= ThrottleCap, lit(1))).as("n_kept"))
      .select(col("event_type"), col("n_events"), col("n_kept"),
        (col("n_events") - col("n_kept")).as("n_dropped"))
      .orderBy(col("event_type"))
  }

  val evThrottleSql: String =
    s"""WITH rn AS (
       |  SELECT event_type,
       |    row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts::TIMESTAMP)
       |                       ORDER BY ts::TIMESTAMP, event_id) AS rn
       |  FROM events)
       |SELECT event_type, count(*) AS n_events,
       |  count(CASE WHEN rn <= $ThrottleCap THEN 1 END) AS n_kept,
       |  count(*) - count(CASE WHEN rn <= $ThrottleCap THEN 1 END) AS n_dropped
       |FROM rn GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Top 3-step event paths (clickstream sequence mining) — the k-step
    * extension of [[evMarkov]]'s pair transitions: every consecutive
    * (a → b → c) triple per user in (ts, event_id) order, counted and
    * ranked globally.
    *
    * Scale: ONE window shuffle on high-cardinality user_id builds the
    * triples record-locally via two lags; the path groupBy partial-aggs
    * map-side into ≤|types|³ groups, and the global top-k sorts a
    * kilobyte. No self-joins (the naive 3-way sequence join would shuffle
    * the table twice more). */
  def evTopPaths: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("a", lag(col("event_type"), 2).over(w))
      .withColumn("b", lag(col("event_type"), 1).over(w))
      .filter(col("a").isNotNull)
      .select(concat_ws(">", col("a"), col("b"), col("event_type")).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(25)
  }

  val evTopPathsSql: String =
    """WITH t AS (
      |  SELECT lag(event_type, 2) OVER w AS a, lag(event_type, 1) OVER w AS b,
      |    event_type AS c
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id))
      |SELECT a || '>' || b || '>' || c AS path, count(*) AS n
      |FROM t WHERE a IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, path LIMIT 25""".stripMargin

  /** Inter-arrival time profile per event type: gaps between consecutive
    * events of the same type in (ts, event_id) order — the traffic-shape
    * signal behind rate-limit sizing, source-health alerting (rising max
    * gap = a stalling producer) and watermark-delay tuning.
    *
    * Scale: the consecutive-gap lag is a [[graft.plans.ChunkedPrefix]]
    * two-phase lag over (type, time-chunk). The chunk width derives
    * from the observed span: span/√N-ish chunks keep the local windows
    * AND the per-type carry window both ~√N under uniform traffic (a
    * FIXED width would let either side grow corpus-shaped at 100×
    * scale); the three sizing scalars (count, min ts, max ts) are one
    * aggregate fetched to the driver — metadata, the documented scalar
    * exception. The avg is an exact long-microsecond quotient
    * floor-rounded, so both engines agree. */
  def evInterArrival: Q = (s, d) => {
    import graft.plans.ChunkedPrefix
    val ev = Tables.events(s, d).select(col("event_type"), col("ts"), col("event_id"))
    val st = ev.agg(count(lit(1)).as("n"),
      min(unix_micros(col("ts"))).as("lo"), max(unix_micros(col("ts"))).as("hi")).head()
    val widthUs =
      if (st.getLong(0) == 0 || st.isNullAt(1)) 3600000000L
      else math.max(1L, (st.getLong(2) - st.getLong(1) + 1) /
        math.max(16L, math.ceil(math.sqrt(st.getLong(0).toDouble)).toLong))
    ChunkedPrefix.lagValue(ev,
        keys = Seq("event_type"), order = Seq(col("ts"), col("event_id")),
        chunk = ChunkedPrefix.timeChunks(col("ts"), widthUs),
        value = unix_micros(col("ts")), out = "prev_us")
      .withColumn("gap_us", unix_micros(col("ts")) - col("prev_us"))
      .filter(col("gap_us").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        min(col("gap_us")).as("min_gap_us"),
        max(col("gap_us")).as("max_gap_us"),
        Exact.floorRound(sum(col("gap_us")).cast("double") / count(lit(1)) / 1e6, 4)
          .as("avg_gap_s"))
      .orderBy(col("event_type"))
  }

  val evInterArrivalSql: String =
    """WITH g AS (
      |  SELECT event_type,
      |    epoch_us(ts::TIMESTAMP) - lag(epoch_us(ts::TIMESTAMP), 1)
      |      OVER (PARTITION BY event_type ORDER BY ts::TIMESTAMP, event_id) AS gap_us
      |  FROM events)
      |SELECT event_type, count(*) AS n_gaps,
      |  min(gap_us) AS min_gap_us, max(gap_us) AS max_gap_us,
      |  floor((sum(gap_us)::DOUBLE / count(*) / 1e6) * 10000 + 0.5) / 10000 AS avg_gap_s
      |FROM g WHERE gap_us IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Burst detection: each (event_type, hour) bucket scored against its
    * trailing-10-observed-hours rate — `burst_ratio = n · n_prev /
    * sum_prev`, flagged when the bucket runs ≥ 2× its trailing average
    * (integer cross-multiplication, no float threshold). Emits EVERY
    * scored bucket with the flag rather than only flagged rows, so the
    * result is non-degenerate at any SF (at sf0.1 the Poisson tail makes
    * 2× spikes rare). Reference analogue: the flow-rate alerting a loader
    * hangs off its per-batch counters. Scale: one corpus-sized hash agg
    * to hour buckets (map-side partial), then a ROWS-frame window over
    * the tiny bucket table partitioned by type. */
  def evBurst: Q = (s, d) => {
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour_start"))
      .rowsBetween(-10, -1)
    Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour_start"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("n_prev", count(col("n_events")).over(w))
      .withColumn("sum_prev", sum(col("n_events")).over(w))
      .filter(col("n_prev") >= 3)
      .select(col("event_type"), col("hour_start"), col("n_events"),
        col("sum_prev").cast("long").as("sum_prev"), col("n_prev").cast("long").as("n_prev"),
        Exact.floorRound(col("n_events") * col("n_prev") / col("sum_prev"), 4)
          .as("burst_ratio"),
        (col("n_events") * col("n_prev") >= lit(2) * col("sum_prev")).as("is_burst"))
      .orderBy(col("event_type"), col("hour_start"))
  }

  val evBurstSql: String =
    """WITH m AS (SELECT event_type, date_trunc('hour', ts::TIMESTAMP) AS hour_start,
      |    count(*) AS n_events
      |  FROM events GROUP BY 1, 2),
      |w AS (SELECT *,
      |    count(n_events) OVER (PARTITION BY event_type ORDER BY hour_start
      |      ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING) AS n_prev,
      |    sum(n_events) OVER (PARTITION BY event_type ORDER BY hour_start
      |      ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING) AS sum_prev
      |  FROM m)
      |SELECT event_type, hour_start, n_events,
      |  CAST(sum_prev AS BIGINT) AS sum_prev, CAST(n_prev AS BIGINT) AS n_prev,
      |  floor((n_events * n_prev / sum_prev) * 10000 + 0.5) / 10000 AS burst_ratio,
      |  n_events * n_prev >= 2 * sum_prev AS is_burst
      |FROM w WHERE n_prev >= 3
      |ORDER BY event_type, hour_start""".stripMargin

  /** Single-changepoint estimate per event_type over the hourly count
    * series — the CUSUM argmax, kept fully integer-exact: with n buckets
    * totalling T events, the scaled deviation at bucket i is
    * `dev_i = n·cumsum_i − i·T` (n× the classic cumsum-minus-mean·i), and
    * the changepoint is the bucket maximizing |dev| (earliest on ties).
    * No float enters until the reported mean-shift share. Scale: hash agg
    * to buckets, then windows over the per-type bucket table — the series
    * length is bounded by the time span, not the corpus. */
  def evChangepoint: Q = (s, d) => {
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("hour_start"))
    val wAll = Window.partitionBy(col("event_type"))
    val wPick = Window.partitionBy(col("event_type"))
      .orderBy(col("abs_dev").desc, col("hour_start"))
    Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour_start"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("i", row_number().over(wOrd).cast("long"))
      .withColumn("cum", sum(col("n_events")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
      .withColumn("n_buckets", count(col("n_events")).over(wAll).cast("long"))
      .withColumn("total", sum(col("n_events")).over(wAll).cast("long"))
      .withColumn("dev", col("n_buckets") * col("cum") - col("i") * col("total"))
      .withColumn("abs_dev", abs(col("dev")))
      .withColumn("pick", row_number().over(wPick))
      .filter(col("pick") === 1)
      .select(col("event_type"), col("hour_start").as("cp_hour"),
        col("n_buckets"), col("total").as("total_events"), col("dev"),
        // mean level before vs after the changepoint, 4 dp
        Exact.floorRound(col("cum") / col("i"), 4).as("mean_before"),
        Exact.floorRound((col("total") - col("cum")) /
          greatest(col("n_buckets") - col("i"), lit(1L)), 4).as("mean_after"))
      .orderBy(col("event_type"))
  }

  val evChangepointSql: String =
    """WITH m AS (SELECT event_type, date_trunc('hour', ts::TIMESTAMP) AS hour_start,
      |    count(*) AS n_events
      |  FROM events GROUP BY 1, 2),
      |w AS (SELECT *,
      |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY hour_start) AS BIGINT) AS i,
      |    CAST(sum(n_events) OVER (PARTITION BY event_type ORDER BY hour_start
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |    CAST(count(n_events) OVER (PARTITION BY event_type) AS BIGINT) AS n_buckets,
      |    CAST(sum(n_events) OVER (PARTITION BY event_type) AS BIGINT) AS total
      |  FROM m),
      |dv AS (SELECT *, n_buckets * cum - i * total AS dev,
      |    abs(n_buckets * cum - i * total) AS abs_dev FROM w),
      |pk AS (SELECT *, row_number() OVER (PARTITION BY event_type
      |    ORDER BY abs_dev DESC, hour_start) AS pick FROM dv)
      |SELECT event_type, hour_start AS cp_hour, n_buckets, total AS total_events, dev,
      |  floor((cum / i) * 10000 + 0.5) / 10000 AS mean_before,
      |  floor(((total - cum) / greatest(n_buckets - i, 1)) * 10000 + 0.5) / 10000
      |    AS mean_after
      |FROM pk WHERE pick = 1 ORDER BY event_type""".stripMargin

  /** Seasonality profile: per event_type, the (day-of-week × hour-of-day)
    * activity matrix with each cell's share of the type total — the
    * load-shaping input for ingest capacity planning. Spark's dayofweek is
    * Sunday=1; the oracle shifts DuckDB's Sunday=0 by one. Scale: one
    * hash agg; the share derives from a window over the ≤ 7·24·|types|
    * aggregate, never a second corpus pass. */
  def evSeasonality: Q = (s, d) => {
    val wAll = Window.partitionBy(col("event_type"))
    Tables.events(s, d)
      .groupBy(col("event_type"),
        dayofweek(col("ts")).cast("long").as("dow"),
        hour(col("ts")).cast("long").as("hod"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("total", sum(col("n_events")).over(wAll).cast("long"))
      .select(col("event_type"), col("dow"), col("hod"), col("n_events"),
        Exact.floorRound(col("n_events") / col("total") * 1e2, 4).as("pct_of_type"))
      .orderBy(col("event_type"), col("dow"), col("hod"))
  }

  val evSeasonalitySql: String =
    """WITH m AS (SELECT event_type,
      |    CAST(dayofweek(ts::TIMESTAMP) + 1 AS BIGINT) AS dow,
      |    CAST(hour(ts::TIMESTAMP) AS BIGINT) AS hod, count(*) AS n_events
      |  FROM events GROUP BY 1, 2, 3),
      |w AS (SELECT *, CAST(sum(n_events) OVER (PARTITION BY event_type) AS BIGINT) AS total
      |  FROM m)
      |SELECT event_type, dow, hod, n_events,
      |  floor((n_events / total * 1e2) * 10000 + 0.5) / 10000 AS pct_of_type
      |FROM w ORDER BY event_type, dow, hod""".stripMargin

  def queries: Map[String, Q] = Map(
    "ev_burst" -> evBurst,
    "ev_changepoint" -> evChangepoint,
    "ev_seasonality" -> evSeasonality,
    "ev_inter_arrival" -> evInterArrival,
    "ev_top_paths" -> evTopPaths,
    "ev_throttle" -> evThrottle,
    "ev_cohort_matrix" -> evCohortMatrix,
    "ev_dau_wau" -> evDauWau,
    "ev_markov" -> evMarkov,
    "ev_markov_stationary" -> evMarkovStationary,
    "ev_decay" -> evDecay,
    "ev_heavy_hitters" -> evHeavyHitters,
    "ev_anomaly" -> evAnomaly,
    "ev_retention" -> evRetention,
    "ev_hopping" -> evHopping,
    "ev_tumbling" -> evTumbling,
    "ev_sessions" -> evSessions,
    "ev_session_stats" -> evSessionStats,
    "ev_trend" -> evTrend,
    "ev_late_data" -> evLateData,
    "ev_resample" -> evResample,
    "ev_salted_agg" -> evSaltedAgg)

  def oracleSql: Map[String, String] = Map(
    "ev_burst" -> evBurstSql,
    "ev_changepoint" -> evChangepointSql,
    "ev_seasonality" -> evSeasonalitySql,
    "ev_inter_arrival" -> evInterArrivalSql,
    "ev_top_paths" -> evTopPathsSql,
    "ev_throttle" -> evThrottleSql,
    "ev_cohort_matrix" -> evCohortMatrixSql,
    "ev_dau_wau" -> evDauWauSql,
    "ev_markov" -> evMarkovSql,
    "ev_markov_stationary" -> evMarkovStationarySql,
    "ev_decay" -> evDecaySql,
    "ev_heavy_hitters" -> evHeavyHittersSql,
    "ev_anomaly" -> evAnomalySql,
    "ev_retention" -> evRetentionSql,
    "ev_hopping" -> evHoppingSql,
    "ev_tumbling" -> evTumblingSql,
    "ev_sessions" -> evSessionsSql,
    "ev_session_stats" -> evSessionStatsSql,
    "ev_trend" -> evTrendSql,
    "ev_late_data" -> evLateDataSql,
    "ev_resample" -> evResampleSql,
    "ev_salted_agg" -> evSaltedAggSql)
}
