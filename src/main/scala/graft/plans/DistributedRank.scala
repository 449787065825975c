package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed global rank / NTILE — the cluster-scale replacement for
  * `Window.orderBy(...)` with no partition spec, whose physical plan is a
  * SINGLE-partition sort: one task sorts every row, the one non-parallel
  * stage in an otherwise distributed plan (fine at 10⁵ rows, a stall at
  * 10⁹, an OOM at 100 TB).
  *
  * Scheme (the classic two-phase distributed rank, same contract as
  * `zipWithIndex` over a range-partitioned sort, kept inside Catalyst):
  *
  *  1. `repartitionByRange(P, keys)` + `sortWithinPartitions(keys)` —
  *     a sampled-boundary range shuffle; partition i's keys all precede
  *     partition j's for i < j, each partition locally sorted. Fully
  *     parallel (this is exactly how Spark executes a global orderBy).
  *  2. `monotonically_increasing_id()` over the sorted partitions encodes
  *     (partition id << 33) | record-index — i.e. BOTH the partition id
  *     and the 0-based local rank, with ZERO extra shuffle and no
  *     mapPartitions (stays in whole-stage codegen). The sort keys are
  *     unique total orders (callers append a key tiebreak), so local
  *     iteration order — and hence the id — is deterministic.
  *  3. The id-stamped frame is localCheckpoint-pinned, and the P-row
  *     per-partition counts aggregate over the pid column of the PINNED
  *     bytes — correctness is independent of exchange reuse by
  *     construction (before r7 the counts branch re-read the range
  *     exchange and silently depended on ReuseExchange firing: had the
  *     two branches each run their own sampled range shuffle, the
  *     boundaries could differ and ranks would come out wrong with no
  *     error). Counts prefix-sum into rank offsets via a P×P
  *     theta-join: metadata-sized by construction (P = shuffle
  *     partitions), chosen over a window cumsum so the executed plan
  *     contains NO Window node at all, single-partition or otherwise.
  *  4. global rank = offset(pid) + local rank; offsets and the total
  *     broadcast back onto the rows (≤ P rows — a real broadcast-small
  *     contract, unlike broadcasting data).
  *
  * NTILE bucket assignment is then record-local integer arithmetic
  * reproducing ANSI NTILE's remainder semantics exactly: with N rows and
  * n buckets, q = N div n and rem = N mod n, the first rem buckets hold
  * q+1 rows — bucket(r) = (r−1) div (q+1) + 1 for r ≤ rem·(q+1), else
  * rem + (r − rem·(q+1) − 1) div q + 1. OperatorsSpec pins equality
  * against Spark's own `ntile` window at test scale.
  *
  * Integer division is exact by construction: [[idiv]] subtracts
  * `pmod(a, b)` first so the double division is of an exact multiple —
  * no float-boundary risk at any operand magnitude a parquet corpus can
  * reach (< 2⁵², double-exact).
  */
object DistributedRank {

  private val LocalBits = 33 // monotonically_increasing_id layout: pid << 33 | record#
  private val LocalMask = (1L << LocalBits) - 1

  /** Exact integer floor division of non-negative longs as a Column:
    * a div b without `expr` string plumbing. `a − pmod(a,b)` is an exact
    * multiple of b, so the double division is exact. Callers guarantee
    * b > 0 on every row where the expression is evaluated. */
  def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** ANSI NTILE bucket from a 1-based unique rank `r` out of `n` total
    * rows, `buckets` buckets — record-local, no window. The `otherwise`
    * branch divides by q and is only reached when q ≥ 1 (q = 0 ⟹ n <
    * buckets ⟹ rem = n ⟹ every r ≤ n = rem·(q+1) takes the first
    * branch, where NTILE degenerates to bucket = rank). */
  def ntileFromRank(r: Column, n: Column, buckets: Int): Column = {
    val b = lit(buckets.toLong)
    val q = idiv(n, b)
    val rem = pmod(n, b)
    when(r <= (q + lit(1L)) * rem, idiv(r - lit(1L), q + lit(1L)) + lit(1L))
      .otherwise(rem + idiv(r - lit(1L) - rem * (q + lit(1L)), q) + lit(1L))
  }

  /** `df` plus a 1-based global dense rank column `rankCol` (long) in
    * `sortKeys` order (which MUST be a unique total order) and the total
    * row count `totalCol` (long) — no single-partition stage anywhere.
    * Output stays range-partitioned and locally sorted by `sortKeys`,
    * so a downstream orderBy on the same keys is a no-shuffle sort. */
  def withGlobalRankAndTotal(
      df: DataFrame,
      sortKeys: Seq[Column],
      rankCol: String,
      totalCol: String): DataFrame = {
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    // localCheckpoint: pid and local rank are FROZEN in materialized
    // bytes before the counts branch reads them, so both consumers see
    // one set of range boundaries whatever the exchange-reuse config —
    // a second sampled range shuffle (RangePartitioner seeds per RDD)
    // could otherwise place rows differently than the counts describe
    // and corrupt every downstream rank with no error raised. LAZY
    // (eager = false): both branches hold the SAME cached RDD, which is
    // what pins the boundaries — eagerness adds nothing to correctness
    // but serializes sibling ranks (each eager pin is a blocking job at
    // plan-construction time; ev_rfm's three concurrent rank branches
    // regressed 1.4× under eager pins). A lost block fails the job
    // loudly (truncated lineage), never silently re-samples.
    val rows = df.repartitionByRange(p, sortKeys: _*)
      .sortWithinPartitions(sortKeys: _*)
      .withColumn("__gr_mid", monotonically_increasing_id())
      .withColumn("__gr_pid", shiftright(col("__gr_mid"), LocalBits))
      .withColumn("__gr_lr", col("__gr_mid").bitwiseAND(lit(LocalMask)) + lit(1L))
      .drop("__gr_mid")
      .localCheckpoint(false)
    // P rows: one count per physical range partition, off the pinned pids.
    val counts = rows
      .groupBy(col("__gr_pid")).agg(count(lit(1)).as("__gr_cnt"))
    // Prefix sums over ≤ P rows via theta-join, NOT a window — keeps the
    // executed plan Window-free so the no-global-window audit is clean.
    val offsets = counts.as("a")
      .join(counts.as("b"), col("b.__gr_pid") < col("a.__gr_pid"), "left")
      .groupBy(col("a.__gr_pid").as("__gr_pid"))
      .agg(coalesce(sum(col("b.__gr_cnt")), lit(0L)).as("__gr_off"))
    val total = counts.agg(sum(col("__gr_cnt")).cast("long").as(totalCol))
    rows.join(broadcast(offsets), "__gr_pid")
      .crossJoin(broadcast(total))
      .withColumn(rankCol, col("__gr_off") + col("__gr_lr"))
      .drop("__gr_pid", "__gr_lr", "__gr_off")
  }

  /** `df` plus `rankCol` only (see [[withGlobalRankAndTotal]]). */
  def withGlobalRank(df: DataFrame, sortKeys: Seq[Column], rankCol: String): DataFrame =
    withGlobalRankAndTotal(df, sortKeys, rankCol, "__gr_n").drop("__gr_n")

  /** `df` plus an NTILE(`buckets`) column `out` (long) over the global
    * `sortKeys` order — the drop-in distributed replacement for
    * `ntile(buckets).over(Window.orderBy(sortKeys))`. */
  def withNtile(df: DataFrame, buckets: Int, sortKeys: Seq[Column], out: String): DataFrame =
    withGlobalRankAndTotal(df, sortKeys, "__gr_r", "__gr_n")
      .withColumn(out, ntileFromRank(col("__gr_r"), col("__gr_n"), buckets))
      .drop("__gr_r", "__gr_n")
}
