package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase chunked prefix windows — the scale-safe replacement for
  * `Window.partitionBy(lowCardinalityKey).orderBy(order)` running
  * aggregates over a corpus-sized frame.
  *
  * The hazard: WindowExec cannot split a partition, and AQE's skew
  * handling applies to joins, not windows — so a running watermark /
  * lag / row-number keyed on a ~5-value column (event type, Kafka
  * partition, source name) puts corpus/5 rows in ONE task at any
  * cluster size. The reference loader (stream-loader-core
  * WatermarkProvider.scala:12, commit strategies in
  * sink/batch/RecordBatchBuilder.scala:20) computes these per-partition
  * running values incrementally on a single consumer thread; re-expressed
  * declaratively they become prefix aggregates, and prefix aggregates
  * decompose associatively.
  *
  * The decomposition: pick a chunk id that is NONDECREASING in the
  * window order within each key (the caller's contract — offsets
  * quantized by `idChunks`, event time by `timeChunks`). Then
  *
  *   prefix(row) = combine(local prefix within (key, chunk),
  *                         total over all earlier chunks of the key)
  *
  * Phase 1 runs the local window keyed (key, chunk) — partition size is
  * bounded by the chunk width, parallel across the cluster. Phase 2
  * aggregates one summary row per (key, chunk) (map-side partial
  * combine), runs the cross-chunk prefix as a window over that
  * metadata-sized frame (|keys| × |chunks| rows), and joins the carry
  * back on (key, chunk). The join and the local window share one
  * clustering, so the plan pays one corpus shuffle — the same bytes the
  * unsplittable window shuffled — plus a second column-pruned scan for
  * the summary branch (cheaper than checkpointing the corpus frame;
  * parquet reads only the key/order/value columns).
  *
  * All combines are null-exact w.r.t. the single-window semantics:
  * `greatest` skips nulls (max), sums are zero-defaulted only where the
  * monolithic window was too, and lag falls back to the previous
  * non-empty chunk's last value.
  */
object ChunkedPrefix {

  private val CHUNK = "__gp_chunk"
  private val CARRY = "__gp_carry"

  /** Quantize a dense non-negative id column (Kafka offset, event id)
    * into fixed-width chunks: hard bound of `width` rows per chunk.
    * [[DistributedRank.idiv]] rather than floor(a/b): the double
    * quotient drifts at chunk boundaries once ids pass 2⁵², which would
    * silently break the chunk-monotone-in-order contract. */
  def idChunks(id: Column, width: Long): Column =
    DistributedRank.idiv(id, lit(width))

  /** Chunk width balancing the two window levels: local partitions hold
    * ≤ width rows, the per-key carry window holds ≈ N/width summary
    * rows — width = √N equalizes them, so BOTH stay ~√N at any corpus
    * size (10¹² rows → 10⁶-row tasks on each level; a fixed width would
    * push the carry window back toward a corpus-sized single task at
    * 100× scale). Floored at 4096 so toy corpora still split into
    * multiple chunks and exercise the boundary merge. The count this
    * takes as input can be approximate — sizing, not semantics; a
    * parquet footer count (no filter) is free. */
  def autoWidth(rowCount: Long): Long =
    math.max(4096L, math.ceil(math.sqrt(math.max(0L, rowCount).toDouble)).toLong)

  /** Chunk id for an md5-hex fill order: the leading 8 hex digits parse
    * to a uniform 32-bit value whose numeric order IS the string order
    * (fixed-width lowercase hex), quantized into ~√N balanced chunks. */
  def hashChunks(hexCol: Column, rowCount: Long): Column = {
    val nChunks = math.max(16L, math.ceil(math.sqrt(rowCount.toDouble)).toLong)
    val width = math.max(1L, (1L << 32) / nChunks)
    DistributedRank.idiv(conv(substring(hexCol, 1, 8), 16, 10).cast("long"), lit(width))
  }

  /** Quantize event time into fixed-duration chunks. The per-chunk row
    * bound is the max event rate × `widthUs` — size it from the
    * source's throughput ceiling. (Non-negative epochs assumed — the
    * post-1970 contract every ts column in this engine carries.) */
  def timeChunks(ts: Column, widthUs: Long): Column =
    DistributedRank.idiv(unix_micros(ts), lit(widthUs))

  /** Quantize a CONTINUOUS numeric column into `nChunks` monotone range
    * chunks over the OBSERVED [lo, hi] domain — for order columns whose
    * unit spacing is unknown (prices, scores), where [[idChunks]]'s
    * fixed integer width silently collapses a narrow domain (e.g. all
    * fractional prices inside one 64-unit span) into ONE chunk, the
    * exact single-task hazard this module exists to avoid. Monotone
    * non-decreasing in `value`: `x - lo` and `/ w` (w > 0) are
    * monotone under IEEE round-to-nearest and `floor`/`least` preserve
    * it, so the chunk-monotone-in-order contract holds for any finite
    * domain. A degenerate domain (hi <= lo, or non-finite) yields the
    * single chunk it genuinely is. Values at `hi` land in the last
    * chunk via the `least` clamp; a value BELOW `lo` (possible only if
    * the sizing stats and the data diverge) clamps to chunk 0 via the
    * symmetric `greatest`, keeping the documented [0, nChunks) range.
    * A NULL value gets a NULL chunk
    * (ascending NULLS-FIRST placement, matching idChunks/timeChunks and
    * the monolithic window) — `least` alone would SKIP the null and
    * misfile the row into the LAST chunk, handing it the full
    * cross-chunk carry its (empty) prefix must not see.
    *
    * Skew caveat: quantization is uniform in VALUE, so a distribution
    * concentrated in a sliver of the observed span re-concentrates rows
    * into few chunks (a milder relative of the fixed-width hazard). For
    * row-balanced chunks on skewed continuous domains use
    * [[percentileChunks]]; rangeChunks is the cheap choice when the
    * domain is roughly uniform (sizing stats are one agg either way). */
  def rangeChunks(value: Column, lo: Double, hi: Double, nChunks: Long): Column = {
    require(nChunks >= 1, s"rangeChunks needs nChunks >= 1 (got $nChunks)")
    val span = hi - lo
    if (!(span > 0) || !java.lang.Double.isFinite(span) || nChunks == 1)
      when(value.isNotNull, lit(0L))
    else when(value.isNotNull,
      least(greatest(
          floor((value.cast("double") - lit(lo)) / lit(span / nChunks)).cast("long"),
          lit(0L)),
        lit(nChunks - 1)))
  }

  /** Row-balanced chunks for a SKEWED continuous domain: `boundaries`
    * are ascending percentile cut points (from an
    * `approx_percentile(value, …)` sizing agg at plan construction), and
    * each of the `boundaries.size + 1` cells is split uniformly into
    * `subChunks` range chunks between its edges. Chunk mass is bounded
    * by the CELL mass (~N / cells, up to approx-percentile error)
    * regardless of the value distribution — a dense value cluster can
    * saturate one cell, never the corpus. Monotone: the cell index is a
    * sum of monotone indicators, the within-cell offset is a clamped
    * [[rangeChunks]]-style quantization of the cell's own span, and
    * `cell * subChunks + offset` preserves order across cell edges.
    * NULL value → NULL chunk, like every chunker in this module. The
    * boundary count is a PLAN-SIZE cost (one comparison chain per row),
    * so keep it ≤ ~64 and let `subChunks` carry the rest of the
    * resolution. */
  def percentileChunks(value: Column, boundaries: Seq[Double], lo: Double,
      hi: Double, subChunks: Long): Column = {
    require(subChunks >= 1, s"percentileChunks needs subChunks >= 1 (got $subChunks)")
    require(boundaries == boundaries.sorted,
      "percentileChunks boundaries must be ascending")
    if (boundaries.isEmpty) return rangeChunks(value, lo, hi, subChunks)
    val v = value.cast("double")
    val cell = boundaries.map(b => when(v > lit(b), 1L).otherwise(0L))
      .reduce(_ + _)
    val edges = (lo +: boundaries) :+ hi
    // within-cell uniform offset, selected by cell id (static when-chain:
    // |boundaries|+1 arms, each a clamped linear quantization)
    val offset = edges.sliding(2).zipWithIndex.foldLeft(lit(0L)) {
      case (acc, (Seq(clo, chi), i)) =>
        val span = chi - clo
        val off =
          if (!(span > 0) || !java.lang.Double.isFinite(span) || subChunks == 1) lit(0L)
          else least(floor((v - lit(clo)) / lit(span / subChunks)).cast("long"),
            lit(subChunks - 1))
        when(cell === i, off).otherwise(acc)
    }
    when(value.isNotNull, cell * lit(subChunks) + greatest(offset, lit(0L)))
  }

  private def chunked(df: DataFrame, chunk: Column): DataFrame =
    df.withColumn(CHUNK, chunk.cast("long"))

  /** The using-join moves the join keys to the front; restore the
    * caller's column order with the new column appended. */
  private def reorder(df: DataFrame, original: Seq[String], out: String): DataFrame =
    df.select((original :+ out).map(col): _*)

  private def carryJoin(df: DataFrame, keys: Seq[String], chunk: Column,
                        summaryAgg: Column, carryOver: Column => Column): DataFrame = {
    val cdf = chunked(df, chunk)
    val summaries = chunked(df, chunk)
      .groupBy((keys :+ CHUNK).map(col): _*)
      .agg(summaryAgg.as("__gp_ctot"))
    val carry = summaries
      .withColumn(CARRY, carryOver(col("__gp_ctot")))
      .select((keys :+ CHUNK).map(c => col(c).as("__gp_r_" + c)) :+ col(CARRY): _*)
    // NULL-SAFE equi-join (<=>), not a using-join: Window.partitionBy
    // treats a NULL key (or a NULL chunk from a NULL order value) as an
    // ordinary group, and an equi-join would silently DROP those rows
    // from the output — the one way this helper could diverge from the
    // window it replaces. NULL chunks sort first in both the carry
    // window and the local order (Spark ASC default), matching the
    // monolithic window's NULLS-FIRST placement of NULL order values.
    val cond = (keys :+ CHUNK).map(c => cdf(c) <=> col("__gp_r_" + c)).reduce(_ && _)
    (keys :+ CHUNK).foldLeft(cdf.join(carry, cond))((d, c) => d.drop("__gp_r_" + c))
  }

  private def precedingChunks(keys: Seq[String]) =
    Window.partitionBy(keys.map(col): _*).orderBy(col(CHUNK))
      .rowsBetween(Window.unboundedPreceding, -1)

  private def localWin(keys: Seq[String], order: Seq[Column]) =
    Window.partitionBy((keys :+ CHUNK).map(col): _*).orderBy(order: _*)

  /** Running max of `value` over `order` within each key. `inclusive`
    * false gives the exclusive prefix (null for the first row of a key,
    * like `rowsBetween(unboundedPreceding, -1)`). */
  def runningMax(df: DataFrame, keys: Seq[String], order: Seq[Column], chunk: Column,
                 value: Column, out: String, inclusive: Boolean): DataFrame = {
    val frameEnd = if (inclusive) Window.currentRow else -1L
    val wLoc = localWin(keys, order).rowsBetween(Window.unboundedPreceding, frameEnd)
    reorder(
      carryJoin(df, keys, chunk, max(value), c => max(c).over(precedingChunks(keys)))
        .withColumn(out, greatest(max(value).over(wLoc), col(CARRY))),
      df.columns, out)
  }

  /** Running sum of `value` over `order` within each key, zero-defaulted
    * (an empty prefix sums to 0, matching the
    * `sum().over(...) - value` idiom rather than SQL's null). */
  def runningSum(df: DataFrame, keys: Seq[String], order: Seq[Column], chunk: Column,
                 value: Column, out: String, inclusive: Boolean): DataFrame = {
    val frameEnd = if (inclusive) Window.currentRow else -1L
    val wLoc = localWin(keys, order).rowsBetween(Window.unboundedPreceding, frameEnd)
    reorder(
      carryJoin(df, keys, chunk, sum(value), c => sum(c).over(precedingChunks(keys)))
        .withColumn(out,
          coalesce(sum(value).over(wLoc), lit(0L)) + coalesce(col(CARRY), lit(0L))),
      df.columns, out)
  }

  /** 1-based row number over `order` within each key. */
  def rowNumber(df: DataFrame, keys: Seq[String], order: Seq[Column], chunk: Column,
                out: String): DataFrame =
    reorder(
      carryJoin(df, keys, chunk, count(lit(1)), c => sum(c).over(precedingChunks(keys)))
        .withColumn(out,
          row_number().over(localWin(keys, order)).cast("long") +
            coalesce(col(CARRY), lit(0L))),
      df.columns, out)

  /** Previous row's `value` in `order` within each key (lag 1; null for
    * the first row of a key). The cross-chunk fallback is the last value
    * of the key's latest preceding non-empty chunk. */
  def lagValue(df: DataFrame, keys: Seq[String], order: Seq[Column], chunk: Column,
               value: Column, out: String): DataFrame = {
    val wChunks = Window.partitionBy(keys.map(col): _*).orderBy(col(CHUNK))
    val wLoc = localWin(keys, order)
    reorder(
      carryJoin(df, keys, chunk, max_by(value, struct(order: _*)),
          c => lag(c, 1).over(wChunks))
        // first-row-of-chunk detected positionally, NOT via
        // coalesce(lag, carry): a genuine NULL in the previous row's
        // value must stay NULL, not fall through to the carry
        .withColumn(out, when(row_number().over(wLoc) === 1, col(CARRY))
          .otherwise(lag(value, 1).over(wLoc))),
      df.columns, out)
  }
}
