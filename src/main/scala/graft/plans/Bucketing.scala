package graft.plans

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table write path — the cluster-scale answer for repeat
  * fact⋈fact joins too big to broadcast: both sides bucketed (and
  * sorted) on the join key plan a SortMergeJoin with ZERO join-side
  * exchanges, so the shuffle is paid ONCE at write time and amortized
  * over every subsequent join/aggregation on that key (BucketedJoinSpec
  * pins the plan shape). At 100 TB pick `numBuckets` so a bucket ≈ one
  * task's comfortable input (a few hundred MB compressed).
  */
object Bucketing {

  /** Materialize `df` as a bucketed (and optionally sorted) table.
    * Sorting by the bucket key lets the join skip its sort too. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(bucketCols.nonEmpty, "bucketBy needs at least one column")
    val w = df.write.mode(mode).bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val ws = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    ws.saveAsTable(table)
  }

  /** Number of Exchange operators in the EXECUTED plan — the metric the
    * bucketing exists to minimize; used by specs to pin co-location.
    * ReusedExchange nodes perform no shuffle and must not count. */
  def exchanges(df: DataFrame): Int =
    "(?<!Reused)Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).size
}
