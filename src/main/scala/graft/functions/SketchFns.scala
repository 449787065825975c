package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Count-min-sketch column helpers shared by the batch heavy-hitters
  * operator (`ev_heavy_hitters`) and the streaming sketch transform
  * (`Transforms.countMinCells`) — one definition so batch and stream
  * build bit-identical cells (reference: the loader's Metrics-side
  * counters; sketch scheme per Cormode & Muthukrishnan, depth d rows ×
  * width w buckets, independent md5-salted hashes per row).
  */
object SketchFns {

  /** Bucket of `key` in sketch row `j`: md5-salted, first 8 hex digits
    * as an integer mod `width` — deterministic across engines and
    * identical to the DuckDB oracle's arithmetic. */
  def cmBucket(j: Int, key: Column, width: Int = 32): Column =
    TextFns.hashBucket(s"cm$j|", key, 8, width)

  /** All `depth` (row, bucket) probe pairs for a key, as an array of
    * structs ready to explode — record-local, codegen'd. */
  def cmPairs(key: Column, depth: Int = 4, width: Int = 32): Column =
    array((0 until depth).map(j =>
      struct(lit(j).as("j"), cmBucket(j, key, width).as("b"))): _*)
}
