package graft.util

import org.apache.spark.sql.SparkSession

/** Per-(session, dir) memo for deterministic trained/sampled artifacts,
  * validated by a parquet file-listing fingerprint — the ONE
  * implementation behind the repo's memo family (corpus count, trained
  * IVF/k-means centroids, OPQ rotation, ql weight model, ir sample, BPE
  * merges, similarity-edge pairs, ANN truth). Round 15, r14 advice
  * item 3: the fingerprint + WeakHashMap boilerplate had been copied
  * per operator file with only the table name and value type differing
  * — three-plus copies of the same invalidation logic to keep in sync.
  *
  * Invalidation contract (the Clustering rationale, preserved exactly):
  *  - keyed by DIR with the fingerprint stored ALONGSIDE the value (not
  *    baked into the key), so a refreshed corpus under the same dir
  *    REPLACES the stale entry instead of stranding it for the session
  *    lifetime — the bounded-cache behavior a long-lived session needs;
  *  - the fingerprint is the FULL listing string (name:len:mtime per
  *    file, sorted), never a hashCode of it — two corpus states
  *    colliding on a 32-bit hash would silently reuse a stale artifact,
  *    the exact hazard the fingerprint exists to close (driver-side and
  *    tiny, so the long key costs nothing);
  *  - WEAK session keys, so stopped test sessions are not kept alive;
  *  - compute runs inside the per-session lock: concurrent same-session
  *    callers wait for ONE training run instead of racing duplicates
  *    (training is deterministic, so waiting is strictly cheaper).
  */
private[graft] final class SessionMemo[V](table: String) {
  private val keyed = new SessionMemo.Keyed[String, V](table)

  /** Listing fingerprint of `$dir/$table.parquet` ("" when absent). */
  def fingerprint(s: SparkSession, dir: String): String =
    keyed.fingerprint(s, dir)

  /** Cached value for `dir` if its fingerprint still matches, else
    * `compute` (stored with the fresh fingerprint). */
  def getOrCompute(s: SparkSession, dir: String)(compute: => V): V =
    keyed.getOrCompute(s, dir, dir)(compute)

  /** Bench hook: drop this session's entries so a timed call prices the
    * computation the consumers amortize (the pair_build_sec pattern). */
  def evict(s: SparkSession): Unit = keyed.evict(s)
}

private[graft] object SessionMemo {

  /** General form for memos whose key carries more than the dir (e.g.
    * the similarity-edge pairs keyed by (dir, threshold)); `dir` still
    * drives the fingerprint. */
  final class Keyed[K, V](table: String) {
    private val cache = java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        scala.collection.mutable.Map[K, (String, V)]]())

    def fingerprint(s: SparkSession, dir: String): String = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$table.parquet")
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) ""
      else fs.listStatus(p).map(st =>
        s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
        .sorted.mkString(",")
    }

    private def perSession(s: SparkSession) = cache.synchronized {
      var m = cache.get(s)
      if (m == null) {
        m = scala.collection.mutable.Map.empty[K, (String, V)]
        cache.put(s, m)
      }
      m
    }

    def getOrCompute(s: SparkSession, dir: String, key: K)(compute: => V): V = {
      val m = perSession(s)
      val fp = fingerprint(s, dir)
      m.synchronized {
        m.get(key) match {
          case Some((cachedFp, v)) if cachedFp == fp => v
          case stale =>
            val v = compute
            m.put(key, (fp, v))
            // a fingerprint-superseded value is released AFTER the
            // replacement computes: the stale frame's pinned blocks
            // would otherwise strand until GC + ContextCleaner
            stale.foreach { case (_, old) => release(old) }
            v
        }
      }
    }

    def evict(s: SparkSession): Unit = cache.synchronized {
      val m = cache.get(s)
      if (m != null) m.synchronized {
        m.values.foreach { case (_, v) => release(v) }
        m.clear()
      }
    }

    /** Release checkpoint/cache block storage behind an evicted or
      * fingerprint-superseded value (round 16, r15 advice item 3):
      * `Dataset.unpersist` covers CacheManager entries and the shim
      * covers localCheckpoint RDD blocks — without this, Bench's
      * evict-then-reprice transiently doubles the pinned footprint and
      * a refreshed corpus strands the old corpus-sized pin for the
      * session lifetime. Values nested one Product level deep (e.g.
      * the (model, frame) pairs) are walked; release failures are
      * non-fatal by design — eviction is hygiene, not correctness. */
    private def release(v: Any): Unit = v match {
      case df: org.apache.spark.sql.Dataset[_] =>
        try {
          df.unpersist(false)
          org.apache.spark.sql.GraftShim.unpersistLocalCheckpoint(df)
        } catch { case scala.util.control.NonFatal(_) => () }
      case p: Product => p.productIterator.foreach(release)
      case _ => ()
    }
  }
}
