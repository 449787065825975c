package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Deterministic scale-up corpus generator (round 11, r10 verdict item
  * 1): extrapolates the driver testdata by an integer factor so the
  * scale smoke harness ([[ScaleCheck]]) can MEASURE super-linearity
  * instead of arguing plan shapes — the r8 mm_phash_pairs class of
  * blowup (0.4 s at sf0.01, 210 s at sf0.1) is only visible with data.
  *
  * Everything is seed-pinned and content-derived — no RNG state, no
  * wall clock — so two generations of the same (src, factor) are
  * byte-identical in content (file split/order may differ; every
  * consumer is order-independent).
  *
  * Copy semantics (copy 0 is the source verbatim; copy k > 0 shifts ids
  * by k·(max id + 1)):
  * - `documents`: every token gets the suffix `~k`. Per-copy token
  *   counts, lengths, duplication, shingle and Jaccard structure are
  *   EXACTLY the source's, so true near-dup pairs scale LINEARLY with
  *   the factor; cross-copy vocabularies are disjoint, so no
  *   artificial clone groups introduce a quadratic truth set the base
  *   corpus doesn't have.
  * - `embeddings`: dimensions rotate by 7k mod 64 with a seeded
  *   per-(k, dim) sign flip — norms are preserved exactly and
  *   within-copy cosines are equal up to SUMMATION-ORDER rounding (a
  *   downstream dot product sums the same per-dim products in rotated
  *   order), so per-copy ANN structure matches the source's except
  *   where two candidates tie within ~1 ulp at a rank boundary;
  *   cross-copy cosines decorrelate. Labels ride along.
  * - `events`: user_id shifts by k·(max user + 1) — per-user timelines
  *   replicate, the user population and per-hour event density scale
  *   with the factor (what a 10x traffic corpus looks like).
  * - TPC-H tables copy verbatim (the heavy query set doesn't scale
  *   them; they ride along so the directory is a complete sf layout).
  */
object ScaleGen {

  /** Per-(copy, dim) sign for the embedding flip — a tiny explicit LCG
    * chain (JVM-stable, unlike hashCode) shared with nothing else. */
  private[tools] def signOf(k: Int, j: Int): Float = {
    var x = k.toLong * 6364136223846793005L + j * 1442695040888963407L + 42L
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL; x ^= x >>> 33
    if ((x & 1L) == 0L) 1.0f else -1.0f
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ScaleGen <srcSfDir> <outDir> <factor> [tables...]")
    val (src, out, factor) = (args(0), args(1), args(2).toInt)
    val only = if (args.length > 3) Some(args.drop(3).toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = GraftSession.create(s"local[$cpus]", 32)
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.lint", "off")
    generate(spark, src, out, factor, only)
    println(s"[scalegen] wrote ${factor}x of $src to $out" +
      only.fold("")(t => s" (scaled tables: ${t.toSeq.sorted.mkString(",")})"))
    spark.stop()
  }

  /** The generation itself, session-agnostic — ScaleGenSpec pins the
    * invariants the scale ratios rely on through this entry point.
    * `only` restricts which of the three SCALED tables actually scale
    * (the rest copy verbatim, keeping the directory a complete sf
    * layout) — the factor-32 documents-only slope run (r11 verdict item
    * 6) scales the one table its linear-class queries read instead of
    * paying a 32× events/embeddings generation it never scans. */
  def generate(spark: org.apache.spark.sql.SparkSession, src: String,
      out: String, factor: Int, only: Option[Set[String]] = None): Unit = {
    require(factor >= 1, s"factor must be >= 1 (got $factor)")
    // a typo'd table name would silently produce a factor-1 corpus and
    // let the slope gate pass vacuously — fail loudly instead (the
    // Verify-ids discipline)
    val scalable = Set("documents", "embeddings", "events")
    only.foreach { t =>
      val unknown = t -- scalable
      require(unknown.isEmpty,
        s"ScaleGen: unknown scalable table(s) ${unknown.toSeq.sorted.mkString(", ")} " +
          s"— the scaled tables are ${scalable.toSeq.sorted.mkString(", ")}")
    }
    val scaleTable = (t: String) => only.forall(_.contains(t))
    def copyVerbatim(t: String): Unit =
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")

    // documents: suffix every token with ~k (copy 0 verbatim)
    if (!scaleTable("documents")) copyVerbatim("documents")
    else {
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val dM = docs.agg(max("doc_id")).collect()(0).getLong(0) + 1
    (0 until factor).map { k =>
      if (k == 0) docs
      else docs
        .withColumn("text", regexp_replace(col("text"), "(\\S+)", "$1~" + k))
        .select((col("doc_id") + k * dM).as("doc_id"), col("text"),
          col("lang"), col("source"),
          length(col("text")).cast("long").as("n_chars"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    }

    // embeddings: rotate dims by 7k mod 64, seeded sign flips
    if (!scaleTable("embeddings")) copyVerbatim("embeddings") else {
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val eM = emb.agg(max("vec_id")).collect()(0).getLong(0) + 1
    val dims = emb.select(size(col("embedding"))).limit(1).collect()(0).getInt(0)
    (0 until factor).map { k =>
      if (k == 0) emb
      else {
        val rot = (7 * k) % dims
        val e = col("embedding")
        emb.select((col("vec_id") + k * eM).as("vec_id"),
          array((0 until dims).map { j =>
            (element_at(e, (j + rot) % dims + 1) * lit(signOf(k, j))).cast("float")
          }: _*).as("embedding"),
          col("label"))
      }
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    }

    // events: shift event/user ids, timelines and timestamps verbatim
    if (!scaleTable("events")) copyVerbatim("events") else {
    val ev = spark.read.parquet(s"$src/events.parquet")
    val evM = ev.agg(max("event_id")).collect()(0).getLong(0) + 1
    val uM = ev.agg(max("user_id")).collect()(0).getLong(0) + 1
    (0 until factor).map { k =>
      if (k == 0) ev
      else ev.withColumn("event_id", col("event_id") + k * evM)
        .withColumn("user_id", col("user_id") + k * uM)
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    }

    // TPC-H tables ride along verbatim
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach { t =>
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode("overwrite").parquet(s"$out/$t.parquet")
      }
  }
}
