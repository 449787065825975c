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
    require(args.length >= 3,
      "usage: ScaleGen <srcSfDir> <outDir> <factor|shingle> [tables...|perQuery]")
    val (src, out) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = GraftSession.create(s"local[$cpus]", 32)
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.lint", "off")
    if (args(2) == "shingle") {
      val perQuery = if (args.length > 3) args(3).toInt else 3
      shingleDups(spark, src, out, perQuery)
      println(s"[scalegen] wrote shingle-dup corpus of $src to $out (perQuery=$perQuery)")
    } else {
      val factor = args(2).toInt
      val only = if (args.length > 3) Some(args.drop(3).toSet) else None
      generate(spark, src, out, factor, only)
      println(s"[scalegen] wrote ${factor}x of $src to $out" +
        only.fold("")(t => s" (scaled tables: ${t.toSeq.sorted.mkString(",")})"))
    }
    spark.stop()
  }

  /** Shingle-near-dup corpus (round 15, r14 verdict item 5): the source
    * documents plus TRUNCATION near-dups — prefix copies keeping
    * 70–95% of each donor's tokens, so donor↔copy 3-gram shingle
    * Jaccard is (keep−2)/(n−2) ≈ the kept fraction, comfortably ≥ ½ —
    * the dense verbatim-overlap structure the `ir_eval_strict` shingle
    * truth needs to be statistically meaningful (the driver testdata's
    * near-dups are vocabulary-level only: 2 shingle-truth queries at
    * sf0.01).
    *
    * The retrieval sample rule (16 smallest md5(doc_id)) is computed
    * over the FINAL id set driver-side, and donors are assigned so
    * every final query doc participates in a dup cluster: source-id
    * queries donate (their copies are the relevant docs), new-id
    * queries ARE copies (their donor is the relevant doc) — so the
    * strict truth row is populated by construction, not by luck.
    * Deterministic: ids, donors and kept fractions derive from the
    * sample rule and fixed arithmetic — no RNG. */
  def shingleDups(spark: org.apache.spark.sql.SparkSession, src: String,
      out: String, perQuery: Int): Unit = {
    require(perQuery >= 1, s"perQuery must be >= 1 (got $perQuery)")
    import spark.implicits._
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val rowsById = docs.select("doc_id", "text", "lang", "source").collect()
      .map(r => r.getLong(0) -> r).toMap
    val ids = rowsById.keys.toSeq
    val dM = ids.max + 1
    val nQ = graft.operators.Retrieval.QueryDocs
    val newIds = (0 until nQ * perQuery).map(dM + _)
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val finalQ = (ids ++ newIds).sortBy(id => (md5hex(id.toString), id)).take(nQ)
    val srcQ = finalQ.filter(_ < dM).sorted
    // donors: every source-id query donates; if the whole final sample
    // landed on new ids (vanishingly unlikely), fall back to the
    // lowest source ids so the corpus still gains dup clusters
    val donorPool = if (srcQ.nonEmpty) srcQ else ids.sorted.take(4)
    val newRows = newIds.zipWithIndex.map { case (nid, i) =>
      val donor = donorPool(i % donorPool.length)
      val r = rowsById(donor)
      val tk = Option(r.getAs[String]("text")).getOrElse("")
        .split("\\s+").filter(_.nonEmpty)
      val level = i / donorPool.length + 1
      val frac = 0.70 + 0.25 * level / (perQuery + 1.0)
      val keep = math.max(math.min(tk.length, 3),
        math.ceil(tk.length * frac).toInt)
      (nid, tk.take(keep).mkString(" "),
        r.getAs[String]("lang"), r.getAs[String]("source"))
    }
    val newDf = newRows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.unionByName(newDf.select(docs.columns.map(col): _*))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    // the rest of the layout rides along verbatim
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "embeddings").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
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
