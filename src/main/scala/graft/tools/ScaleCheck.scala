package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Scale-up smoke harness (round 11, r10 verdict item 1): time the
  * heavy query set at the base scale factor and at [[ScaleGen]]'s
  * factor-scaled corpus, and report the big/base wall-time RATIO per
  * query — the measured super-linearity check behind every "would this
  * hold at 100 TB" claim in SURVEY §4. The ratio mostly cancels
  * sustained host load (both sides run in one session minutes apart);
  * ScaleCheckSpec pins per-query ratio ceilings so a rewrite that goes
  * quadratic fails CI instead of surfacing at the next data bump.
  *
  * Scaling classes, with the round-12 factor-10 measurement bands
  * (two same-code sweeps; shared-host scheduling swings single
  * measurements — a one-off 14.6x on cl_pagerank in one band against
  * 1.5x in the other — so ceilings carry 2-3x headroom over band
  * maxima and exist to catch CLASS changes, not timing drift):
  * - `linear` — record-local kernels + partial-agg collapse: measured
  *   0.2-3.9x (fixed per-job overheads still dominate at these
  *   absolute sizes; the factor-32 documents-only slope run below puts
  *   real slope on this class).
  * - `shuffle` — keyed joins, prefix-filtered self-joins, fixpoints:
  *   measured 0.4-6.1x across the two bands.
  * - `fixed-budget ANN cards` — round 12 gave every ANN evaluation
  *   card a FIXED 256-query budget (Similarity.QueryBudget), so the
  *   former adc-scan Θ(factor²)-by-contract class is GONE: ann_pq
  *   26.6x → 2.4-3.4x, ann_opq 12.6x → 0.7-1.6x, ann_ivfpq
  *   13.7x → 1.3-2.3x, ann_dim_trunc 1.5-1.8x, ann_recall_card
  *   0.7-0.8x measured at factor 10 — linear-class scans now.
  * - `sqrt-schedule` — ann_ivf_sqrt / ann_ivf_health: K = max(16, √N)
  *   cells, so the build side is Θ(N·√N) brute-force assignment
  *   (measured 1.0-1.6x at these sizes where overheads dominate; the
  *   asymptotic class is priced in the operator doc) while the
  *   serving-path candidates/query grow as √N — the health card's
  *   cand_per_query column measures exactly that.
  * - `graph` — ann_nndescent keeps Q = N BY DESIGN (every node is a
  *   query in graph construction): N·k keyed joins, measured
  *   5.6-5.9x, the honest near-linear price of the graph build.
  *
  * A second, factor-32 DOCUMENTS-ONLY plan ([[ScalePlan.checks32]],
  * gated on SPARK_GRAFT_SCALE32_DIR) pins slope-aware ceilings for the
  * linear text/dedup class where factor-10 wall ratios are
  * overhead-dominated.
  *
  * Usage: `ScaleCheck <baseSfDir> <bigSfDir> <factor> <outJson>
  * [plan=checks|checks32|checks32e] [ids…]` — base side times warm +
  * min-of-2 (the Bench discipline); the big side takes min-of-2 only
  * while a single run stays under 60 s (quad-class cards pay one run —
  * their ceilings carry the margin). Sub-0.67 ratios re-measure once
  * (stalled-base detection) and every row records its capture order and
  * session-memo state, so the artifact adjudicates its own captures. */
object ScaleCheck {

  def timeOnce(spark: SparkSession, d: String, id: String): Double = {
    val t0 = System.nanoTime()
    SparkEntry.queries(id)(spark, d).count()
    (System.nanoTime() - t0) / 1e9
  }

  /** THE measurement discipline, shared by the artifact run and the
    * ScaleCheckSpec gate so the CI ceiling always pins the same
    * statistic the artifact records: base = warm pass + min-of-2
    * (the Bench discipline); big = min-of-2 only while a single run
    * stays under 60 s (the adc-scan cards pay one run — their ceilings
    * carry the margin). Returns (baseSec, bigSec, ratio); a failed side
    * reports -1 and ratio -1. */
  def measureRatio(spark: SparkSession, base: String, big: String,
      id: String): (Double, Double, Double) = {
    val baseSec = try {
      timeOnce(spark, base, id) // warm codegen/JIT for this plan shape
      math.min(timeOnce(spark, base, id), timeOnce(spark, base, id))
    } catch { case e: Throwable =>
      System.err.println(s"[scalecheck] $id base FAILED: ${e.getMessage}"); -1.0
    }
    val bigSec = try {
      val first = timeOnce(spark, big, id)
      if (first < 60.0) math.min(first, timeOnce(spark, big, id)) else first
    } catch { case e: Throwable =>
      System.err.println(s"[scalecheck] $id big FAILED: ${e.getMessage}"); -1.0
    }
    val ratio = if (baseSec > 0 && bigSec >= 0) bigSec / baseSec else -1.0
    (baseSec, bigSec, ratio)
  }

  /** Session-memo groups (capture-order transparency, round 13, r12
    * note 1): queries sharing a memoized session frame time differently
    * depending on WHICH of them ran first — the artifact records
    * cold/warm per query so a flattering capture order is readable off
    * the artifact instead of needing the reader to know the memo map.
    * Round 14: a query can touch SEVERAL memo groups (the health card
    * warms both the corpus count and the trained codebook), so the
    * memo field records exactly which groups were cold at its capture
    * — `cold(g1,g2)` — or `warm` when every touched group was. */
  private val MemoGroups: Map[String, Seq[String]] = Map(
    "cl_pagerank" -> Seq("simedges"), "cl_dbscan" -> Seq("simedges"),
    "cl_kmeans" -> Seq("kmeans-cents"), "cl_inertia" -> Seq("kmeans-cents"),
    "cl_silhouette" -> Seq("kmeans-cents"), "cl_purity" -> Seq("kmeans-cents"),
    "cl_semantic_dedup" -> Seq("kmeans-cents"), "cl_drift" -> Seq("kmeans-cents"),
    "cl_outliers" -> Seq("kmeans-cents"), "cl_diverse_sample" -> Seq("kmeans-cents"),
    // the √N family shares Similarity.corpusCount per (session, dir);
    // the round-14 trained-codebook consumers additionally share the
    // Lloyd-trained matrix (ivf-train) and ann_opq its rotation memo
    "ann_ivf_sqrt" -> Seq("emb-count"), "ann_ivfpq_sqrt" -> Seq("emb-count"),
    "ann_ivf_health" -> Seq("emb-count", "ivf-train"),
    "ann_ivf_trained" -> Seq("emb-count", "ivf-train"),
    // round 15: the recall card gained the graph row (nn-graph) and its
    // truth set is memoized (ann-truth); the other truth consumers and
    // the graph pair likewise
    "ann_recall_card" -> Seq("emb-count", "ivf-train", "ann-truth", "nn-graph"),
    "ann_dim_trunc" -> Seq("ann-truth"),
    "ann_sq8" -> Seq("ann-truth"),
    "ann_nndescent" -> Seq("nn-graph"),
    "ann_beam" -> Seq("nn-graph"),
    "ann_opq" -> Seq("opq-rot"),
    // the retrieval family shares the memoized md5 sample + corpus
    // stats (round 14 — the ir-sample group)
    "ir_bm25" -> Seq("ir-sample"), "ir_phrase" -> Seq("ir-sample"),
    "ir_eval" -> Seq("ir-sample"), "ir_eval_strict" -> Seq("ir-sample"),
    "ir_fusion" -> Seq("ir-sample"))

  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: ScaleCheck <baseSfDir> <bigSfDir> <factor> <outJson> [plan=checks|checks32|checks32e] [ids...]")
    val (base, big, factor, outJson) = (args(0), args(1), args(2).toInt, args(3))
    // the default id list AND the ceiling map both follow the plan
    // matching the run's factor — a bare factor-32 run must sweep the
    // documents-only slope set, not pay the full ANN/clustering sweep
    // against a corpus whose embeddings/events never scaled. An explicit
    // plan= token picks a named plan (the factor-32 EMBEDDINGS-subset
    // sweep shares the factor with the documents one).
    val extra0 = args.drop(4).toSeq
    val (plan, planName, extra) = extra0.headOption match {
      case Some(p) if p.startsWith("plan=") =>
        val name = p.stripPrefix("plan=")
        val sel = ScalePlan.byName.getOrElse(name, sys.error(
          s"ScaleCheck: unknown plan '$name' — one of ${ScalePlan.byName.keys.toSeq.sorted.mkString(", ")}"))
        (sel, name, extra0.tail)
      case _ =>
        if (factor >= 32) (ScalePlan.checks32, "checks32", extra0)
        else (ScalePlan.checks, "checks", extra0)
    }
    // Explicit ids must be plan members SOMEWHERE (r12 advice: a typo'd
    // or cross-plan id used to record ceiling -1.0 and go silently
    // ungated) — validate against the union of plans, and let ceilings
    // fall back across plans, selected plan winning.
    val allPlans = ScalePlan.byName.values.toSeq
    val known = allPlans.flatMap(_.map(_._1)).toSet
    val ids = if (extra.nonEmpty) {
      val unknown = extra.filterNot(known)
      require(unknown.isEmpty,
        s"ScaleCheck: id(s) not in any ScalePlan: ${unknown.mkString(", ")} " +
          s"— plan members are ${known.toSeq.sorted.mkString(", ")}")
      extra
    } else plan.map(_._1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.create(s"local[$cpus]", 32)
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.lint", "off")
    val seenGroups = scala.collection.mutable.Set.empty[String]
    val rows = ids.zipWithIndex.map { case (id, order) =>
      val memo = MemoGroups.get(id) match {
        case Some(gs) =>
          val cold = gs.filterNot(seenGroups)
          gs.foreach(seenGroups += _)
          if (cold.isEmpty) "warm" else cold.mkString("cold(", ",", ")")
        case None => "none"
      }
      var (baseSec, bigSec, ratio) = measureRatio(spark, base, big, id)
      // Stalled-base detection (round 13, r12 note 1): a ratio far BELOW
      // 1 — factor-k data measuring FASTER than base — is as diagnostic
      // of a bad capture as one above the ceiling, and it silently
      // flatters the artifact. Re-measure (the Bench rerun discipline:
      // by now the contention window has usually passed), keep the MIN
      // of each side, recompute. A ratio that still stands after the
      // rerun is recorded as-is with remeasured=true — self-adjudicating.
      // 0.67, not the note's literal 0.5: the r13 calibration sweep
      // caught a stalled 14.5 s ann_ivfpq base (probe-verified 3.7 s
      // warm) slipping through at ratio 0.546 — factor-k data measuring
      // meaningfully FASTER than base is implausible for every class
      // in the plans, so the re-measure line sits above the noise band,
      // not at the headline threshold.
      var remeasured = false
      if (ratio >= 0 && ratio < 0.67) {
        remeasured = true
        val (b2, g2, _) = measureRatio(spark, base, big, id)
        if (b2 > 0) baseSec = if (baseSec > 0) math.min(baseSec, b2) else b2
        if (g2 >= 0) bigSec = if (bigSec >= 0) math.min(bigSec, g2) else g2
        ratio = if (baseSec > 0 && bigSec >= 0) bigSec / baseSec else -1.0
      }
      println(f"[scalecheck] $id%-18s base=$baseSec%8.3f s  big=$bigSec%8.3f s  ratio=$ratio%7.2f  memo=$memo${if (remeasured) "  (remeasured)" else ""}")
      (id, baseSec, bigSec, ratio, order, memo, remeasured)
    }
    def fmt(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val ceil = allPlans.foldLeft(Map.empty[String, Double])(_ ++ _.toMap) ++ plan.toMap
    val qs = rows.map { case (id, b, g, r, order, memo, rem) =>
      s""""$id":{"base_sec":${fmt(b)},"big_sec":${fmt(g)},"ratio":${fmt(r)},"ceiling":${ceil.getOrElse(id, -1.0)},"order":$order,"memo":"$memo","remeasured":$rem}"""
    }.mkString("{", ",", "}")
    val line = s"""{"artifact":"scalecheck","factor":$factor,"plan":"$planName","base":"$base","big":"$big","queries":$qs}"""
    println(line)
    val outPath = java.nio.file.Paths.get(outJson)
    // a missing parent must not discard a 10-minute measurement run
    Option(outPath.toAbsolutePath.getParent)
      .foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(outPath, (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}

/** The heavy-set scale plan: (query id, big/base ratio ceiling at
  * factor 10). Ceilings are CALIBRATED from the round-12 two-band
  * measured run (≈ 2-3x the band maximum, floored at the class
  * minimum) — they exist to catch a REWRITE changing a query's scaling
  * class (linear → quadratic), not to be tight timing bounds. Shared
  * by the [[ScaleCheck]] artifact and ScaleCheckSpec. */
object ScalePlan {
  val checks: Seq[(String, Double)] = Seq(
    // linear class (measured 0.2-3.9x at factor 10 across two bands)
    "dd_substring" -> 8.0,
    // dd_line_dup banded 2.6-7.7x with the 7.7 a host-stall capture
    // (dd_line_trim — a superset of its work — measured 1.3-1.4x on the
    // same data in the same sweeps); ceiling carries the stall
    "dd_line_dup" -> 10.0,
    "dd_line_trim" -> 6.0,
    "dd_dup_span" -> 8.0,
    "ta_dsir" -> 6.0,
    "mm_phash" -> 6.0,
    "mm_integrity" -> 6.0,
    // shuffle class (measured 0.4-6.1x)
    "dd_ppjoin" -> 12.0,
    // dd_sig_width pays the heaviest CPU kernel of the set (32-perm md5
    // signatures over every doc) ON TOP of the truth build — r11 banded
    // 4.4-13.1x under shared-host scheduling (isolated floor ~6x)
    "dd_sig_width" -> 20.0,
    "dd_sig_plan" -> 12.0,
    "dd_lsh_tuning" -> 14.0,
    "dd_lsh_recall" -> 12.0,
    "dd_dup_groups" -> 12.0,
    "cl_kcenter" -> 12.0,
    // cl_pagerank measured 1.5x in one band and a 14.6x host-stall
    // capture in the other (r11: 2.1x) — ceiling carries the stall mode
    "cl_pagerank" -> 20.0,
    "cl_dbscan" -> 12.0,
    "ev_sessions" -> 12.0,
    // bounded-domain / graph cards
    "mm_phash_pairs" -> 20.0,
    "ann_nndescent" -> 20.0, // Q = N by design: graph build, ~5.6-5.9x
    // fixed-budget ANN evaluation cards (round 12): Q = 256 at any
    // corpus, so each card is one LINEAR corpus scan class now —
    // measured 0.7-3.4x at factor 10 (r11, under Q ∝ N: 12.6-26.6x)
    "ann_pq" -> 10.0,
    "ann_opq" -> 10.0,
    "ann_ivfpq" -> 10.0,
    "ann_recall_card" -> 10.0,
    "ann_dim_trunc" -> 10.0,
    // sqrt-schedule IVF (K = max(16, √N)): Θ(N·√N) build priced in the
    // operator doc; measured 1.0-2.1x at factor 10 (ivfpq_sqrt 2.0x)
    "ann_ivf_sqrt" -> 12.0,
    "ann_ivf_health" -> 12.0,
    "ann_ivfpq_sqrt" -> 12.0,
    // trained codebook (round 14): serving = ann_ivf_sqrt's class; the
    // Lloyd sweep is Θ(budget·K) = Θ(√N) and memoized, so the first
    // capture pays it once (memo field says which)
    "ann_ivf_trained" -> 12.0)

  /** Factor-32 DOCUMENTS-ONLY slope plan (round 12, r11 verdict item
    * 6): the linear class at factor 10 is fixed-overhead-dominated
    * (0.2-3.9x), which would hide a mild super-linearity; 32x the one
    * table these queries read puts real slope on the claim. Ceilings
    * ≈ 2x the measured factor-32 ratios — all FAR under the 32x a
    * data-dominated linear profile would eventually reach, so a
    * quadratic rewrite (which would measure ≳100x here) cannot hide. */
  val checks32: Seq[(String, Double)] = Seq(
    "dd_substring" -> 30.0,
    "dd_line_dup" -> 30.0,
    "dd_line_trim" -> 30.0,
    "dd_dup_span" -> 30.0,
    "ta_dsir" -> 30.0,
    "mm_phash" -> 12.0,
    // round 14: BM25 retrieval — fixed 16-doc query budget, so the card
    // is one restricted-postings corpus scan + a query-term-bounded
    // aggregation (linear class; ceiling ≈ 3× the measured factor-32
    // ratio). A query sample growing with the corpus would push this
    // toward the Θ(N·Q) band and through the ceiling.
    "ir_bm25" -> 12.0,
    // ir_phrase: positional postings restricted to ≤ 48 broadcast phrase
    // terms — the same linear restricted-scan class
    "ir_phrase" -> 12.0,
    // round 15: span trim = dd_dup_span's census + a doc_id-keyed
    // join-back + record-local cut — the dd_line_trim linear class
    "dd_span_trim" -> 30.0,
    // round 15: the dual-truth card — two Θ(16·N) truth chains + the
    // bm25 ranking, all query-budget-restricted linear passes
    "ir_eval_strict" -> 12.0,
    // round 15: fusion's DOCUMENT side (truth + bm25) scales here; the
    // vector side rides the unscaled embeddings (checks32e gates it)
    "ir_fusion" -> 12.0)

  /** Factor-32 EMBEDDINGS-ONLY slope plan (round 13, r12 verdict item
    * 1): the build-side measurement behind the √N IVF family's
    * two-level coarse assignment. 32× the embeddings table (64k vectors
    * against the sf0.1 base's 2k) puts real slope on the ANN class the
    * factor-10 sweep reads as overhead-dominated: the fixed-budget
    * evaluation cards should track the linear band, and the √N ops —
    * whose K grows ~5.7× here — expose their assignment stage's class
    * directly. Ceilings ≈ 3× the round-13 measured factor-32 ratios
    * (SCALECHECK32E.json, map-only two-level kernels ON): sqrt family
    * 0.90–1.77×, fixed-budget cards 2.55–2.64×, bruteforce 1.40× (256
    * queries × 32× corpus — pure linear scan). A brute-force Θ(N·√N)
    * assignment rewrite would push the sqrt family toward
    * 32^1.5/32 ≈ 5.7× the linear slope and through these ceilings once
    * data dominates. */
  val checks32e: Seq[(String, Double)] = Seq(
    "ann_bruteforce" -> 6.0,
    "ann_pq" -> 8.0,
    "ann_ivfpq" -> 10.0,
    "ann_ivf_sqrt" -> 6.0,
    "ann_ivfpq_sqrt" -> 8.0,
    "ann_ivf_health" -> 8.0,
    // round 14: trained serving must track ann_ivf_sqrt's slope — the
    // Θ(budget·K) Lloyd sweep grows only as √N, so a ceiling break here
    // means the TRAINING stage went corpus-shaped (ceiling ≈ 3× the
    // round-14 measured ratio); the health card's ceiling moves 6→8 for
    // its third (trained) scheme's extra ≤K-row audit pass
    "ann_ivf_trained" -> 8.0,
    // round 14: int8 scalar quantization — a fixed-budget evaluation
    // card (Q = 256 at any corpus): min/max train, MSE and the ADC scan
    // are each one linear corpus pass (the ann_pq class; ceiling ≈ 3×
    // the measured factor-32 ratio)
    "ann_sq8" -> 8.0,
    // round 15: the graph pair, in deliberate capture order — the BUILD
    // (ann_nndescent, cold nn-graph: LSH-bucket self-join + 2 NoN
    // rounds, the Q = N graph class whose candidate pairs grow as
    // Σ bucket² over the fixed 16-bucket sign space; the one
    // by-design super-linear build, gated so a further blowup still
    // fails) and then SERVING (ann_beam, warm graph: per query
    // Θ(entries + rounds·width·k) graph nodes + bounded broadcast
    // scoring scans — the corpus-size-independent path the graph
    // exists for; its slope must track the linear band)
    "ann_nndescent" -> 200.0,
    "ann_beam" -> 10.0,
    // round 15: fusion's VECTOR side (broadcast-query cosine scan over
    // the scaled embeddings) — the ann_bruteforce linear class; the
    // document side rides the unscaled base here (checks32 gates it)
    "ir_fusion" -> 8.0)

  /** Name → plan, for ScaleCheck's `plan=` selector. */
  val byName: Map[String, Seq[(String, Double)]] = Map(
    "checks" -> checks, "checks32" -> checks32, "checks32e" -> checks32e)
}
