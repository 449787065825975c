package graft.operators

import graft.Tables
import graft.functions.TextFns._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composed training-data pipeline operators (SURVEY.md §2d/§2f end to
  * end): the stages a 100 TB curation job chains — quality gate →
  * normalize-dedup → pack into fixed token budgets. Everything stays one
  * declarative plan, so Catalyst fuses the stages (single scan, pushed
  * filters) rather than materializing between steps.
  */
object Pipeline {

  type Q = (SparkSession, String) => DataFrame

  /** Curation: quality-gate the corpus, then keep one representative per
    * normalized-content group, and report the per-language yield. */
  def pipeCuration: Q = (s, d) => {
    val tk = tokens(col("text"))
    val norm = graft.functions.TextFns.normText(col("text"))
    val w = Window.partitionBy(col("content_hash"))
    Tables.documents(s, d)
      .withColumn("n_tokens", size(tk).cast("long"))
      .filter(col("n_tokens").between(20, 1000))
      .withColumn("content_hash", md5s(norm))
      .withColumn("rep_id", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("rep_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("n_tokens")).as("total_tokens"))
      .orderBy(col("lang").asc_nulls_last)
  }

  val pipeCurationSql: String =
    s"""WITH quality AS (
       |  SELECT doc_id, lang,
       |    CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> length(x) > 0)) AS BIGINT) AS n_tokens,
       |    md5(${graft.functions.TextFns.normTextSql("text")}) AS content_hash
       |  FROM documents
      |  WHERE len(list_filter(string_split_regex(text, '\\s+'), x -> length(x) > 0)) BETWEEN 20 AND 1000),
      |reps AS (
      |  SELECT lang, n_tokens, doc_id,
      |    min(doc_id) OVER (PARTITION BY content_hash) AS rep_id
      |  FROM quality)
      |SELECT lang, count(*) AS n_kept, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
      |FROM reps WHERE doc_id = rep_id
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Sequence packing: assign docs to fixed 4096-token training-batch
    * budgets via a TWO-PHASE sharded prefix sum — the distributed form of
    * greedy pack-by-order. The packing order is lang → shard → doc_id,
    * where shard is a content-independent md5 bucket of the doc id
    * (pinned in the oracle).
    *
    * Scale shape: the naive form — one cumulative window partitioned by
    * `lang` — serializes each language's ENTIRE corpus through a single
    * sort partition chain (~5 partitions at any corpus size: a skew
    * bomb at 100 TB). Here each (lang, shard) runs its own bounded
    * cumulative window (phase 1), the per-shard token totals — langs ×
    * nShards rows — roll into per-shard starting offsets with one tiny
    * window (phase 2, broadcast back), and the global pack id is
    * floor((shard_offset + local_cum − n_tokens) / 4096) in pure integer
    * arithmetic. SCALE THE SHARD COUNT WITH THE CORPUS (same rule as
    * [[pipeShuffleFor]]): tens of thousands of shards at 100 TB keeps
    * every sort partition-sized. The oracle-pinned query uses 8. */
  def pipePacking: Q = (s, d) => pipePackingFor(Tables.documents(s, d), 8)

  /** General form of [[pipePacking]] with an explicit shard count. */
  def pipePackingFor(docs: DataFrame, nShards: Int): DataFrame = {
    require(nShards >= 1, s"pipePackingFor: nShards must be >= 1 (got $nShards)")
    val tk = tokens(col("text"))
    val shard = conv(substring(md5s(concat(lit("pack|"), col("doc_id"))), 1, 8), 16, 10)
      .cast("long") % nShards
    // localCheckpoint: both phases read the token frame, and neither AQE
    // stage reuse (the tokenize lambda defeats exchange canonicalization —
    // verified: the two-branch plan re-scans even with the broadcast
    // replaced by a keyed join) nor a broadcast-side subtree (reuse never
    // fires under BroadcastExchange — the ta_quality mechanism, PLANS.md)
    // dedups the branches, so without materialization the corpus text is
    // read and TOKENIZED twice. The checkpointed frame is 4 narrow columns
    // (no text) — a few percent of the corpus bytes, vs ~2× scan cost; at
    // the sf0.01 probe scale the trade is ~+0.2 s of checkpoint overhead.
    val toks = docs
      .select(col("doc_id"), col("lang"), size(tk).cast("long").as("n_tokens"))
      .withColumn("shard", shard)
      .localCheckpoint()
    val wLocal = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = toks.withColumn("local_cum", sum(col("n_tokens")).over(wLocal))
    // phase 2: per-(lang, shard) totals → running shard offsets within the
    // language; langs × nShards rows (map-side partial agg over the
    // checkpointed frame), broadcast back onto the big frame
    val offs = toks.groupBy(col("lang").as("ol"), col("shard").as("os"))
      .agg(sum(col("n_tokens")).as("tot"))
      .withColumn("shard_offset",
        coalesce(sum(col("tot")).over(Window.partitionBy(col("ol")).orderBy(col("os"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("tot")
    cum.join(broadcast(offs), col("lang") === col("ol") && col("shard") === col("os"))
      .withColumn("pack_id",
        expr("(shard_offset + local_cum - n_tokens) div 4096"))
      .groupBy(col("lang"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("pack_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("lang").asc_nulls_last, col("pack_id"))
  }

  val pipePackingSql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang,
      |    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> length(x) > 0)) AS BIGINT) AS n_tokens,
      |    CAST(('0x' || substr(md5('pack|' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8 AS shard
      |  FROM documents),
      |cum AS (
      |  SELECT doc_id, lang, shard, n_tokens,
      |    sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS local_cum
      |  FROM toks),
      |offs AS (
      |  SELECT lang, shard,
      |    coalesce(sum(tot) OVER (PARTITION BY lang ORDER BY shard
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS shard_offset
      |  FROM (SELECT lang, shard, sum(n_tokens) AS tot FROM toks GROUP BY 1, 2) t),
      |packed AS (
      |  SELECT c.lang, c.doc_id, c.n_tokens,
      |    (o.shard_offset + c.local_cum - c.n_tokens) // 4096 AS pack_id
      |  FROM cum c JOIN offs o ON c.lang = o.lang AND c.shard = o.shard)
      |SELECT lang, CAST(pack_id AS BIGINT) AS pack_id, count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM packed GROUP BY lang, pack_id ORDER BY lang, pack_id""".stripMargin

  /** Deterministic hash sampling: ~10% of docs per language, selected by
    * content-independent hash of the key — reproducible across engines,
    * runs and cluster sizes (unlike rand()-based sampling), which is what
    * a training-data pipeline needs for auditable subsets. */
  def pipeSample: Q = (s, d) => {
    val bucket = graft.functions.TextFns.hashBucket("sample|", col("doc_id"), 4, 100)
    Tables.documents(s, d)
      .filter(bucket < 10)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("lang").asc_nulls_last)
  }

  val pipeSampleSql: String =
    """SELECT lang, count(*) AS n_sampled,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM documents
      |WHERE CAST(('0x' || substr(md5('sample|' || CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100 < 10
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Deterministic stratified train/val/test split (80/10/10): the split
    * a document lands in is a pure function of its id (same md5-bucket
    * idiom as [[pipeSample]]), so the assignment is stable under
    * re-ingestion, re-partitioning and engine changes — eval rows can
    * never drift into train between pipeline runs. Reported per
    * (lang, split) with document and character mass so stratification
    * skew is visible per language. One partial-aggregated shuffle on the
    * (lang, split) key — 15 groups at any corpus size. */
  def pipeSplit: Q = (s, d) => {
    val bucket = graft.functions.TextFns.hashBucket("split|", col("doc_id"), 4, 100)
    Tables.documents(s, d)
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("char_mass"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("lang").asc_nulls_last, col("split"))
  }

  val pipeSplitSql: String =
    """WITH b AS (SELECT lang, doc_id, n_chars,
      |    CAST(('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100 AS bucket
      |  FROM documents)
      |SELECT lang,
      |  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
      |  count(*) AS n_docs, sum(n_chars)::BIGINT AS char_mass,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM b GROUP BY 1, 2 ORDER BY lang, split""".stripMargin

  /** Weighted source interleaving (training-data mixing): each source
    * gets weight 1–3; a document's virtual position is its rank within
    * its source divided by the weight, and the training order reads docs
    * by ascending virtual position — heavier sources surface
    * proportionally more often. The global pick is ORDER BY + LIMIT
    * (TakeOrderedAndProject: each partition contributes its local top,
    * no single-partition global window); the per-source rank is a
    * [[graft.plans.ChunkedPrefix]] two-phase row number over
    * (source, id-chunk) — sources are LOW-cardinality, so a plain
    * `Window.partitionBy(source)` would sort each source's full
    * document set in one unsplittable task at 100 TB. */
  def pipeInterleave: Q = (s, d) => {
    import graft.plans.ChunkedPrefix
    // identical parse on both engines: 10-char bounded substring and
    // NULL (not error) on a non-numeric source id — Spark's try_cast and
    // the oracle's TRY_CAST agree (a plain cast THROWS under ANSI on a
    // source name with no digits — DirtyTextSpec); unparseable sources
    // are excluded by contract (NULL ordering differs between engines,
    // so letting them through would diverge inside the LIMIT)
    val wgt = (expr("try_cast(substring(source, 4, 10) as int)") % 3 + 1).cast("double")
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("source"))
      .withColumn("w", wgt)
      .filter(col("w").isNotNull)
    ChunkedPrefix.rowNumber(base, keys = Seq("source"), order = Seq(col("doc_id")),
        chunk = ChunkedPrefix.idChunks(col("doc_id"),
          ChunkedPrefix.autoWidth(Tables.documents(s, d).count())), out = "rn")
      .withColumn("vpos", round(col("rn").cast("double") / col("w"), 4))
      .select(col("doc_id"), col("source"), col("vpos"))
      .orderBy(col("vpos"), col("source"), col("doc_id"))
      .limit(200)
  }

  val pipeInterleaveSql: String =
    """WITH ranked AS (
      |  SELECT doc_id, source,
      |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
      |    (TRY_CAST(substr(source, 4, 10) AS INT) % 3 + 1) AS w
      |  FROM documents)
      |SELECT doc_id, source, round(rn / (w * 1.0), 4) AS vpos
      |FROM ranked WHERE w IS NOT NULL
      |ORDER BY vpos, source, doc_id
      |LIMIT 200""".stripMargin

  /** Deterministic training-order shuffle WITHOUT a global sort: each
    * document hashes to one of 8 shards (content-independent md5 — the
    * same portable hex-parse as [[pipeSample]]), and its serving position
    * is its rank under the hash order WITHIN the shard. A trainer reads
    * shards round-robin for a reproducible pseudo-random permutation.
    * The construction is a per-shard window (partitionBy shard), never a
    * single global ORDER BY — at 100 TB shard count scales out and each
    * shard sorts independently; a global `orderBy(rand())` shuffle would
    * funnel the corpus through one range sort and not be reproducible. */
  def pipeShuffle: Q = (s, d) => pipeShuffleFor(Tables.documents(s, d), 8)

  /** General form. SCALE THE SHARD COUNT WITH THE CORPUS: each shard is
    * sorted by one task, so pick `nShards` ≈ corpus / (a few hundred MB)
    * — at 100 TB that is tens of thousands of shards, keeping every sort
    * partition-sized. The oracle-pinned query uses 8 on the test corpus. */
  def pipeShuffleFor(docs: DataFrame, nShards: Int): DataFrame = {
    val h = md5s(concat(lit("shuffle|"), col("doc_id")))
    // 8 hex digits = 32 bits of hash: 4 digits (65536 values) skews
    // shards 2:1 once nShards passes ~30k and leaves shards beyond 65536
    // permanently empty — the doc above RECOMMENDS tens of thousands
    val shard = conv(substring(col("h"), 1, 8), 16, 10).cast("long") % nShards
    docs
      .select(col("doc_id"), h.as("h"))
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  val pipeShuffleSql: String =
    """WITH h AS (
      |  SELECT doc_id, md5('shuffle|' || CAST(doc_id AS VARCHAR)) AS h FROM documents),
      |sharded AS (
      |  SELECT doc_id, h, CAST(('0x' || substr(h, 1, 8)) AS BIGINT) % 8 AS shard FROM h)
      |SELECT doc_id, shard,
      |  row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS pos
      |FROM sharded ORDER BY shard, pos""".stripMargin

  /** Token-budget source mixing: allocate a global 100k-token budget
    * across sources proportional to sqrt(source token mass) — the
    * temperature-style reweighting that upsamples small sources — then
    * fill each source's allocation in deterministic content-hash order.
    * Scale shape: per-doc token counts are record-local; the weight
    * table is a tiny per-source agg crossJoined as a broadcast scalar;
    * the budget fill is a [[graft.plans.ChunkedPrefix]] two-phase
    * cumulative sum over (source, hash-prefix-chunk) — sources are
    * LOW-cardinality, so the r6 plan's `Window.partitionBy(source)`
    * sorted each source's full document set in one unsplittable task.
    * The chunk id is the leading 8 hex digits of the md5 fill order
    * quantized into ~√N chunks (ChunkedPrefix.hashChunks): lowercase
    * fixed-width hex sorts lexicographically exactly as its numeric
    * value, so the chunk is monotone in the fill order, md5 uniformity
    * balances chunk sizes, and the √N count keeps the local windows AND
    * the per-source carry window both ~√N at any corpus size. The cum
    * ≤ budget comparison
    * pairs integral token counts with a budget derived from a 20-source
    * sum, so float drift cannot flip membership except at
    * astronomically exact boundaries.
    *
    * One tokenize scan: the narrow (source, doc_id, n_tok, hash) frame
    * is localCheckpoint-pinned (the pipePacking idiom) before fanning
    * into the chunked prefix's two branches and the per-source totals,
    * so the corpus text is read and tokenized exactly once. Null-source
    * docs are excluded from the mix by contract (the oracle SQL
    * carries the same predicate). */
  def pipeBudgetMix: Q = (s, d) => {
    import graft.plans.ChunkedPrefix
    val base = Tables.documents(s, d)
      .filter(col("source").isNotNull)
      .select(col("source"), col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tok"),
        md5s(concat(lit("mix|"), col("doc_id"))).as("h"))
      .localCheckpoint()
    val cum = ChunkedPrefix.runningSum(base,
      keys = Seq("source"), order = Seq(col("h")),
      chunk = ChunkedPrefix.hashChunks(col("h"), base.count()),
      value = col("n_tok"), out = "cum", inclusive = true)
    val totals = base.groupBy(col("source")).agg(sum(col("n_tok")).as("tot"))
    // sqrt is IEEE-correctly-rounded (identical in both engines), but the
    // SUM of the sqrt terms is order-dependent in double — decimal(38,18)
    // makes it order-independent (Exact idiom 3); wsum then feeds an
    // identical quotient into every budget
    val budgets = totals
      .crossJoin(broadcast(totals.agg(
        sum(sqrt(col("tot")).cast("decimal(38,18)")).cast("double").as("wsum"))))
      .select(col("source"), (lit(100000.0) * sqrt(col("tot")) / col("wsum")).as("budget"))
    cum.join(broadcast(budgets), "source")
      .filter(col("cum") <= col("budget"))
      .groupBy(col("source"), col("budget"))
      .agg(count(lit(1)).as("docs_kept"), sum(col("n_tok")).as("tokens_kept"))
      .select(col("source"), Exact.floorRound(col("budget"), 2).as("budget"),
        col("docs_kept"), col("tokens_kept"))
      .orderBy(col("source"))
  }

  val pipeBudgetMixSql: String =
    """WITH tok AS (
      |  SELECT source, doc_id,
      |    len(list_filter(string_split_regex(text, '\s+'), x -> length(x) > 0))::BIGINT AS n_tok
      |  FROM documents WHERE source IS NOT NULL),
      |tot AS (SELECT source, sum(n_tok) AS tot FROM tok GROUP BY 1),
      |ws AS (SELECT sum(sqrt(tot)::DECIMAL(38,18))::DOUBLE AS wsum FROM tot),
      |bud AS (SELECT source, 100000.0 * sqrt(tot) / wsum AS budget
      |        FROM tot CROSS JOIN ws),
      |cum AS (
      |  SELECT source, doc_id, n_tok,
      |    sum(n_tok) OVER (PARTITION BY source
      |                     ORDER BY md5('mix|' || CAST(doc_id AS VARCHAR))
      |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM tok),
      |kept AS (
      |  SELECT c.source, c.n_tok, b.budget
      |  FROM cum c JOIN bud b USING (source) WHERE c.cum <= b.budget)
      |SELECT source, floor(max(budget) * 100 + 0.5) / 100 AS budget,
      |  count(*) AS docs_kept, sum(n_tok)::BIGINT AS tokens_kept
      |FROM kept GROUP BY source ORDER BY source""".stripMargin

  /** Curriculum schedule: stage the corpus easy → hard by document
    * length (the standard length-based curriculum — short documents
    * first), 20-token bands capped at stage 4, and report the schedule a
    * trainer consumes: per-stage doc/token mass plus the cumulative
    * token share reached when that stage completes.
    *
    * Scale shape: stage assignment is record-local (floor of an exact
    * integer quotient — no percentile pass over the corpus, which would
    * need a global sort or an approx-quantile sketch whose cut points
    * the oracle could not mirror exactly); the rollup is a 5-row
    * aggregate, and the cumulative window runs over those 5 rows, not
    * the corpus. One scan, one corpus shuffle (the keyed agg).
    * Cross-engine: all quotients divide exact longs (bit-identical
    * doubles), shares go through the floor idiom. */
  def pipeCurriculum: Q = (s, d) => {
    val nTok = size(tokens(col("text"))).cast("long")
    val stage = least(floor(col("n_tok") / lit(20.0)), lit(4)).cast("long")
    val w = Window.orderBy(col("stage"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.orderBy(col("stage"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.documents(s, d)
      .select(col("doc_id"), nTok.as("n_tok"))
      .withColumn("stage", stage)
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("stage_tokens"),
        min(col("n_tok")).as("min_tokens"), max(col("n_tok")).as("max_tokens"))
      .withColumn("cum_tokens", sum(col("stage_tokens")).over(w))
      .withColumn("cum_share",
        Exact.floorRound(col("cum_tokens") / sum(col("stage_tokens")).over(all), 4))
      .orderBy(col("stage"))
  }

  val pipeCurriculumSql: String =
    """WITH tok AS (
      |  SELECT doc_id,
      |    len(list_filter(string_split_regex(text, '\s+'), x -> length(x) > 0))::BIGINT AS n_tok
      |  FROM documents),
      |staged AS (
      |  SELECT CAST(least(floor(n_tok / 20.0), 4) AS BIGINT) AS stage, n_tok FROM tok),
      |agg AS (
      |  SELECT stage, count(*) AS n_docs, sum(n_tok)::BIGINT AS stage_tokens,
      |    min(n_tok) AS min_tokens, max(n_tok) AS max_tokens
      |  FROM staged GROUP BY stage)
      |SELECT stage, n_docs, stage_tokens, min_tokens, max_tokens,
      |  CAST(sum(stage_tokens) OVER (ORDER BY stage
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens,
      |  floor(CAST(sum(stage_tokens) OVER (ORDER BY stage
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    / CAST(sum(stage_tokens) OVER () AS BIGINT) * 1e4 + 0.5) / 1e4 AS cum_share
      |FROM agg ORDER BY stage""".stripMargin

  /** The four PII pattern classes, in REDACTION ORDER (email first so
    * its digit runs can't be re-matched as numbers; SSN before phone so
    * the more specific 3-part pattern wins). Patterns stay in the
    * Java-regex ∩ RE2 common subset so Spark and the DuckDB oracle
    * compile them identically. */
  private val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", "\\d{3}-\\d{2}-\\d{4}", "<SSN>"),
    ("phone", "\\b555-\\d{4}", "<PHONE>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"))

  /** PII detect + redact — the scrub stage every public-data training
    * pipeline runs before anything else sees the text. Detection counts
    * per class, then an ordered `regexp_replace` chain, then a RESIDUAL
    * re-scan of the redacted text that must come back zero — the output
    * carries its own completeness proof, so a pattern regression is a
    * visible nonzero column, not silent leakage.
    *
    * The synthetic corpus carries no organic PII, so the operator first
    * injects one span of each class deterministically from `doc_id`
    * (both engines apply the same injection — what's verified
    * cross-engine is the regex semantics: counts AND the md5 of the
    * redacted text). Everything is record-local string work: no
    * shuffle, no UDF — four codegen'd regex passes that scale linearly
    * with corpus bytes, and the only exchange in the plan is the
    * ORDER BY of the 500-row report. */
  def pipeRedact: Q = (s, d) => {
    val idS = col("doc_id").cast("string")
    val aug = concat(col("text"),
      lit(" reach user"), idS, lit("@mail.example.com"),
      lit(" call 555-"), lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
      lit(" from 10."), pmod(col("doc_id"), lit(250)).cast("string"),
      lit(".0."), pmod(col("doc_id"), lit(200)).cast("string"),
      lit(" id 987-65-"), lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
    val redacted = piiPatterns.foldLeft(col("t")) {
      case (c, (_, pat, tok)) => regexp_replace(c, pat, tok)
    }
    val residual = piiPatterns.map { case (_, pat, _) =>
      regexp_count(col("clean"), lit(pat)) }.reduce(_ + _)
    Tables.documents(s, d)
      .select(col("doc_id"), aug.as("t"))
      .select(col("doc_id"), col("t"), redacted.as("clean"))
      .select((col("doc_id") +:
        piiPatterns.map { case (name, pat, _) =>
          regexp_count(col("t"), lit(pat)).cast("long").as(s"n_$name") } :+
          residual.cast("long").as("n_residual") :+
          md5s(col("clean")).as("clean_hash")): _*)
      .orderBy(col("doc_id"))
  }

  val pipeRedactSql: String = {
    val redacted = piiPatterns.foldLeft("t") {
      case (e, (_, pat, tok)) => s"regexp_replace($e, '$pat', '$tok', 'g')"
    }
    val counts = piiPatterns.map { case (name, pat, _) =>
      s"CAST(len(regexp_extract_all(t, '$pat')) AS BIGINT) AS n_$name" }.mkString(",\n    ")
    val residual = piiPatterns.map { case (_, pat, _) =>
      s"len(regexp_extract_all(clean, '$pat'))" }.mkString(" + ")
    s"""WITH aug AS (
       |  SELECT doc_id,
       |    text || ' reach user' || CAST(doc_id AS VARCHAR) || '@mail.example.com'
       |      || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |      || ' from 10.' || CAST(doc_id % 250 AS VARCHAR)
       |      || '.0.' || CAST(doc_id % 200 AS VARCHAR)
       |      || ' id 987-65-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
       |  FROM documents),
       |red AS (SELECT doc_id, t, $redacted AS clean FROM aug)
       |SELECT doc_id,
       |    $counts,
       |  CAST($residual AS BIGINT) AS n_residual,
       |  md5(clean) AS clean_hash
       |FROM red ORDER BY doc_id""".stripMargin
  }

  /** Chunk size / stride for [[pipeChunk]] (overlap = size − stride).
    * Sized to the testdata's 10–99-token docs so the multi-chunk path is
    * actually exercised by the oracle; a production context window just
    * scales both constants. */
  val ChunkSize = 48
  val ChunkStride = 32

  /** Sliding-window document chunking: split each doc's token stream into
    * fixed [[ChunkSize]]-token windows advancing by [[ChunkStride]]
    * (32-token overlap) — the context-window preprocessing step between
    * curation and packing: a doc longer than the model context must
    * become overlapping chunks BEFORE packing or its tail is truncated
    * silently. Emits one row per chunk with its token offsets; a doc at
    * or under one window is exactly one chunk (including empty docs —
    * dropping them silently here would desync downstream token
    * accounting). All integer math, record-local: the chunk spine is a
    * `sequence` explode with fanout n/stride — no shuffle at all until
    * the output sort. */
  def pipeChunk: Q = (s, d) => {
    // null text counts 0 tokens, not Spark's legacy size(null) = -1 — a
    // -1 would emit a chunk with negative token count and desync the
    // token accounting this operator exists to preserve (NullInputSpec)
    val n = when(col("text").isNotNull, size(tokens(col("text"))).cast("long")).otherwise(0L)
    Tables.documents(s, d)
      .select(col("doc_id"), n.as("n_tokens"))
      .withColumn("n_chunks",
        when(col("n_tokens") <= ChunkSize, lit(1L))
          // integer `div`, not a double quotient cast — trunc-vs-round
          // cast semantics differ across engines (the ev_rfm lesson)
          .otherwise(expr(
            s"(n_tokens - $ChunkSize + ${ChunkStride - 1}) div $ChunkStride + 1")))
      .withColumn("chunk_idx", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * ChunkStride).as("tok_start"),
        least(lit(ChunkSize.toLong), col("n_tokens") - col("chunk_idx") * ChunkStride)
          .as("n_chunk_tokens"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  val pipeChunkSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    coalesce(CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> length(x) > 0)) AS BIGINT), 0) AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, n_tokens,
       |    CASE WHEN n_tokens <= $ChunkSize THEN 1
       |         ELSE (n_tokens - $ChunkSize + ${ChunkStride - 1}) // $ChunkStride + 1 END AS n_chunks
       |  FROM t),
       |e AS (
       |  SELECT doc_id, n_tokens, unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
       |  FROM c)
       |SELECT doc_id, chunk_idx, chunk_idx * $ChunkStride AS tok_start,
       |  least($ChunkSize, n_tokens - chunk_idx * $ChunkStride) AS n_chunk_tokens
       |FROM e ORDER BY doc_id, chunk_idx""".stripMargin

  /** Dataset card: the per-(lang, source) summary table published beside
    * a training corpus — doc counts, exact-dedup uniqueness, token totals
    * and means, and each stratum's share of the corpus token budget. One
    * scan into a tiny (≤|langs|·|sources|) aggregate; the corpus total is
    * a broadcast scalar (ev_decay idiom), so shares need no second pass
    * over the data. Distinct-hash counts partial-aggregate per stratum. */
  def pipeDatacard: Q = (s, d) => {
    val base = Tables.documents(s, d)
      .select(col("lang"), col("source"),
        // null text = 0 tokens (same contract as pipeChunk; legacy
        // size(null) is -1 and would subtract from the token census)
        when(col("text").isNotNull, size(tokens(col("text"))).cast("long")).otherwise(0L)
          .as("n_tokens"),
        md5s(graft.functions.TextFns.normText(col("text"))).as("content_hash"))
    // ONE corpus scan: the corpus token total is a frame-max-style window
    // sum over the strata aggregate itself (≤|langs|·|sources| rows — a
    // single-partition window over kilobytes), not a broadcast scalar
    // re-aggregating the corpus (audited: that formulation scanned
    // documents twice, no AQE reuse across the broadcast boundary).
    val totW = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val agg = base.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("content_hash")).as("n_unique"),
        sum(col("n_tokens")).as("total_tokens"))
    agg.withColumn("corpus_tokens", sum(col("total_tokens")).over(totW))
      .select(col("lang"), col("source"), col("n_docs"), col("n_unique"),
        col("total_tokens"),
        Exact.floorRound(col("total_tokens").cast("double") / col("n_docs"), 4)
          .as("avg_tokens"),
        Exact.floorRound(col("total_tokens").cast("double") / col("corpus_tokens"), 6)
          .as("token_share"))
      .orderBy(col("lang").asc_nulls_last, col("source").asc_nulls_last)
  }

  val pipeDatacardSql: String = {
    val nTok = "coalesce(CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> length(x) > 0)) AS BIGINT), 0)"
    s"""WITH base AS (
       |  SELECT lang, source, $nTok AS n_tokens,
       |    md5(${graft.functions.TextFns.normTextSql("text")}) AS content_hash
       |  FROM documents),
       |agg AS (
       |  SELECT lang, source, count(*) AS n_docs,
       |    count(DISTINCT content_hash) AS n_unique,
       |    CAST(sum(n_tokens) AS BIGINT) AS total_tokens
       |  FROM base GROUP BY 1, 2),
       |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS corpus_tokens FROM base)
       |SELECT lang, source, n_docs, n_unique, total_tokens,
       |  ${Exact.floorRoundSql("total_tokens::DOUBLE / n_docs", 4)} AS avg_tokens,
       |  ${Exact.floorRoundSql("total_tokens::DOUBLE / corpus_tokens", 6)} AS token_share
       |FROM agg CROSS JOIN tot ORDER BY lang, source""".stripMargin
  }

  /** Temperature-mixing decision card: for each sampling temperature α,
    * every source's mixture share w_s = tot_s^α / Σ_r tot_r^α and the
    * effective epochs B·w_s / tot_s it implies at a fixed token budget —
    * the table a multi-source training run reads to pick α (α = 1 is
    * proportional sampling that lets giant sources drown the tail; α → 0
    * is uniform sampling that epochs tiny sources into memorization;
    * published multilingual runs pick the knee in between). The executed
    * α = 0.5 path is [[pipeBudgetMix]]; this is its sweep twin, the same
    * relationship dd_lsh_tuning bears to dd_lsh_pairs.
    *
    * α is restricted to {0.25, 0.5, 0.75, 1} so every power folds into
    * IEEE-correctly-rounded sqrt compositions (x^¼ = √√x, x^¾ = √x·√√x —
    * one correctly-rounded multiply) — `pow` itself carries no
    * cross-libm exactness guarantee and would make the oracle hash
    * flaky at share boundaries.
    *
    * Scale shape: one corpus pass into the |sources|-row totals frame;
    * the α explode and the per-α share windows run on 4·|sources| rows
    * of aggregate output — no corpus-sized shuffle, no data movement
    * beyond the one groupBy(source). */
  def pipeAlphaSweep: Q = (s, d) => {
    val per = Tables.documents(s, d)
      .filter(col("source").isNotNull && col("text").isNotNull)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(tokens(col("text"))).cast("long")).as("n_tokens"))
    val t = col("n_tokens").cast("double")
    val weights = Seq(
      0.25 -> sqrt(sqrt(t)),
      0.5 -> sqrt(t),
      0.75 -> (sqrt(t) * sqrt(sqrt(t))),
      1.0 -> t)
    val exploded = per.select(col("source"), col("n_docs"), col("n_tokens"),
      explode(array(weights.map { case (a, wc) =>
        struct(lit(a).as("alpha"), wc.as("w")) }: _*)).as("aw"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("aw.alpha").as("alpha"), col("aw.w").as("w"))
    val perAlpha = Window.partitionBy(col("alpha"))
    val share = col("w") / col("wsum")
    exploded
      .withColumn("wsum",
        sum(col("w").cast("decimal(38,18)")).over(perAlpha).cast("double"))
      .withColumn("toksum", sum(col("n_tokens")).over(perAlpha).cast("double"))
      .select(col("alpha"), col("source"), col("n_docs"), col("n_tokens"),
        Exact.floorRound(col("n_tokens").cast("double") / col("toksum"), 6)
          .as("raw_share"),
        Exact.floorRound(share, 6).as("temp_share"),
        when(col("n_tokens") > 0,
          Exact.floorRound(lit(100000.0) * share / col("n_tokens").cast("double"), 6))
          .as("epochs"))
      .orderBy(col("alpha"), col("source"))
  }

  val pipeAlphaSweepSql: String =
    s"""WITH per AS (
       |  SELECT source, count(*) AS n_docs,
       |    CAST(sum(len(list_filter(string_split_regex(text, '\\s+'),
       |      x -> length(x) > 0))) AS BIGINT) AS n_tokens
       |  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
       |  GROUP BY 1),
       |ex AS (
       |  SELECT source, n_docs, n_tokens, alpha,
       |    CASE alpha
       |      WHEN 0.25 THEN sqrt(sqrt(n_tokens::DOUBLE))
       |      WHEN 0.5 THEN sqrt(n_tokens::DOUBLE)
       |      WHEN 0.75 THEN sqrt(n_tokens::DOUBLE) * sqrt(sqrt(n_tokens::DOUBLE))
       |      ELSE n_tokens::DOUBLE END AS w
       |  FROM per, unnest([0.25::DOUBLE, 0.5::DOUBLE, 0.75::DOUBLE, 1.0::DOUBLE]) AS a(alpha)),
       |ws AS (
       |  SELECT *,
       |    sum(w::DECIMAL(38,18)) OVER (PARTITION BY alpha)::DOUBLE AS wsum,
       |    sum(n_tokens) OVER (PARTITION BY alpha)::DOUBLE AS toksum
       |  FROM ex)
       |SELECT alpha, source, n_docs, n_tokens,
       |  ${Exact.floorRoundSql("n_tokens::DOUBLE / toksum", 6)} AS raw_share,
       |  ${Exact.floorRoundSql("w / wsum", 6)} AS temp_share,
       |  CASE WHEN n_tokens > 0
       |    THEN ${Exact.floorRoundSql("100000.0 * (w / wsum) / n_tokens::DOUBLE", 6)}
       |  END AS epochs
       |FROM ws ORDER BY alpha, source""".stripMargin

  /** Power-of-two ladder for [[pipeLenBuckets]] — shared with the oracle
    * SQL via [[lenBucketCaseSql]]. */
  private val LenBuckets = Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L, 2048L, 4096L)

  private def lenBucketCaseSql(col: String): String =
    LenBuckets.init.map(b => s"WHEN $col <= $b THEN $b").mkString(
      "CASE ", " ", s" ELSE ${LenBuckets.last} END")

  /** Sequence-length bucketing card — the batch-shape decision table for
    * PADDED training/finetune loaders (the alternative to
    * [[pipePacking]]'s concat-packing): every doc lands in the smallest
    * power-of-two token bucket that holds it (16…4096; longer docs clamp
    * to the top bucket — they get SPLIT by pipe_chunk, not padded, so
    * they waste nothing here and are counted in `n_oversize` instead).
    * Per bucket: doc count, real token mass, padding tokens the bucket
    * shape would burn, and the padding-waste share — the number you
    * compare against packing's cross-doc attention contamination to pick
    * a batching strategy per corpus.
    *
    * Exactness: everything is integer arithmetic off one record-local
    * tokenize; waste_share is a single exact-int ratio, floor-rounded.
    * Scale: one scan, one partial-agged groupBy on a ≤9-value key —
    * the hot-key concern of a 9-value grouping does not apply because
    * partial aggregation collapses each map partition to ≤9 rows before
    * the shuffle. */
  def pipeLenBuckets: Q = (s, d) => {
    val bucket = LenBuckets.init.foldRight(lit(LenBuckets.last): org.apache.spark.sql.Column)(
      (b, acc) => when(col("n_tokens") <= b, lit(b)).otherwise(acc))
    Tables.documents(s, d)
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("bucket", bucket)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        sum(col("bucket") - least(col("n_tokens"), col("bucket"))).as("pad_tokens"),
        sum(when(col("n_tokens") > LenBuckets.last, 1L).otherwise(0L)).as("n_oversize"))
      .withColumn("waste_share", Exact.floorRound(
        col("pad_tokens").cast("double") / (col("n_docs") * col("bucket")), 6))
      .orderBy(col("bucket"))
  }

  val pipeLenBucketsSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> length(x) > 0)) AS BIGINT) AS n_tokens
       |  FROM documents),
       |b AS (SELECT n_tokens, ${lenBucketCaseSql("n_tokens")} AS bucket FROM t)
       |SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       |  CAST(sum(bucket - least(n_tokens, bucket)) AS BIGINT) AS pad_tokens,
       |  CAST(sum(CASE WHEN n_tokens > ${LenBuckets.last} THEN 1 ELSE 0 END) AS BIGINT) AS n_oversize,
       |  ${Exact.floorRoundSql(
            "CAST(sum(bucket - least(n_tokens, bucket)) AS DOUBLE) / (count(*) * bucket)", 6)} AS waste_share
       |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Post-trim corpus-budget card (round 12) — the re-plan step after
    * boilerplate line removal that [[graft.operators.Dedup.ddLineTrim]]'s
    * token ledger exists for: per (lang, source) stratum, doc count, raw
    * vs kept vs removed token totals, the stratum's removed share, and
    * its share of the corpus's KEPT token budget — the number a sampling
    * config (pipe_alpha_sweep / pipe_budget_mix) is re-balanced against
    * once trimming changes every stratum's mass by a different factor
    * (boilerplate is not uniformly distributed across sources; that is
    * the whole point of measuring it per stratum). Docs with no
    * countable segments (null/empty/whitespace text) carry no tokens
    * and do not participate, exactly as in the trim itself.
    *
    * Scale shape: the trim pipeline's own shape (pinned segment frame,
    * partial-agg census, AQE-splittable join-back) feeds a doc_id-keyed
    * join to the (lang, source) metadata — column-pruned to three
    * columns — and collapses to a strata-sized aggregate; the corpus
    * total is a frame window over THAT aggregate (the pipe_datacard
    * discipline). Exact longs; 4/6-dp floor-rounded exact quotients. */
  def pipeTrimBudget: Q = (s, d) => {
    val trim = graft.operators.Dedup.ddLineTrim(s, d)
      .select(col("doc_id"), col("n_tokens"),
        col("kept_tokens"), col("removed_tokens"))
    val meta = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"))
    val totW = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    trim.join(meta, "doc_id")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("raw_tokens"),
        sum(col("kept_tokens")).as("kept_tokens"),
        sum(col("removed_tokens")).as("removed_tokens"))
      .withColumn("corpus_kept", sum(col("kept_tokens")).over(totW))
      .select(col("lang"), col("source"), col("n_docs"),
        col("raw_tokens"), col("kept_tokens"), col("removed_tokens"),
        when(col("raw_tokens") > 0, Exact.floorRound(
          col("removed_tokens").cast("double") / col("raw_tokens"), 4))
          .as("removed_share"),
        when(col("corpus_kept") > 0, Exact.floorRound(
          col("kept_tokens").cast("double") / col("corpus_kept"), 6))
          .as("kept_budget_share"))
      .orderBy(col("lang").asc_nulls_last, col("source").asc_nulls_last)
  }

  val pipeTrimBudgetSql: String =
    s"""WITH j AS (
       |  SELECT d.lang, d.source, t.n_tokens, t.kept_tokens, t.removed_tokens
       |  FROM (${graft.operators.Dedup.ddLineTrimSql}) t
       |  JOIN documents d USING (doc_id)),
       |a AS (
       |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(n_tokens) AS BIGINT) AS raw_tokens,
       |    CAST(sum(kept_tokens) AS BIGINT) AS kept_tokens,
       |    CAST(sum(removed_tokens) AS BIGINT) AS removed_tokens
       |  FROM j GROUP BY 1, 2)
       |SELECT lang, source, n_docs, raw_tokens, kept_tokens, removed_tokens,
       |  CASE WHEN raw_tokens > 0 THEN ${Exact.floorRoundSql(
            "removed_tokens::DOUBLE / raw_tokens", 4)} END AS removed_share,
       |  CASE WHEN (SELECT CAST(sum(kept_tokens) AS BIGINT) FROM a) > 0
       |    THEN ${Exact.floorRoundSql(
            "kept_tokens::DOUBLE / (SELECT CAST(sum(kept_tokens) AS BIGINT) FROM a)", 6)}
       |  END AS kept_budget_share
       |FROM a ORDER BY lang, source""".stripMargin

  def queries: Map[String, Q] = Map(
    "pipe_trim_budget" -> pipeTrimBudget,
    "pipe_len_buckets" -> pipeLenBuckets,
    "pipe_alpha_sweep" -> pipeAlphaSweep,
    "pipe_chunk" -> pipeChunk,
    "pipe_datacard" -> pipeDatacard,
    "pipe_redact" -> pipeRedact,
    "pipe_budget_mix" -> pipeBudgetMix,
    "pipe_curation" -> pipeCuration,
    "pipe_curriculum" -> pipeCurriculum,
    "pipe_packing" -> pipePacking,
    "pipe_sample" -> pipeSample,
    "pipe_split" -> pipeSplit,
    "pipe_interleave" -> pipeInterleave,
    "pipe_shuffle" -> pipeShuffle)

  def oracleSql: Map[String, String] = Map(
    "pipe_trim_budget" -> pipeTrimBudgetSql,
    "pipe_len_buckets" -> pipeLenBucketsSql,
    "pipe_alpha_sweep" -> pipeAlphaSweepSql,
    "pipe_chunk" -> pipeChunkSql,
    "pipe_datacard" -> pipeDatacardSql,
    "pipe_redact" -> pipeRedactSql,
    "pipe_budget_mix" -> pipeBudgetMixSql,
    "pipe_curation" -> pipeCurationSql,
    "pipe_curriculum" -> pipeCurriculumSql,
    "pipe_packing" -> pipePackingSql,
    "pipe_sample" -> pipeSampleSql,
    "pipe_split" -> pipeSplitSql,
    "pipe_interleave" -> pipeInterleaveSql,
    "pipe_shuffle" -> pipeShuffleSql)
}
