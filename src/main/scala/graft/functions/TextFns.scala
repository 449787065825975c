package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reusable text columns (all codegen-friendly built-ins, no UDFs).
  * Cross-engine note: every function here has an exact DuckDB twin used by
  * the oracles (string_split_regex/list_filter/list_transform/md5), so
  * results are bit-identical between Spark and the oracle.
  */
object TextFns {

  /** Whitespace tokenization with empty-token removal. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** ONE stopword list shared by ta_quality's per-doc scoring and
    * ta_gopher_rules' per-rule census — the two are documented twins
    * and a drifted copy would silently desynchronize them. */
  val stopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is", "it")

  /** Word 3-gram shingles (space-joined); empty for docs under 3 tokens.
    * Guarded because Spark's sequence() flips direction when stop < start. */
  def shingles3(toks: Column): Column =
    when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2), i =>
        concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))

  /** md5 hex of a string column (Spark needs an explicit binary cast). */
  def md5s(c: Column): Column = md5(c.cast("binary"))

  /** Text normalization for content-hash dedup: lowercase, strip
    * non-alphanumerics, collapse whitespace, trim. ONE definition —
    * pipe_curation's content groups must equal dd_exact_norm's, and a
    * drifted copy would silently break that without failing either
    * oracle. (The SQL twins inline the same chain; [[normTextSql]] keeps
    * them in one place too.) */
  def normText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "), "\\s+", " "))

  /** The DuckDB spelling of [[normText]] (regexp_replace needs the 'g'
    * flag there). */
  def normTextSql(expr: String): String =
    s"trim(regexp_replace(regexp_replace(lower($expr), '[^a-z0-9 ]', ' ', 'g'), '\\s+', ' ', 'g'))"

  /** Salted md5 hex bucket: the first `hexDigits` hex digits of
    * md5(salt ‖ key) parsed as an integer, mod `mod` — THE deterministic
    * content-independent bucketing idiom behind sampling, splits, shard
    * assignment and the count-min rows. One definition so every copy
    * stays arithmetically identical to its hand-written DuckDB twin:
    * `CAST(('0x' || substr(md5('<salt>' || CAST(key AS VARCHAR)), 1, H)) AS BIGINT) % M`. */
  def hashBucket(salt: String, key: Column, hexDigits: Int, mod: Int): Column = {
    // >15 hex digits overflows long: Spark's non-ANSI cast would yield
    // NULL buckets while the DuckDB twin raises a conversion error — a
    // silent one-sided divergence; fail at construction instead
    require(hexDigits >= 1 && hexDigits <= 15,
      s"hashBucket: hexDigits must be in [1, 15] (got $hexDigits — 16 hex digits overflow BIGINT)")
    require(mod >= 1, s"hashBucket: mod must be >= 1 (got $mod)")
    conv(substring(md5s(concat(lit(salt), key)), 1, hexDigits), 16, 10)
      .cast("long") % mod
  }
}
