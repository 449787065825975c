package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused n-gram hash buckets over a token array: for every window of
  * `n` consecutive tokens, the value of the first `hexDigits` hex chars
  * of md5(space-joined gram), optionally reduced `% mod` — ONE long per
  * gram, in position order. Bit-for-bit equal BY CONTRACT to the
  * composed column chain
  * `conv(substring(md5(concat_ws(' ', gram)), 1, hexDigits), 16, 10)
  * .cast("long") [% mod]` (and to its DuckDB twin
  * `('0x' || substr(md5(gram), 1, hexDigits))::BIGINT [% mod]`), so
  * every oracle written against the composed chain keeps matching —
  * GramBucketsSpec pins the equality property-style.
  *
  * Why an expression: the composed chain materializes one STRING per
  * gram (the concat_ws), hex-encodes the full 16-byte digest, then
  * re-parses 8 hex chars back through conv's radix machinery — per
  * feature, at millions of features per corpus pass this is the hot
  * path of the n-gram dedup/scoring family (dd_dup_span, dd_substring,
  * ta_dsir). The kernel feeds token bytes straight into one reused MD5
  * instance (no gram string, no hex round-trip — the bucket is read
  * directly off the digest's leading nibbles) and emits the whole
  * gram array in a single call per row.
  *
  * Contracts: `n >= 1`; `hexDigits` in [1, 15] (16 would overflow the
  * signed long the composed chain casts to); `mod >= 0`, 0 meaning "no
  * modulo" (the raw hexDigits-prefix value, what dd_dup_span keys on).
  * Fewer than `n` tokens → empty array (matching the callers'
  * `size(tk) >= n` guards). Null token ELEMENTS don't occur in the
  * callers' arrays (tokens() filters empties from a split); the kernel
  * treats one as an empty string rather than throwing. A null ARRAY
  * yields null via UnaryExpression's null intolerance.
  *
  * Codegen: a single static kernel call per row — the loop is shared
  * with the interpreted path by construction (the CdcCuts pattern), so
  * interpreted ≡ codegen holds structurally; the spec still drives both
  * paths through a parquet round-trip.
  */
case class GramBuckets(child: Expression, n: Int, hexDigits: Int, mod: Int)
    extends UnaryExpression {

  require(n >= 1, s"graft_gram_buckets: n must be >= 1 (got $n)")
  require(hexDigits >= 1 && hexDigits <= 15,
    s"graft_gram_buckets: hexDigits in [1, 15] (got $hexDigits — 16 hex digits overflow BIGINT)")
  require(mod >= 0, s"graft_gram_buckets: mod must be >= 0 (0 = no modulo; got $mod)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_gram_buckets expects array<string> tokens, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    GramBucketsKernel.compute(input.asInstanceOf[ArrayData], n, hexDigits, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks =>
      s"${ev.value} = graft.functions.GramBucketsKernel$$.MODULE$$.compute(" +
        s"$toks, $n, $hexDigits, $mod);")

  override def prettyName: String = "graft_gram_buckets"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramBucketsKernel {

  // one MD5 instance per thread, reset implicitly by digest(); a
  // per-gram getInstance would dominate the kernel on short grams
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(toks: ArrayData, n: Int, hexDigits: Int, mod: Int): ArrayData = {
    val nt = toks.numElements()
    val count = if (nt >= n) nt - n + 1 else 0
    val out = new Array[Long](count)
    val md = mdLocal.get()
    var i = 0
    while (i < count) {
      var j = 0
      while (j < n) {
        if (j > 0) md.update(' '.toByte)
        val s = toks.getUTF8String(i + j)
        if (s != null) md.update(s.getBytes)
        j += 1
      }
      val dg = md.digest() // also resets the instance
      // value of the leading hexDigits nibbles — what the composed
      // chain's hex-encode + conv(…, 16, 10) round-trip computes
      var v = 0L
      var k = 0
      while (k < hexDigits) {
        val nib =
          if ((k & 1) == 0) (dg(k >> 1) >> 4) & 0xF
          else dg(k >> 1) & 0xF
        v = (v << 4) | nib
        k += 1
      }
      out(i) = if (mod > 0) v % mod else v
      i += 1
    }
    new GenericArrayData(out)
  }
}
