package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-signature MinHash in a single pass over a document's shingle
  * array — no explode, no shuffle, no aggregation. Returns the 8-slot
  * signature as `array<string>` (8-hex-char slices of 2 salted md5 digests
  * per shingle, lexicographic min per slot).
  *
  * Math is identical to the oracle CTE in Dedup.minhashCte
  * (`min(substr(md5(g || '|' || s), 8k+1, 8))`), so results hash-match;
  * this form just removes the 300×-per-doc row explosion the aggregation
  * plan pays (reference operator analog: per-batch fingerprinting in the
  * loader's record pipeline, computed record-local the same way).
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_minhash expects array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.compute($c);")

  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)

  override def prettyName: String = "graft_minhash"
}

object MinHashSig {
  final val NumSalts = 2
  final val SlicesPerDigest = 4
  final val NumHashes: Int = NumSalts * SlicesPerDigest

  // Kernel internals, shared by [[compute]] and [[computeFromTokensN]].
  // Slot minima are kept as UNSIGNED 32-bit digest slices (one Long per
  // slot, -1 = empty) and hex-rendered only at OUTPUT: fixed-width
  // lowercase hex sorts exactly as its numeric value, so an integer min
  // is bit-identical to the old per-shingle `substring` + string-compare
  // form with no per-(shingle, salt) string/boxing allocation — the
  // digest itself lands in a caller-preallocated 16-byte buffer via
  // `md.digest(buf, 0, 16)`. The digest input is `<salt>|<shingle>`
  // composed from a constant salt-prefix byte array + the shingle's
  // UTF-8 bytes encoded ONCE per shingle — the old form re-concatenated
  // and re-encoded the whole string once per SALT, which dominated the
  // wide-signature kernels.
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val SaltPrefix: Array[Array[Byte]] = (0 until 64)
    .map(g => (g.toString + "|").getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
  private val HexChars = "0123456789abcdef".toCharArray

  /** Fold one shingle's salted digest slices into the running minima;
    * `dig` is a caller-owned 16-byte scratch buffer reused across calls. */
  private def foldShingle(mins: Array[Long], numSalts: Int,
      md: java.security.MessageDigest, dig: Array[Byte],
      sBytes: Array[Byte]): Unit = {
    var g = 0
    while (g < numSalts) {
      md.reset()
      md.update(SaltPrefix(g))
      md.update(sBytes)
      md.digest(dig, 0, 16)
      var k = 0
      while (k < SlicesPerDigest) {
        val v = ((dig(4 * k) & 0xffL) << 24) | ((dig(4 * k + 1) & 0xffL) << 16) |
          ((dig(4 * k + 2) & 0xffL) << 8) | (dig(4 * k + 3) & 0xffL)
        val j = g * SlicesPerDigest + k
        if (mins(j) == -1L || v < mins(j)) mins(j) = v
        k += 1
      }
      g += 1
    }
  }

  /** Render the slot minima as the 8-hex-char signature array. */
  private def render(mins: Array[Long]): GenericArrayData = {
    val out = new Array[AnyRef](mins.length)
    var j = 0
    while (j < mins.length) {
      out(j) =
        if (mins(j) == -1L) null
        else {
          val cs = new Array[Char](8)
          var h = 0
          while (h < 8) {
            cs(h) = HexChars(((mins(j) >> (28 - 4 * h)) & 0xfL).toInt)
            h += 1
          }
          UTF8String.fromString(new String(cs))
        }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Single-pass signature; null/empty input slots stay null (callers
    * filter empty shingle arrays to keep oracle parity). */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val mins = new Array[Long](NumHashes)
    java.util.Arrays.fill(mins, -1L)
    val md = md5Local.get()
    val dig = new Array[Byte](16)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        foldShingle(mins, NumSalts, md, dig,
          arr.getUTF8String(i).toString
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      i += 1
    }
    render(mins)
  }

  /** [[MinHashTokens]] kernel: the same signature as [[compute]] over the
    * word 3-gram shingles of `toks`, but the shingles are built inside
    * the loop (one StringBuilder join per window) instead of as a column.
    * Exactly `TextFns.shingles3` ∘ [[compute]] for the arrays
    * `TextFns.tokens` produces (which never contain nulls — a null token
    * here renders as an empty string, where concat_ws would skip it):
    * space-joined 3-windows, < 3 tokens → all slots null. */
  def computeFromTokens(toks: ArrayData): ArrayData =
    computeFromTokensN(toks, NumSalts)

  /** [[computeFromTokens]] at an arbitrary salt count (`numSalts × 4`
    * permutations). Salts are a PREFIX chain: the first `4 × g` slots of
    * a wider signature are bit-identical to the `g`-salt signature (salt
    * g's digest never depends on the salt count), so a width sweep pays
    * ONE widest pass and slices — the dd_sig_width decision-card
    * contract. */
  def computeFromTokensN(toks: ArrayData, numSalts: Int): ArrayData = {
    require(numSalts >= 1 && numSalts <= SaltPrefix.length,
      s"numSalts must be in [1, ${SaltPrefix.length}] (got $numSalts)")
    val nHashes = numSalts * SlicesPerDigest
    val n = toks.numElements()
    val mins = new Array[Long](nHashes)
    java.util.Arrays.fill(mins, -1L)
    val md = md5Local.get()
    val dig = new Array[Byte](16)
    var i = 0
    while (i + 2 < n) {
      val sb = new java.lang.StringBuilder
      var w = 0
      while (w < 3) {
        if (w > 0) sb.append(' ')
        if (!toks.isNullAt(i + w)) sb.append(toks.getUTF8String(i + w).toString)
        w += 1
      }
      foldShingle(mins, numSalts, md, dig,
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      i += 1
    }
    render(mins)
  }
}

/** MinHash signature directly from a TOKEN array — semantically
  * `graft_minhash(shingles3(tokens))`, fused record-local.
  *
  * The fused form exists for PLAN SAFETY, not just speed: `shingles3`
  * is a `transform` lambda over the token column, and whenever the
  * optimizer inlines the token alias into that lambda (alias inlining
  * by CollapseProject/PushDownPredicates — higher-order-function bodies
  * also get no codegen subexpression elimination), the tokenizer
  * re-evaluates per lambda ELEMENT: O(tokens²) per doc, measured 8×
  * wall on the near-dup gate build. A native unary expression gives the
  * optimizer nothing to inline through — tokenize runs once per row,
  * shingling is a linear loop inside [[MinHashSig.computeFromTokens]]. */
case class MinHashTokens(child: Expression) extends UnaryExpression {

  /** DELIBERATE LIE for plan safety — the function is a pure hash of its
    * input (bit-identical on every run; OperatorsSpec re-runs every
    * query and compares). Flagging it nondeterministic is the standard
    * Spark idiom for expensive scalar functions (`udf.asNondeterministic`
    * serves the same purpose): the optimizer must not duplicate,
    * inline, or push through it, so a multi-reference consumer (the 8
    * band-key reads, the gate's 5 filter references) reads ONE
    * materialized attribute instead of re-running tokenize+minhash per
    * reference. A rand()-column barrier was tried first and failed:
    * column pruning removes the unused rand column, and alias inlining
    * then resumes (measured: dd_minhash 0.3 → 0.76 s when the 8
    * element_at reads each re-ran the chain). */
  override lazy val deterministic: Boolean = false

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_minhash_tokens expects array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.computeFromTokens(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.computeFromTokens($c);")

  override protected def withNewChildInternal(c: Expression): MinHashTokens = copy(child = c)

  override def prettyName: String = "graft_minhash_tokens"
}

/** [[MinHashTokens]] at a caller-chosen width: `salts × 4` permutations
  * (`graft_minhash_tokens_w(tk, salts)`; the salt count is baked at
  * registration from a required int literal, so the kernel loop bound is
  * a plan-time constant). Two salts ≡ [[MinHashTokens]] bit-exactly, and
  * wider signatures are prefix-consistent (see
  * [[MinHashSig.computeFromTokensN]]) — the signature-width sweep behind
  * the dd_sig_width scaling card. Same deliberate nondeterminism flag as
  * [[MinHashTokens]] (multi-reference consumers must read one
  * materialized attribute). */
case class MinHashTokensWide(child: Expression, salts: Int) extends UnaryExpression {

  override lazy val deterministic: Boolean = false

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_minhash_tokens_w expects array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.computeFromTokensN(input.asInstanceOf[ArrayData], salts)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.computeFromTokensN($c, $salts);")

  override protected def withNewChildInternal(c: Expression): MinHashTokensWide = copy(child = c)

  override def prettyName: String = "graft_minhash_tokens_w"
}
