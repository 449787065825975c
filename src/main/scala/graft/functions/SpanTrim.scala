package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Record-local duplicated-span excision (round 15) — the kernel behind
  * the streaming twin of the batch `dd_span_trim` operator
  * ([[graft.operators.Dedup.ddSpanTrim]]): given a token array and one
  * boolean per `width`-token window ("is this window a known
  * duplicate?"), merge consecutive flagged windows into runs, and drop
  * every token covered by a run of `minTokens`+ tokens (a run of
  * windows [p, q] covers tokens p .. q+width−1). Returns the KEPT
  * tokens in original order.
  *
  * Same cut rule as the batch operator's gaps-and-islands frame BY
  * CONSTRUCTION — the batch side computes the flags corpus-wide (8-gram
  * hash count > 1) and cuts relationally; this kernel replays the
  * identical islands/threshold/coverage arithmetic on one record
  * (StreamingSpec pins cleaned-text equality when the history filter
  * holds exactly the corpus's duplicated grams).
  *
  * Why an expression and not HOFs: the span fold consumes the flags
  * array ONCE; a `filter`+`exists`-over-`aggregate` composition
  * references the (unevaluated) fold alias per token, and projection
  * collapse then re-derives it per reference — the O(n²) alias-inlining
  * hazard the fused minhash kernel documents. Here flags and tokens are
  * each read exactly once per call.
  *
  * Null handling: a null tokens OR flags array yields null
  * (BinaryExpression null intolerance — callers pass the original text
  * through, the lineTrim convention). Null flag ELEMENTS read as
  * "not duplicated"; null token elements are kept/cut by position like
  * any other. A flags array shorter/longer than tokens−width+1 is
  * accepted (runs clamp to the token range) — the caller contract is
  * `graft_gram_buckets` output, which always matches.
  *
  * Codegen: a single static kernel call per row — loop shared with the
  * interpreted path by construction (the CdcCuts pattern).
  */
case class SpanTrim(left: Expression, right: Expression,
    width: Int, minTokens: Int) extends BinaryExpression {

  require(width >= 1, s"graft_span_trim: width must be >= 1 (got $width)")
  require(minTokens >= 1, s"graft_span_trim: minTokens must be >= 1 (got $minTokens)")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(BooleanType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_span_trim expects (array<string> tokens, array<boolean> window flags), got $l and $r")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    SpanTrimKernel.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], width, minTokens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, flags) =>
      s"${ev.value} = graft.functions.SpanTrimKernel$$.MODULE$$.compute(" +
        s"$toks, $flags, $width, $minTokens);")

  override def prettyName: String = "graft_span_trim"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SpanTrimKernel {

  def compute(toks: ArrayData, flags: ArrayData,
      width: Int, minTokens: Int): ArrayData = {
    val nt = toks.numElements()
    val nw = flags.numElements()
    def flagged(p: Int): Boolean = !flags.isNullAt(p) && flags.getBoolean(p)
    val cut = new Array[Boolean](nt)
    var any = false
    var p = 0
    while (p < nw) {
      if (flagged(p)) {
        var q = p // island: the maximal run of consecutive flagged windows
        while (q + 1 < nw && flagged(q + 1)) q += 1
        if (q - p + width >= minTokens) {
          any = true
          var t = p
          val end = math.min(q + width - 1, nt - 1)
          while (t <= end) { cut(t) = true; t += 1 }
        }
        p = q + 1
      } else p += 1
    }
    // fast path: nothing qualified — return the input array untouched
    // (same-row reference, the standard pass-through expression shape)
    if (!any) return toks
    val kept = new Array[AnyRef](nt)
    var k = 0
    var t = 0
    while (t < nt) {
      if (!cut(t)) {
        kept(k) = if (toks.isNullAt(t)) null else toks.getUTF8String(t)
        k += 1
      }
      t += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(kept, k))
  }
}
