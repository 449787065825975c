package graft.functions

import org.apache.commons.codec.digest.DigestUtils
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

  /** Single-pass signature; null/empty input slots stay null (callers
    * filter empty shingle arrays to keep oracle parity). */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val mins = new Array[String](NumHashes)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i).toString
        var g = 0
        while (g < NumSalts) {
          val h = DigestUtils.md5Hex(g.toString + "|" + s)
          var k = 0
          while (k < SlicesPerDigest) {
            val j = g * SlicesPerDigest + k
            val sub = h.substring(8 * k, 8 * k + 8)
            if (mins(j) == null || sub.compareTo(mins(j)) < 0) mins(j) = sub
            k += 1
          }
          g += 1
        }
      }
      i += 1
    }
    val out = new Array[AnyRef](NumHashes)
    var j = 0
    while (j < NumHashes) {
      out(j) = if (mins(j) == null) null else UTF8String.fromString(mins(j))
      j += 1
    }
    new GenericArrayData(out)
  }
}
