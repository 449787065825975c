package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** PQ asymmetric-distance (ADC) score: given a query's flattened m×k
  * lookup table and a vector's m subspace codes, sums the m table
  * entries `lut[j*k + code_j]` — the 8-lookup replacement for a 64-dim
  * dot product that makes product quantization fast. A higher-order
  * `aggregate(sequence(...))` computes the same thing interpreted, per
  * element, with lambda dispatch (measured ~4 s for 1M pairs at sf0.1);
  * this expression compiles to a tight loop inside whole-stage codegen.
  * Accumulation is double left-to-right from 0.0 (matches the oracle's
  * `list_reduce` fold exactly). k is derived per row as lut.length /
  * codes.length. */
case class PqAdcScore(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_score expects (array<double> lut, array<bigint> codes), got $l and $r")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    val k = if (m == 0) 0 else lut.numElements() / m
    // shape/range violations must error loudly: an unchecked index into
    // UnsafeArrayData reads arbitrary memory as a double (garbage scores)
    if (m != 0 && k * m != lut.numElements())
      throw PqAdcScore.shapeError(lut.numElements(), m)
    var acc = 0.0
    var j = 0
    while (j < m) {
      // null elements must error like shape violations do: getLong on a
      // null UnsafeArrayData slot silently reads 0 (a valid-looking code)
      if (codes.isNullAt(j)) throw PqAdcScore.nullCodeError(j)
      val c = codes.getLong(j)
      if (c < 0 || c >= k) throw PqAdcScore.codeError(c, k)
      if (lut.isNullAt(j * k + c.toInt)) throw PqAdcScore.nullLutError(j * k + c.toInt)
      acc += lut.getDouble(j * k + c.toInt)
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, codes) => {
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      val cls = "graft.functions.PqAdcScore"
      s"""
         |int $m = $codes.numElements();
         |int $k = $m == 0 ? 0 : $lut.numElements() / $m;
         |if ($m != 0 && $k * $m != $lut.numElements())
         |  throw $cls.shapeError($lut.numElements(), $m);
         |double $acc = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  if ($codes.isNullAt($j)) throw $cls.nullCodeError($j);
         |  long $c = $codes.getLong($j);
         |  if ($c < 0 || $c >= $k) throw $cls.codeError($c, $k);
         |  if ($lut.isNullAt($j * $k + (int) $c)) throw $cls.nullLutError($j * $k + (int) $c);
         |  $acc += $lut.getDouble($j * $k + (int) $c);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcScore =
    copy(left = l, right = r)

  override def prettyName: String = "graft_pq_score"
}

/** Standalone-object statics so generated Java can raise the same errors. */
object PqAdcScore {
  def shapeError(lutLen: Int, m: Int): IllegalArgumentException =
    new IllegalArgumentException(
      s"graft_pq_score: lut length $lutLen is not a multiple of codes length $m")
  def codeError(code: Long, k: Int): IllegalArgumentException =
    new IllegalArgumentException(
      s"graft_pq_score: code $code out of range [0, $k)")
  def nullCodeError(j: Int): IllegalArgumentException =
    new IllegalArgumentException(
      s"graft_pq_score: null code at subspace $j")
  def nullLutError(idx: Int): IllegalArgumentException =
    new IllegalArgumentException(
      s"graft_pq_score: null lut entry at index $idx")
}
