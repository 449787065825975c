package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Overlap count of two ASCENDING-sorted `array<int>` sets via a two-
  * pointer merge, with whole-stage codegen — the verification kernel of
  * the PPJoin set-similarity join (operators/Dedup.ddPpjoin).
  *
  * `array_intersect` builds a per-row hash set (allocation + hashed
  * probes per element); on the similarity join's millions of candidate
  * pairs the merge loop is the difference between the verify stage
  * dominating the query and it disappearing (measured ~20 s → ~2 s at
  * sf0.1's 3.7M candidates). Sortedness is the CALLER's contract — the
  * join's token-rank arrays come out of `sort_array` — and is not
  * re-checked here; an unsorted input undercounts (exactly what a merge
  * would do) rather than erroring. Inputs are set-like (distinct
  * elements), so the count equals `|A ∩ B|`. Null elements don't occur
  * in rank arrays (ranks come from a non-null aggregation key); a null
  * ARRAY yields null via BinaryExpression's default null intolerance.
  */
case class SortedOverlapCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_overlap expects two array<int>, got ${left.dataType} and ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val xv = x.getInt(i); val yv = y.getInt(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (nx, ny) = (ctx.freshName("nx"), ctx.freshName("ny"))
      val (i, j, c) = (ctx.freshName("i"), ctx.freshName("j"), ctx.freshName("c"))
      val (xv, yv) = (ctx.freshName("xv"), ctx.freshName("yv"))
      s"""
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  final int $xv = $a.getInt($i);
         |  final int $yv = $b.getInt($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override def prettyName: String = "graft_overlap"

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedOverlapCount =
    copy(left = l, right = r)
}
