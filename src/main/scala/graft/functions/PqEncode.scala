package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** PQ encoding kernel: all m subspace codes for one vector against a
  * broadcast FLATTENED codebook, record-locally —
  * `graft_pq_encode(x, cb, m)`.
  *
  * [[IvfAssign]]'s sibling (round 13): the PQ/IVF-PQ ENCODE stage
  * previously scored (vector × codeword) pairs via
  * crossJoin(broadcast(codebook)) + an m-way min_by aggregation — the
  * partial agg collapses map-side but the exchange still moves one row
  * per corpus vector; with the codebook flattened into one broadcast
  * double array the encode is a pure projection and the whole
  * PQ/IVF-PQ build becomes shuffle-free.
  *
  * Layout: `cb` = k blocks of (dim + 1) doubles: [cid, ce(dim)], cids
  * the DENSE codeword ids `graft_pq_score` indexes with. Subspace j of
  * the m covers elements [j·dim/m, (j+1)·dim/m). Per subspace the code
  * is the argmin of `-2·dot(x_j, ce_j) + dot(ce_j, ce_j)` (the |x_j|²
  * term is constant within the argmin — exactly the replaced column
  * expression, dots accumulated double left-to-right), ties to the
  * LOWEST cid; NaN scores order like Spark's sort (never the min unless
  * every score is NaN). Returns the m codes in subspace order, or NULL
  * for an EMPTY codebook — callers filter, restoring the empty-join
  * semantics of the aggregation shape this replaces.
  */
case class PqEncode(left: Expression, right: Expression, m: Int)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val xOk = elemType(left) == FloatType || elemType(left) == DoubleType
    if (xOk && elemType(right) == DoubleType && m >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_pq_encode expects (array<float|double> x, array<double> cb, m >= 1); " +
        s"got (${left.dataType}, ${right.dataType}, $m)")
  }

  override def nullSafeEval(x: Any, cb: Any): Any =
    PqEncode.encode(x.asInstanceOf[ArrayData], elemType(left) == FloatType,
      cb.asInstanceOf[ArrayData], m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val isFloat = elemType(left) == FloatType
    nullSafeCodeGen(ctx, ev, (x, cb) => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  graft.functions.PqEncode.encode($x, $isFloat, $cb, $m);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncode =
    copy(left = l, right = r)

  override def prettyName: String = "graft_pq_encode"
}

object PqEncode {

  // the shared nan-safe score ordering — see IvfAssign.cmpScore's doc
  private def cmpScore(a: Double, b: Double): Int = IvfAssign.cmpScore(a, b)

  /** ONE static kernel shared by the interpreted and codegen paths. */
  def encode(x: ArrayData, xIsFloat: Boolean, cb: ArrayData, m: Int): ArrayData = {
    val dim = x.numElements()
    if (dim % m != 0) throw new IllegalArgumentException(
      s"graft_pq_encode: vector dim $dim is not a multiple of m=$m subspaces")
    val block = dim + 1
    val cLen = cb.numElements()
    if (cLen % block != 0) throw new IllegalArgumentException(
      s"graft_pq_encode: cb length $cLen is not a multiple of its block size $block")
    val k = cLen / block
    if (k == 0) return null
    val sub = dim / m
    val xv = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      xv(i) = if (x.isNullAt(i)) 0.0 else if (xIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      i += 1
    }
    val codes = new Array[Long](m)
    var j = 0
    while (j < m) {
      val lo = j * sub
      var bestCid = -1L
      var bestScore = 0.0
      var c = 0
      while (c < k) {
        val off = c * block
        val cid = cb.getDouble(off)
        // -2·dot(x_j, ce_j) + dot(ce_j, ce_j), each dot a double
        // left-to-right fold — the replaced column expression exactly
        var d1 = 0.0
        var d2 = 0.0
        var t = 0
        while (t < sub) {
          val ce = cb.getDouble(off + 1 + lo + t)
          d1 += xv(lo + t) * ce
          d2 += ce * ce
          t += 1
        }
        val s = -2.0 * d1 + d2
        val cmp = if (bestCid < 0) -1 else cmpScore(s, bestScore)
        if (cmp < 0 || (cmp == 0 && cid.toLong < bestCid)) {
          bestCid = cid.toLong; bestScore = s
        }
        c += 1
      }
      codes(j) = bestCid
      j += 1
    }
    new GenericArrayData(codes)
  }
}
