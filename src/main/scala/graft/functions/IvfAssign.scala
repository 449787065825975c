package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** IVF coarse-assignment kernel: the argmax cell for one vector against a
  * broadcast FLATTENED codebook, record-locally — `graft_ivf_assign(e,
  * nrm, sb, cb, probes)`.
  *
  * This is what makes the IVF build MAP-ONLY (round 13): the previous
  * shape scored cells via crossJoin(broadcast(cents)) + an argmax
  * aggregation, which partial-agg collapses map-side but still pays a
  * full corpus exchange (one row per vector, embedding attached) — at
  * 100 TB the assignment stage's dominant cost. With the codebook
  * flattened into two broadcast double arrays, assignment is a pure
  * projection: zero shuffle, whole-stage codegen, and the two-level rule
  * costs exactly its flops.
  *
  * Layouts (dim = |e|, every block a run of doubles):
  *  - `cb` — candidate blocks of (dim + 3): [parent, cid, cn, ce(dim)].
  *  - `sb` — super-cell blocks of (dim + 2): [scid, sn, se(dim)].
  *    `probes = 0` disables probing entirely (one-level: argmax over
  *    every cb block; pass sb empty). Under `probes > 0` an EMPTY sb
  *    yields -1 — no super-cell means no probed children, matching the
  *    join shape this kernel replaces (an empty sup frame joined to
  *    nothing), NOT a silent fallback to one-level.
  *
  * Rule (both levels tie to the LOWEST id, matching the oracle's
  * `ORDER BY cos DESC, cid`): score = dot(e, ce) / (nrm · cn) with the
  * dot accumulated double left-to-right (bit-identical to
  * [[DotProduct]] and the oracle's `list_reduce` fold); two-level first
  * takes the `probes` best super-cells by the same rule, then argmaxes
  * over cb blocks whose parent is probed. Returns the winning cid, or
  * -1 when no block is eligible (empty codebook / no probed children —
  * callers filter `cell >= 0`, restoring the empty-join semantics of
  * the aggregation shape this replaces). NaN scores order like Spark's
  * sort (greater than everything, ties by id) via Double.compare.
  */
case class IvfAssign(first: Expression, second: Expression,
    third: Expression, fourth: Expression, probes: Int)
    extends QuaternaryExpression {

  override def dataType: DataType = LongType

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val eOk = elemType(first) == FloatType || elemType(first) == DoubleType
    val rest = second.dataType == DoubleType &&
      third.dataType.isInstanceOf[ArrayType] && elemType(third) == DoubleType &&
      fourth.dataType.isInstanceOf[ArrayType] && elemType(fourth) == DoubleType
    if (eOk && rest && probes >= 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_ivf_assign expects (array<float|double> e, double nrm, " +
        s"array<double> sb, array<double> cb, probes >= 0); got (${first.dataType}, " +
        s"${second.dataType}, ${third.dataType}, ${fourth.dataType}, $probes)")
  }

  override def nullSafeEval(e: Any, nrm: Any, sb: Any, cb: Any): Any =
    IvfAssign.assign(e.asInstanceOf[ArrayData], elemType(first) == FloatType,
      nrm.asInstanceOf[Double], sb.asInstanceOf[ArrayData],
      cb.asInstanceOf[ArrayData], probes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val isFloat = elemType(first) == FloatType
    nullSafeCodeGen(ctx, ev, (e, nrm, sb, cb) => {
      s"${ev.value} = graft.functions.IvfAssign.assign($e, $isFloat, $nrm, $sb, $cb, $probes);"
    })
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): IvfAssign =
    copy(first = f, second = s, third = t, fourth = q)

  override def prettyName: String = "graft_ivf_assign"
}

object IvfAssign {

  private def shapeError(what: String, len: Int, block: Int) =
    new IllegalArgumentException(
      s"graft_ivf_assign: $what length $len is not a multiple of its block size $block")

  /** Spark's nan-safe double ordering (the comparison the replaced
    * max_by/TopK shapes used): NaN greater than everything, NaN == NaN,
    * and -0.0 == 0.0 (primitive compare — java.lang.Double.compare
    * would order -0.0 < 0.0 and could flip a tie the oracle breaks the
    * other way). ONE definition shared with [[PqEncode]] — the two
    * kernels' tie rules must never drift. */
  private[functions] def cmpScore(a: Double, b: Double): Int =
    if (java.lang.Double.isNaN(a)) { if (java.lang.Double.isNaN(b)) 0 else 1 }
    else if (java.lang.Double.isNaN(b)) -1
    else if (a < b) -1 else if (a > b) 1 else 0

  /** The whole kernel as ONE static method shared by the interpreted and
    * codegen paths (interpreted ≡ codegen by construction; JIT compiles
    * this to the same tight loops generated Java would be). */
  def assign(e: ArrayData, eIsFloat: Boolean, nrm: Double,
      sb: ArrayData, cb: ArrayData, probes: Int): Long = {
    val dim = e.numElements()
    val ev = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      ev(i) = if (e.isNullAt(i)) 0.0 else if (eIsFloat) e.getFloat(i).toDouble else e.getDouble(i)
      i += 1
    }
    val sBlock = dim + 2
    val cBlock = dim + 3
    val sLen = sb.numElements()
    val cLen = cb.numElements()
    if (sLen % sBlock != 0) throw shapeError("sb", sLen, sBlock)
    if (cLen % cBlock != 0) throw shapeError("cb", cLen, cBlock)
    val ns = sLen / sBlock
    if (probes > 0 && ns == 0) return -1L // probing asked, nothing to probe
    // dot(ev, arr[off..off+dim)) — double left-to-right from 0.0, the
    // DotProduct / list_reduce fold exactly
    def dotAt(arr: ArrayData, off: Int): Double = {
      var acc = 0.0
      var j = 0
      while (j < dim) { acc += ev(j) * arr.getDouble(off + j); j += 1 }
      acc
    }
    // top-`probes` super-cells by (score DESC, scid ASC) — insertion into
    // fixed slots; cmpScore gives Spark's nan-safe sort semantics
    var probedIds: Array[Double] = null
    var probedN = 0
    if (probes > 0) {
      val ids = new Array[Double](probes)
      val scores = new Array[Double](probes)
      var s = 0
      while (s < ns) {
        val off = s * sBlock
        val scid = sb.getDouble(off)
        val sn = sb.getDouble(off + 1)
        val score = dotAt(sb, off + 2) / (nrm * sn)
        // find insertion position among the current probedN slots
        var pos = probedN
        while (pos > 0 && {
          val c = cmpScore(score, scores(pos - 1))
          c > 0 || (c == 0 && scid < ids(pos - 1))
        }) pos -= 1
        if (pos < probes) {
          val last = math.min(probedN, probes - 1)
          var t = last
          while (t > pos) { ids(t) = ids(t - 1); scores(t) = scores(t - 1); t -= 1 }
          ids(pos) = scid; scores(pos) = score
          if (probedN < probes) probedN += 1
        }
        s += 1
      }
      probedIds = ids
    }
    // argmax over eligible candidate blocks (parent probed, or no sb)
    var bestCid = -1L
    var bestScore = 0.0
    val nc = cLen / cBlock
    var c = 0
    while (c < nc) {
      val off = c * cBlock
      val parent = cb.getDouble(off)
      var eligible = probes == 0
      if (!eligible) {
        var t = 0
        while (!eligible && t < probedN) {
          if (probedIds(t) == parent) eligible = true
          t += 1
        }
      }
      if (eligible) {
        val cid = cb.getDouble(off + 1)
        val cn = cb.getDouble(off + 2)
        val score = dotAt(cb, off + 3) / (nrm * cn)
        val cmp = if (bestCid < 0) 1 else cmpScore(score, bestScore)
        if (cmp > 0 || (cmp == 0 && cid.toLong < bestCid)) {
          bestCid = cid.toLong; bestScore = score
        }
      }
      c += 1
    }
    bestCid
  }
}
