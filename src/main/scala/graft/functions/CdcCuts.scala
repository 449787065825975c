package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Content-defined chunk boundaries over a binary payload — the
  * gear-hash rolling scheme (FastCDC family: Xia et al., USENIX ATC'16):
  * roll `h = (h << 1) + GEAR[byte]` and cut where the low `maskBits`
  * bits of h are zero, subject to [minSize, maxSize] chunk bounds.
  * Returns the ASCENDING array of cut END offsets (exclusive; the last
  * element is always the payload length, empty payload → empty array).
  *
  * Why content-defined and not fixed-size: a one-byte insertion shifts
  * EVERY fixed-size chunk boundary after it (all downstream chunk
  * hashes change — storage dedup finds nothing), while gear cuts
  * re-synchronize within ~one chunk because boundaries depend only on a
  * sliding content window. That shift-resistance is the entire basis of
  * chunk-level storage dedup for large media blobs (CdcCutsSpec pins
  * it, plus reassembly and the size bounds).
  *
  * Determinism: the gear table derives from a fixed splitmix64 seed at
  * class load — no RNG state, same cuts on every executor, every run.
  *
  * Codegen: a single static kernel call per row (no lambda dispatch, no
  * row-level virtual calls) — the loop body is shared with the
  * interpreted path BY CONSTRUCTION, so the usual interpreted≡codegen
  * parity risk of hand-duplicated loops doesn't exist here; the spec
  * still drives both paths.
  */
case class CdcCuts(child: Expression, minSize: Int, maskBits: Int, maxSize: Int)
    extends UnaryExpression {

  require(minSize >= 1, s"graft_cdc_cuts: minSize must be >= 1 (got $minSize)")
  require(maxSize >= minSize, s"graft_cdc_cuts: maxSize >= minSize required (got $maxSize < $minSize)")
  require(maskBits >= 1 && maskBits <= 48, s"graft_cdc_cuts: maskBits in [1,48] (got $maskBits)")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_cdc_cuts expects a binary payload, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    CdcCutsKernel.compute(input.asInstanceOf[Array[Byte]], minSize, maskBits, maxSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bin =>
      s"${ev.value} = graft.functions.CdcCutsKernel$$.MODULE$$.compute(" +
        s"$bin, $minSize, $maskBits, $maxSize);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcCutsKernel {

  /** 256-entry gear table from splitmix64 over a fixed seed — the
    * documented public mixer (Steele et al., "Fast splittable
    * pseudorandom number generators"), no library RNG state involved. */
  private val Gear: Array[Long] = {
    var x = 0x9E3779B97F4A7C15L
    Array.fill(256) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
  }

  def compute(bytes: Array[Byte], minSize: Int, maskBits: Int, maxSize: Int): ArrayData = {
    val n = bytes.length
    // upper bound on cut count: every chunk has >= min(minSize, maxSize)
    // bytes except possibly the last
    val out = new Array[Int](n / math.min(minSize, maxSize) + 2)
    var nOut = 0
    val mask = (1L << maskBits) - 1
    var h = 0L
    var start = 0
    var i = 0
    while (i < n) {
      h = (h << 1) + Gear(bytes(i) & 0xff)
      val len = i - start + 1
      if ((len >= minSize && (h & mask) == 0L) || len >= maxSize) {
        out(nOut) = i + 1; nOut += 1
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < n) { out(nOut) = n; nOut += 1 }
    new GenericArrayData(java.util.Arrays.copyOf(out, nOut))
  }
}
