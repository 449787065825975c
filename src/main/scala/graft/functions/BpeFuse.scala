package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE merge application: fold a symbol array through a whole merge
  * table in rank order — `graft_bpe_fuse(syms, lefts, rights)` applies
  * merge k = (lefts[k], rights[k]) for k = 0..K-1, each as the greedy
  * leftmost-non-overlapping fuse, and returns the fused symbol array.
  *
  * Semantics are EXACTLY the composed HOF chain
  * `merges.foldLeft(syms)((s, (l, r)) => aggregate(s, [], fold-fuse))`
  * ([[graft.operators.TextAnalysis.bpeFuse]]): the kernel's inner loop
  * IS that fold (compare the last emitted symbol to `l`, the incoming
  * symbol to `r`), so interpreted ≡ codegen ≡ HOF holds structurally;
  * BpeFuseSpec pins all three pairwise on trained and adversarial
  * tables.
  *
  * Why an expression: the HOF chain builds K nested `aggregate()`
  * expression trees — the plan grows LINEARLY in the merge count, which
  * caps the table at toy sizes (a shipped tokenizer carries 10k–30k
  * merges; K sequential aggregates at that size blow plan compilation
  * long before data volume matters). Here the merge table is ONE
  * array literal pair and the rank loop runs at RUNTIME: plan size is
  * O(1) in K, and per row the kernel skips inapplicable merges with an
  * O(1) vocabulary-set probe (the set is an over-approximation — symbols
  * are never removed — so a stale hit costs one linear scan, never a
  * wrong result), giving O(K + |word| × applied) per word instead of
  * O(K × |word|).
  *
  * Contracts: all three inputs `array<string>`; `lefts` and `rights`
  * must have equal length (checked per table build, not per row). A
  * null in any of the three arrays → null row (TernaryExpression null
  * intolerance). Null ELEMENTS don't occur in the callers' arrays
  * (symbols come from `split` of non-empty tokens); the kernel
  * CANONICALLY coerces one to the empty string — a DOCUMENTED
  * divergence from the HOF chain, whose Catalyst null-propagating
  * equality passes a null element through unchanged (the "≡ HOF" claim
  * above is for null-free symbol arrays; BpeFuseSpec pins the
  * divergence in executable form). The coercion is also what licenses
  * the declared `containsNull = false` output. Empty-string SYMBOLS in
  * the merge table are rejected (they cannot arise from training and
  * would make "merged == left" re-fusion ambiguous).
  *
  * The merge-table decode (UTF8String → String, plus the skip set) is
  * cached per thread keyed on the ArrayData pair IDENTITY — but ONLY
  * when both table children are foldable (then the planner evaluates
  * them once and the same instance arrives every row, so identity
  * implies content). A non-foldable table rebuilds per row: a source
  * that recycles one mutable ArrayData container across rows with
  * different content must never pass an identity check and silently
  * apply a stale table. Foldability is decided once at plan time and
  * baked into both the interpreted and codegen paths. */
case class BpeFuseAll(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(first, second, third).map(_.dataType).zipWithIndex.collectFirst {
      case (t, i) if !t.isInstanceOf[ArrayType] ||
          t.asInstanceOf[ArrayType].elementType != StringType =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_bpe_fuse expects array<string> for argument ${i + 1}, got $t")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)

  // plan-time fact: a foldable table is planner-evaluated once, so the
  // same ArrayData instance arrives every row and identity caching is
  // sound; anything else rebuilds per row (correct for mutable reuse)
  private lazy val tableRowConstant: Boolean = second.foldable && third.foldable

  override def nullSafeEval(syms: Any, lefts: Any, rights: Any): Any =
    BpeFuseKernel.compute(syms.asInstanceOf[ArrayData],
      lefts.asInstanceOf[ArrayData], rights.asInstanceOf[ArrayData], tableRowConstant)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, l, r) =>
      s"${ev.value} = graft.functions.BpeFuseKernel$$.MODULE$$.compute($s, $l, $r, $tableRowConstant);")

  override def prettyName: String = "graft_bpe_fuse"

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BpeFuseKernel {

  /** Decoded merge table + the applicability skip set's seed vocabulary
    * (all left/right symbols — the per-row set starts from the word's
    * own symbols; this set is only used to validate the table). */
  private final class Table(val lefts: Array[String], val rights: Array[String])

  // Identity-keyed per-thread cache: Literal.eval returns the SAME
  // ArrayData instance every row, so the decode is amortized to one per
  // (thread, table). IdentityHashMap, not HashMap — ArrayData equality
  // is structural and would pay a full compare per row at 10k+ entries.
  private val cache = new ThreadLocal[java.util.IdentityHashMap[ArrayData, (ArrayData, Table)]] {
    override def initialValue() = new java.util.IdentityHashMap[ArrayData, (ArrayData, Table)]()
  }

  private def table(lefts: ArrayData, rights: ArrayData, cacheable: Boolean): Table = {
    val c = if (cacheable) cache.get() else null
    if (c != null) {
      val hit = c.get(lefts)
      if (hit != null && (hit._1 eq rights)) return hit._2
    }
    val k = lefts.numElements()
    if (rights.numElements() != k) throw new IllegalArgumentException(
      s"graft_bpe_fuse: lefts has $k entries but rights has ${rights.numElements()}")
    val ls = new Array[String](k)
    val rs = new Array[String](k)
    var i = 0
    while (i < k) {
      val l = lefts.getUTF8String(i); val r = rights.getUTF8String(i)
      ls(i) = if (l == null) "" else l.toString
      rs(i) = if (r == null) "" else r.toString
      if (ls(i).isEmpty || rs(i).isEmpty) throw new IllegalArgumentException(
        s"graft_bpe_fuse: empty symbol in merge $i — empty symbols cannot " +
          "arise from BPE training and are rejected")
      i += 1
    }
    val t = new Table(ls, rs)
    if (c != null) {
      if (c.size() > 64) c.clear() // bound a long-lived executor thread's cache
      c.put(lefts, (rights, t))
    }
    t
  }

  /** Direct-call convenience (specs): cache off — a raw caller carries
    * no foldability evidence, so never trust instance identity. */
  def compute(syms: ArrayData, leftsData: ArrayData, rightsData: ArrayData): ArrayData =
    compute(syms, leftsData, rightsData, cacheTable = false)

  def compute(syms: ArrayData, leftsData: ArrayData, rightsData: ArrayData,
      cacheTable: Boolean): ArrayData = {
    val t = table(leftsData, rightsData, cacheTable)
    val n0 = syms.numElements()
    val cur = new Array[String](n0)
    // present-symbol skip set: O(1) rejection of merges whose parts the
    // word doesn't contain — with 10k+ merges and ~10-symbol words this
    // is the difference between O(K) probes and O(K × |word|) scans.
    // Over-approximate on purpose: merged-away symbols stay in the set
    // (a false "present" costs one scan that fuses nothing).
    val present = new java.util.HashSet[String](math.max(8, n0 * 2))
    var i = 0
    while (i < n0) {
      val s = syms.getUTF8String(i)
      cur(i) = if (s == null) "" else s.toString
      present.add(cur(i))
      i += 1
    }
    var n = n0
    var k = 0
    val kk = t.lefts.length
    while (k < kk) {
      val l = t.lefts(k); val r = t.rights(k)
      if (present.contains(l) && present.contains(r)) {
        // the HOF fold, verbatim: emit symbols left to right; when the
        // LAST EMITTED symbol equals l and the incoming one equals r,
        // replace the last emitted with l+r. In-place compaction is
        // safe: the write cursor never passes the read cursor.
        var rd = 0; var wr = 0; var fused = false
        while (rd < n) {
          val x = cur(rd)
          if (wr > 0 && x == r && cur(wr - 1) == l) { cur(wr - 1) = l + r; fused = true }
          else { cur(wr) = x; wr += 1 }
          rd += 1
        }
        if (fused) { n = wr; present.add(l + r) }
      }
      k += 1
    }
    val out = new Array[AnyRef](n)
    i = 0
    while (i < n) { out(i) = UTF8String.fromString(cur(i)); i += 1 }
    new GenericArrayData(out)
  }
}
