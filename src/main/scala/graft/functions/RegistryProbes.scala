package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused standing-query registry probes (round 15, r14 verdict item 6)
  * — the record-local kernels behind the token-keyed scorer and phrase
  * gate ([[graft.streaming.Transforms.bm25ScoreIndexed]] /
  * [[graft.streaming.Transforms.phraseGateIndexed]]).
  *
  * Why kernels and not HOF compositions: Catalyst literal-map lookups
  * (`element_at` on a map literal) are LINEAR scans of the key array,
  * and a per-query regrouping of matched (query, term) entries via
  * `filter`-per-query is Θ(matched queries × matched entries) — both
  * re-introduce registry-size-dependent per-record cost, the exact
  * thing the indexed forms exist to remove (measured: the HOF draft was
  * SLOWER than the per-term scan form at a 1k registry). Each kernel
  * makes ONE pass over the token array with O(1) hash probes against a
  * registry hash built lazily ONCE per expression instance per JVM
  * (`@transient lazy` — codegen ships the kernel object as a reference,
  * so neither path rebuilds it per row).
  *
  * Exactness split: the kernels emit per-term BM25 partials / phrase
  * ids as RAW data; every exactness-critical step (decimal summation,
  * 6-dp rounding) stays in Catalyst on the emitted rows, so the
  * decimal route is shared with the scan forms. The per-term st runs
  * the same JVM IEEE op sequence as the scan form's Catalyst
  * expression — bit-identical doubles by construction.
  */

/** `graft_bm25_probe(tokens)` with a frozen registry: for every
  * standing query with ≥ 1 matching term in the record, emits
  * `struct(qid, sts)` — the query id and the array of per-matched-term
  * BM25 partial scores (term-sorted) — as one record-local pass.
  * `terms`/`idfs` align; `qoffs`/`qids` are the CSR term → query-ids
  * index. The caller explodes the result and runs the shared decimal
  * summation on `sts`. Null tokens → null (callers emit nothing). */
case class Bm25Probe(child: Expression,
    terms: Seq[String], idfs: Seq[Double], qoffs: Seq[Int], qids: Seq[Long],
    k1: Double, b: Double, avgdl: Double) extends UnaryExpression {

  require(terms.length == idfs.length,
    "graft_bm25_probe: terms/idfs must align")
  require(qoffs.length == terms.length + 1,
    "graft_bm25_probe: qoffs must have terms+1 entries")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("qid", LongType, nullable = false),
    StructField("sts", ArrayType(DoubleType, containsNull = false),
      nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bm25_probe expects array<string> tokens, got $t")
  }

  @transient private lazy val kernel =
    new Bm25ProbeKernel(terms.toArray, idfs.toArray, qoffs.toArray,
      qids.toArray, k1, b, avgdl)

  override def nullSafeEval(input: Any): Any =
    kernel.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship the kernel instance as a codegen reference — the registry
    // hash builds once per executor, not per row
    val ref = ctx.addReferenceObj("bm25ProbeKernel", kernel,
      classOf[Bm25ProbeKernel].getName)
    nullSafeCodeGen(ctx, ev, toks => s"${ev.value} = $ref.compute($toks);")
  }

  override def prettyName: String = "graft_bm25_probe"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The shared probe implementation — serializable so codegen references
  * ship it to executors; the term hash map builds lazily per JVM. */
final class Bm25ProbeKernel(terms: Array[String], idfs: Array[Double],
    qoffs: Array[Int], qids: Array[Long],
    k1: Double, b: Double, avgdl: Double) extends Serializable {

  @transient private lazy val termIdx: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](terms.length * 2)
    var i = 0
    while (i < terms.length) {
      m.put(UTF8String.fromString(terms(i)), i)
      i += 1
    }
    m
  }

  def compute(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    // one pass: tf per registry term index (sparse — touched list kept)
    var touched: java.util.ArrayList[Integer] = null
    var tf: java.util.HashMap[Integer, Integer] = null
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val idx = termIdx.get(toks.getUTF8String(i))
        if (idx != null) {
          if (tf == null) {
            tf = new java.util.HashMap[Integer, Integer]()
            touched = new java.util.ArrayList[Integer]()
          }
          val prev = tf.get(idx)
          if (prev == null) { tf.put(idx, 1); touched.add(idx) }
          else tf.put(idx, prev + 1)
        }
      }
      i += 1
    }
    if (tf == null) return new GenericArrayData(Array.empty[Any])
    // per matched term (term-sorted for determinism): the scan form's
    // exact IEEE sequence — idf * (tf·(k1+1)) / (tf + k1·(1−b+b·dl/avgdl))
    val idxs = new Array[Int](touched.size())
    var j = 0
    while (j < idxs.length) { idxs(j) = touched.get(j); j += 1 }
    java.util.Arrays.sort(idxs)
    val dl = n.toDouble
    // per-query partial lists, insertion-ordered then emitted qid-sorted
    val perQ = new java.util.HashMap[Long, java.util.ArrayList[Double]]()
    j = 0
    while (j < idxs.length) {
      val idx = idxs(j)
      val t = tf.get(idx).toDouble
      val st = idfs(idx) * (t * (k1 + 1.0)) /
        (t + k1 * ((1.0 - b) + b * (dl / avgdl)))
      var q = qoffs(idx)
      while (q < qoffs(idx + 1)) {
        val qid = qids(q)
        var lst = perQ.get(qid)
        if (lst == null) {
          lst = new java.util.ArrayList[Double]()
          perQ.put(qid, lst)
        }
        lst.add(st)
        q += 1
      }
      j += 1
    }
    val outQids = perQ.keySet().toArray(new Array[java.lang.Long](0))
    java.util.Arrays.sort(outQids, java.util.Comparator.naturalOrder[java.lang.Long]())
    val rows = new Array[Any](outQids.length)
    var r = 0
    while (r < outQids.length) {
      val lst = perQ.get(outQids(r).longValue())
      val sts = new Array[Double](lst.size())
      var s = 0
      while (s < sts.length) { sts(s) = lst.get(s); s += 1 }
      rows(r) = InternalRow(outQids(r).longValue(), new GenericArrayData(sts))
      r += 1
    }
    new GenericArrayData(rows)
  }
}

/** `graft_phrase_probe(tokens)` with a frozen phrase registry: emits
  * the ASCENDING DISTINCT ids of every registered phrase the record
  * contains (the scan gate's exact positional-adjacency semantics) in
  * one pass — per position an O(1) first-token hash probe, full window
  * verification only on candidate hits. `poffs`/`flat` are the CSR
  * phrase-term index; `pids` align with phrases. */
case class PhraseProbe(child: Expression,
    pids: Seq[Long], poffs: Seq[Int], flat: Seq[String])
    extends UnaryExpression {

  require(poffs.length == pids.length + 1,
    "graft_phrase_probe: poffs must have pids+1 entries")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_phrase_probe expects array<string> tokens, got $t")
  }

  @transient private lazy val kernel =
    new PhraseProbeKernel(pids.toArray, poffs.toArray, flat.toArray)

  override def nullSafeEval(input: Any): Any =
    kernel.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("phraseProbeKernel", kernel,
      classOf[PhraseProbeKernel].getName)
    nullSafeCodeGen(ctx, ev, toks => s"${ev.value} = $ref.compute($toks);")
  }

  override def prettyName: String = "graft_phrase_probe"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

final class PhraseProbeKernel(pids: Array[Long], poffs: Array[Int],
    flat: Array[String]) extends Serializable {

  // first token -> candidate phrase indexes
  @transient private lazy val firstIdx
      : java.util.HashMap[UTF8String, java.util.ArrayList[Integer]] = {
    val m = new java.util.HashMap[UTF8String, java.util.ArrayList[Integer]]()
    var p = 0
    while (p < pids.length) {
      if (poffs(p + 1) > poffs(p)) {
        val t0 = UTF8String.fromString(flat(poffs(p)))
        var lst = m.get(t0)
        if (lst == null) {
          lst = new java.util.ArrayList[Integer]()
          m.put(t0, lst)
        }
        lst.add(p)
      }
      p += 1
    }
    m
  }

  @transient private lazy val flatU: Array[UTF8String] =
    flat.map(UTF8String.fromString)

  def compute(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    var hits: java.util.TreeSet[java.lang.Long] = null
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val cands = firstIdx.get(toks.getUTF8String(i))
        if (cands != null) {
          var c = 0
          while (c < cands.size()) {
            val p = cands.get(c)
            val len = poffs(p + 1) - poffs(p)
            if (i + len <= n) {
              var k = 1 // first term already matched via the probe
              var ok = true
              while (ok && k < len) {
                val tk =
                  if (toks.isNullAt(i + k)) null
                  else toks.getUTF8String(i + k)
                ok = tk != null && tk.equals(flatU(poffs(p) + k))
                k += 1
              }
              if (ok) {
                if (hits == null) hits = new java.util.TreeSet[java.lang.Long]()
                hits.add(pids(p))
              }
            }
            c += 1
          }
        }
      }
      i += 1
    }
    if (hits == null) new GenericArrayData(Array.empty[Long])
    else {
      val out = new Array[Long](hits.size())
      val it = hits.iterator()
      var j = 0
      while (it.hasNext) { out(j) = it.next(); j += 1 }
      new GenericArrayData(out)
    }
  }
}
