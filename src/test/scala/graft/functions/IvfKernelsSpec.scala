package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Pins the map-only ANN build kernels (round 13): [[IvfAssign]]
  * (`graft_ivf_assign`) against an independent Scala reference argmax in
  * both rules, and [[PqEncode]] (`graft_pq_encode`) against a reference
  * per-subspace argmin — plus the shape/empty/sentinel contracts and the
  * codegen path driven through a real whole-stage-codegen projection.
  * (Cross-engine value parity is pinned separately through the ANN
  * oracles, hash-exact at sf0.01 and sf0.1.) */
class IvfKernelsSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val rnd = new scala.util.Random(17)
  private val dim = 8

  private def vec(): Array[Double] = Array.fill(dim)(rnd.nextGaussian())
  private def cos(a: Array[Double], b: Array[Double], an: Double, bn: Double): Double = {
    var acc = 0.0; var i = 0
    while (i < dim) { acc += a(i) * b(i); i += 1 }
    acc / (an * bn)
  }
  private def nrm(a: Array[Double]): Double = math.sqrt(a.map(x => x * x).sum)

  // reference one-level argmax (cos desc, tie lowest cid)
  private def refAssign(e: Array[Double], cents: Seq[(Long, Array[Double])]): Long =
    if (cents.isEmpty) -1L
    else cents.map { case (cid, ce) => (cid, cos(e, ce, nrm(e), nrm(ce))) }
      .minBy { case (cid, c) => (-c, cid) }._1

  // reference two-level: parent per centroid, top-p super-cells per
  // vector, argmax among probed children
  private def refAssign2(e: Array[Double], cents: Seq[(Long, Array[Double])],
      nSuper: Int, p: Int): Long = {
    val sup = cents.filter(_._1 < nSuper)
    if (sup.isEmpty) return -1L
    def best(x: Array[Double], cands: Seq[(Long, Array[Double])]): Long =
      cands.map { case (cid, ce) => (cid, cos(x, ce, nrm(x), nrm(ce))) }
        .minBy { case (cid, c) => (-c, cid) }._1
    val parent = cents.map { case (cid, ce) => cid -> best(ce, sup) }.toMap
    val probes = sup.map { case (scid, se) => (scid, cos(e, se, nrm(e), nrm(se))) }
      .sortBy { case (scid, c) => (-c, scid) }.take(p).map(_._1).toSet
    val cands = cents.filter { case (cid, _) => probes(parent(cid)) }
    if (cands.isEmpty) -1L else best(e, cands)
  }

  private def flatCb(cents: Seq[(Long, Array[Double])],
      parent: Long => Long): Array[Double] =
    cents.flatMap { case (cid, ce) =>
      Array(parent(cid).toDouble, cid.toDouble, nrm(ce)) ++ ce
    }.toArray

  private def flatSb(sup: Seq[(Long, Array[Double])]): Array[Double] =
    sup.flatMap { case (scid, se) => Array(scid.toDouble, nrm(se)) ++ se }.toArray

  private def kernelAssign(e: Array[Double], sb: Array[Double],
      cb: Array[Double], probes: Int): Long = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    IvfAssign.assign(ArrayData.toArrayData(e), eIsFloat = false,
      nrm(e), ArrayData.toArrayData(sb), ArrayData.toArrayData(cb), probes)
  }

  behavior of "graft_ivf_assign"

  it should "match the reference one-level argmax on random codebooks" in {
    val cents = (0L until 20L).map(i => i -> vec())
    val cb = flatCb(cents, identity)
    (1 to 200).foreach { _ =>
      val e = vec()
      kernelAssign(e, Array.empty, cb, 0) shouldBe refAssign(e, cents)
    }
  }

  it should "match the reference two-level rule including the probe set" in {
    val cents = (0L until 25L).map(i => i -> vec())
    val nSuper = 5; val p = 2
    val sup = cents.filter(_._1 < nSuper)
    val parent = cents.map { case (cid, ce) =>
      cid -> refAssign(ce, sup) }.toMap
    val cb = flatCb(cents, parent)
    val sb = flatSb(sup)
    (1 to 200).foreach { _ =>
      val e = vec()
      kernelAssign(e, sb, cb, p) shouldBe refAssign2(e, cents, nSuper, p)
    }
  }

  it should "hold the sentinel and shape contracts" in {
    val cents = (0L until 4L).map(i => i -> vec())
    val cb = flatCb(cents, identity)
    val e = vec()
    // empty codebook -> -1 under either rule
    kernelAssign(e, Array.empty, Array.empty, 0) shouldBe -1L
    kernelAssign(e, flatSb(cents.take(2)), Array.empty, 2) shouldBe -1L
    // probing asked but nothing to probe -> -1, NOT a one-level fallback
    kernelAssign(e, Array.empty, cb, 2) shouldBe -1L
    // misaligned block lengths fail loudly
    an[IllegalArgumentException] should be thrownBy
      kernelAssign(e, Array.empty, cb.dropRight(1), 0)
    an[IllegalArgumentException] should be thrownBy
      kernelAssign(e, Array(1.0, 2.0), cb, 1)
  }

  it should "agree between interpreted and whole-stage-codegen paths" in {
    graft.plans.GraftFunctions.register(spark)
    import spark.implicits._
    val cents = (0L until 12L).map(i => i -> vec())
    val cb = flatCb(cents, identity)
    val rows = (1 to 50).map(i => (i.toLong, vec()))
    val df = rows.toDF("id", "e")
      .withColumn("nrm", graft.functions.VecFns.l2norm(col("e")))
      .withColumn("cell", call_function("graft_ivf_assign",
        col("e"), col("nrm"), lit(Array.empty[Double]), lit(cb), lit(0)))
    val got = df.select("id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, e) => got(id) shouldBe refAssign(e, cents) }
  }

  behavior of "graft_pq_encode"

  private def refEncode(x: Array[Double], cents: Seq[(Long, Array[Double])],
      m: Int): Seq[Long] = {
    val sub = dim / m
    (0 until m).map { j =>
      cents.map { case (cid, ce) =>
        var d1 = 0.0; var d2 = 0.0
        (0 until sub).foreach { t =>
          d1 += x(j * sub + t) * ce(j * sub + t)
          d2 += ce(j * sub + t) * ce(j * sub + t)
        }
        (cid, -2.0 * d1 + d2)
      }.minBy { case (cid, s) => (s, cid) }._1
    }
  }

  private def flatPq(cents: Seq[(Long, Array[Double])]): Array[Double] =
    cents.flatMap { case (cid, ce) => Array(cid.toDouble) ++ ce }.toArray

  it should "match the reference per-subspace argmin" in {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val cents = (0L until 16L).map(i => i -> vec())
    val cb = flatPq(cents)
    (1 to 200).foreach { _ =>
      val x = vec()
      val got = PqEncode.encode(ArrayData.toArrayData(x), xIsFloat = false,
        ArrayData.toArrayData(cb), 4)
      got.toLongArray().toSeq shouldBe refEncode(x, cents, 4)
    }
  }

  it should "return NULL for an empty codebook and reject bad shapes" in {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val x = vec()
    PqEncode.encode(ArrayData.toArrayData(x), xIsFloat = false,
      ArrayData.toArrayData(Array.empty[Double]), 4) shouldBe null
    an[IllegalArgumentException] should be thrownBy
      PqEncode.encode(ArrayData.toArrayData(x), xIsFloat = false,
        ArrayData.toArrayData(Array(1.0, 2.0)), 4)
    an[IllegalArgumentException] should be thrownBy
      PqEncode.encode(ArrayData.toArrayData(x), xIsFloat = false,
        ArrayData.toArrayData(Array.fill(dim + 1)(0.0)), 3) // dim % m != 0
  }

  it should "encode through whole-stage codegen identically" in {
    graft.plans.GraftFunctions.register(spark)
    import spark.implicits._
    val cents = (0L until 16L).map(i => i -> vec())
    val cb = flatPq(cents)
    val rows = (1 to 50).map(i => (i.toLong, vec()))
    val got = rows.toDF("id", "x")
      .withColumn("codes", call_function("graft_pq_encode", col("x"), lit(cb), lit(4)))
      .select("id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    rows.foreach { case (id, x) => got(id) shouldBe refEncode(x, cents, 4) }
  }
}
