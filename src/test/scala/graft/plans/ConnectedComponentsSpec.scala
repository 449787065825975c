package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Pins [[ConnectedComponents]]' hash-min fixpoint against a driver-side
  * union-find on graphs chosen to stress what the similarity corpus
  * cannot: a fixed-seed random graph (arbitrary component shapes), a
  * single long chain (worst-case diameter — the most fixpoint rounds per
  * component, catching any early-exit bug), singletons (nodes with no
  * edges keep their own label), and the empty graph. */
class ConnectedComponentsSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-cc-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** min-root union-find: component = min node id, like hash-min. */
  private def unionFind(nodes: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    pairs.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    nodes.map(n => n -> find(n)).toMap
  }

  private def run(nodes: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val n = nodes.toDF("node")
    val e = ConnectedComponents.symmetrize(pairs.toDF("u", "v"), "u", "v")
    ConnectedComponents.labels(n, e).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("component")).toMap
  }

  behavior of "ConnectedComponents.labels"

  it should "match union-find on a fixed random graph with singletons" in {
    val rnd = new scala.util.Random(42)
    val nodes = (0L until 60L).toSeq
    val pairs = Seq.fill(45)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter(p => p._1 != p._2) // nodes 50-59 stay edge-free singletons
    run(nodes, pairs) shouldBe unionFind(nodes, pairs)
  }

  it should "converge on a worst-case-diameter chain" in {
    val nodes = (0L until 40L).toSeq
    val pairs = (0L until 39L).map(i => (i + 1, i)) // one 40-node chain
    val got = run(nodes, pairs)
    got.values.toSet shouldBe Set(0L) // everything reaches the min label
  }

  it should "contract a chain geometrically with pointer jumping" in {
    import spark.implicits._
    val n = (0L until 64L).toDF("node")
    val pairs = (0L until 63L).map(i => (i + 1, i))
    val e = ConnectedComponents.symmetrize(pairs.toDF("u", "v"), "u", "v")
    val (plain, plainRounds) = ConnectedComponents.run(n, e, jump = false)
    val (jumped, jumpRounds) = ConnectedComponents.run(n, e, jump = true)
    plain.collect().map(_.getLong(1)).toSet shouldBe Set(0L)
    jumped.collect().map(_.getLong(1)).toSet shouldBe Set(0L)
    // a 64-chain takes ~diameter rounds plain; jumping is logarithmic
    plainRounds should be >= 30
    jumpRounds should be <= 10
    // and jumping must not change answers on an arbitrary graph
    val rnd = new scala.util.Random(11)
    val rp = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(p => p._1 != p._2)
    run((0L until 40L).toSeq, rp) shouldBe {
      import spark.implicits._
      val nd = (0L until 40L).toDF("node")
      val ed = ConnectedComponents.symmetrize(rp.toDF("u", "v"), "u", "v")
      ConnectedComponents.labelsJumped(nd, ed).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
  }

  it should "label an empty graph empty and an edge-free graph by identity" in {
    run(Seq.empty, Seq.empty) shouldBe Map.empty
    val nodes = Seq(3L, 7L, 9L)
    run(nodes, Seq.empty) shouldBe nodes.map(n => n -> n).toMap
  }
}
