package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pins [[SortedOverlapCount]] (the PPJoin verify kernel): the merge count
  * must equal the set-intersection size on sorted distinct inputs, and the
  * interpreted and whole-stage-codegen paths must agree bit-for-bit. */
class SortedOverlapSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val arrTy = ArrayType(IntegerType, containsNull = false)

  private def interpreted(a: Seq[Int], b: Seq[Int]): Any =
    SortedOverlapCount(Literal.create(a, arrTy), Literal.create(b, arrTy)).eval(null)

  behavior of "SortedOverlapCount"

  it should "count the intersection of sorted distinct arrays" in {
    interpreted(Seq(1, 3, 5), Seq(2, 3, 4, 5)) shouldBe 2
    interpreted(Seq(1, 2, 3), Seq(1, 2, 3)) shouldBe 3
    interpreted(Seq(1, 2, 3), Seq(4, 5)) shouldBe 0
    interpreted(Seq.empty[Int], Seq(1, 2)) shouldBe 0
    interpreted(Seq.empty[Int], Seq.empty[Int]) shouldBe 0
    interpreted(Seq(-5, -1, 0, 7), Seq(-1, 7, 9)) shouldBe 2
  }

  it should "equal the set-intersection size on arbitrary sorted sets" in {
    // fixed-seed generator loop (the scalatestplus bridge isn't available
    // offline — same idiom as PropertySpec)
    val gen = Gen.listOf(Gen.chooseNum(-50, 50)).map(_.toSet)
    (0 until 200).foreach { i =>
      val seed = Seed(0xC0FFEEL + i)
      val xs = gen.pureApply(Gen.Parameters.default, seed)
      val ys = gen.pureApply(Gen.Parameters.default, seed.next)
      interpreted(xs.toSeq.sorted, ys.toSeq.sorted) shouldBe (xs & ys).size
    }
  }

  it should "agree between interpreted and codegen paths" in {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val rows = Seq(
      (Seq(1, 3, 5, 9), Seq(1, 2, 3, 9)),
      (Seq.empty[Int], Seq(4)),
      (Seq(-3, 0, 2), Seq(-3, 0, 2)))
    val viaCodegen = rows.toDF("a", "b")
      .selectExpr("graft_overlap(a, b) AS c").collect().map(_.getInt(0)).toSeq
    viaCodegen shouldBe rows.map { case (a, b) => interpreted(a, b) }
  }

  it should "count sorted string arrays in UTF8 binary order" in {
    val sTy = ArrayType(StringType, containsNull = false)
    def run(a: Seq[String], b: Seq[String]): Any =
      SortedOverlapCount(Literal.create(a, sTy), Literal.create(b, sTy)).eval(null)
    run(Seq("a b c", "b c d"), Seq("b c d", "x y z")) shouldBe 1
    run(Seq("a", "b"), Seq("c")) shouldBe 0
    // sort_array order ≡ UTF8 binary order, incl. multi-byte chars
    val xs = Seq("z", "é", "a b", "a").sorted
    run(xs, xs) shouldBe xs.length
  }

  it should "match size(array_intersect(a,b)) through sort_array on a DataFrame" in {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val df = Seq(
      (Seq("the cat sat", "cat sat on", "sat on mat"), Seq("cat sat on", "on mat now")),
      (Seq("héllo wörld x"), Seq("héllo wörld x"))).toDF("a", "b")
    val got = df.selectExpr(
      "graft_overlap(sort_array(a), sort_array(b)) AS m",
      "size(array_intersect(a, b)) AS e").collect()
    got.foreach(r => r.getInt(0) shouldBe r.getInt(1))
  }

  it should "count sorted long arrays" in {
    val lTy = ArrayType(LongType, containsNull = false)
    SortedOverlapCount(Literal.create(Seq(1L, 5L, 9L), lTy),
      Literal.create(Seq(5L, 9L, 11L), lTy)).eval(null) shouldBe 2
  }

  it should "reject mixed element types" in {
    val bad = SortedOverlapCount(
      Literal.create(Seq(1), ArrayType(IntegerType, containsNull = false)),
      Literal.create(Seq(1L), ArrayType(LongType, containsNull = false)))
    bad.checkInputDataTypes().isFailure shouldBe true
  }

  it should "be null on a null array side" in {
    val r = SortedOverlapCount(Literal.create(null, arrTy),
      Literal.create(Seq(1), arrTy)).eval(null)
    (r == null) shouldBe true
  }
}
