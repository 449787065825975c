package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Contracts of the gear-hash content-defined chunker: reassembly
  * (chunks partition the payload exactly), size bounds, determinism,
  * the SHIFT-RESISTANCE property that justifies content-defined over
  * fixed-size cuts, and interpreted ≡ codegen agreement through a real
  * projection. */
class CdcCutsSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-cdc-cuts-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def cutsOf(payload: Array[Byte], min: Int, bits: Int, max: Int): Seq[Int] =
    CdcCutsKernel.compute(payload, min, bits, max)
      .toIntArray().toSeq

  // deterministic pseudo-random payload (fixed seed)
  private def payload(n: Int, seed: Long = 7L): Array[Byte] = {
    val r = new scala.util.Random(seed)
    Array.fill(n)(r.nextInt(256).toByte)
  }

  behavior of "CdcCutsKernel"

  it should "partition the payload exactly (ascending cuts ending at length)" in {
    val p = payload(10000)
    val cuts = cutsOf(p, 64, 6, 512)
    cuts.last shouldBe p.length
    cuts shouldBe cuts.sorted
    cuts.distinct.length shouldBe cuts.length
    // reassembly: concatenating the chunks restores the payload
    val chunks = (Seq(0) ++ cuts).sliding(2).map { case Seq(a, b) => p.slice(a, b) }.toSeq
    chunks.reduce(_ ++ _).toSeq shouldBe p.toSeq
  }

  it should "respect [min, max] chunk bounds (last chunk may undershoot min)" in {
    val p = payload(20000, seed = 13L)
    val cuts = cutsOf(p, 64, 6, 512)
    val lens = (Seq(0) ++ cuts).sliding(2).map { case Seq(a, b) => b - a }.toSeq
    lens.init.foreach { l => l should be >= 64; l should be <= 512 }
    lens.last should be <= 512
    // avg target 2^6 = 64 past the min: expect meaningfully more than n/max chunks
    lens.size should be > (p.length / 512)
  }

  it should "be empty on an empty payload and single-chunk on a tiny one" in {
    cutsOf(Array.emptyByteArray, 64, 6, 512) shouldBe Seq.empty
    cutsOf(payload(10), 64, 6, 512) shouldBe Seq(10)
  }

  it should "re-synchronize after an insertion (the reason for content-defined cuts)" in {
    val p = payload(50000, seed = 99L)
    val shifted = Array[Byte](1, 2, 3) ++ p // 3-byte prefix insertion
    def chunkHashes(bytes: Array[Byte]): Seq[Seq[Byte]] = {
      val cuts = cutsOf(bytes, 64, 6, 512)
      (Seq(0) ++ cuts).sliding(2).map { case Seq(a, b) => bytes.slice(a, b).toSeq }.toSeq
    }
    val before = chunkHashes(p).toSet
    val after = chunkHashes(shifted)
    // all but the first few chunks are byte-identical to the original's:
    // fixed-size chunking would share ZERO chunks after the insertion
    val shared = after.count(before.contains)
    shared.toDouble / after.size should be > 0.9
  }

  it should "agree between interpreted and codegen paths" in {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val rows = (0 until 200).map { i => (i.toLong, payload(100 + i * 37, seed = i)) }
    // a projection over a LocalRelation is constant-folded DRIVER-SIDE by
    // ConvertToLocalRelation (InterpretedMutableProjection — doGenCode
    // never runs); round-trip through parquet so the expression really
    // executes inside a whole-stage-codegen'd scan stage
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-codegen").toString
    rows.toDF("id", "p").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .withColumn("cuts", call_function("graft_cdc_cuts", col("p"), lit(16), lit(4), lit(96)))
    // the `*(n)` prefix marks whole-stage-codegen stages in the plan
    // string; the Project evaluating cdccuts must carry it
    df.queryExecution.executedPlan.toString should include regex """\*\(\d+\) Project .*cdccuts"""
    val viaSpark = df.collect().map(r => r.getLong(0) -> r.getSeq[Int](2)).toMap
    rows.foreach { case (id, p) =>
      viaSpark(id) shouldBe cutsOf(p, 16, 4, 96)
    }
  }

  behavior of "mm_cdc_chunk"

  it should "tie chunk byte totals out against mm_meta and find the clone dedup" in {
    val sf = "/root/testdata/sf0.001"
    val census = graft.operators.Multimodal.mmCdcChunk(spark, sf).collect()
    census.map(_.getString(0)).toSeq shouldBe Seq("audio", "image", "video")
    // total chunk bytes per format == total payload bytes per format
    val metaBytes = graft.operators.Multimodal.mmMeta(spark, sf).collect()
      .groupBy(_.getString(3)).view.mapValues(_.map(_.getLong(1)).sum).toMap
    census.foreach { r =>
      r.getAs[Long]("total_bytes") shouldBe metaBytes(r.getString(0))
      r.getAs[Long]("n_distinct") should be <= r.getAs[Long]("n_chunks")
      r.getAs[Double]("dedup_ratio") should be >= 0.0
    }
  }
}
