package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe for the standing-query registry forms: builds the bench's
  * 1k mid-tail registry over `SPARK_GRAFT_SF_DIR` and times the indexed
  * vs scan scorer (cold, like the bench line). Usage:
  * `runMain graft.tools.RegistryProbe [nQueries]`. */
object RegistryProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000)
    val (spark, sf) = DevTool.session()
    val docs = graft.Tables.documents(spark, sf)
      .filter(col("text").isNotNull).localCheckpoint()
    val nd = docs.count()
    val allVocab = docs
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t")).limit(6000)
      .collect().map(_.getString(0))
    val vocab = allVocab.drop(allVocab.length / 2)
    val rng = new scala.util.Random(42)
    val reg = (0 until n).map(q =>
      q.toLong -> Seq.fill(4)(vocab(rng.nextInt(vocab.length))).distinct).toMap
    val dfm = reg.values.flatten.toSeq.distinct.map(_ -> 3L).toMap
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $tag: $sec%.2f s  (${nd / sec}%.0f rows/s, $rows emitted)")
    }
    time("indexed")(graft.streaming.Transforms
      .bm25ScoreIndexed(docs, reg, dfm, nd, 50.0).count())
    time("scan   ")(graft.streaming.Transforms
      .bm25Score(docs, reg, dfm, nd, 50.0).count())
    spark.stop()
  }
}
