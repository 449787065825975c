package graft.tools

import graft.Tables
import graft.functions.TextFns._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B for the round-16 truthFrameBy rework (delete after the
  * round): times the r15 form, the map-only-sizes form, and the
  * full bloom form of the shingle truth build in one session. */
object TruthAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.create(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.lint", "off")
    graft.plans.GraftFunctions.register(spark)
    val s = spark
    val d = sfDir
    import s.implicits._
    val featsOf: Column => Column = tk => shingles3(tk)
    val qidSeq = graft.operators.Retrieval.frozenPhrases(s, d).keys.toSeq // warm sample memo
    def qidsDf = {
      val docs = Tables.documents(s, d)
      docs.orderBy(md5(col("doc_id").cast("string").cast("binary")), col("doc_id"))
        .limit(16).select(col("doc_id").as("query_id"))
    }

    def vOld(): DataFrame = {
      val docs = Tables.documents(s, d)
      val base = docs.select(col("doc_id"), tokens(col("text")).as("tk"))
      val dtk = base.select(col("doc_id"),
        explode(array_distinct(featsOf(col("tk")))).as("t"))
      val sizes = dtk.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val qids = qidsDf
      val qtok = dtk.join(broadcast(qids), col("doc_id") === col("query_id"))
        .select(col("query_id"), col("t"))
        .localCheckpoint(false)
      val qsizes = qtok.groupBy(col("query_id")).agg(count(lit(1)).as("nq"))
        .localCheckpoint(false)
      val inter = dtk.join(qtok.hint("shuffle_hash"), "t")
        .groupBy(col("query_id"), col("doc_id"))
        .agg(count(lit(1)).as("ni"))
      inter.join(sizes, "doc_id").join(broadcast(qsizes), "query_id")
        .filter(col("doc_id") =!= col("query_id") &&
          lit(2) * col("ni") >= col("nq") + col("n") - col("ni"))
        .select(col("query_id"), col("doc_id"))
        .localCheckpoint(false)
    }

    def vSizes(withBloom: Boolean): DataFrame = {
      val docs = Tables.documents(s, d)
      val base = docs.select(col("doc_id"), tokens(col("text")).as("tk"))
      val feats = base
        .select(col("doc_id"), array_distinct(featsOf(col("tk"))).as("fs"))
        .filter(col("fs").isNotNull)
      val dtk = feats.select(col("doc_id"), explode(col("fs")).as("t"))
      val sizes = feats.select(col("doc_id"), size(col("fs")).cast("long").as("n"))
      val qids = qidsDf
      val qtok = dtk.join(broadcast(qids), col("doc_id") === col("query_id"))
        .select(col("query_id"), col("t"))
        .localCheckpoint(false)
      val qsizes = qtok.groupBy(col("query_id")).agg(count(lit(1)).as("nq"))
        .localCheckpoint(false)
      val dtkF = if (!withBloom) dtk else {
        val nQtok = qtok.count()
        val items = math.min(math.max(1L, nQtok), 4000000L)
        val numBits = math.min(67108864L, math.max(64L, math.ceil(
          -items * math.log(0.01) / (math.log(2) * math.log(2))).toLong))
        val bfRow = qtok.select(xxhash64(col("t")).as("h"))
          .agg(call_function("graft_bloom_agg", col("h"),
            lit(items), lit(numBits)).as("bf"))
          .head()
        if (bfRow.isNullAt(0)) dtk
        else dtk.filter(call_function("graft_bloom_contains",
          lit(bfRow.getAs[Array[Byte]](0)), xxhash64(col("t"))))
      }
      val inter = dtkF.join(qtok.hint("shuffle_hash"), "t")
        .groupBy(col("query_id"), col("doc_id"))
        .agg(count(lit(1)).as("ni"))
      inter.join(sizes, "doc_id").join(broadcast(qsizes), "query_id")
        .filter(col("doc_id") =!= col("query_id") &&
          lit(2) * col("ni") >= col("nq") + col("n") - col("ni"))
        .select(col("query_id"), col("doc_id"))
        .localCheckpoint(false)
    }


    def vOldBloom(sizesExpr: Boolean): DataFrame = {
      val docs = Tables.documents(s, d)
      val base = docs.select(col("doc_id"), tokens(col("text")).as("tk"))
      val dtk = base.select(col("doc_id"),
        explode(array_distinct(featsOf(col("tk")))).as("t"))
      val sizes =
        if (sizesExpr) base.select(col("doc_id"),
          size(array_distinct(featsOf(col("tk")))).cast("long").as("n"))
          .filter(col("n") >= 0)
        else dtk.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val qids = qidsDf
      val qtok = dtk.join(broadcast(qids), col("doc_id") === col("query_id"))
        .select(col("query_id"), col("t"))
        .localCheckpoint(false)
      val qsizes = qtok.groupBy(col("query_id")).agg(count(lit(1)).as("nq"))
        .localCheckpoint(false)
      val nQtok = qtok.count()
      val items = math.min(math.max(1L, nQtok), 4000000L)
      val numBits = math.min(67108864L, math.max(64L, math.ceil(
        -items * math.log(0.01) / (math.log(2) * math.log(2))).toLong))
      val bfRow = qtok.select(xxhash64(col("t")).as("h"))
        .agg(call_function("graft_bloom_agg", col("h"),
          lit(items), lit(numBits)).as("bf"))
        .head()
      val dtkF = if (bfRow.isNullAt(0)) dtk
        else dtk.filter(call_function("graft_bloom_contains",
          lit(bfRow.getAs[Array[Byte]](0)), xxhash64(col("t"))))
      val inter = dtkF.join(qtok.hint("shuffle_hash"), "t")
        .groupBy(col("query_id"), col("doc_id"))
        .agg(count(lit(1)).as("ni"))
      inter.join(sizes, "doc_id").join(broadcast(qsizes), "query_id")
        .filter(col("doc_id") =!= col("query_id") &&
          lit(2) * col("ni") >= col("nq") + col("n") - col("ni"))
        .select(col("query_id"), col("doc_id"))
        .localCheckpoint(false)
    }

    def time(tag: String)(mk: => DataFrame): Unit = {
      mk.count() // warm
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = mk.count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"TRUTHAB $tag%-12s min=${ts.map(_._1).min}%7.3f s rows=${ts.head._2} runs=${ts.map(t => f"${t._1}%.3f").mkString(", ")}")
    }
    println(s"qids=${qidSeq.size}")
    time("old")(vOld())
    time("old+bloom")(vOldBloom(false))
    time("old+bl+sz")(vOldBloom(true))
    time("sizes")(vSizes(false))
    time("sizes+bloom")(vSizes(true))
    spark.stop()
  }
}
