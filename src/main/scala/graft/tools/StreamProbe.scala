package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Scratch probe for stream-load throughput variants (dev-only). */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "100000")

    def run(tag: String, srcFiles: Int, mfpt: Int, saltFiles: Int): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"probe-$tag").toString
      val src = s"$tmp/src"; val out = s"$tmp/out"; val cp = s"$tmp/cp"
      Tables.events(spark, sfDir).repartition(srcFiles).write.parquet(src)
      val n = spark.read.parquet(src).count()
      val t0 = System.nanoTime()
      val stream = graft.streaming.EventSource.fileStream(spark, src, maxFilesPerTrigger = mfpt)
      val q = graft.streaming.Sinks.recordBatchingSink(stream, out, cp,
        writerTasksPerPartition = saltFiles).start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      val lats = q.recentProgress.toSeq.filter(_.numInputRows > 0).map(_.batchDuration)
      println(f"PROBE $tag: rate=${(n / wall).toLong} wall=$wall%.2f epochs=${lats.size} lats=${lats.sorted.mkString(",")}")
    }

    // variants: (srcFiles, maxFilesPerTrigger, salt)
    run("base-1ep-nosalt", 4, 64, 0)
    run("base-1ep-salt4", 4, 64, 4)
    run("4ep-nosalt", 8, 2, 0)
    run("4ep-salt4", 8, 2, 4)
    run("2ep-salt4", 8, 4, 4)
    run("8ep-salt4", 8, 1, 4)
    spark.stop()
  }
}
