package graft.tools

import graft.{GraftSession, SparkEntry}

/** Scratch probe: warm+timed wall clock for named queries (dev-only). */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"PROBE $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
