package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev tool: print a query's FINAL adaptive plan (post-execution), to see
  * which exchanges got reused and which subtrees recompute. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("local[4]", 4)
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))
    }
    spark.stop()
  }
}
