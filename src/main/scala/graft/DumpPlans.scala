package graft

/** Dev tool: print the executed plan of named queries (for PLANS.md
  * evidence). `SPARK_GRAFT_SF_DIR` overrides the default sf0.01 dir. */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("local[4]", 4)
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for (name <- args) {
      println(s"===== $name =====")
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          println(fn(spark, sf).queryExecution.executedPlan.toString.take(6000))
        case None =>
          println(s"unknown query id (known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")})")
      }
    }
    spark.stop()
  }
}
