package graft
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("local[4]", 4)
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    for (name <- args) {
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}
