package graft.tools

import graft.SparkEntry

/** Dev tool: write each named query's `.explain("formatted")` output to
  * `<outDir>/<query>_<tag>.txt` (round-15 plan evidence files). Usage:
  * `runMain graft.tools.FormattedPlan <outDir> <tag> <query> [query...]`;
  * `SPARK_GRAFT_SF_DIR` picks the data dir (DevTool default). */
object FormattedPlan {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val (spark, sf) = DevTool.session()
    new java.io.File(outDir).mkdirs()
    args.drop(2).foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          val txt = fn(spark, sf).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val f = new java.io.PrintWriter(s"$outDir/${name}_$tag.txt")
          try f.write(txt) finally f.close()
          println(s"[plan] wrote $outDir/${name}_$tag.txt (${txt.length} chars)")
        case None =>
          println(s"[plan] unknown query id: $name")
      }
    }
    spark.stop()
  }
}
