package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev tool: count parquet-scan occurrences per query plan. Each scan of
  * the same table beyond the first means Spark re-runs that subtree — a
  * repeated full corpus pass at 100 TB. Some repeats are deliberate
  * (documented light scans, e.g. a scalar total); this tool surfaces the
  * ones to audit, it does not judge them.
  *
  * Counts come from the POST-EXECUTION plan: AQE's ReuseExchange dedups
  * identical shuffle subtrees at runtime (e.g. an aggregate and the
  * broadcast max over that same aggregate share one exchange), so the
  * initial static plan over-reports scans. Each query is executed (noop
  * write) and the final adaptive plan string — where a reused subtree
  * prints as a one-line ReusedExchange — is what gets counted. */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("local[4]", 4)
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val only = args.toSet
    val rows = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .flatMap { case (name, fn) =>
        try {
          val df = fn(spark, sf)
          // collect() finalizes THIS QueryExecution's adaptive plan
          // (df.write would plan and execute a fresh one)
          df.collect()
          // the executed AdaptiveSparkPlan prints final plan THEN an
          // "== Initial Plan ==" section — count only the final part
          val plan = df.queryExecution.executedPlan.toString
            .split("== Initial Plan ==")(0)
          val scans = "FileScan parquet|Scan parquet".r.findAllIn(plan).length
          // per-table breakdown from the file paths in the scan nodes
          val byTable = "([a-z]+)\\.parquet".r.findAllMatchIn(plan)
            .map(_.group(1)).toSeq.groupBy(identity).view.mapValues(_.size)
            .toSeq.sortBy(-_._2).map { case (t, c) => s"$t=$c" }.mkString(",")
          Some((name, scans, byTable))
        } catch { case e: Throwable =>
          println(s"$name FAILED: ${e.getMessage}"); None
        }
      }
    rows.foreach { case (n, s, bt) => println(f"$n%-22s scans=$s%-3d $bt") }
    spark.stop()
  }
}
