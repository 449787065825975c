package graft.tools

import graft.SparkEntry

/** Dev tool: count parquet-scan occurrences per query plan. Each scan of
  * the same table beyond the first means Spark re-runs that subtree — a
  * repeated full corpus pass at 100 TB. Some repeats are deliberate
  * (documented light scans, e.g. a scalar total); this tool surfaces the
  * ones to audit, it does not judge them.
  *
  * Counts come from the POST-EXECUTION plan ([[DevTool.finalPlan]]):
  * AQE's ReuseExchange dedups identical shuffle subtrees at runtime
  * (e.g. an aggregate and the broadcast max over that same aggregate
  * share one exchange), so the initial static plan over-reports scans. */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val (spark, sf) = DevTool.session()
    val only = args.toSet
    val rows = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .flatMap { case (name, fn) =>
        try {
          val plan = DevTool.finalPlan(fn(spark, sf))
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
