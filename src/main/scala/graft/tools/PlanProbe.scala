package graft.tools

import graft.SparkEntry

/** Dev tool: print a query's FINAL adaptive plan (post-execution), to see
  * which exchanges got reused and which subtrees recompute. For the
  * static (pre-execution) plan, use [[graft.DumpPlans]]. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val (spark, sf) = DevTool.session()
    args.foreach { name =>
      println(s"===== $name =====")
      SparkEntry.queries.get(name) match {
        case Some(fn) => println(DevTool.finalPlan(fn(spark, sf)))
        case None => println(
          s"unknown query id (known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")})")
      }
    }
    spark.stop()
  }
}
