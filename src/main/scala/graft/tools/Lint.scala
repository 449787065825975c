package graft.tools

import graft.SparkEntry
import graft.plans.PlanLint

/** Dev tool: run [[graft.plans.PlanLint]] over registered queries —
  * the same static scale-hazard rules PlanLintSpec enforces in CI
  * (corpus-shaped partition-less windows, unhinted cartesians,
  * repartition(1) funnels as errors; unbounded collects, Scala UDFs,
  * mid-pipeline global sorts as warnings), runnable against a WIP
  * query before it has a spec:
  *
  * {{{
  * sbt -batch "runMain graft.tools.Lint my_new_query"   # one query
  * sbt -batch "runMain graft.tools.Lint"                # all, findings only
  * }}}
  *
  * Lints the ANALYZED/OPTIMIZED logical plan (construction only — no
  * execution), so it is fast even at large SF dirs. */
object Lint {
  def main(args: Array[String]): Unit = {
    val (spark, sf) = DevTool.session()
    val only = args.toSet
    var nErr = 0
    var nFail = 0
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
        try {
          val findings = PlanLint.lint(fn(spark, sf))
          if (findings.nonEmpty || only.nonEmpty) {
            println(s"$name:")
            findings.foreach(f => println(s"  $f"))
            if (findings.isEmpty) println("  clean")
          }
          nErr += findings.count(_.severity == "error")
        } catch { case e: Throwable =>
          // a query that cannot even build must fail the gate, not pass it
          nFail += 1
          println(s"$name FAILED to build: ${e.getMessage}")
        }
      }
    println(s"[lint] errors: $nErr, build failures: $nFail")
    spark.stop()
    if (nErr + nFail > 0) sys.exit(1)
  }
}
