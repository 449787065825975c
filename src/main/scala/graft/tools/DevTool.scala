package graft.tools

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared harness for the plan-inspection dev mains (ScanAudit,
  * PlanProbe): one session/sf-dir setup and one definition of
  * "the final adaptive plan" so the tools can't drift apart. */
object DevTool {
  def session(): (SparkSession, String) = {
    val spark = GraftSession.create("local[4]", 4)
    spark.sparkContext.setLogLevel("ERROR")
    (spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
  }

  /** Execute the frame and return its POST-EXECUTION plan string — the
    * plan AQE actually ran, with reused subtrees printed as one-line
    * ReusedExchange nodes. collect() (not a write) so THIS
    * QueryExecution's adaptive plan is the one finalized, and the
    * trailing "== Initial Plan ==" section is stripped. */
  def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }
}
