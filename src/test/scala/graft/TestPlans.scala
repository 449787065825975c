package graft

/** Shared test-side definition of "the plan that actually ran" — the
  * POST-EXECUTION adaptive plan with reused subtrees printed as
  * ReusedExchange one-liners (the same contract as tools.DevTool
  * .finalPlan). One definition so the plan-pinning specs (ScanAuditSpec
  * ceilings, DistributedRankSpec's no-Window assertion) cannot drift
  * onto the initial plan if Spark's plan-string format changes. */
object TestPlans {
  def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }
}
