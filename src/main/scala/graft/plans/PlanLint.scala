package graft.plans

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.catalyst.expressions.{Expression, ScalaUDF, SortOrder}
import org.apache.spark.sql.catalyst.expressions.aggregate.{CollectList, CollectSet}
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical._

/** Static scale-hazard linter for Spark logical plans — the engine's
  * internal plan discipline (PLANS.md "Repeated-scan audit",
  * ScanAuditSpec, the r5–r7 window-hazard rewrites) packaged as a
  * library API, so a user can audit THEIR query the way this repo
  * audits its own before submitting it against 100 TB.
  *
  * Severity contract:
  *  - `error`: a shape that concentrates unbounded data on one task —
  *    fine at test scale, a stall or OOM at cluster scale.
  *  - `warn`: a shape that is bounded only by an assumption the plan
  *    itself cannot prove (per-group collect sizes, UDF opacity).
  *
  * The linter reasons on the OPTIMIZED logical plan and uses one
  * structural notion: a subtree is REDUCED when every path from its
  * root to a leaf relation passes through an Aggregate (or a
  * grand-total with no grouping) — i.e. the frame's size is a function
  * of group cardinality, not corpus cardinality. Global sorts, windows
  * and cross joins over reduced frames are metadata-shaped and
  * deliberately not flagged (the carry windows of [[ChunkedPrefix]],
  * the P-row offset join of [[DistributedRank]], broadcast scalar
  * crossJoins). Cardinality of partition KEYS is not statically
  * knowable, so low-cardinality `partitionBy` hazards stay the domain
  * of runtime audits (ScanAuditSpec / ChunkedPrefixSpec) — this linter
  * catches the shapes that are provably single-task from structure
  * alone. */
object PlanLint {

  final case class Finding(rule: String, severity: String, detail: String) {
    override def toString: String = s"[$severity] $rule: $detail"
  }

  /** True when the frame is provably metadata-shaped: every leaf-ward
    * path passes through an Aggregate (size a function of group
    * cardinality) or the subtree carries a static row bound (a Limit —
    * the idiom for declaring a filtered seed set bounded). */
  private def reduced(p: LogicalPlan): Boolean = p match {
    case _: Aggregate => true
    case b if b.maxRows.exists(_ <= 100000L) => true
    case _: LeafNode => false
    case j: Join => reduced(j.left) && reduced(j.right)
    case u: Union => u.children.forall(reduced)
    case other if other.children.isEmpty => false
    case other => other.children.forall(reduced)
  }

  private def containsUdf(e: Expression): Boolean =
    e.exists(_.isInstanceOf[ScalaUDF])

  /** An explicit broadcast() on either side is the author declaring the
    * side metadata-sized — the ANN suite's query-side contract. */
  private def broadcastHinted(j: Join): Boolean =
    j.hint.leftHint.exists(_.strategy.isDefined) ||
      j.hint.rightHint.exists(_.strategy.isDefined)

  /** Statically bounded row count (a Limit in the subtree). */
  private def boundedRows(p: LogicalPlan): Boolean =
    p.maxRows.exists(_ <= 100000L)

  private def node(p: LogicalPlan): String = p.nodeName

  def lint(df: Dataset[_]): Seq[Finding] =
    lintPlan(df.queryExecution.optimizedPlan)

  /** Plan-level entry point — what [[GraftExtensions]]' injected
    * optimizer rule calls, where no Dataset exists yet. */
  def lintPlan(plan: LogicalPlan): Seq[Finding] = {
    val findings = Seq.newBuilder[Finding]
    plan.foreach {
      case w: Window if w.partitionSpec.isEmpty && !reduced(w.child) =>
        findings += Finding("single-partition-window", "error",
          "Window with no PARTITION BY over a corpus-shaped child: the physical " +
            "plan sorts every row in ONE task. Partition the window, or use a " +
            "distributed rank (graft.plans.DistributedRank) / chunked prefix " +
            "(graft.plans.ChunkedPrefix).")
      case j: Join if j.condition.isEmpty && j.joinType == Cross &&
          !reduced(j.left) && !reduced(j.right) &&
          !broadcastHinted(j) && !boundedRows(j.left) && !boundedRows(j.right) =>
        findings += Finding("cartesian-product", "error",
          "Cross join with two corpus-shaped sides: O(n^2) pairs at scale. " +
            "Key the join, or reduce/broadcast one side.")
      case r: Repartition if r.numPartitions == 1 && !reduced(r.child) =>
        findings += Finding("repartition-to-one", "error",
          "repartition(1)/coalesce(1) over a corpus-shaped child funnels the " +
            "whole frame through one task.")
      case a: Aggregate =>
        val collects = a.aggregateExpressions.filter(e => e.exists {
          case _: CollectList | _: CollectSet => true
          case _ => false
        })
        if (collects.nonEmpty && !reduced(a.child))
          findings += Finding("unbounded-collect", "warn",
            "collect_list/collect_set over a corpus-shaped child: per-group " +
              "array size is bounded only by group cardinality assumptions " +
              "(a hot key builds its array on one executor). Cap membership " +
              "first (graft.plans.TopKPerGroup) or restructure.")
      case _ => ()
    }
    // UDF detection runs as its own pass: folded into the match above it
    // would be shadowed on any node an earlier arm matches (a UDF inside
    // an Aggregate or Window would silently escape the lint).
    plan.foreach { p =>
      if (p.expressions.exists(containsUdf))
        findings += Finding("scala-udf", "warn",
          s"Scala UDF inside ${node(p)}: opaque to codegen, pushdown and " +
            "null-propagation. Prefer built-in functions or a native " +
            "Catalyst expression (graft.functions).")
    }
    // global sort not feeding a limit: walk parent→child so the
    // Limit(Sort) / Sort(Limit) shapes can be excused in one place
    def sortWalk(p: LogicalPlan, underLimit: Boolean): Unit = p match {
      case l: GlobalLimit => l.children.foreach(sortWalk(_, underLimit = true))
      case l: LocalLimit => l.children.foreach(sortWalk(_, underLimit = true))
      case s @ Sort(_, true, child, _) =>
        if (!underLimit && !reduced(child))
          findings += Finding("global-sort", "warn",
            "Global ORDER BY over a corpus-shaped frame without a LIMIT: a " +
              "full range shuffle + sort of every row. Fine as a final " +
              "presentation step; hazardous mid-pipeline.")
        sortWalk(child, underLimit = false)
      case other => other.children.foreach(sortWalk(_, underLimit = false))
    }
    sortWalk(plan, underLimit = false)
    findings.result().distinct
  }

  /** Findings at `error` severity only. */
  def errors(df: Dataset[_]): Seq[Finding] =
    lint(df).filter(_.severity == "error")
}
