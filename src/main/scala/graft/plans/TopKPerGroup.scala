package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Custom whole-operator: top-k rows per group under a total order,
  * executed as two-phase bounded heaps — a partial pass keeps ≤k rows per
  * group per input partition (map-side reduction, like partial agg), the
  * shuffle then moves at most k×groups rows, and a final pass merges.
  *
  * This replaces the `row_number().over(partitionBy(g).orderBy(o)) <= k`
  * plan shape, which must SORT every group's full row set; at 100 TB the
  * sort (and the unreduced shuffle) dominates — the heap is O(n log k)
  * with an O(k·groups) shuffle instead. Ties must be broken by the
  * ordering (make it total) for deterministic results.
  *
  * Wiring: `TopKPerGroup.transform` builds the logical node directly and
  * `GraftStrategy` plans it; registered per-session via
  * `spark.experimental.extraStrategies` (see `TopKPerGroup.install`) or
  * `GraftExtensions` (injectPlannerStrategy).
  */
case class TopKPerGroupNode(
    k: Int,
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroupNode =
    copy(child = c)
}

case class TopKPerGroupExec(
    k: Int,
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val groupLocal = groupExprs
    val orderLocal = order
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupLocal, childOutput)
      val ordering = RowOrdering.create(orderLocal, childOutput)
      // per group: bounded "worst-on-top" heap of the current best k rows
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.getOrElseUpdate(key.copy(),
          mutable.PriorityQueue.empty[InternalRow](ordering.asInstanceOf[Ordering[InternalRow]]))
        if (heap.size < kLocal) {
          heap.enqueue(row.copy())
        } else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      heaps.iterator.flatMap { case (_, heap) => heap.iterator }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}

/** Plans TopKPerGroupNode as final-over-partial heap execs. */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(k, g, o, child) =>
      TopKPerGroupExec(k, g, o, partial = false,
        TopKPerGroupExec(k, g, o, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {

  /** Register the strategy on a session (idempotent). */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(GraftStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GraftStrategy
    }
  }

  /** Top-k rows per group under `order` (make it total — add a unique
    * tiebreak). Output row order is unspecified; sort downstream if
    * needed (the downstream sort then sees only k×groups rows). */
  def transform(
      df: org.apache.spark.sql.DataFrame,
      groupCols: Seq[org.apache.spark.sql.Column],
      orderCols: Seq[org.apache.spark.sql.Column],
      k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.GraftShim
    val spark = df.sparkSession
    install(spark)
    val order = orderCols.map { c =>
      GraftShim.expression(c) match {
        case so: SortOrder => so
        case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
      }
    }
    GraftShim.ofRows(spark,
      TopKPerGroupNode(k, groupCols.map(GraftShim.expression),
        order, GraftShim.logicalPlan(df)))
  }
}
