package graft.plans

import graft.functions.{DotProduct, MinHashSig, PqAdcScore, RowBinaryEncode, VerticaNativeEncode}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registry for graft's native Catalyst expressions.
  *
  * Two entry points:
  *  - `spark.sql.extensions=graft.plans.GraftExtensions` at session build
  *    (the production path, via SparkSessionExtensions), or
  *  - `GraftFunctions.register(spark)` at runtime (idempotent; used by the
  *    operators so any session works).
  */
object GraftFunctions {

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    (new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (args: Seq[Expression]) => MinHashSig(args(0))),
    (new FunctionIdentifier("graft_rowbinary"),
      new ExpressionInfo(classOf[RowBinaryEncode].getName, "graft_rowbinary"),
      (args: Seq[Expression]) => RowBinaryEncode(args(0))),
    (new FunctionIdentifier("graft_verticarow"),
      new ExpressionInfo(classOf[VerticaNativeEncode].getName, "graft_verticarow"),
      (args: Seq[Expression]) => VerticaNativeEncode(args(0))),
    (new FunctionIdentifier("graft_pq_score"),
      new ExpressionInfo(classOf[PqAdcScore].getName, "graft_pq_score"),
      (args: Seq[Expression]) => PqAdcScore(args(0), args(1))))

  def register(spark: SparkSession): Unit = all.foreach { case (id, info, builder) =>
    if (!spark.sessionState.functionRegistry.functionExists(id)) {
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
  }
}

/** Session-extension hook: `--conf spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (id, info, builder) =>
      ext.injectFunction((id, info, builder))
    }
    ext.injectPlannerStrategy(_ => GraftStrategy)
  }
}
