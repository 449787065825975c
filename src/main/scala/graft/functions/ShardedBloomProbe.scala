package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom probe whose filter argument may be a per-row COLUMN — the probe
  * half of the sharded history gate (streaming.Transforms.bloomGateSharded).
  *
  * Spark's `BloomFilterMightContain` requires the serialized filter to be
  * foldable (a literal or scalar subquery), which caps the history at
  * whatever fits in ONE broadcast value. The sharded gate instead joins
  * each document to its shard's filter row, so the filter arrives as a
  * join output column; this expression accepts that.
  *
  * Deserializing a multi-MB filter per row would dominate the probe, so
  * instances keep a one-entry per-thread cache keyed by the shard id:
  * after the gate's shuffle join, a task's rows arrive clustered by
  * shard, making the cache hit rate ~1 (a task re-deserializes only on a
  * shard boundary). Contract: within one query, a shard id must map to
  * exactly one filter value — true by construction for the gate, where
  * the filters frame has one row per shard.
  *
  * Total (never null): a NULL filter — a left-join miss, i.e. a shard
  * with no historical documents — contains nothing, so the probe answers
  * `false`; a NULL hash likewise. That keeps `!probe` as the gate's keep
  * predicate without a null-handling wrapper.
  */
case class ShardedBloomProbe(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = first.dataType == IntegerType && second.dataType == BinaryType &&
      third.dataType == LongType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_bloom_probe expects (shard INT, filter BINARY, hash BIGINT); got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  }

  @transient private lazy val cache =
    new ThreadLocal[(Int, BloomFilter)]

  /** Public for generated code. */
  def probe(shard: Int, bytes: Array[Byte], hash: Long): Boolean = {
    var e = cache.get()
    if (e == null || e._1 != shard) {
      e = (shard, BloomFilter.readFrom(new ByteArrayInputStream(bytes)))
      cache.set(e)
    }
    e._2.mightContainLong(hash)
  }

  override def eval(input: InternalRow): Any = {
    val s = first.eval(input)
    val f = second.eval(input)
    val h = third.eval(input)
    if (s == null || f == null || h == null) false
    else probe(s.asInstanceOf[Int], f.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val s = first.genCode(ctx)
    val f = second.genCode(ctx)
    val h = third.genCode(ctx)
    val ref = ctx.addReferenceObj("shardedBloomProbe", this, classOf[ShardedBloomProbe].getName)
    val resultCode =
      code"""
        ${s.code}
        ${f.code}
        ${h.code}
        boolean ${ev.value} = false;
        if (!${s.isNull} && !${f.isNull} && !${h.isNull}) {
          ${ev.value} = $ref.probe(${s.value}, ${f.value}, ${h.value});
        }
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): ShardedBloomProbe =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "graft_bloom_probe"
}
