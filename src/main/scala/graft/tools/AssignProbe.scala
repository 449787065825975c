package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Build-side assignment probe (round 13, r12 verdict item 1): times the
  * √N IVF family's coarse ASSIGNMENT STAGE in isolation — one-level
  * brute-force argmax (Θ(N·K)) against the deployed two-level rule
  * (Θ(N·√K)) — on any corpus dir. The SCALECHECK32E artifact prices the
  * whole retrieval cards; this isolates the one stage the two-level
  * rewrite exists for, so the build-side claim is measured directly
  * rather than inferred from card totals.
  *
  * Usage: `AssignProbe <sfDir> [reps]` — per variant: one warm pass,
  * then `reps` timed passes reporting each (the TimeQuery discipline).
  */
object AssignProbe {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AssignProbe <sfDir> [reps]")
    val d = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.create(s"local[$cpus]", 32)
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.lint", "off")
    graft.plans.GraftFunctions.register(spark)
    val v = graft.Tables.embeddings(spark, d)
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding").as("e"))
      .withColumn("nrm", graft.functions.VecFns.l2norm(col("e")))
    val n = v.count()
    val k = graft.operators.Similarity.sqrtCells(n)
    val cents = v.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("e").as("ce"), col("nrm").as("cn"))
    println(s"[assignprobe] corpus=$d n=$n k=$k super=${graft.operators.Similarity.superCells(k)}")
    Seq(false, true).foreach { twoLevel =>
      val name = if (twoLevel) "two-level" else "one-level"
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.operators.Similarity.assignCells(v, cents, k, twoLevel, carry = Nil).count()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm codegen/JIT for this plan shape
      (1 to reps).foreach { r =>
        println(f"[assignprobe] $name%-9s run $r: ${once()}%.2f s")
      }
    }
    spark.stop()
  }
}
