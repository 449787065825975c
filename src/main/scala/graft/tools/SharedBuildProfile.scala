package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler for the PRICED shared-build lines (round 16): times
  * evict → rebuild of a named memoized artifact, min-of-N, without
  * paying a full bench sweep per data point. The r15 c8 capture showed
  * ir_truth_shingle at 127× its c32 time — this tool exists to measure
  * that ratio in isolation before/after the truth-join fixes.
  * Usage: `runMain graft.tools.SharedBuildProfile <name> [name...]`;
  * `SPARK_GRAFT_SF_DIR` / `SPARK_GRAFT_CPUS` as in Bench;
  * `GRAFT_BUILD_RUNS` (default 3) timed runs per name. */
object SharedBuildProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.get("GRAFT_BUILD_RUNS").flatMap(_.toIntOption).getOrElse(3)
    val spark = graft.GraftSession.create(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.lint", "off")
    import graft.operators._
    val builds: Map[String, SparkSession => Unit] = Map(
      "ir_top" -> (s => { Retrieval.evictEvalTop(s); Retrieval.bm25EvalTop(s, sfDir).count(); () }),
      "ir_truth" -> (s => { Retrieval.evictTruth(s); Retrieval.truthFrame(s, sfDir).count(); () }),
      "ir_truth_shingle" -> (s => { Retrieval.evictTruthShingle(s); Retrieval.truthFrameShingle(s, sfDir).count(); () }),
      "dd_truth" -> (s => { Dedup.evictPpjoinTruth(s); Dedup.ppjoinPairsUnsorted(s, sfDir).count(); () }),
      "ann_truth" -> (s => { Similarity.evictAnnTruth(s); Similarity.annTruth(s, sfDir).count(); () }),
      "nn_graph" -> (s => { Similarity.evictNnGraph(s); Similarity.nnDescentGraph(s, sfDir).count(); () }),
      "pq_book" -> (s => { Similarity.evictResidualBooks(s); Similarity.priceResidualBooks(s, sfDir); () }),
      "ann_queries" -> (s => { Similarity.evictQueries(s); Similarity.budgetQueries(s, sfDir).count(); () }),
      "ql_scored" -> (s => { QualityClassifier.evictScored(s); QualityClassifier.scored(s, sfDir).count(); () }))
    val stageRows = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Long, Int, String)]())
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val info = sc.stageInfo
        val dur = (for (a <- info.completionTime; b <- info.submissionTime)
          yield a - b).getOrElse(0L)
        stageRows.add((dur, info.numTasks,
          info.name.linesIterator.next().take(100)))
      }
    })
    args.foreach { name =>
      val fn = builds.getOrElse(name,
        sys.error(s"unknown build (known: ${builds.keys.toSeq.sorted.mkString(", ")})"))
      fn(spark) // warm codegen/JIT (and upstream memos, e.g. the sample)
      val times = (1 to runs).map { _ =>
        stageRows.clear()
        val t0 = System.nanoTime()
        fn(spark)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"BUILDPROFILE $name%-18s min=${times.min}%7.3f s  runs=${times.map(t => f"$t%.3f").mkString(", ")}")
      if (sys.env.contains("GRAFT_PROFILE_STAGES")) {
        import scala.jdk.CollectionConverters._
        Thread.sleep(300)
        stageRows.asScala.toSeq.sortBy(-_._1).take(10).foreach {
          case (dur, nt, nm) =>
            println(f"  STAGE ${dur / 1e3}%7.3f s tasks=$nt%4d  $nm")
        }
      }
    }
    spark.stop()
  }
}
