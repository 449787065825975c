package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Dev profiler: per query, warm once then time once, reporting the
  * Spark job / stage / task counts and the summed executor task time of
  * the timed run — separates "slow because of compute" from "slow
  * because of driver/job overhead" (guide §1: measure first). Usage:
  * `runMain graft.tools.JobProfile <query> [query...]`;
  * `SPARK_GRAFT_SF_DIR` picks the data dir. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.create(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.lint", "off")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val taskTime = new java.util.concurrent.atomic.AtomicLong
    val stageRows = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Long, Int, String)]())
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val info = sc.stageInfo
        val dur = (for (a <- info.completionTime; b <- info.submissionTime)
          yield a - b).getOrElse(0L)
        stageRows.add((dur, info.numTasks,
          info.name.linesIterator.next().take(100)))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) taskTime.addAndGet(t.taskInfo.duration)
      }
    })
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm (also populates session memos)
      Thread.sleep(300) // let queued listener events drain
      jobs.set(0); stages.set(0); tasks.set(0); taskTime.set(0)
      stageRows.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let queued listener events drain
      println(f"JOBPROFILE $name%-22s wall=$wall%7.3f s jobs=${jobs.get}%3d " +
        f"stages=${stages.get}%4d tasks=${tasks.get}%5d taskTime=${taskTime.get / 1e3}%8.2f s")
      if (sys.env.contains("GRAFT_PROFILE_STAGES")) {
        import scala.jdk.CollectionConverters._
        stageRows.asScala.toSeq.sortBy(-_._1).take(8).foreach {
          case (dur, nt, nm) =>
            println(f"  STAGE ${dur / 1e3}%7.3f s tasks=$nt%4d  $nm")
        }
      }
    }
    spark.stop()
  }
}
