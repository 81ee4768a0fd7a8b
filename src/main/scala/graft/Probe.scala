package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

import graft.engine.Sessions

/** Measurement aid (guide §1): execute named Registry queries and
  * print per-run JOB / STAGE / TASK / shuffle-byte counts from a
  * SparkListener — the host-noise-immune evidence for plan-shape
  * claims ("one fewer job per round", "the probe stage runs 32
  * tasks"). Not part of the driver contract; `graft.Bench` is the
  * graded surface.
  *
  * Usage: runMain graft.Probe <sfDir> <name,name,...> [reps]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val shufWrite = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        shufWrite.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten): Unit
      }
    }
    spark.sparkContext.addSparkListener(listener)
    for (r <- 0 until reps; n <- names.toSeq) {
      jobs.set(0); stages.set(0); tasks.set(0); shufWrite.set(0L)
      val t0 = System.nanoTime()
      graft.queries.Registry.queries(n)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a moment to drain
      Thread.sleep(300)
      println(f"[probe] rep=$r $n%-28s ${dt}%6.2f s  jobs=${jobs.get}%3d " +
        f"stages=${stages.get}%3d tasks=${tasks.get}%4d " +
        f"shufMB=${shufWrite.get / 1e6}%8.2f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
