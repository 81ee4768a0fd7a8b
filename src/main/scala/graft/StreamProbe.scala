package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Scratch profiling main (not part of the graded surface): drains
  * one windowed-agg streaming query over sf0.1 events with a progress
  * listener and prints per-batch durationMs so the fixed overhead of
  * a drain is attributable (source listing? state commit? no-data
  * batch? sink?).
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.engine.Sessions.local("32")
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit =
        println(s"[probe] started ${System.nanoTime() / 1000000}")
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        println(s"[probe] batch=${e.progress.batchId} rows=${e.progress.numInputRows} " +
          s"durationMs=${e.progress.durationMs} stateOps=${e.progress.stateOperators.length}")
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        println(s"[probe] terminated ${System.nanoTime() / 1000000}")
    })
    for (r <- 0 until 3) {
      val t0 = System.nanoTime()
      val out = graft.streaming.Streaming.eventsStream(spark, sfDir, "complete") { ev =>
        ev.withWatermark("ts", "1 day")
          .groupBy(window(col("ts"), "1 day"), col("event_type"))
          .agg(count(lit(1)).as("n"))
      }
      val n = out.count()
      println(f"[probe] rep=$r total=${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
