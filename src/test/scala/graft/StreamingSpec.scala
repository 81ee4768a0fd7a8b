package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streaming

/** Harness-level streaming tests: the single-file glob workaround,
  * complete-mode aggregation, and append-mode watermark withholding —
  * the behaviors the oracle-checked st* queries depend on.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dataPath = {
    val dir = Files.createTempDirectory("graft_stream_fixture")
    val p = s"$dir/ticks.parquet"
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10L),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:30:00"), 20L),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 05:00:00"), 30L))
      .toDF("id", "ts", "v").coalesce(1).write.parquet(p)
    p
  }

  test("runAvailableNow drains a single-file path via the glob rewrite (complete mode)") {
    val out = Streaming.runAvailableNow(spark, dataPath, "complete") { df =>
      df.groupBy(window(col("ts"), "1 hour").as("w")).agg(sum("v").as("s"))
        .select(col("w.start").as("w_start"), col("s"))
    }
    val rows = out.orderBy("w_start").as[(java.sql.Timestamp, Long)].collect().toSeq
    assert(rows.map(_._2) == Seq(30L, 30L))
  }

  test("foreachBatch drains a streaming aggregate into a JDBC sink (Derby)") {
    val dbDir = Files.createTempDirectory("graft_derby_stream")
    if (System.getProperty("derby.system.home") == null)
      System.setProperty("derby.system.home", dbDir.toString)
    val url = s"jdbc:derby:$dbDir/streamdb;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")

    Streaming.runForeachBatch(spark, dataPath, "complete") { df =>
      df.groupBy().agg(count(lit(1)).as("n"), sum("v").as("total"))
    } { (batch, _) =>
      // complete mode + truncate-reload = idempotent refresh per batch
      graft.io.Sinks.truncateReload(batch, url, "stream_agg", props)
    }
    val got = spark.read.jdbc(url, "stream_agg", props)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((3L, 60L)))
  }

  test("restart from checkpoint delivers only unseen files, batch ids continue") {
    val dataDir = Files.createTempDirectory("graft_ckpt_src").toString + "/ticks.parquet"
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    Seq((1L, 10L), (2L, 20L), (1L, 30L)).toDF("user_id", "v")
      .coalesce(1).write.parquet(dataDir)

    def runOnce(): (Seq[(Long, Long)], Seq[Long]) = {
      val rows = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      val batches = scala.collection.mutable.ArrayBuffer[Long]()
      Streaming.runForeachBatch(spark, dataDir, "append", Some(ckpt))(identity) {
        (batch, id) =>
          val got = batch.collect().map(r => (r.getLong(0), r.getLong(1)))
          synchronized { rows ++= got; batches += id }
      }
      (rows.toSeq.sorted, batches.toSeq)
    }

    val (rows1, batches1) = runOnce()
    assert(rows1 == Seq((1L, 10L), (1L, 30L), (2L, 20L)))
    assert(batches1.contains(0L))

    // new data lands between runs; same checkpoint → only the new
    // file is delivered, and the batch counter resumes past run 1's
    Seq((3L, 40L), (1L, 50L)).toDF("user_id", "v")
      .coalesce(1).write.mode("append").parquet(dataDir)
    val (rows2, batches2) = runOnce()
    assert(rows2 == Seq((1L, 50L), (3L, 40L)), s"reprocessed seen files: $rows2")
    assert(batches2.nonEmpty && batches2.forall(_ > batches1.max),
      s"batch ids did not continue: $batches1 then $batches2")
  }

  test("append mode withholds windows newer than the final watermark") {
    // watermark delay 1h; max ts = 05:00 → watermark 04:00: the
    // 00:00 window (end 01:00) emits, the 05:00 window (end 06:00)
    // is withheld as potentially still open
    val out = Streaming.runAvailableNow(spark, dataPath, "append") { df =>
      df.withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour").as("w")).agg(sum("v").as("s"))
        .select(col("w.start").as("w_start"), col("s"))
    }
    val rows = out.as[(java.sql.Timestamp, Long)].collect().toSeq
    assert(rows == Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 30L)))
  }
}
