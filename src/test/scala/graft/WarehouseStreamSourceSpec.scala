package graft

import java.nio.file.Files

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Warehouse

/** The native Structured Streaming SOURCE
  * (`readStream.format("graft-warehouse")`): a warehouse table
  * streamed through a real query, with commit versions as offsets.
  * Pins the Delta-shaped contract — fresh checkpoint = full snapshot,
  * resume = only the commits since, deletes fail loudly unless
  * acknowledged, `readChangeFeed` serves the tagged diff,
  * `startingVersion` skips the snapshot, and `maxVersionsPerTrigger`
  * pages a backlog across micro-batches — within a run AND across
  * restarts (the admission-control start offset).
  */
class WarehouseStreamSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(rows: Seq[(Long, String, Long, String)]): String = {
    val path = Files.createTempDirectory("graft_src").toString + "/t"
    Warehouse.create(spark, path, rows.toDF("k", "name", "ver", "part"), "part")
    path
  }

  /** Drain every available micro-batch; returns the per-batch row
    * collections (empty batches dropped — AvailableNow can close with
    * one).
    */
  private def drain(path: String, ckpt: String,
                    opts: Map[String, String] = Map.empty): Seq[Seq[Row]] = {
    val buf = ListBuffer[Seq[Row]]()
    val q = spark.readStream.format("graft-warehouse").options(opts).load(path)
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val rows = b.collect().toSeq
        if (rows.nonEmpty) buf += rows
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .start()
    q.awaitTermination()
    buf.toList
  }

  private def keyNames(rows: Seq[Row]): Set[(Long, String)] =
    rows.map(r => (r.getAs[Long]("k"), r.getAs[String]("name"))).toSet

  test("fresh checkpoint = full folded snapshot; resume delivers only new commits' post-images") {
    val path = freshTable(Seq((1L, "base", 1L, "d1"), (2L, "keep", 1L, "d2")))
    Warehouse.mergeIntoDelta(spark, path,
      Seq((1L, "upd", 2L, "d1"), (3L, "ins", 1L, "d1"))
        .toDF("k", "name", "ver", "part"), "k", "ver", "part")
    val ckpt = Files.createTempDirectory("graft_src_ck").toString
    val first = drain(path, ckpt)
    assert(first.size == 1, s"fresh stream must be one snapshot batch, got $first")
    assert(keyNames(first.head) ==
      Set((1L, "upd"), (2L, "keep"), (3L, "ins")),
      "the snapshot must be the chain-folded latest-wins read")
    // nothing new: a resume delivers nothing
    assert(drain(path, ckpt).isEmpty)
    // two more commits land; the same checkpoint gets exactly their post-images
    Warehouse.mergeIntoDelta(spark, path,
      Seq((2L, "upd2", 2L, "d2")).toDF("k", "name", "ver", "part"),
      "k", "ver", "part")
    Warehouse.mergeIntoDelta(spark, path,
      Seq((4L, "new", 1L, "d2")).toDF("k", "name", "ver", "part"),
      "k", "ver", "part")
    val resumed = drain(path, ckpt)
    assert(keyNames(resumed.flatten) == Set((2L, "upd2"), (4L, "new")),
      s"resume must deliver only the new commits' post-images, got $resumed")
    assert(resumed.flatten.size == 2, "each change exactly once")
  }

  test("maxVersionsPerTrigger pages a commit backlog across micro-batches in one run") {
    val path = freshTable(Seq((1L, "base", 1L, "d1")))
    (0 until 4).foreach { i =>
      Warehouse.mergeIntoDelta(spark, path,
        Seq((10L + i, s"c$i", 1L, "d1")).toDF("k", "name", "ver", "part"),
        "k", "ver", "part")
    } // versions 2..5
    val ckpt = Files.createTempDirectory("graft_src_ck").toString
    val batches = drain(path, ckpt, Map(
      "startingVersion" -> "2", "maxVersionsPerTrigger" -> "2"))
    assert(batches.size == 2,
      s"4 pending commits at 2/trigger must drain in 2 batches, got ${batches.size}")
    assert(keyNames(batches.flatten) ==
      Set((10L, "c0"), (11L, "c1"), (12L, "c2"), (13L, "c3")))
    assert(batches.head.size == 2 && batches(1).size == 2,
      "each page carries exactly its own commits' rows")
  }

  test("the per-trigger cap holds ACROSS RESTARTS: a downtime backlog drains in pages") {
    val path = freshTable(Seq((1L, "base", 1L, "d1")))
    val ckpt = Files.createTempDirectory("graft_src_ck").toString
    assert(drain(path, ckpt,
      Map("keyCol" -> "k", "maxVersionsPerTrigger" -> "2")).size == 1) // snapshot
    // 4 commits land while the query is down...
    (0 until 4).foreach { i =>
      Warehouse.mergeIntoDelta(spark, path,
        Seq((20L + i, s"b$i", 1L, "d1")).toDF("k", "name", "ver", "part"),
        "k", "ver", "part")
    }
    // ...and the restarted run still pages them 2 commits at a time
    val resumed = drain(path, ckpt,
      Map("keyCol" -> "k", "maxVersionsPerTrigger" -> "2"))
    assert(resumed.size == 2,
      s"a 4-commit backlog at 2/trigger must drain in 2 batches, got ${resumed.size}")
    assert(keyNames(resumed.flatten) ==
      Set((20L, "b0"), (21L, "b1"), (22L, "b2"), (23L, "b3")))
  }

  test("maxBytesPerTrigger: an oversized commit drains across >= 2 micro-batches as partition sub-pages, exactly once") {
    val path = freshTable(Seq(
      (1L, "b1", 1L, "d1"), (2L, "b2", 1L, "d2"),
      (3L, "b3", 1L, "d3"), (4L, "b4", 1L, "d4")))
    // ONE commit (v2) touching all four partitions - bigger than any
    // 1-byte budget, so it must page by partition groups
    Warehouse.append(spark, path,
      (0 until 8).map(i => (100L + i, s"a$i", 1L, s"d${i % 4 + 1}"))
        .toDF("k", "name", "ver", "part"))
    val ckpt = Files.createTempDirectory("graft_src_ck").toString
    val batches = drain(path, ckpt, Map(
      "keyCol" -> "k", "startingVersion" -> "2", "maxBytesPerTrigger" -> "1"))
    assert(batches.size >= 2,
      s"an over-budget commit must drain across >= 2 micro-batches, got ${batches.size}")
    val all = batches.flatten
    assert(all.size == 8, s"exactly-once: every appended row exactly once, got ${all.size}")
    assert(keyNames(all) == (0 until 8).map(i => (100L + i, s"a$i")).toSet)
    // each sub-page carries whole partitions (key-disjoint groups)
    assert(batches.forall(_.nonEmpty))
  }

  test("maxBytesPerTrigger is a soft max: a fitting backlog still lands in one batch, an indivisible one-partition commit delivers whole") {
    val path = freshTable(Seq((1L, "base", 1L, "d1")))
    Warehouse.append(spark, path,
      Seq((50L, "big", 1L, "d1")).toDF("k", "name", "ver", "part"))
    val ckpt = Files.createTempDirectory("graft_src_ck").toString
    // budget of 1 byte, but the commit moved ONE partition - indivisible,
    // delivered whole rather than deadlocking
    val batches = drain(path, ckpt, Map(
      "keyCol" -> "k", "startingVersion" -> "2", "maxBytesPerTrigger" -> "1"))
    assert(batches.size == 1 && keyNames(batches.head) == Set((50L, "big")))
    // and a GENEROUS budget admits a multi-commit backlog in one batch
    (0 until 3).foreach { i =>
      Warehouse.append(spark, path,
        Seq((60L + i, s"m$i", 1L, "d1")).toDF("k", "name", "ver", "part"))
    }
    val more = drain(path, ckpt, Map(
      "keyCol" -> "k", "maxBytesPerTrigger" -> (64L << 20).toString))
    assert(more.size == 1,
      s"a fitting backlog must not be needlessly split, got ${more.size}")
    assert(keyNames(more.flatten) ==
      (0 until 3).map(i => (60L + i, s"m$i")).toSet)
  }

  test("an over-budget LAYOUT-EVOLUTION commit pages without fabricating delete/insert churn") {
    val path = freshTable(Seq(
      (1L, "b1", 1L, "d1"), (2L, "b2", 1L, "d2"),
      (3L, "b3", 1L, "d3"), (4L, "b4", 1L, "d4")))
    // v2: an append across all partitions; v3: full layout evolution
    // (old keys part=dX -> new keys part=dX/name=...) in ONE commit
    Warehouse.append(spark, path,
      (0 until 4).map(i => (10L + i, s"a$i", 1L, s"d${i + 1}"))
        .toDF("k", "name", "ver", "part"))
    Warehouse.evolveLayout(spark, path, Seq("part", "name"))
    val ckpt = Files.createTempDirectory("graft_src_ck").toString
    val batches = drain(path, ckpt, Map(
      "keyCol" -> "k", "readChangeFeed" -> "true",
      "startingVersion" -> "2", "maxBytesPerTrigger" -> "1"))
    val all = batches.flatten
    // v2's inserts arrive (paged); v3 - a pure layout rewrite - must
    // contribute NOTHING: old and new generations of a logical
    // partition page TOGETHER, so the diff folds them away instead of
    // fabricating delete+insert pairs for unchanged rows
    assert(all.forall(_.getAs[String]("change_type") == "insert"),
      s"a layout evolution must emit no deletes, got ${all.map(_.getAs[String]("change_type")).distinct}")
    assert(all.count(_.getAs[Long]("commit_version") == 3L) == 0,
      "the evolution commit's paged diff must be empty")
    assert(all.map(r => (r.getAs[Long]("k"), r.getAs[String]("name"))).toSet ==
      (0 until 4).map(i => (10L + i, s"a$i")).toSet)
  }

  test("a DELETE commit fails the row-mode stream loudly; ignoreDeletes acknowledges and drops") {
    val path = freshTable(Seq((1L, "base", 1L, "d1"), (2L, "gone", 1L, "d1")))
    Warehouse.mergeIntoDelta(spark, path,
      Seq((3L, "ins", 1L, "d1")).toDF("k", "name", "ver", "part"),
      "k", "ver", "part")
    val ckptA = Files.createTempDirectory("graft_src_ck").toString
    val ckptB = Files.createTempDirectory("graft_src_ck").toString
    assert(drain(path, ckptA).size == 1)
    assert(drain(path, ckptB, Map("ignoreDeletes" -> "true")).size == 1)
    // a tombstone erases key 2
    Warehouse.mergeIntoDelta(spark, path,
      Seq((2L, "gone", 2L, "d1", true)).toDF("k", "name", "ver", "part", "del"),
      "k", "ver", Seq("part"), Some("del"))
    val ex = intercept[StreamingQueryException](drain(path, ckptA))
    // the guard rides inside the delivered plan (no per-trigger
    // existence probe), so the contract message surfaces through the
    // task-failure cause chain — walk it fully
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("DELETE")),
      s"the failure must name the delete contract, got $ex")
    // acknowledged: the delete-only commit delivers nothing and the stream lives
    assert(drain(path, ckptB, Map("ignoreDeletes" -> "true")).isEmpty)
  }

  test("readChangeFeed streams the tagged per-commit diff") {
    val path = freshTable(Seq((1L, "base", 1L, "d1")))
    Warehouse.mergeIntoDelta(spark, path,
      Seq((1L, "upd", 2L, "d1"), (2L, "ins", 1L, "d1"))
        .toDF("k", "name", "ver", "part"), "k", "ver", "part")
    Warehouse.mergeIntoDelta(spark, path,
      Seq((3L, "late", 1L, "d1")).toDF("k", "name", "ver", "part"),
      "k", "ver", "part")
    val ckpt = Files.createTempDirectory("graft_src_ck").toString
    val feed = drain(path, ckpt, Map("readChangeFeed" -> "true")).flatten
    val tags = feed.map(r => (r.getAs[Long]("k"),
      r.getAs[String]("change_type"), r.getAs[Long]("commit_version"))).toSet
    assert(tags == Set(
      (1L, "update_preimage", 2L), (1L, "update_postimage", 2L),
      (2L, "insert", 2L), (3L, "insert", 3L)),
      s"the feed must match the commit history, got $tags")
    // the batch equals the batch API's changeLog over the same range
    val api = Warehouse.changeLog(spark, path, "k", fromV = 1L)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("change_type"),
        r.getAs[Long]("commit_version"))).toSet
    assert(tags == api)
  }

  test("startingVersion skips the snapshot; keyless tables demand an explicit keyCol") {
    val path = freshTable(Seq((1L, "base", 1L, "d1")))
    Warehouse.mergeIntoDelta(spark, path,
      Seq((2L, "only", 1L, "d1")).toDF("k", "name", "ver", "part"),
      "k", "ver", "part")
    val ckpt = Files.createTempDirectory("graft_src_ck").toString
    val got = drain(path, ckpt, Map("startingVersion" -> "2")).flatten
    assert(keyNames(got) == Set((2L, "only")),
      s"startingVersion must skip the v1 base rows, got $got")
    // a table that never recorded merge keys refuses without keyCol
    val plain = freshTable(Seq((9L, "x", 1L, "d1")))
    val ex = intercept[Exception] {
      spark.readStream.format("graft-warehouse").load(plain)
    }
    assert(ex.getMessage.contains("keyCol"),
      s"keyless table must demand option(keyCol), got $ex")
  }

  test("a change-feed stream started BEFORE any diffable commit survives: empty first run, later commits deliver") {
    // only the create commit exists — nothing to diff. The engine
    // still runs (and offset-logs) batch 0; the source must deliver
    // an empty frame, not crash changeLog with a sentinel range and
    // wedge the checkpoint forever (judge r17 review)
    val path = freshTable(Seq((1L, "base", 1L, "d1")))
    val ckpt = Files.createTempDirectory("graft_src_ck").toString
    assert(drain(path, ckpt,
        Map("readChangeFeed" -> "true", "keyCol" -> "k")).isEmpty,
      "nothing diffable yet: the run must close empty, not crash")
    // a commit lands; the SAME checkpoint now delivers it
    Warehouse.mergeIntoDelta(spark, path,
      Seq((2L, "late", 1L, "d1")).toDF("k", "name", "ver", "part"),
      "k", "ver", "part")
    val got = drain(path, ckpt,
      Map("readChangeFeed" -> "true", "keyCol" -> "k")).flatten
    assert(got.map(r => (r.getAs[Long]("k"), r.getAs[String]("change_type")))
      .toSet == Set((2L, "insert")),
      s"the wedged-checkpoint bug is back: expected the late insert, got $got")
  }

  test("a fresh change-feed stream on a VACUUMED table starts from the first retained commit") {
    val path = freshTable(Seq((1L, "base", 1L, "d1")))
    for (i <- 2 to 5)
      Warehouse.mergeIntoDelta(spark, path,
        Seq((i.toLong, s"v$i", 1L, "d1")).toDF("k", "name", "ver", "part"),
        "k", "ver", "part")
    // reclaim history below the newest few commits
    Warehouse.compact(spark, path, "k", targetBytes = 64L << 20)
    Warehouse.vacuum(spark, path, minAgeMs = 0L)
    val oldest = Warehouse.oldestVersion(spark, path)
    assert(oldest > 1L, s"vacuum must have reclaimed early history, oldest=$oldest")
    // one more commit past the retained floor, so the stream has
    // something diffable to deliver
    Warehouse.mergeIntoDelta(spark, path,
      Seq((9L, "fresh", 1L, "d1")).toDF("k", "name", "ver", "part"),
      "k", "ver", "part")
    // fresh stream without startingVersion: the default floor is the
    // first RETAINED commit (the hardcoded version-1 floor crashed
    // changeLog's retention check here — judge r17 review)
    val ckpt = Files.createTempDirectory("graft_src_ck").toString
    val got = drain(path, ckpt, Map("readChangeFeed" -> "true")).flatten
    assert(got.nonEmpty &&
      got.forall(_.getAs[Long]("commit_version") > oldest),
      s"the stream must start at the first retained commit, got $got")
  }

  test("OutputMode.Update with sink mode=append refuses at start (stale duplicates would accumulate silently)") {
    val path = freshTable(Seq((1L, "base", 1L, "d1")))
    val ckpt = Files.createTempDirectory("graft_src_ck").toString
    val ex = intercept[Exception] {
      spark.readStream.format("graft-warehouse")
        .option("keyCol", "k").load(path)
        .groupBy("k").count()
        .writeStream.format("graft-warehouse")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start(Files.createTempDirectory("graft_upd_sink").toString + "/t")
    }
    assert(ex.getMessage.contains("Update"),
      s"Update+append must refuse loudly, got: ${ex.getMessage}")
  }

  test("initial snapshot pages under maxBytesPerTrigger: a fresh multi-partition stream drains across >= 2 micro-batches, exactly once") {
    val path = freshTable((0 until 12).map(i =>
      (i.toLong, s"n$i", 1L, s"d${i % 4 + 1}")))
    val ckpt = Files.createTempDirectory("graft_src_ck").toString
    val batches = drain(path, ckpt, Map(
      "keyCol" -> "k", "maxBytesPerTrigger" -> "1"))
    assert(batches.size >= 2,
      s"a fresh snapshot over budget must drain across >= 2 micro-batches, got ${batches.size}")
    val all = batches.flatten
    assert(all.size == 12,
      s"exactly-once: every snapshot row exactly once, got ${all.size}")
    assert(keyNames(all) == (0 until 12).map(i => (i.toLong, s"n$i")).toSet)
    // after the paged snapshot completes, change commits still stream
    Warehouse.append(spark, path,
      Seq((100L, "post", 1L, "d1")).toDF("k", "name", "ver", "part"))
    val more = drain(path, ckpt, Map(
      "keyCol" -> "k", "maxBytesPerTrigger" -> "1"))
    assert(keyNames(more.flatten) == Set((100L, "post")),
      "post-snapshot commits must deliver as ordinary change pages")
  }

  test("mid-snapshot crash + restart (even under a CHANGED budget) replays the checkpointed sub-page and finishes exactly once") {
    val path = freshTable((0 until 12).map(i =>
      (i.toLong, s"n$i", 1L, s"d${i % 4 + 1}")))
    val ckpt = Files.createTempDirectory("graft_src_ck").toString
    // run 1: crash after micro-batch 0's offset is logged but before
    // its commit - the classic mid-snapshot death
    val buf1 = ListBuffer[Seq[Row]]()
    val q1 = spark.readStream.format("graft-warehouse")
      .options(Map("keyCol" -> "k", "maxBytesPerTrigger" -> "1")).load(path)
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        buf1 += b.collect().toSeq
        if (id == 0L) throw new RuntimeException("injected mid-snapshot crash")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .start()
    intercept[StreamingQueryException] { q1.awaitTermination() }
    assert(buf1.nonEmpty && buf1.head.size < 12,
      "the crash must land mid-snapshot, after a PARTIAL first page")
    // run 2 restarts with a DIFFERENT budget: the offset-recorded
    // budget must reproduce the original grouping (a re-derived
    // grouping would double- or under-deliver)
    val batches2 = drain(path, ckpt, Map(
      "keyCol" -> "k", "maxBytesPerTrigger" -> (64L << 20).toString))
    assert(keyNames(batches2.head) == keyNames(buf1.head),
      "the replayed batch 0 must be byte-for-byte the checkpointed sub-page")
    assert(keyNames(batches2.flatten) ==
      (0 until 12).map(i => (i.toLong, s"n$i")).toSet,
      "the restarted drain must complete the snapshot exactly once")
    assert(batches2.flatten.size == 12)
  }

  test("a corrupt paged offset (missing budget segment) fails loudly instead of regrouping silently") {
    val e = intercept[IllegalStateException] {
      graft.sources.warehouse.WarehouseStreamSource.parsePos("7#2")
    }
    assert(e.getMessage.contains("corrupt"))
    // the three legal encodings parse
    assert(graft.sources.warehouse.WarehouseStreamSource.parsePos("7") ==
      ((7L, -1, -1L, false)))
    assert(graft.sources.warehouse.WarehouseStreamSource.parsePos("7#2#1024") ==
      ((7L, 2, 1024L, false)))
    assert(graft.sources.warehouse.WarehouseStreamSource
      .parsePos("7#2#1024#snap") == ((7L, 2, 1024L, true)))
  }

  test("maxFilesPerTrigger: a many-small-files commit drains across >= 2 micro-batches exactly once; whole-commit admission caps too") {
    val path = freshTable(Seq(
      (1L, "b1", 1L, "d1"), (2L, "b2", 1L, "d2"),
      (3L, "b3", 1L, "d3"), (4L, "b4", 1L, "d4")))
    // ONE commit (v2) landing a file in each of the four partitions —
    // over any 1-file budget, so it must sub-page by partition groups
    // packed by FILE COUNT (the pre-compaction many-small-files shape)
    Warehouse.append(spark, path,
      (0 until 8).map(i => (100L + i, s"a$i", 1L, s"d${i % 4 + 1}"))
        .toDF("k", "name", "ver", "part"))
    val ckpt = Files.createTempDirectory("graft_src_ck").toString
    val batches = drain(path, ckpt, Map(
      "keyCol" -> "k", "startingVersion" -> "2", "maxFilesPerTrigger" -> "1"))
    assert(batches.size >= 2,
      s"an over-file-budget commit must drain across >= 2 micro-batches, got ${batches.size}")
    val all = batches.flatten
    assert(all.size == 8,
      s"exactly-once: every appended row exactly once, got ${all.size}")
    assert(keyNames(all) == (0 until 8).map(i => (100L + i, s"a$i")).toSet)
    // whole-commit admission: three 1-file commits under a 2-file
    // budget land as 2 + 1 (fresh partitions - a commit's file cost
    // is its touched partitions' whole chains, the fold-read bound)
    (0 until 3).foreach { i =>
      Warehouse.append(spark, path,
        Seq((200L + i, s"m$i", 1L, s"d${5 + i}")).toDF("k", "name", "ver", "part"))
    }
    val more = drain(path, ckpt, Map(
      "keyCol" -> "k", "maxFilesPerTrigger" -> "2"))
    assert(more.size == 2,
      s"greedy file admission must page 3 one-file commits as 2+1, got ${more.size}")
    assert(keyNames(more.flatten) ==
      (0 until 3).map(i => (200L + i, s"m$i")).toSet)
  }

  test("mid-snapshot crash + restart under a FILE budget (even when the restart switches to a byte budget) replays the negative-budget sub-page exactly once") {
    val path = freshTable((0 until 12).map(i =>
      (i.toLong, s"n$i", 1L, s"d${i % 4 + 1}")))
    val ckpt = Files.createTempDirectory("graft_src_ck").toString
    // run 1 pages the snapshot by FILE COUNT and crashes after micro-
    // batch 0's offset (a NEGATIVE budget) is logged but uncommitted
    val buf1 = ListBuffer[Seq[Row]]()
    val q1 = spark.readStream.format("graft-warehouse")
      .options(Map("keyCol" -> "k", "maxFilesPerTrigger" -> "1")).load(path)
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        buf1 += b.collect().toSeq
        if (id == 0L) throw new RuntimeException("injected mid-snapshot crash")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .start()
    intercept[StreamingQueryException] { q1.awaitTermination() }
    assert(buf1.nonEmpty && buf1.head.size < 12,
      "the crash must land mid-snapshot, after a PARTIAL first page")
    // run 2 restarts under a DIFFERENT (byte) budget: the offset's
    // negative budget must reproduce the FILE-packed grouping the
    // checkpoint meant, then the drain completes exactly once
    val batches2 = drain(path, ckpt, Map(
      "keyCol" -> "k", "maxBytesPerTrigger" -> (64L << 20).toString))
    assert(keyNames(batches2.head) == keyNames(buf1.head),
      "the replayed batch 0 must be exactly the checkpointed file-packed sub-page")
    assert(keyNames(batches2.flatten) ==
      (0 until 12).map(i => (i.toLong, s"n$i")).toSet,
      "the restarted drain must complete the snapshot exactly once")
    assert(batches2.flatten.size == 12)
  }

  test("initial snapshot pages under maxFilesPerTrigger; the file-derived grouping rides the offset as a negative budget") {
    val path = freshTable((0 until 12).map(i =>
      (i.toLong, s"n$i", 1L, s"d${i % 4 + 1}")))
    val ckpt = Files.createTempDirectory("graft_src_ck").toString
    val batches = drain(path, ckpt, Map(
      "keyCol" -> "k", "maxFilesPerTrigger" -> "1"))
    assert(batches.size >= 2,
      s"a fresh snapshot over the file budget must drain across >= 2 micro-batches, got ${batches.size}")
    val all = batches.flatten
    assert(all.size == 12,
      s"exactly-once: every snapshot row exactly once, got ${all.size}")
    assert(keyNames(all) == (0 until 12).map(i => (i.toLong, s"n$i")).toSet)
    // the negative-budget encoding round-trips (file grouping of 3)
    assert(graft.sources.warehouse.WarehouseStreamSource
      .parsePos("7#2#-3") == ((7L, 2, -3L, false)))
    assert(graft.sources.warehouse.WarehouseStreamSource
      .parsePos("7#0#-3#snap") == ((7L, 0, -3L, true)))
  }
}
