package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Warehouse

/** Cross-table ATOMIC commit (round 16, judge item #6 — the warehouse
  * plane of K4's staged + single-commit multi-table load): stage every
  * table's next version through the normal single-claim commit
  * primitive with a `#txnpending <marker>` header, then ONE
  * create-exclusive marker write flips all of them at the same
  * instant. Pinned here: the flip's atomicity, the crash-between-
  * stage-and-flip contract (every table stays at its old version;
  * readers never see a torn set), the loud blocked-slot error +
  * abortTransaction recovery, the abort-vs-flip single-winner race,
  * and vacuum's refusal to sweep an in-flight transaction's data.
  */
class WarehouseTxnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_txnspec").toString + "/t"

  private def mkTables(): (String, String) = {
    val a = freshDir(); val b = freshDir()
    Warehouse.create(spark, a,
      Seq((1L, "a1", "p1")).toDF("id", "v", "dt"), "dt")
    Warehouse.create(spark, b,
      Seq((10L, "b1", "p1")).toDF("id", "v", "dt"), "dt")
    (a, b)
  }

  private def ids(path: String): Set[Long] =
    Warehouse.read(spark, path).select("id").as[Long].collect().toSet

  test("transactAppend publishes every table atomically; before the flip every reader sees every table OLD") {
    val (a, b) = mkTables()
    var preFlipA: Set[Long] = null
    var preFlipB: Set[Long] = null
    var preFlipVa = -1L
    Warehouse.transactAppendHooked(spark,
      Seq(a -> Seq((2L, "a2", "p1")).toDF("id", "v", "dt"),
        b -> Seq((20L, "b2", "p1")).toDF("id", "v", "dt")),
      beforeFlip = () => {
        // both stages claimed, marker not flipped: READERS SEE OLD
        preFlipA = ids(a); preFlipB = ids(b)
        preFlipVa = Warehouse.currentVersion(spark, a)
      })
    assert(preFlipA == Set(1L) && preFlipB == Set(10L),
      s"pre-flip reads must be the old snapshots, got $preFlipA / $preFlipB")
    assert(preFlipVa == 1L)
    // after the flip: both new, atomically
    assert(ids(a) == Set(1L, 2L) && ids(b) == Set(10L, 20L))
    assert(Warehouse.currentVersion(spark, a) == 2L)
    assert(Warehouse.currentVersion(spark, b) == 2L)
    // history shows the txn commit like any other
    assert(Warehouse.history(spark, a).map(_._1) == Seq(2L, 1L))
  }

  test("a crash between stage and flip leaves every table at its old version; abortTransaction recovers the slots") {
    val (a, b) = mkTables()
    val boom = intercept[RuntimeException] {
      Warehouse.transactAppendHooked(spark,
        Seq(a -> Seq((2L, "a2", "p1")).toDF("id", "v", "dt"),
          b -> Seq((20L, "b2", "p1")).toDF("id", "v", "dt")),
        beforeFlip = () => throw new RuntimeException("crash before flip"))
    }
    assert(boom.getMessage == "crash before flip")
    // torn-set check: every table still serves its OLD version
    assert(ids(a) == Set(1L) && ids(b) == Set(10L))
    assert(Warehouse.currentVersion(spark, a) == 1L)
    // the staged slots block later writers LOUDLY, naming the marker
    val blocked = intercept[IllegalStateException] {
      Warehouse.append(spark, a, Seq((3L, "a3", "p1")).toDF("id", "v", "dt"))
    }
    assert(blocked.getMessage.contains("crashed cross-table transaction"),
      s"wrong error: ${blocked.getMessage}")
    val marker = blocked.getMessage.split("marker ")(1).split("\\)")(0)
    // recovery: abort claims the marker, drops the stages, slots free
    assert(Warehouse.abortTransaction(spark, marker, Seq(a, b)))
    Warehouse.append(spark, a, Seq((3L, "a3", "p1")).toDF("id", "v", "dt"))
    assert(ids(a) == Set(1L, 3L))
    // and a fresh transaction over both tables succeeds
    Warehouse.transactAppend(spark,
      Seq(a -> Seq((4L, "a4", "p1")).toDF("id", "v", "dt"),
        b -> Seq((40L, "b4", "p1")).toDF("id", "v", "dt")))
    assert(ids(a) == Set(1L, 3L, 4L) && ids(b) == Set(10L, 40L))
  }

  test("abort vs flip race to ONE winner: an abort landing first fails the transaction, tables unchanged") {
    val (a, b) = mkTables()
    val e = intercept[IllegalStateException] {
      Warehouse.transactAppendHooked(spark,
        Seq(a -> Seq((2L, "a2", "p1")).toDF("id", "v", "dt"),
          b -> Seq((20L, "b2", "p1")).toDF("id", "v", "dt")),
        beforeFlip = () => {
          // a racing janitor aborts while the coordinator is alive:
          // the marker's create-exclusive claim decides the winner
          val blocked = intercept[IllegalStateException] {
            Warehouse.append(spark, a,
              Seq((9L, "x", "p1")).toDF("id", "v", "dt"))
          }
          val marker = blocked.getMessage.split("marker ")(1).split("\\)")(0)
          assert(Warehouse.abortTransaction(spark, marker, Seq(a, b)))
        })
    }
    assert(e.getMessage.contains("aborted before its commit marker"),
      s"wrong error: ${e.getMessage}")
    assert(ids(a) == Set(1L) && ids(b) == Set(10L))
    // slots are free again
    Warehouse.append(spark, a, Seq((3L, "a3", "p1")).toDF("id", "v", "dt"))
    assert(ids(a) == Set(1L, 3L))
  }

  test("abortTransaction on an already-committed transaction refuses and cleans nothing") {
    val (a, b) = mkTables()
    val marker = Warehouse.transactAppend(spark,
      Seq(a -> Seq((2L, "a2", "p1")).toDF("id", "v", "dt"),
        b -> Seq((20L, "b2", "p1")).toDF("id", "v", "dt")))
    assert(!Warehouse.abortTransaction(spark, marker, Seq(a, b)))
    assert(ids(a) == Set(1L, 2L) && ids(b) == Set(10L, 20L))
  }

  test("a staged version is invisible to time travel and vacuum keeps an in-flight transaction's data alive") {
    val (a, b) = mkTables()
    Warehouse.transactAppendHooked(spark,
      Seq(a -> Seq((2L, "a2", "p1")).toDF("id", "v", "dt"),
        b -> Seq((20L, "b2", "p1")).toDF("id", "v", "dt")),
      beforeFlip = () => {
        // the staged v2 is not time-travelable yet
        val e = intercept[IllegalStateException](
          Warehouse.readVersion(spark, a, 2L))
        assert(e.getMessage.contains("no committed version 2"))
        // a zero-retention vacuum mid-flight must not sweep the
        // staged batches (the marker may still flip)
        Warehouse.vacuum(spark, a, minAgeMs = 0L)
        Warehouse.vacuum(spark, b, minAgeMs = 0L)
      })
    // the flip happened after the vacuum: the data must be intact
    assert(ids(a) == Set(1L, 2L) && ids(b) == Set(10L, 20L))
    assert(Warehouse.readVersion(spark, a, 2L).count() == 2L)
  }

  test("transact with mixed APPEND and OVERWRITE writes publishes both shapes atomically") {
    val (a, b) = mkTables()
    var preA: Set[Long] = null
    var preB: Set[Long] = null
    Warehouse.transactHooked(spark,
      Seq(
        Warehouse.TxnWrite(a, Seq((2L, "a2", "p1")).toDF("id", "v", "dt")),
        Warehouse.TxnWrite(b, Seq((99L, "b!", "p2")).toDF("id", "v", "dt"),
          overwrite = true)),
      beforeFlip = () => { preA = ids(a); preB = ids(b) })
    assert(preA == Set(1L) && preB == Set(10L), "pre-flip: both OLD")
    // a appended; b REPLACED (old partition p1 gone from the snapshot,
    // still time-travelable)
    assert(ids(a) == Set(1L, 2L))
    assert(ids(b) == Set(99L), s"overwrite must replace, got ${ids(b)}")
    assert(Warehouse.readVersion(spark, b, 1L)
      .select("id").as[Long].collect().toSet == Set(10L))
  }

  test("a DELTA (merge-on-read) table participates in a transaction: the staged chain link is invisible until the flip, atomic with a CoW table") {
    val (a, d) = mkTables()
    // make d a KEYED delta table (records _meta)
    Warehouse.mergeIntoDelta(spark, d,
      Seq((10L, "b1v2", 2L, "p1")).toDF("id", "v", "ver", "dt"),
      "id", "ver", "dt")
    assert(Warehouse.read(spark, d).select("v").as[String].collect().toSet
      == Set("b1v2"))
    var preA: Set[Long] = null
    var preDv: Set[String] = null
    Warehouse.transactHooked(spark,
      Seq(
        Warehouse.TxnWrite(a, Seq((2L, "a2", "p1")).toDF("id", "v", "dt")),
        // an UPSERT of key 10 plus a new key 11 — the delta link must
        // fold with latest-wins after the flip
        Warehouse.TxnWrite(d,
          Seq((10L, "b1v3", 3L, "p1"), (11L, "new", 1L, "p1"))
            .toDF("id", "v", "ver", "dt"))),
      beforeFlip = () => {
        preA = ids(a)
        preDv = Warehouse.read(spark, d).select("v").as[String].collect().toSet
      })
    assert(preA == Set(1L) && preDv == Set("b1v2"),
      s"pre-flip: both OLD, got $preA / $preDv")
    assert(ids(a) == Set(1L, 2L))
    assert(Warehouse.read(spark, d)
      .select("id", "v").as[(Long, String)].collect().toSet
      == Set((10L, "b1v3"), (11L, "new")),
      "the staged delta link must fold latest-wins after the flip")
  }

  test("a crashed CoW+delta transaction leaves both tables old; abort drops the staged chain link") {
    val (a, d) = mkTables()
    Warehouse.mergeIntoDelta(spark, d,
      Seq((10L, "b1v2", 2L, "p1")).toDF("id", "v", "ver", "dt"),
      "id", "ver", "dt")
    intercept[RuntimeException] {
      Warehouse.transactHooked(spark,
        Seq(
          Warehouse.TxnWrite(a, Seq((2L, "a2", "p1")).toDF("id", "v", "dt")),
          Warehouse.TxnWrite(d,
            Seq((10L, "b1v3", 3L, "p1")).toDF("id", "v", "ver", "dt"))),
        beforeFlip = () => throw new RuntimeException("crash"))
    }
    assert(ids(a) == Set(1L))
    assert(Warehouse.read(spark, d).select("v").as[String].collect().toSet
      == Set("b1v2"))
    val blocked = intercept[IllegalStateException] {
      Warehouse.append(spark, a, Seq((3L, "a3", "p1")).toDF("id", "v", "dt"))
    }
    val marker = blocked.getMessage.split("marker ")(1).split("\\)")(0)
    assert(Warehouse.abortTransaction(spark, marker, Seq(a, d)))
    // the staged chain link is gone: the delta table still serves v2
    // and takes new keyed writes
    assert(Warehouse.read(spark, d).select("v").as[String].collect().toSet
      == Set("b1v2"))
    Warehouse.append(spark, d,
      Seq((12L, "x", 1L, "p1")).toDF("id", "v", "ver", "dt"))
    assert(ids(d) == Set(10L, 12L))
  }

  test("transact refuses OVERWRITE of a delta table loudly") {
    val (_, d) = mkTables()
    Warehouse.mergeIntoDelta(spark, d,
      Seq((10L, "b1v2", 2L, "p1")).toDF("id", "v", "ver", "dt"),
      "id", "ver", "dt")
    val e = intercept[IllegalArgumentException] {
      Warehouse.transact(spark, Seq(Warehouse.TxnWrite(d,
        Seq((1L, "z", 1L, "p1")).toDF("id", "v", "ver", "dt"),
        overwrite = true)))
    }
    assert(e.getMessage.contains("cannot OVERWRITE the delta table"))
  }

  test("transact refuses a delta-table write missing the merge columns") {
    val (a, d) = mkTables()
    Warehouse.mergeIntoDelta(spark, d,
      Seq((10L, "b1v2", 2L, "p1")).toDF("id", "v", "ver", "dt"),
      "id", "ver", "dt")
    val e = intercept[IllegalArgumentException] {
      Warehouse.transactAppend(spark,
        Seq(d -> Seq((11L, "new", "p1")).toDF("id", "v", "dt")))
    }
    assert(e.getMessage.contains("must carry its merge columns"))
    assert(ids(a) == Set(1L))
  }

  test("committed visibility MATERIALIZES: after the flip the other participants survive losing the first table's _txn dir") {
    val (a, b) = mkTables()
    val marker = Warehouse.transactAppend(spark,
      Seq(a -> Seq((2L, "a2", "p1")).toDF("id", "v", "dt"),
        b -> Seq((20L, "b2", "p1")).toDF("id", "v", "dt")))
    // the advisor-r16 scenario: the marker lives under table a; wipe
    // a's _txn dir entirely — b's committed version must NOT
    // time-travel back, because the flip already materialized it
    val fs = new org.apache.hadoop.fs.Path(marker)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$a/_txn"), true)
    assert(ids(b) == Set(10L, 20L),
      "materialized commit must survive losing the marker dir")
    assert(ids(a) == Set(1L, 2L))
  }

  test("vacuum sweeps settled _txn markers past the retention age, keeps young ones, and never breaks an unmaterialized committed txn") {
    val (a, b) = mkTables()
    val fs = new org.apache.hadoop.fs.Path(a)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def markers(): Set[String] = {
      val dir = new org.apache.hadoop.fs.Path(s"$a/_txn")
      if (!fs.exists(dir)) Set.empty
      else fs.listStatus(dir).map(_.getPath.getName).toSet
    }
    // a committed txn: marker exists, manifests materialize at flip
    Warehouse.transactAppend(spark,
      Seq(a -> Seq((2L, "a2", "p1")).toDF("id", "v", "dt"),
        b -> Seq((20L, "b2", "p1")).toDF("id", "v", "dt")))
    // an aborted txn: crash before flip, then abort
    intercept[RuntimeException] {
      Warehouse.transactAppendHooked(spark,
        Seq(a -> Seq((3L, "a3", "p1")).toDF("id", "v", "dt")),
        beforeFlip = () => throw new RuntimeException("crash"))
    }
    val blocked = intercept[IllegalStateException] {
      Warehouse.append(spark, a, Seq((4L, "a4", "p1")).toDF("id", "v", "dt"))
    }
    val m = blocked.getMessage.split("marker ")(1).split("\\)")(0)
    Warehouse.abortTransaction(spark, m, Seq(a))
    assert(markers().size == 2, s"both settled markers on disk: ${markers()}")
    // a LONG retention keeps them (young markers never sweep)
    Warehouse.vacuum(spark, a, minAgeMs = 3600L * 1000L)
    assert(markers().size == 2, "young markers must survive vacuum")
    // zero retention: both are settled and proved unreferenced → gone
    Warehouse.vacuum(spark, a, minAgeMs = 0L)
    assert(markers().isEmpty, s"settled markers must reclaim: ${markers()}")
    // the tables still serve the committed state
    assert(ids(a) == Set(1L, 2L) && ids(b) == Set(10L, 20L))
  }

  test("CALL graft.system.abort_txn recovers a crashed transaction from SQL") {
    val (a, b) = mkTables()
    intercept[RuntimeException] {
      Warehouse.transactAppendHooked(spark,
        Seq(a -> Seq((2L, "a2", "p1")).toDF("id", "v", "dt"),
          b -> Seq((20L, "b2", "p1")).toDF("id", "v", "dt")),
        beforeFlip = () => throw new RuntimeException("crash"))
    }
    val blocked = intercept[IllegalStateException] {
      Warehouse.append(spark, a, Seq((3L, "a3", "p1")).toDF("id", "v", "dt"))
    }
    val marker = blocked.getMessage.split("marker ")(1).split("\\)")(0)
    val res = spark.sql(
      s"CALL graft.system.abort_txn(marker => '$marker', tables => '$a,$b')")
      .collect()(0)
    assert(res.getBoolean(0), "abort must report success")
    Warehouse.append(spark, a, Seq((3L, "a3", "p1")).toDF("id", "v", "dt"))
    assert(ids(a) == Set(1L, 3L) && ids(b) == Set(10L))
    // aborting a COMMITTED txn from SQL refuses (aborted = false)
    val m2 = Warehouse.transactAppend(spark,
      Seq(a -> Seq((5L, "a5", "p1")).toDF("id", "v", "dt")))
    val res2 = spark.sql(
      s"CALL graft.system.abort_txn(marker => '$m2', tables => '$a')")
      .collect()(0)
    assert(!res2.getBoolean(0))
    assert(ids(a) == Set(1L, 3L, 5L))
  }

  test("a marker claim that throws AFTER publishing `committed` self-resolves: transact reports success and the tables flip exactly once") {
    val (a, b) = mkTables()
    // the r19-documented residual: a create-exclusive claim whose
    // marker LANDED but whose syscall result was lost (filesystem
    // partial failure). transact must consult the marker itself and
    // report the truth — committed — instead of failing a transaction
    // that actually published.
    val thrown = new java.util.concurrent.atomic.AtomicInteger(0)
    Warehouse.primitiveOverride = Some(new graft.io.CommitPrimitive {
      override def claim(fs: org.apache.hadoop.fs.FileSystem,
          tmp: org.apache.hadoop.fs.Path,
          target: org.apache.hadoop.fs.Path): Boolean = {
        val won = Warehouse.LocalLinkCommit.claim(fs, tmp, target)
        if (won && target.toString.contains("/_txn/")) {
          thrown.incrementAndGet(): Unit
          throw new java.io.IOException(
            "injected: claim result lost after the marker landed")
        }
        won
      }
    })
    val marker =
      try Warehouse.transactAppendHooked(spark,
        Seq(a -> Seq((2L, "a2", "p1")).toDF("id", "v", "dt"),
          b -> Seq((20L, "b2", "p1")).toDF("id", "v", "dt")),
        beforeFlip = () => ())
      finally Warehouse.primitiveOverride = None
    assert(thrown.get() == 1, "the injected post-claim failure must fire")
    assert(marker.contains("/_txn/"))
    assert(ids(a) == Set(1L, 2L) && ids(b) == Set(10L, 20L),
      "the flip happened exactly once - both tables new")
    assert(Warehouse.currentVersion(spark, a) == 2L)
    assert(Warehouse.currentVersion(spark, b) == 2L)
    // a claim that throws with NO marker landed stays a real failure
    Warehouse.primitiveOverride = Some(new graft.io.CommitPrimitive {
      override def claim(fs: org.apache.hadoop.fs.FileSystem,
          tmp: org.apache.hadoop.fs.Path,
          target: org.apache.hadoop.fs.Path): Boolean =
        if (target.toString.contains("/_txn/"))
          throw new java.io.IOException("injected: claim failed outright")
        else Warehouse.LocalLinkCommit.claim(fs, tmp, target)
    })
    try {
      intercept[java.io.IOException] {
        Warehouse.transactAppendHooked(spark,
          Seq(a -> Seq((3L, "a3", "p1")).toDF("id", "v", "dt")),
          beforeFlip = () => ())
      }
    } finally Warehouse.primitiveOverride = None
    assert(ids(a) == Set(1L, 2L),
      "a genuinely failed claim must leave the table unchanged")
  }
}
