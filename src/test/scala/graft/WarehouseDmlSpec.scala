package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Warehouse

/** SQL `UPDATE` / `MERGE INTO` over graft-warehouse tables — the
  * analyzer-extension DML plane (WarehouseDmlRule → the CoW passes
  * Warehouse.updateWhere / Warehouse.mergeStatement). Pinned here:
  * exact SQL semantics (source-wins, clause order, NULL-predicate
  * survival, the cardinality rule), the copy-on-write scale contract
  * (untouched partitions keep byte-identical files), and every
  * refusal arm — moves across partitions, target-side merge
  * expressions, NOT MATCHED BY SOURCE — fails loudly rather than
  * silently misplanning.
  */
class WarehouseDmlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_dmlspec").toString + "/t"

  private def dataFiles(path: String): Set[String] = {
    val root = Paths.get(path, "data")
    Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p)).map(_.toString).toSet
  }

  private def seed(path: String): Unit =
    Warehouse.create(spark, path,
      Seq((1L, 1L, "x", "a"), (2L, 1L, "y", "a"), (3L, 2L, "z", "b"))
        .toDF("id", "ver", "v", "dt"), "dt")

  // -------------------------------------------------------------
  // UPDATE
  // -------------------------------------------------------------

  test("UPDATE rewrites matching rows, reports num_affected_rows, leaves untouched partitions byte-identical") {
    val path = freshDir()
    seed(path)
    val bFilesBefore = dataFiles(path).filter(_.contains("dt=b"))
    val n = spark.sql(s"UPDATE graft.`$path` SET v = concat(v, '!') WHERE id = 1 OR id = 2")
      .as[Long].head()
    assert(n == 2L)
    val rows = Warehouse.read(spark, path).orderBy("id")
      .select("id", "v").as[(Long, String)].collect().toSeq
    assert(rows == Seq((1L, "x!"), (2L, "y!"), (3L, "z")))
    // dt=b carried no match: its files must not have been rewritten
    assert(dataFiles(path).filter(_.contains("dt=b")) == bFilesBefore)
  }

  test("UPDATE with a NULL predicate leaves the row unchanged (SQL semantics) and multi-assignment applies together") {
    val path = freshDir()
    Warehouse.create(spark, path,
      Seq((1L, Some(1L), "x", "a"), (2L, None, "y", "a"))
        .toDF("id", "score", "v", "dt"), "dt")
    // score > 0 is NULL for id=2 → survives unchanged
    val n = spark.sql(
      s"UPDATE graft.`$path` SET v = 'hit', score = score + 10 WHERE score > 0")
      .as[Long].head()
    assert(n == 1L)
    val rows = Warehouse.read(spark, path).orderBy("id")
      .select("id", "score", "v").as[(Long, Option[Long], String)].collect().toSeq
    assert(rows == Seq((1L, Some(11L), "hit"), (2L, None, "y")))
  }

  test("UPDATE refuses partition-column assignment loudly") {
    val path = freshDir()
    seed(path)
    val e = intercept[Exception] {
      spark.sql(s"UPDATE graft.`$path` SET dt = 'c' WHERE id = 1").collect()
    }
    assert(e.getMessage.contains("partition"),
      s"wrong refusal message: ${e.getMessage}")
    // nothing committed
    assert(Warehouse.currentVersion(spark, path) == 1L)
  }

  test("UPDATE folds delta chains first: the rewrite sees merged state, not raw links") {
    val path = freshDir()
    seed(path)
    // delta-commit a newer version of id=2 (v → 'y2'), then UPDATE it
    Warehouse.mergeIntoDelta(spark, path,
      Seq((2L, 5L, "y2", "a")).toDF("id", "ver", "v", "dt"),
      "id", "ver", "dt")
    val n = spark.sql(s"UPDATE graft.`$path` SET v = concat(v, '?') WHERE id = 2")
      .as[Long].head()
    assert(n == 1L)
    val rows = Warehouse.read(spark, path).orderBy("id")
      .select("id", "v").as[(Long, String)].collect().toSeq
    assert(rows == Seq((1L, "x"), (2L, "y2?"), (3L, "z")))
  }

  // -------------------------------------------------------------
  // MERGE INTO
  // -------------------------------------------------------------

  test("MERGE three arms: conditional DELETE, UPDATE SET *, INSERT * — clause order decides, source wins") {
    val path = freshDir()
    seed(path)
    val bFilesBefore = dataFiles(path).filter(_.contains("dt=b"))
    spark.sql(
      s"""MERGE INTO graft.`$path` t
         |USING (SELECT * FROM VALUES
         |  (CAST(1 AS BIGINT), CAST(9 AS BIGINT), 'gone', 'a', true),
         |  (CAST(2 AS BIGINT), CAST(0 AS BIGINT), 'upd',  'a', false),
         |  (CAST(4 AS BIGINT), CAST(9 AS BIGINT), 'new',  'a', false)
         |  AS s(id, ver, v, dt, is_del)) s
         |ON t.id = s.id
         |WHEN MATCHED AND s.is_del THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val rows = Warehouse.read(spark, path).orderBy("id")
      .select("id", "ver", "v").as[(Long, Long, String)].collect().toSeq
    // id=1 deleted; id=2 took the SOURCE row even though its ver (0)
    // is OLDER than the stored one — statement merges are source-wins,
    // not version-argmax; id=4 inserted
    assert(rows == Seq((2L, 0L, "upd"), (3L, 2L, "z"), (4L, 9L, "new")))
    // the source named only dt=a: dt=b must keep byte-identical files
    assert(dataFiles(path).filter(_.contains("dt=b")) == bFilesBefore)
  }

  test("MERGE insert into a brand-new partition joins the mapping") {
    val path = freshDir()
    seed(path)
    spark.sql(
      s"""MERGE INTO graft.`$path` t
         |USING (SELECT CAST(7 AS BIGINT) AS id, CAST(1 AS BIGINT) AS ver,
         |              'c-row' AS v, 'c' AS dt) s
         |ON t.id = s.id
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val rows = Warehouse.read(spark, path).orderBy("id")
      .select("id", "dt").as[(Long, String)].collect().toSeq
    assert(rows == Seq((1L, "a"), (2L, "a"), (3L, "b"), (7L, "c")))
  }

  test("MERGE with explicit column assignments: unassigned columns keep target values (UPDATE) / land NULL (INSERT)") {
    val path = freshDir()
    seed(path)
    spark.sql(
      s"""MERGE INTO graft.`$path` t
         |USING (SELECT * FROM VALUES
         |  (CAST(2 AS BIGINT), 'patched', 'a'),
         |  (CAST(5 AS BIGINT), 'fresh',   'b')
         |  AS s(id, nv, dt)) s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = upper(s.nv)
         |WHEN NOT MATCHED THEN INSERT (id, v, dt) VALUES (s.id, s.nv, s.dt)""".stripMargin)
    val rows = Warehouse.read(spark, path).orderBy("id")
      .select("id", "ver", "v").as[(Long, Option[Long], String)].collect().toSeq
    // id=2 kept ver=1 (unassigned), got v=PATCHED; id=5 inserted with
    // NULL ver (unassigned)
    assert(rows == Seq((1L, Some(1L), "x"), (2L, Some(1L), "PATCHED"),
      (3L, Some(2L), "z"), (5L, None, "fresh")))
  }

  test("MERGE with a COMPOSITE ON key matches on the conjunction") {
    val path = freshDir()
    Warehouse.create(spark, path,
      Seq((1L, "x", "v1", "a"), (1L, "y", "v2", "a"), (2L, "x", "v3", "b"))
        .toDF("k1", "k2", "v", "dt"), "dt")
    spark.sql(
      s"""MERGE INTO graft.`$path` t
         |USING (SELECT * FROM VALUES
         |  (CAST(1 AS BIGINT), 'y', 'upd', 'a'),
         |  (CAST(1 AS BIGINT), 'z', 'new', 'a')
         |  AS s(k1, k2, v, dt)) s
         |ON t.k1 = s.k1 AND t.k2 = s.k2
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val rows = Warehouse.read(spark, path).orderBy("k1", "k2")
      .select("k1", "k2", "v").as[(Long, String, String)].collect().toSeq
    // only (1,y) matched — (1,x) must survive untouched, (1,z) inserts
    assert(rows == Seq((1L, "x", "v1"), (1L, "y", "upd"),
      (1L, "z", "new"), (2L, "x", "v3")))
  }

  test("MERGE cardinality rule: duplicate source keys fail loudly") {
    val path = freshDir()
    seed(path)
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO graft.`$path` t
           |USING (SELECT * FROM VALUES
           |  (CAST(2 AS BIGINT), 'p1', 'a'), (CAST(2 AS BIGINT), 'p2', 'a')
           |  AS s(id, nv, dt)) s
           |ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET v = s.nv""".stripMargin)
    }
    assert(e.getMessage.contains("duplicate"),
      s"wrong refusal: ${e.getMessage}")
  }

  test("MERGE refuses an UPDATE that assigns a different partition value (a move) at execution") {
    val path = freshDir()
    seed(path)
    // the source row correctly names its key's partition (dt='b', the
    // contract) but the UPDATE assigns dt='moved' — a partition move,
    // refused loudly by the rewrite instead of silently landing the
    // row in a partition the pass never read
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO graft.`$path` t
           |USING (SELECT CAST(3 AS BIGINT) AS id, 'moved' AS dt2,
           |              'b' AS dt) s
           |ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET dt = s.dt2""".stripMargin)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("immutable")), s"wrong refusal: ${msgs(e)}")
  }

  test("MERGE is partition-pruned (the mergeInto contract): a source row naming the wrong partition reconciles nothing") {
    val path = freshDir()
    seed(path)
    // id=3 lives in dt=b, but the source row names dt=a: only dt=a is
    // read, so the key matches nothing and — with no insert arm —
    // nothing changes. This is the documented immutable-partition
    // contract shared with Warehouse.mergeInto: a change row must
    // name its key's true partition; the bounded pass never scans the
    // table to second-guess it.
    spark.sql(
      s"""MERGE INTO graft.`$path` t
         |USING (SELECT CAST(3 AS BIGINT) AS id, 'wrong' AS nv, 'a' AS dt) s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.nv""".stripMargin)
    val rows = Warehouse.read(spark, path).orderBy("id")
      .select("id", "v").as[(Long, String)].collect().toSeq
    assert(rows == Seq((1L, "x"), (2L, "y"), (3L, "z")))
  }

  test("MERGE refusal arms: NOT MATCHED BY SOURCE, non-equi ON, target-side values") {
    val path = freshDir()
    seed(path)
    val bySource = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO graft.`$path` t
           |USING (SELECT CAST(2 AS BIGINT) AS id, 'p' AS nv, 'a' AS dt) s
           |ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET v = s.nv
           |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    }
    assert(bySource.getMessage.contains("NOT MATCHED BY SOURCE"))
    val nonEqui = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO graft.`$path` t
           |USING (SELECT CAST(2 AS BIGINT) AS id, 'p' AS nv, 'a' AS dt) s
           |ON t.id >= s.id
           |WHEN MATCHED THEN UPDATE SET v = s.nv""".stripMargin)
    }
    assert(nonEqui.getMessage.contains("ON <target key column>"))
    val targetSide = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO graft.`$path` t
           |USING (SELECT CAST(2 AS BIGINT) AS id, 'p' AS nv, 'a' AS dt) s
           |ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET v = concat(t.v, s.nv)""".stripMargin)
    }
    assert(targetSide.getMessage.contains("SOURCE side only"))
  }

  test("MERGE and UPDATE refuse time-travel relations (history is immutable)") {
    val path = freshDir()
    seed(path)
    spark.sql(s"UPDATE graft.`$path` SET v = 'v2' WHERE id = 1").collect()
    // VERSION AS OF 1 is not a current-snapshot handle: the DML rule
    // leaves the plan alone and Spark refuses the table operation
    val e = intercept[Exception] {
      spark.sql(s"UPDATE graft.`$path` VERSION AS OF 1 SET v = 'no' WHERE id = 1")
        .collect()
    }
    assert(e != null)
  }

  test("UPDATE translates its pushable conjuncts into discovery pruning filters at analysis time") {
    val path = freshDir()
    seed(path)
    val plan = spark.sessionState.analyzer.execute(
      spark.sessionState.sqlParser.parsePlan(
        s"UPDATE graft.`$path` SET v = 'p' WHERE id = 2 AND length(v) > 0"))
    val cmd = plan.collectFirst {
      case c: org.apache.spark.sql.graft.UpdateWarehouseCommand => c
    }.getOrElse(fail(s"expected UpdateWarehouseCommand, got:\n$plan"))
    // the equality conjunct prunes (routes into the stats/bloom
    // sidecars); the length() conjunct is untranslatable and simply
    // drops from the pruning set — the full predicate still decides
    // every row
    assert(cmd.pruning.exists {
      case org.apache.spark.sql.sources.EqualTo("id", v) => v == 2
      case _ => false
    }, s"expected an EqualTo(id, 2) pruning filter, got ${cmd.pruning}")
  }

  test("MERGE matched-only against a partition that does not exist is a no-op (no commit)") {
    val path = freshDir()
    seed(path)
    val v0 = Warehouse.currentVersion(spark, path)
    spark.sql(
      s"""MERGE INTO graft.`$path` t
         |USING (SELECT CAST(9 AS BIGINT) AS id, 'p' AS nv, 'zz' AS dt) s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.nv""".stripMargin)
    assert(Warehouse.currentVersion(spark, path) == v0)
  }
}
