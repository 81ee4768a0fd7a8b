package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Warehouse

/** CBO statistics flow for warehouse tables (round 16):
  * [[graft.io.Warehouse.analyzeColumns]] rolls up per-column
  * NDV/nulls/min/max into the `_colstats` sidecar, and
  * [[org.apache.spark.sql.graft.WarehouseCboStatsRule]] (an
  * operator-optimization rule — the batch BEFORE Join Reorder) serves
  * it through `computeStats`, so Catalyst's cost-based join reorder
  * can finally order multi-join queries over V2 warehouse relations
  * (a plain DataSourceV2Relation reports defaultSizeInBytes only —
  * stat-blind). Pinned: the ANALYZE rollup round-trips, the optimizer
  * sees rowCount + attributeStats when CBO is on, and a 3-table join
  * written in a bad syntactic order REORDERS to join the reductive
  * small dimension first.
  */
class WarehouseCboSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_cbospec").toString + "/t"

  /** The DEEPEST join's leaf table paths = what got joined first.
    * Leaves end optimization as warehouse scan relations, pre-pushdown
    * relations, or — since the r20 native-path splice — plain parquet
    * LogicalRelations, whose table path recovers from the file
    * location's /data/batch= prefix.
    */
  private def firstJoinLeaves(df: org.apache.spark.sql.DataFrame): Set[String] = {
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    joins.last.collectLeaves().flatMap {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.relation.table match {
          case t: graft.sources.warehouse.WarehouseTable => Some(t.tablePath)
          case _ => None
        }
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        r.table match {
          case t: graft.sources.warehouse.WarehouseTable => Some(t.tablePath)
          case _ => None
        }
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.headOption.map(_.toString)
              .filter(_.contains("/data/batch="))
              .map(_.stripPrefix("file:").split("/data/batch=")(0))
          case _ => None
        }
      case _ => None
    }.toSet
  }

  private def withCbo[A](body: => A): A = {
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try body
    finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.conf.unset("spark.sql.cbo.joinReorder.enabled")
    }
  }

  test("analyzeColumns rolls up NDV/nulls/min-max and readColStats round-trips") {
    val path = freshDir()
    Warehouse.create(spark, path,
      Seq((1L, Some(10L), "x", "a"), (2L, None, "y", "a"),
        (3L, Some(30L), "x", "b"))
        .toDF("id", "score", "v", "dt"), "dt")
    Warehouse.analyzeColumns(spark, path, Seq("id", "score", "v"))
    val st = Warehouse.readColStats(spark, path)
    assert(st.keySet == Set("id", "score", "v"))
    assert(st("id").ndv == 3L && st("id").nullCount == 0L)
    assert(st("id").min.contains("1") && st("id").max.contains("3"))
    assert(st("score").nullCount == 1L)
    assert(st("score").min.contains("10") && st("score").max.contains("30"))
    assert(st("v").ndv == 2L)
    assert(st("v").min.isEmpty, "strings carry no min/max (lengths instead)")
    assert(st("v").avgLen == 1L && st("v").maxLen == 1L)
    // re-analyzing a subset keeps the other columns' stats
    Warehouse.analyzeColumns(spark, path, Seq("id"))
    assert(Warehouse.readColStats(spark, path).keySet == Set("id", "score", "v"))
  }

  test("with CBO on, the optimized plan exposes rowCount and column stats for warehouse relations") {
    val path = freshDir()
    Warehouse.create(spark, path,
      (1L to 50L).map(i => (i, i % 7, s"d${i % 3}"))
        .toDF("id", "grp", "dt"), "dt")
    Warehouse.analyzeColumns(spark, path, Seq("id", "grp"))
    // the rewrap lives between the operator-optimization batch and
    // scan pushdown (which replaces it with a scan relation), so
    // assert on the rule's own output over the analyzed plan — the
    // exact node the Join Reorder batch sees
    val rule = new org.apache.spark.sql.graft.WarehouseCboStatsRule(spark)
    withCbo {
      val df = spark.read.format("graft-warehouse").load(path)
      val rel = rule(df.queryExecution.analyzed).collectFirst {
        case r: org.apache.spark.sql.graft.StatsReportingRelation => r
      }.getOrElse(fail("expected the CBO stats rewrap"))
      val st = rel.stats
      assert(st.rowCount.contains(BigInt(50)), s"rowCount: ${st.rowCount}")
      val idStat = st.attributeStats.find(_._1.name == "id")
        .map(_._2).getOrElse(fail("no column stats for id"))
      assert(idStat.distinctCount.exists(_.toLong >= 45L),
        s"approx ndv of 50 unique ids: ${idStat.distinctCount}")
      assert(idStat.min.contains(1L) && idStat.max.contains(50L),
        s"min/max as catalyst longs: ${idStat.min}/${idStat.max}")
    }
    // CBO off: the rewrap must not fire (no metadata I/O on the
    // default path)
    val plain = spark.read.format("graft-warehouse").load(path)
    assert(rule(plain.queryExecution.analyzed).collectFirst {
      case r: org.apache.spark.sql.graft.StatsReportingRelation => r
    }.isEmpty, "rewrap must be CBO-gated")
  }

  test("cost-based join reorder: a 3-table join in bad syntactic order joins the reductive dimension first") {
    val factPath = freshDir()
    val midPath = freshDir()
    val smallPath = freshDir()
    // fact: 2000 rows; mid dim: 400 rows (every fact row matches);
    // small dim: 10 rows matching only 1/10 of the fact's small-keys —
    // joining small FIRST cuts the fact to ~200 rows before the mid
    // join; syntactic order (fact JOIN mid) JOIN small carries 2000
    // rows through the first join
    Warehouse.create(spark, factPath,
      (1L to 2000L).map(i => (i, i % 400, i % 100, s"p${i % 2}"))
        .toDF("id", "mid_id", "small_id", "dt"), "dt")
    Warehouse.create(spark, midPath,
      (0L to 399L).map(i => (i, s"m$i", "p0")).toDF("mid_id", "mname", "dt"), "dt")
    Warehouse.create(spark, smallPath,
      (0L to 9L).map(i => (i, s"s$i", "p0")).toDF("small_id", "sname", "dt"), "dt")
    Warehouse.analyzeColumns(spark, factPath, Seq("id", "mid_id", "small_id"))
    Warehouse.analyzeColumns(spark, midPath, Seq("mid_id"))
    Warehouse.analyzeColumns(spark, smallPath, Seq("small_id"))
    def joined = {
      val f = spark.read.format("graft-warehouse").load(factPath)
      val m = spark.read.format("graft-warehouse").load(midPath)
      val s = spark.read.format("graft-warehouse").load(smallPath)
      f.join(m, "mid_id").join(s, "small_id")
        .select("id", "mname", "sname")
    }
    // without CBO: syntactic order — fact joins MID first
    assert(firstJoinLeaves(joined) == Set(factPath, midPath),
      "sanity: syntactic order joins mid first")
    withCbo {
      val leaves = firstJoinLeaves(joined)
      assert(leaves == Set(factPath, smallPath),
        s"CBO must reorder to join the reductive small dim first, got $leaves")
    }
    // and the result is unchanged by the reorder
    val rows = withCbo(joined.count())
    assert(rows == joined.count())
  }

  test("CBO join reorder survives RENAME COLUMN: the re-keyed sidecar keeps feeding the reductive-dim-first order (round 17)") {
    val factPath = freshDir()
    val midPath = freshDir()
    val smallPath = freshDir()
    Warehouse.create(spark, factPath,
      (1L to 2000L).map(i => (i, i % 400, i % 100, s"p${i % 2}"))
        .toDF("id", "mid_id", "small_id", "dt"), "dt")
    Warehouse.create(spark, midPath,
      (0L to 399L).map(i => (i, s"m$i", "p0")).toDF("mid_id", "mname", "dt"), "dt")
    Warehouse.create(spark, smallPath,
      (0L to 9L).map(i => (i, s"s$i", "p0")).toDF("small_id", "sname", "dt"), "dt")
    Warehouse.analyzeColumns(spark, factPath, Seq("id", "mid_id", "small_id"))
    Warehouse.analyzeColumns(spark, midPath, Seq("mid_id"))
    Warehouse.analyzeColumns(spark, smallPath, Seq("small_id"))
    // RENAME the fact's join keys AFTER the analyze — the sidecar
    // re-keys with them, so the reorder must still fire
    Warehouse.renameColumn(spark, factPath, "small_id", "sid")
    Warehouse.renameColumn(spark, smallPath, "small_id", "sid")
    def joined = {
      val f = spark.read.format("graft-warehouse").load(factPath)
      val m = spark.read.format("graft-warehouse").load(midPath)
      val s = spark.read.format("graft-warehouse").load(smallPath)
      f.join(m, "mid_id").join(s, "sid").select("id", "mname", "sname")
    }
    withCbo {
      val leaves = firstJoinLeaves(joined)
      assert(leaves == Set(factPath, smallPath),
        s"CBO must keep reordering after the rename, got $leaves")
    }
  }

  test("maintain(analyzeEvery) refreshes previously-analyzed stats once the table advances past the cadence (round 17)") {
    val path = freshDir()
    Warehouse.create(spark, path,
      Seq((1L, "x", "a")).toDF("id", "v", "dt"), "dt")
    Warehouse.analyzeColumns(spark, path, Seq("id"))
    assert(Warehouse.colStatsVersion(spark, path).contains(1L))
    assert(Warehouse.readColStats(spark, path)("id").ndv == 1L)
    Warehouse.append(spark, path, Seq((2L, "y", "a")).toDF("id", "v", "dt"))
    Warehouse.append(spark, path, Seq((3L, "z", "a")).toDF("id", "v", "dt"))
    // cadence not reached with analyzeEvery = 5 → stats stay stamped v1
    Warehouse.maintain(spark, path, "id", 64L << 20,
      everyNCommits = 1000, analyzeEvery = 5)
    assert(Warehouse.colStatsVersion(spark, path).contains(1L))
    // cadence reached with analyzeEvery = 2 → refreshed at v3, NDV 3
    Warehouse.maintain(spark, path, "id", 64L << 20,
      everyNCommits = 1000, analyzeEvery = 2)
    assert(Warehouse.colStatsVersion(spark, path).contains(3L))
    assert(Warehouse.readColStats(spark, path)("id").ndv == 3L)
    // only the previously-analyzed column set refreshes
    assert(Warehouse.readColStats(spark, path).keySet == Set("id"))
    // the SQL procedure binds the cadence too
    Warehouse.append(spark, path, Seq((4L, "w", "a")).toDF("id", "v", "dt"))
    Warehouse.append(spark, path, Seq((5L, "q", "a")).toDF("id", "v", "dt"))
    spark.sql(s"CALL graft.system.maintain(table => '$path', " +
      "sort_col => 'id', every_n_commits => 1000, analyze_every => 2)")
    assert(Warehouse.colStatsVersion(spark, path).contains(5L))
    // a never-analyzed table: the cadence initiates nothing
    val fresh = freshDir()
    Warehouse.create(spark, fresh,
      Seq((1L, "x", "a")).toDF("id", "v", "dt"), "dt")
    Warehouse.maintain(spark, fresh, "id", 64L << 20,
      everyNCommits = 1000, analyzeEvery = 1)
    assert(Warehouse.colStatsVersion(spark, fresh).isEmpty)
  }

  test("CALL graft.system.analyze binds the procedure") {
    val path = freshDir()
    Warehouse.create(spark, path,
      Seq((1L, "x", "a"), (2L, "y", "a")).toDF("id", "v", "dt"), "dt")
    val res = spark.sql(
      s"CALL graft.system.analyze(table => '$path', columns => 'id,v')")
      .collect()(0)
    assert(res.getInt(0) == 2)
    assert(Warehouse.readColStats(spark, path).keySet == Set("id", "v"))
  }

  test("ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS binds as a statement (and FOR ALL COLUMNS)") {
    val path = freshDir()
    Warehouse.create(spark, path,
      Seq((1L, "x", "a"), (2L, "y", "a")).toDF("id", "v", "dt"), "dt")
    spark.sql(
      s"ANALYZE TABLE graft.`$path` COMPUTE STATISTICS FOR COLUMNS id")
    assert(Warehouse.readColStats(spark, path).keySet == Set("id"))
    spark.sql(
      s"ANALYZE TABLE graft.`$path` COMPUTE STATISTICS FOR ALL COLUMNS")
    assert(Warehouse.readColStats(spark, path).keySet == Set("id", "v", "dt"))
    assert(Warehouse.readColStats(spark, path)("id").ndv == 2L)
  }
}
