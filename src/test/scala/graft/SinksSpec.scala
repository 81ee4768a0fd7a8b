package graft

import java.nio.file.Files
import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Sinks
import graft.operators.Cdc

/** Integration tests for the K1–K5 sink layer against embedded Derby
  * (the JDBC engine shipped with Spark's jars) — real distributed
  * writes, real DDL brackets, real transactions.
  */
class SinksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dbDir = {
    val d = Files.createTempDirectory("graft_derby").toFile
    System.setProperty("derby.system.home", d.getAbsolutePath)
    d.getAbsolutePath
  }
  private lazy val url = s"jdbc:derby:$dbDir/graftdb;create=true"
  private def props: Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  private def readTable(table: String): DataFrame =
    spark.read.jdbc(url, table, props)

  test("K1 chunked append accumulates rows across appends") {
    val df1 = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    df1.write.option("createTableColumnTypes", "name VARCHAR(64)")
      .jdbc(url, "k1_tbl", props)
    Sinks.appendJdbc(Seq((3L, "c")).toDF("id", "name"), url, "k1_tbl", props,
      batchSize = 2)
    val got = readTable("k1_tbl").orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("K2 truncate-and-reload replaces contents, keeps the table (LAT:213-222)") {
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v").write.jdbc(url, "k2_tbl", props)
    Sinks.truncateReload(Seq((9L, 90.0)).toDF("id", "v"), url, "k2_tbl", props)
    val got = readTable("k2_tbl").as[(Long, Double)].collect().toSeq
    assert(got == Seq((9L, 90.0)))
  }

  test("K3 ranged delete + append overwrites only the key window (LAT:217-223)") {
    Seq((1L, 100L), (5L, 500L), (9L, 900L)).toDF("id", "day").write
      .jdbc(url, "k3_tbl", props)
    // replace the day-window [400, 600] with fresh rows; outside rows survive
    Sinks.rangedOverwrite(Seq((6L, 555L)).toDF("id", "day"), url, "k3_tbl", props,
      rangeCol = "day", lo = 400L, hi = 600L)
    val got = readTable("k3_tbl").orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 100L), (6L, 555L), (9L, 900L)))
  }

  test("K3 on files: dynamic partition overwrite touches only incoming partitions") {
    val path = Files.createTempDirectory("graft_dpo").toString + "/fact"
    Seq((1L, "2024-01-01"), (2L, "2024-01-02"), (3L, "2024-01-03"))
      .toDF("id", "day").write.partitionBy("day").parquet(path)
    // reload day 2 only; days 1 and 3 must survive
    Sinks.dynamicPartitionOverwrite(
      Seq((20L, "2024-01-02"), (21L, "2024-01-02")).toDF("id", "day"),
      path, Seq("day"))
    val got = spark.read.parquet(path).orderBy("id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "2024-01-01"), (3L, "2024-01-03"),
      (20L, "2024-01-02"), (21L, "2024-01-02")))
  }

  test("K4 multi-table load commits both targets atomically (SER:247-282)") {
    Seq((1L, 1L)).toDF("id", "v").write.jdbc(url, "k4_a", props)
    Seq((1L, 1L)).toDF("id", "v").write.jdbc(url, "k4_b", props)
    Sinks.multiTableTransactionalLoad(Seq(
      Seq((10L, 10L)).toDF("id", "v") -> "k4_a",
      Seq((20L, 20L), (21L, 21L)).toDF("id", "v") -> "k4_b"),
      url, props, replace = true)
    assert(readTable("k4_a").as[(Long, Long)].collect().toSeq == Seq((10L, 10L)))
    assert(readTable("k4_b").orderBy("id").as[(Long, Long)].collect().toSeq ==
      Seq((20L, 20L), (21L, 21L)))
  }

  test("K4 maps columns BY NAME when target column order differs from the frame's") {
    // target created column-reversed relative to the incoming frame
    val conn = DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      st.executeUpdate("""CREATE TABLE k4_rev ("v" BIGINT, "id" BIGINT)""")
      st.close()
    } finally conn.close()
    Sinks.multiTableTransactionalLoad(Seq(
      Seq((7L, 70L)).toDF("id", "v") -> "k4_rev"),
      url, props, replace = true)
    val got = readTable("k4_rev").select("id", "v").as[(Long, Long)].collect().toSeq
    assert(got == Seq((7L, 70L))) // positional SELECT * would swap these
  }

  test("K4 failure before commit leaves every target untouched") {
    Seq((1L, 1L)).toDF("id", "v").write.jdbc(url, "k4_c", props)
    val bad = intercept[Exception] {
      Sinks.multiTableTransactionalLoad(Seq(
        Seq((99L, 99L)).toDF("id", "v") -> "k4_c",
        Seq((5L, 5L)).toDF("id", "v") -> "k4_missing_target"),
        url, props, replace = true)
    }
    assert(bad != null)
    // first target must still hold its original row — nothing committed
    assert(readTable("k4_c").as[(Long, Long)].collect().toSeq == Seq((1L, 1L)))
  }

  test("K5 batched keyed UPDATE rewrites matched rows in place (SER:284-365)") {
    Seq((1L, 10L, 100L), (2L, 20L, 200L), (3L, 30L, 300L))
      .toDF("id", "a", "b").write.jdbc(url, "k5_tbl", props)
    val changes = Seq((1L, 11L, 101L), (3L, 33L, 303L)).toDF("id", "a", "b")
    val n = Sinks.updateByKey(changes, url, "k5_tbl", props,
      keyCol = "id", updateCols = Seq("a", "b"), batchSize = 1)
    assert(n == 2L)
    val got = readTable("k5_tbl").orderBy("id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 11L, 101L), (2L, 20L, 200L), (3L, 33L, 303L)))
  }

  test("E2-shaped merge: CDC split → K5 updates + K1 inserts → target equals expected") {
    // target snapshot in the DB
    Seq((1L, 1L, 10L), (2L, 5L, 20L), (3L, 1L, 30L))
      .toDF("id", "version", "payload").write.jdbc(url, "e2_tbl", props)
    // incoming extract: id=1 newer (update), id=2 stale (unchanged),
    // id=4 absent (insert); id=3 missing from the extract (untouched)
    val incoming = Seq((1L, 2L, 11L), (2L, 3L, 99L), (4L, 1L, 40L))
      .toDF("id", "version", "payload")
    val snapshot = readTable("e2_tbl").select("id", "version")
    val split = Cdc.mergeSplit(incoming, snapshot, "id", "version")
    Sinks.applyMerge(split, url, "e2_tbl", props,
      keyCol = "id", updateCols = Seq("version", "payload"))
    val got = readTable("e2_tbl").orderBy("id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 11L), (2L, 5L, 20L), (3L, 1L, 30L), (4L, 1L, 40L)))
  }
}
