package graft.io

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** JDBC sink layer — the reference's entire load surface (SURVEY.md
  * §2.2 K1–K5) re-expressed Spark-first. The reference drives
  * SQLAlchemy/pyodbc from a single Python process; here every bulk
  * write is a distributed `df.write.jdbc` (one connection per
  * partition, batched inserts) and only the DDL/DELETE bracketing
  * runs on the driver.
  *
  * Scale notes (100 TB): the writers never collect — rows flow from
  * executor partitions straight into the DB, so load parallelism ==
  * partition count (repartition to match the DB's ingest capacity).
  * The K5 upsert is `foreachPartition` + JDBC batch UPDATE: Spark's
  * partitioning replaces the reference's manual `iloc` slicing across
  * `os.cpu_count()` threads (SER:296-301).
  */
object Sinks {

  /** Driver-side connection helper for the DDL/transaction brackets. */
  private def withConnection[A](url: String, props: Properties)(f: Connection => A): A = {
    val conn = DriverManager.getConnection(url, props)
    try f(conn) finally conn.close()
  }

  /** K1 (LAT:188-198) — chunked JDBC append: pandas
    * `to_sql(if_exists='append', chunksize=5000)` becomes a
    * distributed append with per-connection insert batches.
    */
  def appendJdbc(df: DataFrame, url: String, table: String, props: Properties,
                 batchSize: Int = 5000): Unit =
    df.write.mode(SaveMode.Append)
      .option("batchsize", batchSize)
      .jdbc(url, table, props)

  /** K2 (LAT:213-222, SER:229-245) — truncate-and-reload: empty the
    * target (keeping its DDL, indexes, grants) then append the new
    * rows. The reference issues a raw `DELETE FROM`; `TRUNCATE` is
    * the constant-time equivalent and Spark's overwrite-with-truncate
    * keeps the table definition intact.
    */
  def truncateReload(df: DataFrame, url: String, table: String, props: Properties,
                     batchSize: Int = 5000): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("truncate", value = true)
      .option("batchsize", batchSize)
      .jdbc(url, table, props)

  /** K3 (LAT:217-223) — ranged partition overwrite: delete the target
    * rows in `[lo, hi]` of `rangeCol`, then append the replacement
    * window — dynamic partition overwrite for engines without
    * partitioned tables. The delete is one driver-side statement (set
    * logic stays in the DB); the append is distributed.
    */
  def rangedOverwrite(df: DataFrame, url: String, table: String, props: Properties,
                      rangeCol: String, lo: Any, hi: Any,
                      batchSize: Int = 5000): Unit = {
    withConnection(url, props) { conn =>
      val st = conn.prepareStatement(
        s"""DELETE FROM $table WHERE "$rangeCol" BETWEEN ? AND ?""")
      try {
        st.setObject(1, lo); st.setObject(2, hi); st.executeUpdate()
      } finally st.close()
    }
    appendJdbc(df, url, table, props, batchSize)
  }

  /** K3 on files — dynamic partition overwrite: rewrite ONLY the
    * partitions present in `df`, leave sibling partitions untouched.
    * This is the data-lake form of the ranged delete+append (at
    * 100 TB the fact table lives partitioned on object storage and
    * this is the idempotent daily-reload primitive). Scoped to this
    * one write via the DataFrameWriter option — no session-wide conf
    * mutation.
    */
  def dynamicPartitionOverwrite(df: DataFrame, path: String,
                                partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** K4 (SER:247-282) — multi-table load with cross-table atomicity.
    * Spark's JDBC writer commits per partition per table, so a direct
    * multi-table append is NOT atomic (the reference wraps its four
    * `to_sql` calls in one `engine.begin()` — single-connection,
    * single-node). Emulation that keeps the semantic at scale:
    * distributed-append every frame into a fresh staging table, then
    * one driver transaction moves all staged rows into the targets
    * (`DELETE` + `INSERT ... SELECT`, data never leaves the DB) and
    * commits once. Any failure before that commit leaves every target
    * untouched.
    *
    * @param loads  (dataframe, targetTable) pairs
    * @param replace true = truncate-and-reload targets inside the tx;
    *                false = append-only
    */
  def multiTableTransactionalLoad(loads: Seq[(DataFrame, String)], url: String,
                                  props: Properties, replace: Boolean,
                                  batchSize: Int = 5000): Unit = {
    val staged = loads.zipWithIndex.map { case ((df, target), i) =>
      val stage = s"${target}_stage$i"
      df.write.mode(SaveMode.Overwrite).option("batchsize", batchSize)
        .jdbc(url, stage, props)
      (stage, target, df.columns.toSeq)
    }
    withConnection(url, props) { conn =>
      conn.setAutoCommit(false)
      try {
        val st = conn.createStatement()
        try {
          staged.foreach { case (stage, target, cols) =>
            if (replace) st.executeUpdate(s"DELETE FROM $target")
            // column list on BOTH sides: positional SELECT * would
            // silently mis-assign when the pre-existing target's
            // column order differs from the frame's
            val colList = cols.map(c => s""""$c"""").mkString(", ")
            st.executeUpdate(
              s"INSERT INTO $target ($colList) SELECT $colList FROM $stage")
          }
        } finally st.close()
        conn.commit()
      } catch {
        case e: Throwable => conn.rollback(); throw e
      } finally {
        // staging cleanup is best-effort housekeeping OUTSIDE the
        // transaction — autocommit so the drops don't open a new tx
        conn.setAutoCommit(true)
        val st = conn.createStatement()
        try staged.foreach { case (stage, _, _) =>
          try st.executeUpdate(s"DROP TABLE $stage") catch { case _: Exception => }
        } finally st.close()
      }
    }
  }

  /** K5 (SER:284-365) — batched keyed UPDATE (the update half of the
    * MERGE): `UPDATE t SET c=? ... WHERE key=?` executed as JDBC
    * batches from every partition in parallel. Replaces the
    * reference's `iterrows` + manual thread slicing with Spark's own
    * partitioning; `updateCols` order is pinned so the statement text
    * is deterministic.
    *
    * @return number of rows the executors attempted to update
    */
  def updateByKey(df: DataFrame, url: String, table: String, props: Properties,
                  keyCol: String, updateCols: Seq[String],
                  batchSize: Int = 1000): Long = {
    val sql = s"UPDATE $table SET " +
      updateCols.map(c => s""""$c" = ?""").mkString(", ") +
      s""" WHERE "$keyCol" = ?"""
    val cols = updateCols :+ keyCol
    val projected = df.select(cols.map(col): _*)
    val n = projected.sparkSession.sparkContext.longAccumulator("graft.k5.updated")
    val propMap = props.stringPropertyNames().toArray(Array.empty[String])
      .map(k => k -> props.getProperty(k)).toMap
    projected.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      if (rows.nonEmpty) {
        val p = new Properties()
        propMap.foreach { case (k, v) => p.setProperty(k, v) }
        val conn = DriverManager.getConnection(url, p)
        try {
          conn.setAutoCommit(false)
          val st = conn.prepareStatement(sql)
          try {
            var inBatch = 0
            rows.foreach { row =>
              var i = 0
              while (i < cols.length) { st.setObject(i + 1, row.get(i)); i += 1 }
              st.addBatch()
              inBatch += 1
              n.add(1L)
              if (inBatch >= batchSize) { st.executeBatch(); inBatch = 0 }
            }
            if (inBatch > 0) st.executeBatch()
            conn.commit()
          } finally st.close()
        } finally conn.close()
      }
    }
    n.value
  }

  /** Full MERGE: K5 updates + K1 appends from a
    * [[graft.operators.Cdc.MergeSplit]] — the reference's
    * `insert_data` tail (SER:269-276) as one call.
    */
  def applyMerge(split: graft.operators.Cdc.MergeSplit, url: String, table: String,
                 props: Properties, keyCol: String, updateCols: Seq[String]): Unit = {
    updateByKey(split.updates, url, table, props, keyCol, updateCols)
    appendJdbc(split.inserts, url, table, props)
  }
}
