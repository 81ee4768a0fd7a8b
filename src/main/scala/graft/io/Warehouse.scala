package graft.io

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned parquet warehouse table with copy-on-write MERGE and
  * small-file compaction — the file-plane analog of the reference's
  * JDBC CDC merge (`New_Api_Sercom/function_app.py:309-365` lands
  * changes with batched UPDATEs; at 100 TB the dimension lives as a
  * day-partitioned parquet table and a merge must rewrite only the
  * partitions the change batch touches, never the table).
  *
  * Layout — per-partition ownership manifest, committed with one
  * atomic rename (the [[BatchedIndex]] single-marker pattern, carried
  * one step further: the marker file's CONTENT maps every partition
  * to the batch directory that owns it):
  *
  * {{{
  *   path/_versions/v<0-padded N>        commit files; each line is
  *                                       "<partitionValue>\t<batchId>"
  *   path/data/batch=<id>/<partCol>=<v>/part-*.parquet
  * }}}
  *
  * Readers resolve the HIGHEST version file and scan exactly the
  * (batch, partition) directories it lists. A merge writes its
  * rewritten partitions under a NEW batch dir, then publishes
  * old-mapping ++ touched→newBatch as version N+1 via write-to-temp +
  * rename — the rename is the commit point, so the table flips from
  * version N to N+1 atomically: there is no window where a reader
  * sees half a merge, and a writer dying pre-rename leaves version N
  * fully intact (its orphan batch dir is swept by the next committed
  * writer). Untouched partitions keep their EXACT files — the
  * byte-identity WarehouseSpec asserts — so merge I/O scales with the
  * touched partitions, not the table.
  *
  * Scale shape: the driver holds only the partition→batch mapping
  * (two short strings per partition — a 10-year daily table is ~3.6k
  * lines) and the touched-partition list; all row movement is
  * executor-side. Single-writer contract, like [[BatchedIndex]]: two
  * concurrent merges can race the version create — the loser's rename
  * fails loudly (rename-to-existing returns false) and its batch dir
  * is swept later, never half-visible.
  *
  * Contract: a key's partition value is IMMUTABLE (the standard
  * event-date fact-table shape). An update that moves a key across
  * partitions must be expressed as delete + insert; [[mergeInto]]
  * only reconciles keys within the partitions the change batch names.
  */
object Warehouse {

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new HPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val VersionRe = "^v([0-9]{8})$".r

  /** (version number, partitionValue → batchId) of the newest commit. */
  private def snapshot(fs: FileSystem, path: String): Option[(Long, Map[String, String])] = {
    val vdir = new HPath(s"$path/_versions")
    if (!fs.exists(vdir)) None
    else {
      val versions = fs.listStatus(vdir).toSeq.flatMap(st =>
        st.getPath.getName match {
          case VersionRe(n) => Some((n.toLong, st.getPath))
          case _            => None
        })
      if (versions.isEmpty) None
      else {
        val (n, p) = versions.maxBy(_._1)
        val in = fs.open(p)
        val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                   finally in.close()
        val mapping = text.split("\n").filter(_.nonEmpty).map { line =>
          val Array(part, batch) = line.split("\t", 2)
          part -> batch
        }.toMap
        Some((n, mapping))
      }
    }
  }

  /** Publish `mapping` as version `n` — write to a temp name, then
    * rename into place. The rename IS the commit: before it, readers
    * resolve the previous version; after it, the new one — there is
    * no torn state. A duplicate version number (a racing writer that
    * resolved the same snapshot) fails loudly instead of clobbering a
    * committed manifest: strictly on filesystems whose rename refuses
    * an existing destination (HDFS), best-effort via the existence
    * check on POSIX-rename filesystems (local) — the single-writer
    * contract the object doc states.
    */
  private[graft] def commit(fs: FileSystem, path: String, n: Long,
                            mapping: Map[String, String]): Unit = {
    val vdir = new HPath(s"$path/_versions")
    fs.mkdirs(vdir)
    val tmp = new HPath(vdir, s".tmp_${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(mapping.toSeq.sorted.map { case (p, b) => s"$p\t$b" }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    val target = new HPath(vdir, f"v$n%08d")
    if (fs.exists(target) || !fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"commit of version $n at $path lost a race - retry the merge")
    }
  }

  /** Best-effort sweep of data no committed version references: whole
    * batch dirs owning nothing (orphans of writers that died
    * pre-commit, fully superseded merges), and partition subdirs
    * inside still-live batches whose ownership moved to a newer batch
    * (the touched partitions' OLD files after a merge). Runs after a
    * successful commit, so a racing reader of the previous version
    * may lose files mid-scan and should re-resolve + retry — the same
    * trade [[BatchedIndex]] documents.
    */
  private def sweep(fs: FileSystem, path: String,
                    live: Map[String, String], partCol: String): Unit = {
    val dataDir = new HPath(s"$path/data")
    if (fs.exists(dataDir)) {
      val ownedBy = live.groupMap(_._2) { case (pv, _) => s"$partCol=$pv" }
      fs.listStatus(dataDir).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("batch=")) {
          val owned = ownedBy.getOrElse(n.stripPrefix("batch="), Nil).toSet
          try {
            if (owned.isEmpty) fs.delete(st.getPath, true)
            else fs.listStatus(st.getPath).foreach { sub =>
              val sn = sub.getPath.getName
              if (sn.startsWith(s"$partCol=") && !owned.contains(sn))
                fs.delete(sub.getPath, true)
            }
          } catch { case _: java.io.IOException => () }
        }
      }
    }
  }

  private def partDirs(fs: FileSystem, path: String, batchId: String,
                       partCol: String): Seq[String] = {
    val dir = new HPath(s"$path/data/batch=$batchId")
    fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(s"$partCol="))
      .map(_.stripPrefix(s"$partCol="))
  }

  /** Initialize the table: write `df` hive-partitioned by `partCol`
    * as one batch and commit version 1 mapping every written
    * partition to it. Refuses an already-initialized path.
    */
  def create(spark: SparkSession, path: String, df: DataFrame,
             partCol: String): Unit = {
    val fs = fsOf(spark, path)
    require(snapshot(fs, path).isEmpty, s"warehouse table already exists at $path")
    val batchId = java.util.UUID.randomUUID().toString
    df.write.mode("overwrite").partitionBy(partCol)
      .parquet(s"$path/data/batch=$batchId")
    val mapping = partDirs(fs, path, batchId, partCol)
      .map(_ -> batchId).toMap
    commit(fs, path, 1L, mapping)
  }

  /** The table's current rows. Reads exactly the (batch, partition)
    * directories the newest version maps — `basePath` keeps both the
    * synthetic `batch` column and `partCol` inferrable; `batch` is
    * dropped (the manifest, not the path layout, is the visibility
    * contract).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val fs = fsOf(spark, path)
    val (_, mapping) = snapshot(fs, path).getOrElse(
      throw new IllegalStateException(s"no committed version under $path"))
    readMapped(spark, path, mapping, partColOf(fs, path, mapping))
  }

  private def partColOf(fs: FileSystem, path: String,
                        mapping: Map[String, String]): String = {
    // the partition column name is recoverable from any owned dir
    val (pv, batch) = mapping.head
    val dir = new HPath(s"$path/data/batch=$batch")
    fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collectFirst { case n if n.endsWith(s"=$pv") => n.takeWhile(_ != '=') }
      .getOrElse(throw new IllegalStateException(
        s"mapped partition $pv missing under batch $batch at $path"))
  }

  private def readMapped(spark: SparkSession, path: String,
                         mapping: Map[String, String], partCol: String): DataFrame =
    spark.read.option("basePath", s"$path/data")
      .parquet(mapping.toSeq.sorted.map { case (pv, b) =>
        s"$path/data/batch=$b/$partCol=$pv"
      }: _*)
      .drop("batch")

  /** Latest-wins MERGE of `changes` into the table: per key, the row
    * with the highest `versionCol` survives, change rows winning ties
    * against stored rows (the CDC arrival order). Only the partitions
    * present in `changes` are read and rewritten — copy-on-write at
    * partition granularity: base rows of touched partitions are
    * reconciled executor-side (union + per-key max-struct argmax, one
    * keyed shuffle over touched data only), written under a fresh
    * batch dir, and published with one atomic version commit. Driver
    * work is partition METADATA only (the touched-value list); rows
    * never pass through the driver.
    */
  def mergeInto(spark: SparkSession, path: String, changes: DataFrame,
                keyCol: String, versionCol: String, partCol: String): Unit = {
    val fs = fsOf(spark, path)
    val (v, mapping) = snapshot(fs, path).getOrElse(
      throw new IllegalStateException(s"no committed version under $path - create() first"))
    val touched = changes.select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    require(touched.nonEmpty, "empty change batch")
    val baseDirs = touched.flatMap(pv =>
      mapping.get(pv).map(b => s"$path/data/batch=$b/$partCol=$pv"))
    val dataCols = changes.columns.filterNot(Set(keyCol, versionCol, partCol))
    def pick(df: DataFrame, src: Int): DataFrame = df.select(
      col(keyCol),
      struct((col(versionCol) +: lit(src).as("_src") +:
        col(partCol).as("_pv") +:
        dataCols.map(col).toSeq): _*).as("_m"))
    val base =
      if (baseDirs.isEmpty) None
      else Some(pick(
        spark.read.option("basePath", s"$path/data")
          .parquet(baseDirs: _*).drop("batch"), 0))
    // latest wins; _src breaks version ties in favor of the change
    // row (struct max compares field-by-field in order)
    val merged = base.fold(pick(changes, 1))(_.unionByName(pick(changes, 1)))
      .groupBy(keyCol)
      .agg(max(col("_m")).as("_m"))
      .select(col(keyCol) +: col(s"_m.$versionCol") +:
        col("_m._pv").as(partCol) +:
        dataCols.map(c => col(s"_m.$c")).toSeq: _*)
    val batchId = java.util.UUID.randomUUID().toString
    merged.write.mode("overwrite").partitionBy(partCol)
      .parquet(s"$path/data/batch=$batchId")
    val newMapping = mapping ++
      partDirs(fs, path, batchId, partCol).map(_ -> batchId)
    commit(fs, path, v + 1, newMapping)
    sweep(fs, path, newMapping, partCol)
  }

  /** Per-partition (value, batchId, file count, bytes) off the
    * newest version — the listing [[compact]] plans from, exposed for
    * specs and ops dashboards. Driver-bounded: one FS listing per
    * partition, no data read.
    */
  def partitionStats(spark: SparkSession, path: String): Seq[(String, String, Int, Long)] = {
    val fs = fsOf(spark, path)
    val (_, mapping) = snapshot(fs, path).getOrElse(
      throw new IllegalStateException(s"no committed version under $path"))
    val partCol = partColOf(fs, path, mapping)
    mapping.toSeq.sorted.map { case (pv, b) =>
      val files = fs.listStatus(new HPath(s"$path/data/batch=$b/$partCol=$pv"))
        .filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
      (pv, b, files.length, files.map(_.getLen).sum)
    }
  }

  /** Small-file COMPACTION (OPTIMIZE): bin-pack every partition whose
    * file count exceeds what `targetBytes` calls for into
    * ceil(bytes/targetBytes) files, in ONE executor-side job — the
    * selected partitions are read off the current snapshot,
    * range-repartitioned on (partition, `sortCol`) into the total
    * file budget, and rewritten under a fresh batch dir; partitions
    * already at their target keep their exact files. Range
    * partitioning makes each output file cover a contiguous
    * (partition, sortCol) slab, so the compacted layout is also
    * SORTED — min/max row-group stats on `sortCol` become selective
    * for free. Commit + sweep as [[mergeInto]]; a crash mid-compact
    * leaves the fragmented-but-correct table serving. Returns the
    * number of partitions rewritten.
    */
  def compact(spark: SparkSession, path: String, sortCol: String,
              targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val fs = fsOf(spark, path)
    val (v, mapping) = snapshot(fs, path).getOrElse(
      throw new IllegalStateException(s"no committed version under $path"))
    val partCol = partColOf(fs, path, mapping)
    val stats = partitionStats(spark, path)
    val frag = stats.filter { case (_, _, nFiles, bytes) =>
      nFiles > math.max(1L, (bytes + targetBytes - 1) / targetBytes)
    }
    if (frag.isEmpty) 0
    else {
      val nOut = math.max(1L, frag.map { case (_, _, _, bytes) =>
        math.max(1L, (bytes + targetBytes - 1) / targetBytes)
      }.sum).toInt
      val dirs = frag.map { case (pv, b, _, _) =>
        s"$path/data/batch=$b/$partCol=$pv"
      }
      val batchId = java.util.UUID.randomUUID().toString
      spark.read.option("basePath", s"$path/data").parquet(dirs: _*)
        .drop("batch")
        .repartitionByRange(nOut, col(partCol), col(sortCol))
        .sortWithinPartitions(col(partCol), col(sortCol))
        .write.mode("overwrite").partitionBy(partCol)
        .parquet(s"$path/data/batch=$batchId")
      val newMapping = mapping ++ frag.map(_._1 -> batchId)
      commit(fs, path, v + 1, newMapping)
      sweep(fs, path, newMapping, partCol)
      frag.length
    }
  }
}
