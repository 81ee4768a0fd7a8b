package graft.io

import scala.util.DynamicVariable

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-committed multi-part parquet index layout — the atomic
  * fold-in behind [[graft.operators.Dedup.writeMinhashIndex]] and
  * [[graft.operators.Similarity.writeSrpIndex]].
  *
  * Problem this solves: an incremental index is several parquet
  * tables that must stay mutually consistent (signatures + band keys
  * + bucket counts). Folding a batch in as N separate appends is N
  * separate jobs — each atomic, the set not — so a failure mid-fold
  * leaves the index half-updated (docs that verify but never form
  * candidates, or bucket counts that disagree with the band table).
  *
  * Layout: each fold-in writes every part under its own batch
  * directory, then publishes the batch with ONE marker file:
  *
  * {{{
  *   path/_batches/g<gen>_<batchId>     commit markers (empty files)
  *   path/<part>/batch=<batchId>/part-...parquet
  * }}}
  *
  * Readers resolve the manifest as: the markers of the HIGHEST
  * generation number are the committed batches. A batch is therefore
  * visible either in EVERY part or in none: until its marker exists,
  * its files are unreferenced bytes. The marker create is one
  * filesystem operation — the commit point, for appends and
  * overwrites alike:
  *
  *  - append: the new marker carries the current generation, so the
  *    committed set grows by exactly this batch at marker-create.
  *  - overwrite (logical rebuild): the new batch is fully written
  *    BEFORE its marker lands with generation max+1 — the instant
  *    that single marker exists, readers resolve the new generation
  *    and stop seeing every old batch. There is no window where the
  *    manifest is empty or where old and new generations mix; a
  *    crash before the marker leaves the old index fully intact.
  *    Old markers and batch dirs are deleted AFTER the commit as
  *    best-effort cleanup, so a reader that resolved the old
  *    generation just before the swap can still lose files under its
  *    scan — rebuild-racing readers may fail at scan time and should
  *    retry (the re-resolved manifest is consistent); only the
  *    manifest switch itself is atomic.
  *
  * A fold-in that dies before its marker leaves orphan `batch=` dirs
  * that readers never touch; they are swept by the next `overwrite`
  * rebuild, or on append-only deployments by [[scrub]].
  *
  * Single-writer contract (same as any non-transactional table): two
  * concurrent fold-ins do not corrupt data — each writes its own
  * batch dirs — but an overwrite racing an append can orphan the
  * appended batch.
  */
object BatchedIndex {

  /** Test-only failure injection: invoked after each part's files are
    * written, with (index path, part name). A throw here simulates a
    * writer dying mid-fold — the batch must stay invisible. Scoped
    * via [[DynamicVariable.withValue]] so an injection cannot bleed
    * across concurrently running suites.
    */
  private[graft] val afterPartWrite: DynamicVariable[(String, String) => Unit] =
    new DynamicVariable((_, _) => ())

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new HPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Marker file name → (generation, batchId). Markers written before
    * the generation scheme (bare batchId) parse as generation 0.
    */
  private val MarkerRe = "^g([0-9]+)_(.+)$".r
  private def parseMarker(name: String): (Long, String) = name match {
    case MarkerRe(g, id) => (g.toLong, id)
    case legacy          => (0L, legacy)
  }

  /** (generation, batchId, marker mtime) of every marker on disk. */
  private def markers(fs: FileSystem, path: String): Seq[(Long, String, Long)] = {
    val mdir = new HPath(s"$path/_batches")
    if (!fs.exists(mdir)) Seq.empty
    else fs.listStatus(mdir).toSeq.map { st =>
      val (gen, id) = parseMarker(st.getPath.getName)
      (gen, id, st.getModificationTime)
    }
  }

  /** Write `parts` as one batch and publish it with a single commit
    * marker. `overwrite = true` starts a new generation (logical
    * rebuild — readers switch atomically at marker-create) and then
    * sweeps the superseded markers and batch dirs; `false` appends
    * the batch to the current generation. A part listed in
    * `partitionBy` is written hive-partitioned by those columns
    * INSIDE its batch dir — readers passing the batch dirs as scan
    * roots still get partition-column inference and static pruning
    * per root (the layout behind [[graft.operators.IvfIndex]]'s
    * incremental cell index).
    */
  def fold(spark: SparkSession, path: String,
           parts: Seq[(String, DataFrame)], overwrite: Boolean,
           partitionBy: Map[String, Seq[String]] = Map.empty): Unit = {
    require(parts.nonEmpty, "a batch needs at least one part")
    val fs = fsOf(spark, path)
    val batchId = java.util.UUID.randomUUID().toString
    parts.foreach { case (name, df) =>
      val writer = df.write.mode("overwrite")
      partitionBy.getOrElse(name, Nil) match {
        case Nil  => writer.parquet(s"$path/$name/batch=$batchId")
        case cols => writer.partitionBy(cols: _*).parquet(s"$path/$name/batch=$batchId")
      }
      afterPartWrite.value(path, name)
    }
    val mdir = new HPath(s"$path/_batches")
    val existing = markers(fs, path)
    val maxGen = if (existing.isEmpty) 0L else existing.map(_._1).max
    val gen = if (overwrite && existing.nonEmpty) maxGen + 1 else maxGen
    fs.mkdirs(mdir)
    fs.create(new HPath(mdir, s"g${gen}_$batchId"), false).close() // the commit point
    if (overwrite) {
      // post-commit cleanup of the superseded generation(s): readers
      // already resolve the new generation, so these are dead weight
      fs.listStatus(mdir).foreach { st =>
        if (parseMarker(st.getPath.getName)._1 < gen)
          try fs.delete(st.getPath, false)
          catch { case _: java.io.IOException => () }
      }
      sweep(fs, path, parts.map(_._1), Set(batchId))
    }
  }

  /** Committed batch ids — the markers of the highest generation —
    * sorted (readers never depend on order; parts are unioned).
    */
  def committed(spark: SparkSession, path: String): Seq[String] = {
    val ms = markers(fsOf(spark, path), path)
    if (ms.isEmpty) Seq.empty
    else {
      val maxGen = ms.map(_._1).max
      ms.collect { case (g, id, _) if g == maxGen => id }.sorted
    }
  }

  /** One part of the index, unioned across every COMMITTED batch.
    * Uncommitted batch dirs are never read. Queries that read several
    * parts should resolve [[committed]] ONCE and use the ids overload
    * for every part, so one probe sees a single consistent snapshot
    * even if a fold-in commits between the part reads.
    */
  def read(spark: SparkSession, path: String, part: String): DataFrame =
    read(spark, path, part, committed(spark, path))

  /** The subset of `ids` whose batch dir exists for `part` — for parts
    * only SOME batches carry (a delete-only batch writes just its
    * `tombstones` part; an ingest batch writes just `cells`). A batch
    * is still atomic: its marker makes every part it DID write visible
    * at once; parts it never wrote contribute nothing.
    */
  def presentIds(spark: SparkSession, path: String, part: String,
                 ids: Seq[String]): Seq[String] = {
    val fs = fsOf(spark, path)
    ids.filter(id => fs.exists(new HPath(s"$path/$part/batch=$id")))
  }

  /** [[read]] pinned to an explicit batch-id snapshot. */
  def read(spark: SparkSession, path: String, part: String,
           ids: Seq[String]): DataFrame = {
    if (ids.isEmpty) {
      val fs = fsOf(spark, path)
      if (fs.exists(new HPath(s"$path/$part")) &&
          !fs.exists(new HPath(s"$path/_batches")))
        throw new IllegalStateException(
          s"legacy (pre-manifest) index layout at $path: part '$part' exists " +
            "but there is no _batches manifest — rebuild the index with " +
            "overwrite=true to migrate it")
      require(ids.nonEmpty,
        s"no committed batches under $path — build the index first")
    }
    // basePath makes `batch=` parse as a partition column even when a
    // part is itself hive-partitioned inside each batch dir (without
    // it, multi-batch reads of partitioned parts fail partition
    // inference with CONFLICTING_DIRECTORY_STRUCTURES); the synthetic
    // `batch` column is dropped — the manifest, not the path layout,
    // is the visibility contract
    spark.read.option("basePath", s"$path/$part")
      .parquet(ids.map(id => s"$path/$part/batch=$id"): _*)
      .drop("batch")
  }

  /** Reclaim orphan batch dirs left by fold-ins that died before
    * their commit marker — the cleanup path for APPEND-ONLY indexes,
    * which otherwise accumulate crashed-fold orphans forever (an
    * `overwrite` rebuild sweeps as part of [[fold]]). An unmarked dir
    * is deleted only when it is OLDER than the newest marker: a later
    * fold has committed since the orphan's writer went quiet, so the
    * dir cannot belong to a fold that is still in flight. Returns the
    * number of batch dirs deleted.
    */
  def scrub(spark: SparkSession, path: String): Int = {
    val fs = fsOf(spark, path)
    val ms = markers(fs, path)
    if (ms.isEmpty) 0
    else {
      val newest = ms.map(_._3).max
      // every marked id (any generation) counts as referenced — scrub
      // only ever touches dirs NO marker points to
      val marked = ms.map(_._2).toSet
      val partDirs = fs.listStatus(new HPath(path)).toSeq
        .filter(st => st.isDirectory && st.getPath.getName != "_batches")
      partDirs.map { pd =>
        fs.listStatus(pd.getPath).count { st =>
          val n = st.getPath.getName
          n.startsWith("batch=") && !marked.contains(n.stripPrefix("batch=")) &&
            st.getModificationTime < newest && {
              try { fs.delete(st.getPath, true); true }
              catch { case _: java.io.IOException => false }
            }
        }
      }.sum
    }
  }

  /** COMPACTION: rewrite the committed batches as ONE batch in a new
    * generation — the lifecycle step after build → fold → scrub. An
    * append-heavy index accumulates a scan root per batch per part
    * (more file listings, more parquet footers, smaller row groups);
    * compaction collapses them without changing any visible row: each
    * part is read at one pinned snapshot and re-folded with
    * `overwrite = true`, so the switch is the same single
    * marker-create as any rebuild and a crash mid-compact leaves the
    * old batches serving. `partitionBy` mirrors [[fold]]'s — pass the
    * same map the folds used so hive-partitioned parts (e.g. the IVF
    * cell index) keep their pruning layout. Returns the number of
    * batches compacted away (0 = nothing to do). Single-writer, like
    * all mutations here.
    */
  def compact(spark: SparkSession, path: String,
              partitionBy: Map[String, Seq[String]] = Map.empty): Int = {
    val fs = fsOf(spark, path)
    val ids = committed(spark, path)
    if (ids.size <= 1) 0
    else {
      val parts = fs.listStatus(new HPath(path)).toSeq
        .filter(st => st.isDirectory && st.getPath.getName != "_batches")
        .map(_.getPath.getName).sorted
      // lazy reads pinned to the pre-compact snapshot; fold writes the
      // merged batch into NEW batch dirs, so the reads scan only old
      // files while the write runs. Per-part id filtering keeps parts
      // only some batches carry (tombstones) compactable too.
      fold(spark, path, parts.flatMap { p =>
        val present = presentIds(spark, path, p, ids)
        if (present.isEmpty) None else Some(p -> read(spark, path, p, present))
      }, overwrite = true, partitionBy)
      ids.size
    }
  }

  /** Best-effort removal of batch dirs no longer referenced by the
    * manifest (old batches after a rebuild, orphans of failed folds).
    */
  private def sweep(fs: FileSystem, path: String,
                    parts: Seq[String], keep: Set[String]): Unit =
    parts.foreach { p =>
      val dir = new HPath(s"$path/$p")
      if (fs.exists(dir)) fs.listStatus(dir).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("batch=") && !keep.contains(n.stripPrefix("batch=")))
          try fs.delete(st.getPath, true)
          catch { case _: java.io.IOException => () }
      }
    }
}
