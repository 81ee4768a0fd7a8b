package graft.io

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
  *   path/_batches/<batchId>            commit markers (empty files)
  *   path/<part>/batch=<batchId>/part-...parquet
  * }}}
  *
  * Readers list the committed markers and read exactly those batch
  * directories, so a batch is visible either in EVERY part or in
  * none: until the marker exists the batch's files are unreferenced
  * bytes. The marker create is one filesystem operation — the commit
  * point. A fold-in that dies before it leaves orphan `batch=` dirs
  * that readers never touch; they are swept by the next `overwrite`
  * rebuild (an append-only deployment reclaims them with any
  * periodic rebuild, or a trivial scrub of unmarked dirs).
  *
  * Overwrite semantics: the new batch is fully written BEFORE the
  * old manifest is dropped, so the old index stays readable during a
  * rebuild; the swap (delete markers dir, create new marker) is two
  * metadata ops, and a crash between them leaves a detectably-empty
  * manifest — never a silently mixed index.
  *
  * Single-writer contract (same as any non-transactional table): two
  * concurrent fold-ins do not corrupt data — each writes its own
  * batch dirs — but an overwrite racing an append can orphan the
  * appended batch.
  */
object BatchedIndex {

  /** Test-only failure injection: invoked after each part's files are
    * written, with (index path, part name). A throw here simulates a
    * writer dying mid-fold — the batch must stay invisible.
    */
  private[graft] var afterPartWrite: (String, String) => Unit = (_, _) => ()

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new HPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Write `parts` as one batch and publish it with a single commit
    * marker. `overwrite = true` replaces the manifest (logical
    * rebuild) and sweeps now-unreferenced batch dirs; `false` appends
    * the batch to the committed set.
    */
  def fold(spark: SparkSession, path: String,
           parts: Seq[(String, DataFrame)], overwrite: Boolean): Unit = {
    require(parts.nonEmpty, "a batch needs at least one part")
    val fs = fsOf(spark, path)
    val batchId = java.util.UUID.randomUUID().toString
    parts.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$path/$name/batch=$batchId")
      afterPartWrite(path, name)
    }
    val mdir = new HPath(s"$path/_batches")
    if (overwrite) fs.delete(mdir, true)
    fs.mkdirs(mdir)
    fs.create(new HPath(mdir, batchId), false).close() // the commit point
    if (overwrite) sweep(fs, path, parts.map(_._1), Set(batchId))
  }

  /** Committed batch ids, oldest-marker order not guaranteed (readers
    * never depend on order — parts are unioned).
    */
  def committed(spark: SparkSession, path: String): Seq[String] = {
    val fs = fsOf(spark, path)
    val mdir = new HPath(s"$path/_batches")
    if (!fs.exists(mdir)) Seq.empty
    else fs.listStatus(mdir).map(_.getPath.getName).toSeq.sorted
  }

  /** One part of the index, unioned across every COMMITTED batch.
    * Uncommitted batch dirs are never read.
    */
  def read(spark: SparkSession, path: String, part: String): DataFrame = {
    val ids = committed(spark, path)
    require(ids.nonEmpty,
      s"no committed batches under $path — build the index first")
    spark.read.parquet(ids.map(id => s"$path/$part/batch=$id"): _*)
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
