package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DateType, DoubleType, LongType,
  TimestampNTZType, TimestampType}

/** Multi-dimensional data layout for scan pruning — the write-side
  * half of "read less": parquet keeps min/max statistics per file and
  * row group, but a table sorted by ONE column has useless stats on
  * every other column. Z-ORDER clustering interleaves the bits of
  * several normalized columns into one curve key and range-partitions
  * + sorts by it, so every file covers a small HYPER-RECTANGLE of the
  * value space: a selective filter on ANY of the clustered columns
  * (or a multi-column box) skips most files/row groups on their
  * stats. At 100 TB this is the difference between a 2-D predicate
  * scanning the whole table and scanning ~the matching tiles.
  *
  * The curve key is plain integer arithmetic (normalize each column
  * to 16 bits inside its observed [min, max], interleave bits), so
  * the layout is deterministic; it changes WHERE rows land, never
  * query results — the oracle for the layout query is result
  * equality against the unclustered table, and the clusteredness
  * itself is spec-asserted from per-file min/max spreads.
  */
object Layout {

  private val Bits = 16

  /** `c` normalized to a 16-bit integer inside [lo, hi] (clamped). */
  private def norm16(c: Column, lo: Double, hi: Double): Column = {
    val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
    least(lit((1 << Bits) - 1), greatest(lit(0),
      floor((c.cast(DoubleType) - lit(lo)) * (((1 << Bits) - 1).toDouble / span))
        .cast(LongType)))
  }

  /** The interleaved-bit curve key of the given (column, lo, hi)
    * dimensions: bit b of dimension i lands at position b·n + i.
    */
  def zValue(dims: Seq[(Column, Double, Double)]): Column = {
    require(dims.nonEmpty && dims.size <= 4, s"1..4 z-order dims, got ${dims.size}")
    val n = dims.size
    val normed = dims.map { case (c, lo, hi) => norm16(c, lo, hi) }
    (0 until Bits).flatMap { b =>
      normed.zipWithIndex.map { case (v, i) =>
        shiftleft(shiftright(v, b).bitwiseAND(lit(1L)), b * n + i)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` parquet at `path`, clustered on the z-order curve of
    * `zCols`: one bounded stats pass (per-column min/max — two
    * doubles per column on the driver), then range-partition into
    * `nFiles` curve segments and sort within each, so every output
    * file covers a contiguous curve range = a small box of the value
    * space. Numeric and timestamp columns both work (timestamps
    * normalize through their epoch value).
    */
  /** Timestamps/dates normalize through their epoch value (a direct
    * TIMESTAMP_NTZ/DATE → DOUBLE cast is disallowed; the session is
    * UTC-pinned so the intermediate timestamp cast is unambiguous).
    */
  private def numeric(c: Column, dt: DataType): Column = dt match {
    case TimestampNTZType | DateType => c.cast(TimestampType).cast(DoubleType)
    case _                           => c.cast(DoubleType)
  }

  /** The z-order curve key for `df`'s rows over `zCols`, with the
    * normalization bounds taken from one bounded stats pass over `df`
    * (per-column min/max — two doubles per column on the driver; NOTE
    * this EXECUTES the frame's plan once). An all-null column
    * normalizes over a unit span (its rows land together — harmless,
    * stats on it never prune).
    */
  def zValueFor(df: DataFrame, zCols: Seq[String]): Column = {
    val nums = zCols.map(c => numeric(col(c), df.schema(c).dataType))
    val statCols = nums.flatMap(c => Seq(min(c), max(c)))
    val stats = df.agg(statCols.head, statCols.tail: _*).head()
    val dims = nums.zipWithIndex.map { case (c, i) =>
      if (stats.isNullAt(2 * i)) (c, 0.0, 1.0)
      else (c, stats.getDouble(2 * i), stats.getDouble(2 * i + 1))
    }
    zValue(dims)
  }

  def zorderWrite(df: DataFrame, zCols: Seq[String], path: String,
                  nFiles: Int): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    val z = zValueFor(df, zCols)
    df.repartitionByRange(nFiles, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(path)
  }

  /** Bucketed table layout (scale extension): pay the shuffle ONCE at
    * write time. The table is hash-partitioned into `nBuckets` on
    * `key` and registered in the session catalog; any later join or
    * aggregation on `key` between tables sharing the bucket spec
    * plans with ZERO exchanges — the recurring-join shape a 100 TB
    * warehouse wants (Spark's answer to co-located/partitioned joins
    * in distributed DBs). The pre-write `repartition(nBuckets, key)`
    * uses the same murmur3-pmod hash as the bucket spec, so each task
    * holds exactly one bucket and writes exactly one file — one file
    * per bucket is what lets the bucketed SCAN also report a sorted,
    * single-partition-per-bucket layout and elide the join SORT, not
    * just the exchange. Idempotent per (session, name): the catalog
    * check makes repeat calls free, mirroring how a served warehouse
    * table is written once and joined many times.
    */
  def bucketedTable(df: DataFrame, name: String, nBuckets: Int,
                    key: String): String = {
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(name)) {
      // the in-memory catalog dies with the JVM but the warehouse
      // directory doesn't: a table absent from the catalog whose
      // location survives a previous process is a stale derived
      // artifact — sweep it or CREATE refuses the location
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), name.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      df.repartition(nBuckets, col(key))
        .write.mode("overwrite")
        .bucketBy(nBuckets, key).sortBy(key)
        .saveAsTable(name)
    }
    name
  }
}
