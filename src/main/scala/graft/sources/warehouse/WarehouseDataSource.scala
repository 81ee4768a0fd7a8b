package graft.sources.warehouse

import org.apache.spark.sql.{Column, DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, WriteBuilder}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.Warehouse

/** DataSource V2 front door for [[graft.io.Warehouse]] tables —
  * `spark.read.format("graft-warehouse").load(path)` — making the
  * lakehouse SQL-addressable (register a temp view, `SELECT … WHERE`)
  * with the table's own pruning layers engaged AUTOMATICALLY, the way
  * Delta/Iceberg users actually consume these tables:
  *
  *  - **filter pushdown → file skipping**
  *    (`SupportsPushDownFilters`): range/equality predicates on any
  *    column route into the manifest's `_stats` sidecars, so a
  *    `WHERE event_id BETWEEN 10 AND 500` opens only the files whose
  *    recorded min/max intersects — no explicit `readSkipping` call.
  *    Pushdown is PARTIAL by design: every filter is also returned as
  *    residual and re-applied by Spark, so pruning only ever decides
  *    which files open, never a row's fate. The same filters are
  *    additionally applied INSIDE the wrapped scan, where Catalyst
  *    pushes them down to parquet row-group level on the chain-free
  *    partitions (post-fold on chained ones — a pre-fold filter could
  *    resurrect a superseded row).
  *  - **column pruning** (`SupportsPushDownRequiredColumns`): the
  *    projected schema reaches the parquet scans (ReadSchema).
  *  - **time travel**: `.option("versionAsOf", n)` serves exactly
  *    [[Warehouse.readVersion]]'s snapshot.
  *
  * Architecture: the scan is a [[V1Scan]] — the DSv2 fallback Spark's
  * own JDBC connector ships — whose relation wraps the warehouse
  * read plan (manifest resolution, chain folding, stats pruning all
  * reused verbatim). A native `Batch` would have to re-implement the
  * merge-on-read FOLD inside partition readers — a per-key argmax
  * that genuinely needs a keyed aggregation, which scans cannot
  * express — so the V1 bridge is the honest shape: Spark still plans
  * pushdown/pruning against this connector's declarations, and the
  * inner plan executes exactly like the API read path the rest of the
  * suite verifies.
  */
class WarehouseDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-warehouse"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    WarehouseDataSource.conf(options).frame(spark).schema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val c = WarehouseDataSource.conf(new CaseInsensitiveStringMap(properties))
    new WarehouseTable(schema, c)
  }
}

object WarehouseDataSource {

  /** Parsed read options. `readChangeFeed = true` switches the table
    * from the snapshot to its CHANGE FEED — Delta's
    * `option("readChangeFeed", …)` shape: rows are the tagged diffs
    * of commits in `(startingVersion - 1, endingVersion]` (default:
    * from the first diffable commit to the newest), with
    * `change_type` and `commit_version` columns, exactly
    * [[Warehouse.changeLog]]'s frame. Feed reads take no pushed-
    * filter file pruning (the diff must see both images of every
    * moved key) — filters stay Spark-side residuals; the manifest
    * diff already prunes the scan to moved partitions.
    */
  final case class ReadConf(
      path: String, versionAsOf: Option[Long], keyCol: Option[String],
      changeFeed: Boolean, startingVersion: Option[Long],
      endingVersion: Option[Long], maxCommits: Int) {
    def frame(spark: SparkSession): org.apache.spark.sql.DataFrame =
      if (changeFeed) {
        val key = keyCol.getOrElse {
          // default to the table's recorded merge key (_meta); tables
          // that never took a delta commit must name it explicitly
          val fs = new org.apache.hadoop.fs.Path(path)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          try Warehouse.readMeta(fs, path)._1
          catch {
            case e: IllegalArgumentException => throw new IllegalArgumentException(
              "readChangeFeed needs option(\"keyCol\", ...) on a table " +
                s"without recorded merge keys: ${e.getMessage}")
          }
        }
        Warehouse.changeLog(spark, path, key,
          fromV = startingVersion.map(_ - 1).getOrElse(1L),
          toV = endingVersion, maxCommits = maxCommits)
      } else versionAsOf match {
        case Some(n) => Warehouse.readVersion(spark, path, n)
        case None    => Warehouse.read(spark, path)
      }
  }

  private def conf(options: CaseInsensitiveStringMap): ReadConf = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-warehouse requires a table path - .load(path)"))
    ReadConf(path,
      versionAsOf = Option(options.get("versionAsOf")).map(_.toLong),
      keyCol = Option(options.get("keyCol")),
      changeFeed = options.getBoolean("readChangeFeed", false),
      startingVersion = Option(options.get("startingVersion")).map(_.toLong),
      endingVersion = Option(options.get("endingVersion")).map(_.toLong),
      maxCommits = options.getInt("maxCommits", 64))
  }

  /** Test probe: file count and pushed-filter set of the most recently
    * PLANNED warehouse scan (the V1 bridge keeps the outer frame's
    * inputFiles empty, so specs assert the shrink here).
    */
  @volatile var lastPlanned: Option[(Int, Seq[String])] = None

  /** DSv1 `Filter` → pruning [[Warehouse.Bound]]s, per column: the
    * conjunction of every pushed range/equality predicate. Strict
    * comparisons use their inclusive superset — pruning only needs a
    * superset of the matching files; the residual filter exacts it.
    */
  private[warehouse] def boundsOf(filters: Seq[Filter]): Map[String, Warehouse.Bound] = {
    sealed trait Side; case object Lo extends Side; case object Hi extends Side
    def sides(f: Filter): Seq[(String, Side, Any)] = f match {
      case EqualTo(a, v)            => Seq((a, Lo, v), (a, Hi, v))
      case GreaterThan(a, v)        => Seq((a, Lo, v))
      case GreaterThanOrEqual(a, v) => Seq((a, Lo, v))
      case LessThan(a, v)           => Seq((a, Hi, v))
      case LessThanOrEqual(a, v)    => Seq((a, Hi, v))
      case And(l, r)                => sides(l) ++ sides(r)
      case _                        => Seq.empty
    }
    def asLong(v: Any): Option[Long] = v match {
      case n: java.lang.Long    => Some(n.longValue)
      case n: java.lang.Integer => Some(n.longValue)
      case n: java.lang.Short   => Some(n.longValue)
      case d: java.sql.Date     => Some(d.toLocalDate.toEpochDay)
      case d: java.time.LocalDate => Some(d.toEpochDay)
      case _ => None
    }
    filters.flatMap(sides).filter(_._3 != null)
      .groupBy(_._1).flatMap { case (c, ss) =>
        val los = ss.collect { case (_, Lo, v) => v }
        val his = ss.collect { case (_, Hi, v) => v }
        val longLo = los.flatMap(asLong); val longHi = his.flatMap(asLong)
        val strLo = los.collect { case s: String => s }
        val strHi = his.collect { case s: String => s }
        if (longLo.nonEmpty || longHi.nonEmpty)
          Some(c -> Warehouse.LongBound(longLo.maxOption, longHi.minOption))
        else if (strLo.nonEmpty || strHi.nonEmpty)
          Some(c -> Warehouse.StrBound(
            if (strLo.isEmpty) None else Some(strLo.max),
            if (strHi.isEmpty) None else Some(strHi.min)))
        else None
      }
  }

  /** DSv1 `Filter` → `Column` for the filters this connector accepts
    * into the inner scan (where Catalyst pushes them to parquet).
    * None for shapes it leaves entirely to Spark's residual pass.
    */
  private[warehouse] def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v)            => Some(col(a) === lit(v))
    case GreaterThan(a, v)        => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v)           => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v)    => Some(col(a) <= lit(v))
    case IsNotNull(a)             => Some(col(a).isNotNull)
    case IsNull(a)                => Some(col(a).isNull)
    case In(a, vs)                => Some(col(a).isin(vs.toIndexedSeq: _*))
    case And(l, r) => (toColumn(l), toColumn(r)) match {
      case (Some(a), Some(b)) => Some(a && b)
      case _ => None
    }
    case _ => None
  }

  /** The filters [[boundsOf]]/[[toColumn]] can exploit — what
    * `pushFilters` reports as pushed (explain's PushedFilters line).
    */
  private[warehouse] def pushable(f: Filter): Boolean = f match {
    case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual |
         _: LessThan | _: LessThanOrEqual | _: IsNotNull | _: IsNull |
         _: In => true
    case And(l, r) => pushable(l) && pushable(r)
    case _ => false
  }
}

class WarehouseTable(tableSchema: StructType,
                     conf: WarehouseDataSource.ReadConf)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String =
    s"graft-warehouse(${conf.path}${conf.versionAsOf.fold("")(v => s"@v$v")}" +
      s"${if (conf.changeFeed) " changeFeed" else ""})"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    // BATCH_WRITE admits the table to the v2 write planner;
    // V1_BATCH_WRITE routes the plan to the InsertableRelation
    // fallback execs (this connector's Write is a V1Write). No
    // OVERWRITE_DYNAMIC: Spark ships no dynamic-overwrite exec for
    // V1 writes, so declaring it would plan an unexecutable node —
    // dynamic overwrite instead follows the V1 file-source contract
    // (`spark.sql.sources.partitionOverwriteMode`, see
    // [[WarehouseWriteBuilder]]).
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarehouseScanBuilder(tableSchema, conf)

  /** The manifest's partition columns as identity transforms, so
    * Spark knows the table's layout (`INSERT OVERWRITE` under
    * `partitionOverwriteMode=dynamic` plans a dynamic overwrite, SHOW
    * CREATE reflects the layout). Change-feed handles report none —
    * the diff stream is not a writable layout.
    */
  override def partitioning(): Array[Transform] =
    if (conf.changeFeed) Array.empty
    else
      try graft.io.Warehouse
        .partitionColumns(SparkSession.active, conf.path)
        .map(c => Expressions.identity(c)).toArray
      catch { case _: IllegalStateException => Array.empty }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(!conf.changeFeed,
      "cannot write to a change-feed read of a graft-warehouse table")
    require(conf.versionAsOf.isEmpty,
      "cannot write to a time-travel read of a graft-warehouse table - " +
        "restore() the version instead")
    new WarehouseWriteBuilder(conf.path,
      Option(info.options.get("partitionOverwriteMode")))
  }
}

/** The write plane behind `INSERT INTO` / `INSERT OVERWRITE` /
  * `df.write.format("graft-warehouse")` — a [[V1Write]] bridge (the
  * same fallback shape Spark's own JDBC connector ships) routing each
  * SQL write mode to its verified [[Warehouse]] commit path:
  *
  *  - append (`INSERT INTO`, SaveMode.Append) → [[Warehouse.append]]:
  *    a '+' append-link commit on plain tables, a keyed delta merge on
  *    tables with recorded merge keys — O(batch) bytes either way.
  *  - overwrite (`INSERT OVERWRITE`, SaveMode.Overwrite): under the
  *    default STATIC `spark.sql.sources.partitionOverwriteMode` the
  *    whole table is replaced ([[Warehouse.overwrite]] — one more
  *    commit, previous snapshots still time-travelable); under
  *    DYNAMIC mode — the session conf, or a per-write
  *    `option("partitionOverwriteMode", "dynamic")` taking precedence,
  *    exactly the V1 file-source contract — only the partitions the
  *    batch carries rows for are replaced
  *    ([[Warehouse.overwritePartitions]]). The conf is honored HERE
  *    because Spark ships no dynamic-overwrite exec for V1 write
  *    fallbacks: every overwrite plans as truncate and the builder
  *    resolves the mode, the way `InsertIntoHadoopFsRelation` does
  *    for plain parquet.
  *
  * Every path publishes through the table's atomic [[CommitPrimitive]]
  * claim with optimistic-concurrency retry, so SQL writers get the
  * same multi-writer contract as API writers.
  */
class WarehouseWriteBuilder(path: String, overwriteModeOpt: Option[String])
    extends WriteBuilder with SupportsTruncate {

  private var truncateMode: Boolean = false

  override def truncate(): WriteBuilder = { truncateMode = true; this }

  override def build(): V1Write = new V1Write {
    override def toInsertableRelation(): InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, overwrite: Boolean): Unit = {
          val spark = data.sparkSession
          if (!(truncateMode || overwrite))
            graft.io.Warehouse.append(spark, path, data): Unit
          else {
            val dynamic = overwriteModeOpt.getOrElse(spark.conf.get(
              "spark.sql.sources.partitionOverwriteMode", "static"))
              .equalsIgnoreCase("dynamic")
            if (dynamic)
              graft.io.Warehouse.overwritePartitions(spark, path, data): Unit
            else graft.io.Warehouse.overwrite(spark, path, data): Unit
          }
        }
      }
  }
}

class WarehouseScanBuilder(fullSchema: StructType,
                           conf: WarehouseDataSource.ReadConf)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var pruned: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  /** PARTIAL pushdown: accepted filters drive file skipping and the
    * inner parquet scan, but every filter is returned for Spark to
    * re-apply — stats pruning yields a superset, never a verdict.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // change-feed reads take no file pruning (the diff must see both
    // images of every moved key) — leave every filter to Spark
    pushed =
      if (conf.changeFeed) Array.empty
      else filters.filter(WarehouseDataSource.pushable)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    // empty projections (count(*)) keep one column so the inner plan
    // still yields one row per stored row
    pruned =
      if (requiredSchema.fields.nonEmpty) requiredSchema
      else StructType(fullSchema.fields.take(1))

  override def build(): Scan =
    new WarehouseV1Scan(pruned, conf, pushed)
}

/** The V1 bridge scan: resolves the manifest, prunes files through
  * the pushed bounds, folds chains, projects — all by composing the
  * verified [[Warehouse]] read path — and hands Spark the resulting
  * plan's RDD.
  */
class WarehouseV1Scan(pruned: StructType,
                      conf: WarehouseDataSource.ReadConf,
                      pushed: Array[Filter])
    extends V1Scan with SupportsReportStatistics {

  override def readSchema(): StructType = pruned

  /** Size from the manifest's own file listing (driver-bounded
    * metadata, no data read) — without it Spark assumes
    * `defaultSizeInBytes` (effectively infinite) and a small
    * warehouse DIMENSION table joined against a fact would never
    * broadcast; with it, Catalyst's broadcast threshold applies to
    * warehouse tables exactly as to plain parquet. Deliberately the
    * UNPRUNED table bytes: an over-estimate can only miss a broadcast
    * opportunity, never OOM the driver on an under-estimate.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private lazy val bytes: java.util.OptionalLong =
      try java.util.OptionalLong.of(math.max(1L,
        Warehouse.partitionStats(SparkSession.active, conf.path).map(_._4).sum))
      catch { case _: Exception => java.util.OptionalLong.empty() }
    override def sizeInBytes(): java.util.OptionalLong = bytes
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
  }

  override def description(): String =
    s"graft-warehouse ${conf.path}${conf.versionAsOf.fold("")(v => s"@v$v")}" +
      s"${if (conf.changeFeed) " changeFeed" else ""} " +
      s"fields=${pruned.fieldNames.mkString(",")} " +
      s"pushed=[${pushed.mkString(", ")}]"

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T = {
    val spark = context.sparkSession
    val base =
      if (conf.changeFeed) conf.frame(spark)
      else Warehouse.readForScan(spark, conf.path, conf.versionAsOf,
        WarehouseDataSource.boundsOf(pushed.toIndexedSeq))
    val filtered = pushed.toIndexedSeq
      .flatMap(WarehouseDataSource.toColumn)
      .reduceOption(_ && _).map(base.filter).getOrElse(base)
    val projected = filtered.select(pruned.fieldNames.map(col).toIndexedSeq: _*)
    WarehouseDataSource.lastPlanned =
      Some((base.inputFiles.length, pushed.map(_.toString).toIndexedSeq))
    val prunedSchema = pruned
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = prunedSchema
      override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
        projected.rdd
    }.asInstanceOf[T]
  }
}
