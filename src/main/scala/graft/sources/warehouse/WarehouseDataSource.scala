package graft.sources.warehouse

import org.apache.spark.sql.{Column, DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
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
    val (path, versionAsOf) = WarehouseDataSource.conf(options)
    versionAsOf match {
      case Some(n) => Warehouse.readVersion(spark, path, n).schema
      case None    => Warehouse.read(spark, path).schema
    }
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val (path, versionAsOf) =
      WarehouseDataSource.conf(new CaseInsensitiveStringMap(properties))
    new WarehouseTable(schema, path, versionAsOf)
  }
}

object WarehouseDataSource {
  private def conf(options: CaseInsensitiveStringMap): (String, Option[Long]) = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-warehouse requires a table path - .load(path)"))
    (path, Option(options.get("versionAsOf")).map(_.toLong))
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

class WarehouseTable(tableSchema: StructType, path: String,
                     versionAsOf: Option[Long]) extends Table with SupportsRead {
  override def name(): String =
    s"graft-warehouse($path${versionAsOf.fold("")(v => s"@v$v")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarehouseScanBuilder(tableSchema, path, versionAsOf)
}

class WarehouseScanBuilder(fullSchema: StructType, path: String,
                           versionAsOf: Option[Long])
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var pruned: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  /** PARTIAL pushdown: accepted filters drive file skipping and the
    * inner parquet scan, but every filter is returned for Spark to
    * re-apply — stats pruning yields a superset, never a verdict.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(WarehouseDataSource.pushable)
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
    new WarehouseV1Scan(pruned, path, versionAsOf, pushed)
}

/** The V1 bridge scan: resolves the manifest, prunes files through
  * the pushed bounds, folds chains, projects — all by composing the
  * verified [[Warehouse]] read path — and hands Spark the resulting
  * plan's RDD.
  */
class WarehouseV1Scan(pruned: StructType, path: String,
                      versionAsOf: Option[Long], pushed: Array[Filter])
    extends V1Scan {

  override def readSchema(): StructType = pruned

  override def description(): String =
    s"graft-warehouse $path${versionAsOf.fold("")(v => s"@v$v")} " +
      s"fields=${pruned.fieldNames.mkString(",")} " +
      s"pushed=[${pushed.mkString(", ")}]"

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T = {
    val spark = context.sparkSession
    val bounds = WarehouseDataSource.boundsOf(pushed.toIndexedSeq)
    val base = Warehouse.readForScan(spark, path, versionAsOf, bounds)
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
