package graft.sources.warehouse

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, ProcedureCatalog, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.Warehouse

/** Path-addressed [[TableCatalog]] for warehouse tables — the
  * Delta-style SQL identifier form, registered centrally as `graft`
  * ([[graft.engine.Sessions]]), so the WHOLE SQL time-travel grammar
  * works against any table path with zero registration ceremony:
  *
  * {{{
  *   SELECT * FROM graft.`/data/wh/events`                     -- newest
  *   SELECT * FROM graft.`/data/wh/events` VERSION AS OF 3     -- snapshot
  *   SELECT * FROM graft.`/data/wh/events` TIMESTAMP AS OF
  *     '2024-01-05 12:00:00'                                   -- as-of time
  * }}}
  *
  * The identifier IS the table path (exactly Delta's
  * ``delta.`/path/to/table` `` convention); the loaded table is the
  * same [[WarehouseTable]] the `graft-warehouse` read format serves,
  * so pushed-filter file skipping, column pruning and reported
  * statistics all apply to catalog-addressed reads too. `TIMESTAMP AS
  * OF` resolves to the NEWEST commit at-or-before the instant
  * ([[Warehouse.versionAt]] — commit-file mtimes, the Delta
  * convention), then reads that version exactly like `VERSION AS OF`.
  *
  * Writes: `INSERT INTO` appends ([[Warehouse.append]] — a blind '+'
  * append-link commit on plain tables, a keyed delta merge on tables
  * with recorded merge keys) and `INSERT OVERWRITE` truncates or —
  * under `partitionOverwriteMode=dynamic` — replaces exactly the
  * partitions the batch names ([[WarehouseWriteBuilder]]). `DELETE
  * FROM … WHERE …` is metadata-only for partition-decidable
  * predicates and a copy-on-write rewrite of just the touched
  * partitions for any other translatable predicate
  * ([[WarehouseTable.deleteWhere]]); keyed MERGE still goes through
  * the merge API where the key/version vocabulary lives; DDL
  * (create/alter/drop) fails loudly
  * instead of corrupting a manifest — tables are created by
  * [[Warehouse.create]], which names the partition layout.
  */
class WarehouseCatalog extends TableCatalog with ProcedureCatalog {

  private var catalogName: String = "graft"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  private def pathOf(ident: Identifier): String =
    (ident.namespace :+ ident.name).mkString("/")

  private def load(ident: Identifier, versionAsOf: Option[Long]): Table = {
    val spark = SparkSession.active
    val path = pathOf(ident)
    val conf = WarehouseDataSource.ReadConf(path, versionAsOf,
      keyCol = None, changeFeed = false, startingVersion = None,
      endingVersion = None, maxCommits = 64)
    val schema: StructType =
      try conf.frame(spark).schema
      catch {
        case _: IllegalStateException =>
          throw new NoSuchTableException(
            Seq(catalogName) ++ ident.namespace :+ ident.name)
      }
    new WarehouseTable(schema, conf)
  }

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** `VERSION AS OF <n>`. */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(
      try version.toLong
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"graft version identifiers are commit numbers, got '$version'")
      }))

  /** `TIMESTAMP AS OF <ts>` — Spark hands the instant as epoch
    * MICROseconds.
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val spark = SparkSession.active
    load(ident, Some(Warehouse.versionAt(spark, pathOf(ident), timestampMicros)))
  }

  override def tableExists(ident: Identifier): Boolean =
    try { loadTable(ident); true } catch { case _: NoSuchTableException => false }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty // path-addressed: there is no enumerable namespace

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft warehouse tables are created through Warehouse.create " +
        "(merge semantics need key/version columns SQL DDL cannot name)")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "schema evolution happens through widening merges (Warehouse.mergeInto)")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "drop a warehouse table by deleting its path; vacuum() reclaims history")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "rename a warehouse table by moving its path")

  /** `CALL graft.system.<proc>(table => '/path', …)` — the SQL
    * maintenance plane ([[WarehouseProcedures]]: compact / vacuum /
    * restore / maintain), the Iceberg/Delta procedure convention.
    */
  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    require(ident.namespace.isEmpty || ident.namespace.sameElements(Array("system")),
      s"graft procedures live in the 'system' namespace, got " +
        s"'${ident.namespace.mkString(".")}'")
    WarehouseProcedures.byName(ident.name).getOrElse(
      throw new IllegalArgumentException(
        s"unknown graft procedure '${ident.name}' - known: " +
          WarehouseProcedures.names.mkString(", ")))
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    WarehouseProcedures.names
      .map(n => Identifier.of(Array("system"), n)).toArray
}
