package graft.sources.rest

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JSONOptions, JacksonParser}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.io.Sources.{JdkHttpTransport, RestRequest, Transport}

/** DataSource V2 REST connector — the "at scale" form of the S1–S5
  * source operators (SURVEY.md §2.1/§4): `spark.read.format
  * ("graft-rest")` with REAL Catalyst integration instead of a
  * driver-side fetch:
  *
  *  - **column pruning pushdown** (`SupportsPushDownRequiredColumns`):
  *    the pruned schema drives both parsing (Jackson skips unused
  *    fields) and the server request (`fieldsParam` carries the
  *    wanted column list — the reference's `expand[]` idea, SER:73-97);
  *  - **limit pushdown** (`SupportsPushDownLimit`): `LIMIT n` becomes
  *    the server-side `limitParam` (the reference's datatable
  *    `length`, LAT:78);
  *  - **top-N pushdown** (`SupportsPushDownTopN`): `ORDER BY c
  *    [DESC] LIMIT n` collapses into the request as the datatable
  *    ordering vocabulary (`order[i][column]` / `columns[i][data]` /
  *    `order[i][dir]` + `limitParam`, LAT:78) — the server sorts and
  *    caps, so only n rows ever cross the wire; Spark re-applies the
  *    exact sort + limit on top (partial pushdown), so a server that
  *    ignores or botches the ordering still yields correct results;
  *  - **filter pushdown** (`SupportsPushDownFilters`): equality
  *    predicates become query params (the reference's
  *    `deleted=false` / date-range URL predicates, SER:93-96) —
  *    partial pushdown, Spark always re-applies the predicate;
  *  - **partitioned parallel fetch**: `pages=N` plans one input
  *    partition per page, so N executors fetch concurrently — the
  *    DSv2 form of the S3 fan-out.
  *
  * Rows are parsed straight to `InternalRow` with Spark's own
  * `JacksonParser` — no driver materialization anywhere.
  *
  * Options: `url` (required), `transport` (registry key, default
  * "http"), `root` (envelope array key, e.g. "data"), `pages` (int),
  * `pageParam` (default "page"), `fieldsParam`, `limitParam` (default
  * "length"), plus `param.X=Y` passthrough query params.
  */
class RestDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-rest"

  override def supportsExternalMetadata(): Boolean = true

  /** Infer the schema by fetching page 0 once on the driver and
    * running Spark's JSON inference over it. Callers with a known
    * schema pass it via `.schema(...)` and skip this fetch.
    */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val conf = RestConf(options)
    val spark = SparkSession.active
    import spark.implicits._
    val payload = TransportRegistry.get(conf.transportKey)(conf.request(None, None, None))
    val df = spark.read.json(spark.createDataset(Seq(payload)))
    conf.root match {
      case Some(r) =>
        df.schema(r).dataType match {
          case org.apache.spark.sql.types.ArrayType(st: StructType, _) => st
          case other => throw new IllegalArgumentException(
            s"root '$r' is not an array of objects: $other")
        }
      case None => df.schema
    }
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new RestTable(schema, RestConf(new CaseInsensitiveStringMap(properties)))
}

/** Serializable request recipe shared by driver planning and executor
  * readers.
  */
final case class RestConf(url: String, transportKey: String, root: Option[String],
                          pages: Int, pageParam: String, fieldsParam: Option[String],
                          limitParam: String, baseParams: Map[String, String]) {
  def request(page: Option[Int], fields: Option[Seq[String]], limit: Option[Int],
              eqFilters: Map[String, String] = Map.empty,
              sort: Seq[(String, Boolean)] = Nil): RestRequest =
    RestRequest(url, baseParams ++ eqFilters ++
      page.map(p => pageParam -> p.toString) ++
      fields.flatMap(fs => fieldsParam.map(_ -> fs.mkString(","))) ++
      limit.map(n => limitParam -> n.toString) ++
      sort.zipWithIndex.flatMap { case ((col, desc), i) =>
        Seq(s"order[$i][column]" -> i.toString, s"columns[$i][data]" -> col,
          s"order[$i][dir]" -> (if (desc) "desc" else "asc"))
      })
}

object RestConf {
  def apply(o: CaseInsensitiveStringMap): RestConf = {
    val m = o.asCaseSensitiveMap().asScala
    RestConf(
      url = Option(o.get("url")).getOrElse(
        throw new IllegalArgumentException("graft-rest requires option 'url'")),
      transportKey = o.getOrDefault("transport", "http"),
      root = Option(o.get("root")),
      pages = o.getInt("pages", 1),
      pageParam = o.getOrDefault("pageParam", "page"),
      fieldsParam = Option(o.get("fieldsParam")),
      limitParam = o.getOrDefault("limitParam", "length"),
      baseParams = m.collect {
        case (k, v) if k.startsWith("param.") => k.stripPrefix("param.") -> v
      }.toMap)
  }
}

/** JVM-local transport registry: executors resolve the transport by
  * key (options carry only strings). "http" is pre-registered; tests
  * register fixtures. On a cluster, custom transports register from
  * an executor plugin; in local mode (and tests) one JVM is enough.
  */
object TransportRegistry {
  private val transports = new ConcurrentHashMap[String, Transport]()
  transports.put("http", JdkHttpTransport)
  def register(name: String, t: Transport): Unit = transports.put(name, t)
  def get(name: String): Transport =
    Option(transports.get(name)).getOrElse(
      throw new IllegalArgumentException(s"unknown transport '$name'"))
}

class RestTable(schema: StructType, conf: RestConf) extends Table with SupportsRead {
  override def name(): String = s"graft-rest(${conf.url})"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RestScanBuilder(schema, conf)
}

class RestScanBuilder(fullSchema: StructType, conf: RestConf)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit with SupportsPushDownTopN
    with SupportsPushDownFilters {

  private var pruned: StructType = fullSchema
  private var limit: Option[Int] = None
  private var sort: Seq[(String, Boolean)] = Nil
  private var pushedEq: Array[Filter] = Array.empty

  /** Equality predicates on top-level columns travel to the server as
    * `attr=value` query params; everything (incl. the pushed ones) is
    * returned for Spark to re-evaluate — the server's filtering is an
    * optimization, never trusted for correctness.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushedEq = filters.collect {
      case f @ EqualTo(_, v) if v != null && (
        v.isInstanceOf[String] || v.isInstanceOf[java.lang.Number] ||
          v.isInstanceOf[java.lang.Boolean]) => f
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushedEq

  override def pruneColumns(requiredSchema: StructType): Unit =
    // top-level pruning only; empty projections (count(*)) keep one
    // column so the parser still yields one row per element
    pruned =
      if (requiredSchema.fields.nonEmpty) requiredSchema
      else StructType(fullSchema.fields.take(1))

  /** Partially pushed: the server caps what it ships, Spark still
    * applies the exact limit on top.
    */
  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }
  override def isPartiallyPushed: Boolean = true

  /** `ORDER BY … LIMIT n` → the datatable ordering vocabulary
    * (LAT:78). Accepted only when every key is a bare top-level
    * column (computed keys and nested fields have no server-side
    * name to sort by). Null ordering is deliberately not encoded:
    * this is PARTIAL pushdown — Spark re-sorts and re-limits
    * exactly, so the server's ordering only decides which ≤n rows
    * ship, never their final order or the null placement.
    */
  override def pushTopN(orders: Array[SortOrder], n: Int): Boolean = {
    val cols = orders.toSeq.map { o =>
      o.expression match {
        case ref: NamedReference if ref.fieldNames.length == 1 =>
          Some(ref.fieldNames.head -> (o.direction == SortDirection.DESCENDING))
        case _ => None
      }
    }
    if (cols.isEmpty || cols.exists(_.isEmpty)) false
    else {
      sort = cols.flatten
      limit = Some(n)
      true
    }
  }

  override def build(): Scan = new RestScan(pruned, conf, limit,
    pushedEq.collect { case EqualTo(a, v) => a -> String.valueOf(v) }.toMap, sort)
}

class RestScan(schema: StructType, conf: RestConf, limit: Option[Int],
               eqFilters: Map[String, String] = Map.empty,
               sort: Seq[(String, Boolean)] = Nil)
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-rest ${conf.url} fields=${schema.fieldNames.mkString(",")} " +
      s"limit=$limit eqFilters=${eqFilters.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(",")}" +
      (if (sort.isEmpty) ""
       else s" pushedTopN=${sort.map { case (c, d) => s"$c ${if (d) "DESC" else "ASC"}" }.mkString(",")}")

  override def planInputPartitions(): Array[InputPartition] =
    (if (conf.pages <= 1) Array(None: Option[Int])
     else Array.tabulate(conf.pages)(p => Some(p): Option[Int]))
      .map(p => RestInputPartition(p): InputPartition)

  override def createReaderFactory(): PartitionReaderFactory =
    RestReaderFactory(schema, conf, limit, eqFilters, sort)
}

final case class RestInputPartition(page: Option[Int]) extends InputPartition

final case class RestReaderFactory(schema: StructType, conf: RestConf,
                                   limit: Option[Int],
                                   eqFilters: Map[String, String],
                                   sort: Seq[(String, Boolean)] = Nil)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new RestPartitionReader(schema, conf, limit, eqFilters, sort,
      partition.asInstanceOf[RestInputPartition].page)
}

/** Executor-side reader: one HTTP fetch per partition, parsed
  * straight to InternalRow with Spark's JacksonParser. Parse-failure
  * semantics are FAILFAST: a record that cannot coerce to the scan
  * schema aborts the task with the parser's error (there is no
  * null-filled PERMISSIVE row here — FailureSafeParser is not public
  * API; callers wanting lenient parsing read the payload as string
  * and use from_json).
  */
class RestPartitionReader(schema: StructType, conf: RestConf, limit: Option[Int],
                          eqFilters: Map[String, String],
                          sort: Seq[(String, Boolean)],
                          page: Option[Int]) extends PartitionReader[InternalRow] {

  private lazy val rows: Iterator[InternalRow] = {
    val payload = TransportRegistry.get(conf.transportKey)(
      conf.request(page, Some(schema.fieldNames.toSeq), limit, eqFilters, sort))
    val body = conf.root match {
      case Some(r) =>
        // envelope: extract the root array subtree verbatim
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val node = mapper.readTree(payload).get(r)
        if (node == null) "[]" else node.toString
      case None => payload
    }
    val parser = new JacksonParser(schema,
      new JSONOptions(Map.empty[String, String], "UTC", "_corrupt_record"),
      allowArrayAsStructs = true)
    parser.parse[String](body, CreateJacksonParser.string,
      (s: String) => UTF8String.fromString(s)).iterator
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next().copy(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
