package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One oracle-checkable query: a Spark plan builder plus (when the op
  * is SQL-expressible) the equivalent DuckDB SQL over the same parquet
  * tables. Determinism contract (driver hash-compares): every query
  * ends in ORDER BY over a unique key, column names match the oracle
  * exactly, and no floating-point reduction whose result depends on
  * accumulation order (integral sums, min/max, or decimal-cast sums
  * only).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  def all: Seq[Q] = {
    val qs = ParityQueries.qs ++ AggQueries.qs ++ TextQueries.qs ++
      SimilarityQueries.qs ++ StreamQueries.qs ++ MultimodalQueries.qs ++
      CorpusQueries.qs
    // a duplicate name would silently drop a query from the Map-shaped
    // driver contract — fail loudly instead
    val dups = qs.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    qs
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
