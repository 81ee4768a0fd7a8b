package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.Relational
import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The query catalog lives in [[graft.queries.Registry]]; this object
  * only adapts it to the driver's shape.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Composes the reference's E1 analytical core (SURVEY.md §3) over the
    * testdata: union-by-name → clean → multi-key left join → surrogate
    * key → date-window filter → scalar arithmetic.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, d)
    val o  = Tables.orders(spark, d)
    val slices = Seq(
      li.filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
      li.filter(col("l_returnflag") =!= "R")
        .select("l_orderkey", "l_linenumber", "l_quantity"))
    Relational.unionByName(slices)
      .join(o.select("o_orderkey", "o_orderdate", "o_totalprice"),
        col("l_orderkey") === col("o_orderkey"), "left")
      .withColumn("sk", Relational.surrogateKey(
        col("l_orderkey"), col("l_linenumber"), to_date(col("o_orderdate"))))
      .filter(col("l_quantity") > 0)
      .withColumn("price_scaled", coalesce(col("l_extendedprice"), lit(0.0)) / 100)
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ scale
    * extensions). Names and column aliases match [[oracleSql]].
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
