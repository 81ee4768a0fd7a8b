package graft

import java.nio.file.{Files, Paths}

import graft.engine.Sessions

/** Benchmark main: times every `SparkEntry.queries` plan at the
  * scale-factor dir in SPARK_GRAFT_SF_DIR and emits ONE JSON metric
  * line. The line is printed to stdout (build.sbt forks `run` with
  * StdoutOutput so no `[info]` logger prefix mangles it) AND written
  * to `bench_last.json` so the number is machine-readable even if a
  * wrapper swallows stdout.
  *
  * Failures are NOT swallowed into a fake timing: a failing query is
  * reported in an `"errors"` object, its stack goes to stderr, and it
  * contributes no time.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus)
    // Untimed warm-up: absorb session/codegen/shuffle-service startup
    // (~4 s) so the first measured query isn't penalized by position.
    try {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").agg(sum("l_quantity")).count()
    } catch { case _: Throwable => () }
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        timings(name) = (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          e.printStackTrace()
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      } finally {
        // outside the timed region: evict operator-pinned caches so
        // later queries aren't measured under earlier queries' memory
        spark.catalog.clearCache()
      }
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    // Millisecond precision keeps the line short: the round-3 driver
    // record lost its JSON tail to output truncation ("parsed": null);
    // a compact line printed last, after a flush-forcing blank line,
    // survives tail-capture. bench_last.json is the durable copy.
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = timings.map { case (k, v) => s"${jstr(k)}:${num(v)}" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = timings.values.sum
    val line =
      s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$qs,"errors":$es,"sf":${jstr(sfDir)}}"""
    Files.writeString(Paths.get("bench_last.json"), line + "\n")
    System.out.println()
    System.out.println(line)
    System.out.flush()
    spark.stop()
    if (errors.nonEmpty) sys.exit(2)
  }
}
