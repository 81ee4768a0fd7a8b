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
    // NonFatal only, and loudly: a swallowed OOM or a mispointed
    // SPARK_GRAFT_SF_DIR would otherwise silently skip the warm-up and
    // skew the first measured query — the exact bias it exists to cut.
    try {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").agg(sum("l_quantity")).count()
      // Streaming machinery warms separately from batch: the first
      // streaming query of a session pays ~5 s of one-time cost
      // (micro-batch engine classes, state-store infrastructure,
      // checkpoint codepaths) that every later drain skips. Drain a
      // tiny stateful query over the smallest table so that cost
      // lands here, not on whichever st row runs first.
      graft.streaming.Streaming.runAvailableNow(
          spark, s"$sfDir/region.parquet", "complete")(
          _.groupBy("r_regionkey").agg(count(lit(1)).as("n"))).count()
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] WARM-UP FAILED (timings may skew): $e")
    }
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
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = timings.map { case (k, v) => s"${jstr(k)}:${num(v)}" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = timings.values.sum
    val line =
      s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$qs,"errors":$es,"sf":${jstr(sfDir)}}"""
    Files.writeString(Paths.get("bench_last.json"), line + "\n")
    // The driver keeps only the LAST bytes of stdout: the full
    // per-query line is ~2 KB and rounds 3-4 lost its front to tail
    // truncation ("parsed": null). Print the detail first (for humans
    // and logs), then a <60-byte total-only line LAST — that one
    // survives any tail capture; bench_last.json holds the full record.
    System.out.println()
    System.out.println(line)
    System.out.println(
      s"""{"metric":"total","value":${num(total)},"unit":"sec"}""")
    System.out.flush()
    spark.stop()
    if (errors.nonEmpty) sys.exit(2)
  }
}
