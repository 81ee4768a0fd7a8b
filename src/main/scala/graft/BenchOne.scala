package graft

import graft.engine.Sessions

/** Local-iteration timing harness: run named Registry queries
  * repeatedly in one session and print per-rep seconds, so one-time
  * costs (memoized index builds, JIT) separate from per-call costs
  * (plan compilation, execution). Not part of the driver contract —
  * `graft.Bench` is the graded surface.
  *
  * Usage: runMain graft.BenchOne <sfDir> <name,name,...> <reps>
  *          [conf=val,conf=val]   (session conf overrides — e.g. the
  *                                 runtime-pruning crossover modes)
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val (sfDir, names, reps) = (args(0), args(1).split(","), args(2).toInt)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    if (args.length > 3) args(3).split(",").filter(_.nonEmpty).foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    }
    for (r <- 0 until reps; n <- names.toSeq) {
      val t0 = System.nanoTime()
      graft.queries.Registry.queries(n)(spark, sfDir).count()
      println(f"[benchone] rep=$r $n%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
