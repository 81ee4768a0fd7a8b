package graft

/** Plan-audit main: prints `explain("formatted")` for the named
  * queries (all batch queries when none named) so scan pruning
  * (`ReadSchema`/`PushedFilters`), join strategies, and
  * whole-stage-codegen spans can be reviewed per round.
  *
  * Usage: runMain graft.Explain <sfDir> [namePrefix,...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val only: Option[Seq[String]] =
      if (args.length > 1) Some(args(1).split(",").toSeq) else None
    val spark = graft.engine.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) =>
        !name.startsWith("st") && only.forall(_.exists(name.startsWith))
      }
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"[explain] failed: ${e.getMessage}") }
      }
    spark.stop()
  }
}
