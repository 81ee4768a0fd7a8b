package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (sbt forks one JVM
  * for Test; per-suite sessions would pay session startup dozens of
  * times and fight over the Derby lock).
  */
object TestSpark {
  lazy val spark: SparkSession = graft.engine.Sessions.local("4")
}
