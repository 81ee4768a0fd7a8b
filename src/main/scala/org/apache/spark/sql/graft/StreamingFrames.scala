package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame

/** The one Spark-internal call a V1 streaming `Source` needs:
  * `getBatch` must return a DataFrame whose logical plan carries the
  * STREAMING flag (`MicroBatchExecution` asserts `isStreaming` on
  * every V1 batch plan), and the only constructor of that flag is
  * `SparkSession.internalCreateDataFrame(..., isStreaming = true)`,
  * which is `private[sql]`. This shim lives in an
  * `org.apache.spark.sql` subpackage purely to cross that access
  * boundary — the same package convention Delta Lake's `DeltaSource`
  * uses (`org.apache.spark.sql.delta`). Nothing else in this repo
  * reaches into Spark internals.
  */
object StreamingFrames {

  /** `df`'s rows as a streaming-flagged frame with the same schema.
    * Lazy: `queryExecution.toRdd` plans the physical scan now but
    * executes only when the micro-batch runs — no driver-side
    * materialization.
    */
  def asStreaming(df: DataFrame): DataFrame = {
    val session = df.sparkSession match {
      case s: org.apache.spark.sql.classic.SparkSession => s
      case s => throw new IllegalStateException(
        s"streaming bridge needs a classic SparkSession, got ${s.getClass}")
    }
    session.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
