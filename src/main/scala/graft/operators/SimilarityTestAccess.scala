package graft.operators

import org.apache.spark.sql.Column

/** Test-only bridge to `private[operators]` members exercised by
  * cross-package properties (the specs live in package `graft`).
  */
object SimilarityTestAccess {
  def pqEncode(vec: Column, cb: Array[Array[Array[Long]]]): Column =
    Similarity.pqEncode(vec, cb)
}
