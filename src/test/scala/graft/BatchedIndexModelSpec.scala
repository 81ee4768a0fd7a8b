package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.io.BatchedIndex

/** Model-based check of the manifest protocol: drive a seeded random
  * sequence of {append, overwrite-rebuild, failed append, scrub}
  * against one index and assert after EVERY step that the committed
  * manifest and the readable rows equal a trivial in-memory model —
  * the whole-batch-or-nothing and atomic-generation-switch guarantees
  * hold under any interleaving, not just the hand-picked spec
  * scenarios.
  */
class BatchedIndexModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def payload(v: Long): DataFrame = Seq(v).toDF("v")

  test("random fold/fail/overwrite/scrub sequences keep the manifest equal to the model") {
    val rnd = new scala.util.Random(42)
    val path = java.nio.file.Files.createTempDirectory("graft_bim_spec").toString
    var model = Vector.empty[Long] // payload values a reader must see
    var next = 0L
    var steps = List.empty[String]
    for (_ <- 0 until 16) {
      rnd.nextInt(4) match {
        case 0 =>
          BatchedIndex.fold(spark, path, Seq("p" -> payload(next)), overwrite = false)
          model :+= next; steps ::= s"append($next)"; next += 1
        case 1 =>
          BatchedIndex.fold(spark, path, Seq("p" -> payload(next)), overwrite = true)
          model = Vector(next); steps ::= s"overwrite($next)"; next += 1
        case 2 =>
          BatchedIndex.afterPartWrite.withValue((p, _) =>
            if (p == path) throw new RuntimeException("injected death")) {
            intercept[RuntimeException] {
              BatchedIndex.fold(spark, path, Seq("p" -> payload(next)), overwrite = false)
            }
          }
          steps ::= s"failedAppend($next)"; next += 1
        case 3 =>
          BatchedIndex.scrub(spark, path); steps ::= "scrub"
      }
      val trace = steps.reverse.mkString(" -> ")
      assert(BatchedIndex.committed(spark, path).size == model.size,
        s"manifest size diverged from model after: $trace")
      if (model.nonEmpty) {
        val vals = BatchedIndex.read(spark, path, "p")
          .as[Long].collect().toVector.sorted
        assert(vals == model.sorted, s"readable rows diverged after: $trace")
      }
    }
  }
}
