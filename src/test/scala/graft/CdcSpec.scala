package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cdc

/** Example-based CDC coverage: probe column naming (J2), empty
  * snapshot, and the updates payload carrying the incoming (not
  * snapshot) values.
  */
class CdcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("probe left-joins the snapshot version under a suffixed name (J2, SER:215)") {
    val incoming = Seq((1L, 5, "a"), (2L, 7, "b")).toDF("id", "v", "payload")
    val snapshot = Seq((1L, 3)).toDF("id", "v")
    val probed = Cdc.probe(incoming, snapshot, "id", "v")
    assert(probed.columns.toSeq == Seq("id", "v", "payload", "v_existing"))
    val rows = probed.orderBy("id").collect()
    assert(rows(0).getInt(3) == 3)
    assert(rows(1).isNullAt(3))
  }

  test("empty snapshot routes every incoming row to inserts (J3)") {
    val incoming = Seq((1L, 5), (2L, 7)).toDF("id", "v")
    val snapshot = Seq.empty[(Long, Int)].toDF("id", "v")
    val split = Cdc.mergeSplit(incoming, snapshot, "id", "v")
    assert(split.inserts.count() == 2)
    assert(split.updates.count() == 0)
    assert(split.unchanged.count() == 0)
  }

  test("updates carry the incoming payload, not the snapshot's (J3b)") {
    val incoming = Seq((1L, 9, "new")).toDF("id", "v", "payload")
    val snapshot = Seq((1L, 2)).toDF("id", "v")
    val split = Cdc.mergeSplit(incoming, snapshot, "id", "v")
    val row = split.updates.collect().head
    assert(row.getInt(1) == 9 && row.getString(2) == "new")
    assert(split.updates.columns.toSeq == incoming.columns.toSeq)
  }
}
