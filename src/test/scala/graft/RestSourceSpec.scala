package graft

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Sources.{RestRequest, Transport}
import graft.sources.rest.TransportRegistry

/** Request log + paged fixture transport for the DSv2 connector tests
  * (top-level so nothing ScalaTest-side is captured in closures).
  */
object RestSourceFixture {
  val requests = new ConcurrentLinkedQueue[RestRequest]()

  /** 3 pages × 2 users each; honors the pushed limit param. */
  object PagedTransport extends Transport {
    def apply(req: RestRequest): String = {
      requests.add(req)
      val page = req.params.getOrElse("page", "0").toInt
      val rows = (0 until 2).map { i =>
        val id = page * 2 + i
        s"""{"id": $id, "name": "user$id", "score": ${id * 10}, "extra": "x"}"""
      }
      val limited = req.params.get("length").map(_.toInt) match {
        case Some(n) => rows.take(n)
        case None    => rows
      }
      limited.mkString("[", ",", "]")
    }
  }

  /** Envelope form: {"data": [...]} */
  object EnvelopeTransport extends Transport {
    def apply(req: RestRequest): String = {
      requests.add(req)
      """{"data": [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]}"""
    }
  }

  TransportRegistry.register("paged", PagedTransport)
  TransportRegistry.register("envelope", EnvelopeTransport)
}

class RestSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pagedReader = {
    RestSourceFixture.requests.clear()
    spark.read.format("graft-rest")
      .option("url", "https://api.test/users")
      .option("transport", "paged")
      .option("pages", 3)
  }

  test("paged scan plans one partition per page and unions all rows") {
    val df = pagedReader.load()
    assert(df.rdd.getNumPartitions == 3)
    assert(df.select("id").as[Long].collect().sorted.toSeq == (0L to 5L))
  }

  test("column pruning reaches the reader schema AND the server request") {
    RestSourceFixture.requests.clear()
    val df = pagedReader.option("fieldsParam", "fields").load().select("id", "score")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("fields=id,score"), s"scan not pruned:\n$plan")
    assert(df.as[(Long, Long)].collect().sorted.toSeq ==
      (0L to 5L).map(i => (i, i * 10)))
    // every page request carried the pruned column list
    val reqs = RestSourceFixture.requests.asScala.filter(_.params.contains("page"))
    assert(reqs.nonEmpty && reqs.forall(_.params("fields") == "id,score"))
  }

  test("LIMIT is pushed to the server and re-applied exactly by Spark") {
    RestSourceFixture.requests.clear()
    val df = pagedReader.load().limit(3)
    assert(df.count() == 3)
    val reqs = RestSourceFixture.requests.asScala.filter(_.params.contains("page"))
    // each page fetch was capped server-side by the pushed limit
    assert(reqs.nonEmpty && reqs.forall(_.params("length") == "3"))
  }

  test("equality filters push to the server as params AND are re-applied by Spark") {
    RestSourceFixture.requests.clear()
    // the paged transport does NOT honor the filter param — Spark's
    // re-application must still produce the correct result
    val df = pagedReader.load().filter(col("id") === 3L)
    assert(df.select("id").as[Long].collect().toSeq == Seq(3L))
    val reqs = RestSourceFixture.requests.asScala.filter(_.params.contains("page"))
    assert(reqs.nonEmpty && reqs.forall(_.params.get("id").contains("3")))
  }

  test("envelope root option unwraps the payload array") {
    val df = spark.read.format("graft-rest")
      .option("url", "https://api.test/wrapped")
      .option("transport", "envelope")
      .option("root", "data")
      .load()
    assert(df.orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
  }

  test("count(*) projection still yields one row per element") {
    assert(pagedReader.load().count() == 6)
  }
}
