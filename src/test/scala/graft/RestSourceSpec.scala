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

  /** Cursor endpoint: 3 pages × 2 rows addressed by start/length,
    * then empty pages forever — the server never reports a total.
    */
  object CursorTransport extends Transport {
    def apply(req: RestRequest): String = {
      requests.add(req)
      val start = req.params.getOrElse("start", "0").toInt
      val len = req.params.getOrElse("length", "2").toInt
      val rows = (start until math.min(start + len, 6)).map { id =>
        s"""{"id": $id, "name": "user$id"}"""
      }
      rows.mkString("[", ",", "]")
    }
  }

  /** Same cursor, wrapped in a {"total": …, "data": [...]} envelope. */
  object CursorEnvelopeTransport extends Transport {
    def apply(req: RestRequest): String =
      s"""{"total": 6, "data": ${CursorTransport(req)}}"""
  }

  /** Honors the datatable ordering vocabulary + length: sorts its 6
    * rows by the requested column/direction, then caps — the server
    * side of the TopN pushdown contract (the pushed top-n decides
    * WHICH rows ship; Spark re-sorts them exactly).
    */
  object OrderedTransport extends Transport {
    def apply(req: RestRequest): String = {
      requests.add(req)
      val all = Seq(0, 3, 1, 5, 2, 4) // deliberately unsorted by id
      val sorted = (req.params.get("columns[0][data]"), req.params.get("order[0][dir]")) match {
        case (Some(c), dir) =>
          val key: Int => Int = c match {
            case "id"    => identity
            case "score" => _ * 10
            case other   => sys.error(s"unknown sort column $other")
          }
          if (dir.contains("desc")) all.sortBy(key).reverse else all.sortBy(key)
        case _ => all
      }
      val capped = req.params.get("length").map(_.toInt).fold(sorted)(sorted.take)
      capped.map(i => s"""{"id": $i, "name": "user$i", "score": ${i * 10}}""")
        .mkString("[", ",", "]")
    }
  }

  TransportRegistry.register("paged", PagedTransport)
  TransportRegistry.register("envelope", EnvelopeTransport)
  TransportRegistry.register("ordered", OrderedTransport)
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

  private def orderedReader = {
    RestSourceFixture.requests.clear()
    spark.read.format("graft-rest")
      .option("url", "https://api.test/ordered")
      .option("transport", "ordered")
      .schema("id LONG, name STRING, score LONG")
  }

  test("ORDER BY + LIMIT collapses into the request as a pushed TopN") {
    val df = orderedReader.load().orderBy(col("score").desc).limit(3)
    // plan carries the pushed sort spec + limit
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushedTopN=score DESC") && plan.contains("limit=Some(3)"),
      s"TopN not pushed:\n$plan")
    // only 3 rows crossed the wire, and they are the right 3
    assert(df.select("id").as[Long].collect().toSeq == Seq(5L, 4L, 3L))
    // the request itself asked the server to sort desc and cap at 3
    val reqs = RestSourceFixture.requests.asScala.toSeq
    assert(reqs.nonEmpty && reqs.forall { r =>
      r.params.get("columns[0][data]").contains("score") &&
        r.params.get("order[0][dir]").contains("desc") &&
        r.params.get("length").contains("3")
    }, s"order params missing: ${reqs.map(_.params)}")
  }

  test("TopN on a computed key is refused — nothing pushed, result still exact") {
    val df = orderedReader.load().orderBy((col("score") % 7).desc, col("id")).limit(2)
    val reqs = { df.collect(); RestSourceFixture.requests.asScala.toSeq }
    assert(reqs.nonEmpty && reqs.forall(r => !r.params.contains("order[0][dir]")),
      "computed sort key must not reach the server")
    // score % 7 per id 0..5 = 0,3,6,2,5,1 → desc top-2 = ids 2, 4
    assert(df.select("id").as[Long].collect().toSeq == Seq(2L, 4L))
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

  test("cursor paging fetches until the first empty page, no further") {
    RestSourceFixture.requests.clear()
    val df = graft.io.Sources.restScanPaged(spark, RestSourceFixture.CursorTransport,
      RestRequest("https://api.test/cursor"), pageSize = 2)
    assert(df.select("id").as[Long].collect().sorted.toSeq == (0L to 5L))
    val reqs = RestSourceFixture.requests.asScala.toSeq
    // 3 full pages + exactly one empty probe
    assert(reqs.map(_.params("start")) == Seq("0", "2", "4", "6"))
  }

  test("cursor paging unwraps an envelope root and stops on its empty array") {
    RestSourceFixture.requests.clear()
    val df = graft.io.Sources.restScanPaged(spark,
      RestSourceFixture.CursorEnvelopeTransport,
      RestRequest("https://api.test/cursor"), pageSize = 4, root = Some("data"))
    assert(df.select("id").as[Long].collect().sorted.toSeq == (0L to 5L))
    assert(RestSourceFixture.requests.size == 3) // 4 + 2 rows, then empty
  }

  test("cursor paging on an immediately-empty endpoint yields an empty frame") {
    val empty = graft.io.Sources.restScanPaged(spark,
      new Transport { def apply(r: RestRequest) = "[]" },
      RestRequest("https://api.test/none"), pageSize = 2)
    assert(empty.columns.isEmpty && empty.count() == 0)
  }

  test("known-total paging fans pages out and matches the cursor result") {
    RestSourceFixture.requests.clear()
    val (df, failed) = graft.io.Sources.restScanPagedParallel(spark,
      RestSourceFixture.CursorTransport,
      RestRequest("https://api.test/cursor"), pageSize = 2, totalRows = 6)
    assert(df.select("id").as[Long].collect().sorted.toSeq == (0L to 5L))
    assert(failed.value.isEmpty)
    // exactly the 3 page windows, no empty probe needed
    val starts = RestSourceFixture.requests.asScala.map(_.params("start")).toSeq.sorted
    assert(starts == Seq("0", "2", "4"))
  }

  test("pageIsEmpty handles bare arrays, envelopes, and junk") {
    import graft.io.Sources.pageIsEmpty
    assert(pageIsEmpty("[]", None))
    assert(pageIsEmpty("  [ \n ]  ", None))
    assert(!pageIsEmpty("""[{"a": 1}]""", None))
    assert(pageIsEmpty("""{"data": []}""", Some("data")))
    assert(pageIsEmpty("""{"total": 6, "data": [ ]}""", Some("data")))
    assert(!pageIsEmpty("""{"data": [{"a": 1}]}""", Some("data")))
    assert(pageIsEmpty("""{"other": [1]}""", Some("data"))) // missing root → stop
    assert(pageIsEmpty("not json at all", None)) // no array → stop
    // the key must be followed by ':' then '[' — a string VALUE or
    // scalar field named like the root never matches
    assert(pageIsEmpty("""{"title": "data", "data": []}""", Some("data")))
    assert(!pageIsEmpty("""{"count": 3, "data" : [ {"a": 1} ]}""", Some("data")))
    assert(pageIsEmpty("""{"data": 3, "rows": [1]}""", Some("data"))) // non-array root → stop
  }
}
