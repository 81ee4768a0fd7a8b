package graft

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Warehouse

/** Model-based randomized law for the `_schema` overlay DDL log: a
  * random sequence of valid ADD / RENAME / DROP / WIDEN operations —
  * interleaved with APPENDS that write the then-current logical shape
  * — must leave the table reading exactly what an in-memory model of
  * the same operations predicts, for every seed. This is the property
  * the per-arm WarehouseAlterSpec tests can't cover: op ORDER
  * composition over mixed file generations (each append freezes one
  * physical generation; the ordered log must map all of them).
  */
class WarehouseAlterModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // the model: ordered columns name -> (type, per-row values by row id)
  private case class Model(
      cols: Vector[(String, DataType)],
      // value of (col, rowId); absent = null
      values: Map[(String, Long), Long],
      retired: Set[String],
      nextCol: Int,
      nextRow: Long)

  test("random ADD/RENAME/DROP/WIDEN + append sequences match the in-memory model (seeds 1..5)") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val path = Files.createTempDirectory(s"graft_altermodel$seed").toString + "/t"
      // base: id BIGINT, c0 INT, dt partition
      Warehouse.create(spark, path,
        Seq((0L, 0, "p")).toDF("id", "c0", "dt"), "dt")
      var m = Model(Vector("c0" -> IntegerType),
        Map(("c0", 0L) -> 0L), Set.empty, nextCol = 1, nextRow = 1L)
      for (step <- 1 to 8) {
        rnd.nextInt(5) match {
          case 0 => // ADD a fresh long OR decimal(10,0) column
            val n = s"c${m.nextCol}"
            val t: DataType =
              if (rnd.nextBoolean()) LongType else DecimalType(10, 0)
            Warehouse.addColumns(spark, path, Seq(n -> t))
            m = m.copy(cols = m.cols :+ (n -> t), nextCol = m.nextCol + 1)
          case 1 if m.cols.nonEmpty => // RENAME a random column
            val (from, t) = m.cols(rnd.nextInt(m.cols.size))
            val to = s"c${m.nextCol}"
            Warehouse.renameColumn(spark, path, from, to)
            m = m.copy(
              cols = m.cols.map { case (c, ct) =>
                if (c == from) (to, ct) else (c, ct) },
              values = m.values.map { case ((c, r), v) =>
                (if (c == from) to else c, r) -> v },
              retired = m.retired + from, nextCol = m.nextCol + 1)
          case 2 if m.cols.size > 1 => // DROP a random column
            val (victim, _) = m.cols(rnd.nextInt(m.cols.size))
            Warehouse.dropColumns(spark, path, Seq(victim))
            m = m.copy(cols = m.cols.filterNot(_._1 == victim),
              values = m.values.filterNot(_._1._1 == victim),
              retired = m.retired + victim)
          case 3 => // WIDEN a random INT (→ LONG) or DECIMAL
            // (→ +4 precision, same scale) column, if any
            val widenableCols = m.cols.filter {
              case (_, IntegerType) => true
              case (_, d: DecimalType) => d.precision + 4 <= 38
              case _ => false
            }
            if (widenableCols.nonEmpty) {
              val (c, t) = widenableCols(rnd.nextInt(widenableCols.size))
              val wider: DataType = t match {
                case IntegerType => LongType
                case d: DecimalType => DecimalType(d.precision + 4, d.scale)
                case other => other
              }
              Warehouse.widenColumnType(spark, path, c, wider)
              m = m.copy(cols = m.cols.map { case (n, ct) =>
                if (n == c) (n, wider) else (n, ct) })
            }
          case _ => // APPEND one row carrying the current logical shape
            val rowId = m.nextRow
            val vals = m.cols.map { case (c, _) => c -> (rowId * 100 + c.drop(1).toLong) }
            val df0 = Seq((rowId, "p")).toDF("id", "dt")
            val df = vals.foldLeft(df0) { case (d, (c, v)) =>
              d.withColumn(c, lit(v).cast(m.cols.find(_._1 == c).get._2))
            }
            Warehouse.append(spark, path, df)
            m = m.copy(values = m.values ++ vals.map { case (c, v) =>
              (c, rowId) -> v }, nextRow = m.nextRow + 1)
        }
      }
      // compare: schema (names + types) and every cell
      val df = Warehouse.read(spark, path)
      val expectedCols = Seq("id") ++ m.cols.map(_._1) :+ "dt"
      assert(df.columns.toSet == expectedCols.toSet,
        s"seed $seed: columns ${df.columns.toSeq} vs $expectedCols")
      m.cols.foreach { case (c, t) =>
        assert(df.schema(c).dataType == t,
          s"seed $seed: $c is ${df.schema(c).dataType}, model says $t")
      }
      val got = df.select((col("id") +: m.cols.map { case (c, _) =>
        col(c).cast("long").as(c) }): _*)
        .collect().map { r =>
          r.getLong(0) -> m.cols.zipWithIndex.map { case ((c, _), i) =>
            c -> (if (r.isNullAt(i + 1)) None else Some(r.getLong(i + 1)))
          }.toMap
        }.toMap
      assert(got.keySet == (0L until m.nextRow).toSet, s"seed $seed: row set")
      for (rowId <- 0L until m.nextRow; (c, _) <- m.cols) {
        val want = m.values.get((c, rowId))
        assert(got(rowId)(c) == want,
          s"seed $seed: cell ($c, row $rowId) = ${got(rowId)(c)}, model says $want")
      }
    }
  }
}
