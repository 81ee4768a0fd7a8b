package graft

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Warehouse

/** Model-based randomized law for the SQL MERGE statement plane: a
  * random statement — matched UPDATE/DELETE arms with source-only OR
  * pair-level conditions AND source-only OR target-referencing
  * values, multiple conditional NOT MATCHED INSERT arms, NOT MATCHED
  * BY SOURCE arms, an optional residual ON conjunct — applied twice
  * in sequence must leave the table exactly where an in-memory model
  * of SQL MERGE semantics says, for every seed. This is the property
  * the per-arm WarehouseDmlSpec tests can't cover: CLAUSE
  * COMPOSITION — residual-failing pairs falling through to BOTH the
  * insert and BY SOURCE sides of the same statement, first-applicable
  * ordering interacting across arm kinds, NULL three-valued logic
  * threading through conditions and arithmetic at once. A statement
  * whose model outcome is the EMPTY table must instead refuse with
  * [[graft.io.EmptyBatchException]] (the anti-brick guard), and the
  * table must be unchanged.
  */
class WarehouseMergeModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private case class R(id: Long, a: Long, b: Option[Long], dt: String)
  private case class S(id: Long, delta: Long, nb: Option[Long], dt: String)

  // ---- clause pools: each entry renders to SQL and evaluates on the
  // model (SQL boolean semantics: NULL counts as not-applicable) ----

  private case class MCond(sql: String, eval: (R, S) => Boolean)
  private val matchedConds: Seq[Option[MCond]] = Seq(
    None,
    Some(MCond("s.delta > 2", (_, s) => s.delta > 2)),
    Some(MCond("t.a > s.delta", (t, s) => t.a > s.delta)),
    Some(MCond("s.nb IS NOT NULL", (_, s) => s.nb.isDefined)))

  private case class MAct(sql: String, eval: (R, S) => Option[R])
  private val matchedActs: Seq[MAct] = Seq(
    MAct("UPDATE SET a = t.a + s.delta",
      (t, s) => Some(t.copy(a = t.a + s.delta))),
    MAct("UPDATE SET a = s.delta, b = s.nb",
      (t, s) => Some(t.copy(a = s.delta, b = s.nb))),
    MAct("UPDATE SET b = t.b + s.delta",
      (t, s) => Some(t.copy(b = t.b.map(_ + s.delta)))),
    MAct("DELETE", (_, _) => None))

  private case class ICond(sql: String, eval: S => Boolean)
  private val insertConds: Seq[Option[ICond]] = Seq(
    None,
    Some(ICond("s.delta % 2 = 0", s => s.delta % 2 == 0)),
    Some(ICond("s.nb IS NULL", s => s.nb.isEmpty)))

  private case class IAct(sql: String, eval: S => R)
  private val insertActs: Seq[IAct] = Seq(
    IAct("INSERT (id, a, dt) VALUES (s.id, s.delta, s.dt)",
      s => R(s.id, s.delta, None, s.dt)),
    IAct("INSERT (id, a, b, dt) VALUES (s.id, 0, s.nb, s.dt)",
      s => R(s.id, 0L, s.nb, s.dt)))

  private case class BCond(sql: String, eval: R => Boolean)
  private val bySourceConds: Seq[Option[BCond]] = Seq(
    None, Some(BCond("t.a > 5", _.a > 5)))

  private case class BAct(sql: String, eval: R => Option[R])
  private val bySourceActs: Seq[BAct] = Seq(
    BAct("DELETE", _ => None),
    BAct("UPDATE SET b = -1", t => Some(t.copy(b = Some(-1L)))))

  private def valuesSql(src: Seq[S]): String =
    src.map { s =>
      val nb = s.nb.map(v => s"CAST($v AS BIGINT)").getOrElse("CAST(NULL AS BIGINT)")
      s"(CAST(${s.id} AS BIGINT), CAST(${s.delta} AS BIGINT), $nb, '${s.dt}')"
    }.mkString(",\n  ")

  test("random MERGE statements (all clause kinds composed) match the in-memory SQL-semantics model (seeds 1..10)") {
    for (seed <- 1 to 10) {
      val rnd = new Random(seed)
      val path = Files.createTempDirectory(s"graft_mergemodel$seed").toString + "/t"
      var model: Vector[R] = (0L to 7L).map { id =>
        R(id, rnd.nextInt(10).toLong,
          if (rnd.nextBoolean()) Some(rnd.nextInt(10).toLong) else None,
          s"p${id % 2}")
      }.toVector
      Warehouse.create(spark, path,
        model.map(r => (r.id, r.a, r.b, r.dt)).toDF("id", "a", "b", "dt"),
        "dt")

      for (round <- 1 to 2) {
        // source: a random subset of live ids (carrying their own
        // partition — the mergeInto contract) plus fresh negative ids
        val liveIds = model.map(r => r.id -> r.dt).distinct
        val picked = rnd.shuffle(liveIds).take(rnd.nextInt(liveIds.size + 1))
        val fresh = (1 to rnd.nextInt(3)).map { i =>
          val id = -(round * 10L + i)
          id -> s"p${rnd.nextInt(2)}"
        }
        val src = (picked ++ fresh).map { case (id, dt) =>
          S(id, rnd.nextInt(9).toLong - 3L,
            if (rnd.nextBoolean()) Some(rnd.nextInt(5).toLong) else None, dt)
        }
        if (src.nonEmpty) {
          val residual = rnd.nextBoolean()
          val on = "t.id = s.id" + (if (residual) " AND t.a >= s.delta" else "")
          // the parser requires every NON-LAST clause of a kind to
          // carry a condition — force one onto non-last arms
          def armed[C, A](n: Int, conds: Seq[Option[C]], acts: Seq[A]):
              Seq[(Option[C], A)] = {
            val arms = (1 to n).map { _ =>
              (conds(rnd.nextInt(conds.size)), acts(rnd.nextInt(acts.size)))
            }
            val defined: IndexedSeq[C] = conds.flatten.toIndexedSeq
            arms.zipWithIndex.map { case ((c, a), i) =>
              if (i < arms.size - 1 && c.isEmpty)
                (Some(defined(rnd.nextInt(defined.size))), a)
              else (c, a)
            }
          }
          val mArms = armed(rnd.nextInt(3), matchedConds, matchedActs)
          val iArms = armed(rnd.nextInt(3), insertConds, insertActs)
          val bArms = armed(rnd.nextInt(2), bySourceConds, bySourceActs)
          if (mArms.nonEmpty || iArms.nonEmpty || bArms.nonEmpty) {
            val stmt =
              s"""MERGE INTO graft.`$path` t
                 |USING (SELECT * FROM VALUES
                 |  ${valuesSql(src)}
                 |  AS s(id, delta, nb, dt)) s
                 |ON $on
                 |""".stripMargin +
                mArms.map { case (c, a) =>
                  s"WHEN MATCHED${c.fold("")(x => s" AND ${x.sql}")} THEN ${a.sql}"
                }.mkString("\n") + "\n" +
                iArms.map { case (c, a) =>
                  s"WHEN NOT MATCHED${c.fold("")(x => s" AND ${x.sql}")} THEN ${a.sql}"
                }.mkString("\n") + "\n" +
                bArms.map { case (c, a) =>
                  s"WHEN NOT MATCHED BY SOURCE${c.fold("")(x => s" AND ${x.sql}")} THEN ${a.sql}"
                }.mkString("\n")

            // ---- the model: SQL MERGE semantics over `model` ----
            val srcById = src.map(s => s.id -> s).toMap
            def matches(t: R, s: S) = !residual || t.a >= s.delta
            val afterTarget = model.flatMap { t =>
              srcById.get(t.id).filter(matches(t, _)) match {
                case Some(s) =>
                  mArms.find { case (c, _) => c.forall(_.eval(t, s)) } match {
                    case Some((_, act)) => act.eval(t, s)
                    case None           => Some(t) // no arm: row survives
                  }
                case None =>
                  bArms.find { case (c, _) => c.forall(_.eval(t)) } match {
                    case Some((_, act)) => act.eval(t)
                    case None           => Some(t)
                  }
              }
            }
            val inserted = src.filter(s =>
                !model.exists(t => t.id == s.id && matches(t, s)))
              .flatMap { s =>
                iArms.find { case (c, _) => c.forall(_.eval(s)) }
                  .map { case (_, act) => act.eval(s) }
              }
            val predicted = afterTarget ++ inserted

            if (predicted.isEmpty) {
              // the anti-brick guard: a statement that would empty the
              // table refuses and changes nothing
              intercept[graft.io.EmptyBatchException] { spark.sql(stmt) }
            } else {
              spark.sql(stmt)
              model = predicted.toVector
              val got = Warehouse.read(spark, path)
                .select("id", "a", "b", "dt")
                .collect().map(r => R(r.getLong(0), r.getLong(1),
                  if (r.isNullAt(2)) None else Some(r.getLong(2)),
                  r.getString(3))).toVector
              assert(got.sortBy(r => (r.id, r.a, r.b.getOrElse(Long.MinValue), r.dt)) ==
                model.sortBy(r => (r.id, r.a, r.b.getOrElse(Long.MinValue), r.dt)),
                s"seed=$seed round=$round diverged\nstatement:\n$stmt\n" +
                  s"got:      ${got.sortBy(_.id)}\n" +
                  s"expected: ${model.sortBy(_.id)}")
            }
          }
        }
      }
    }
  }
}
