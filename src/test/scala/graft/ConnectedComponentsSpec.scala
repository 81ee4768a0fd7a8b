package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Min-label propagation must converge to the true components for
  * shapes that stress it differently: a long chain (needs ~diameter
  * rounds), a clique (one round), singletons (no rounds), and a
  * labeling-order trap where the smallest id sits at a chain's end.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(nodes: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, (Long, Long, Boolean)] =
    Dedup.connectedComponents(
      nodes.toDF("id"), "id",
      pairs.toDF("a", "b"), "a", "b")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap

  test("chain, clique, and singleton all label to the component min id") {
    val nodes = (0L to 9L)
    // chain 0-1-2-3, clique {5,6,7}, edge 8-9, node 4 isolated
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L),
      (5L, 6L), (6L, 7L), (5L, 7L), (8L, 9L))
    val got = run(nodes, pairs)
    assert(Seq(0L, 1L, 2L, 3L).forall(got(_)._1 == 0L))
    assert(Seq(5L, 6L, 7L).forall(got(_)._1 == 5L))
    assert(Seq(8L, 9L).forall(got(_)._1 == 8L))
    assert(got(4L) == ((4L, 1L, true)))
    assert(got(0L)._2 == 4L && got(3L)._2 == 4L) // chain size
    assert(got(5L)._3 && !got(6L)._3) // canonical flags
  }

  test("long chain with the min id at the FAR end still converges") {
    // 20 <- 19 <- ... <- 1 <- 0, written so propagation must walk the
    // whole diameter; min id 0 is at one extreme
    val nodes = (0L to 20L)
    val pairs = (0L until 20L).map(i => (i + 1, i))
    val got = run(nodes, pairs)
    assert(nodes.forall(got(_)._1 == 0L))
    assert(got(0L)._2 == 21L)
  }

  test("matches a union-find reference on deterministic pseudo-random graphs") {
    def unionFind(n: Int, pairs: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // path-compress to final minima
      (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    }
    for (seed <- 1 to 5) {
      val n = 40
      val pairs = (0 until 50).map { i =>
        val a = (i * 17 + seed * 31) % n
        val b = (i * i * 13 + seed * 7) % n
        (math.min(a, b).toLong, math.max(a, b).toLong)
      }.filter(p => p._1 != p._2).distinct
      val want = unionFind(n, pairs)
      val got = run((0L until n.toLong), pairs).map { case (id, (c, _, _)) => id -> c }
      assert(got == want, s"seed=$seed mismatch")
      // the driver-local fast path and the distributed star loop must
      // produce the identical labeling (both are pure functions of
      // the edge set); localEdgeMax = 0 forces the loop
      val gotLoop = Dedup.connectedComponents(
          (0L until n.toLong).toDF("id"), "id",
          pairs.toDF("a", "b"), "a", "b", localEdgeMax = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotLoop == want, s"seed=$seed loop-path mismatch")
    }
  }

  test("adversarial shapes converge within the O(log n) round bound") {
    // maxIters IS the round-count assertion: non-convergence inside it
    // throws, so passing with maxIters = 2*log2(n)+2 pins the
    // large-star/small-star O(log n) claim on the shapes that defeat
    // plain min-label propagation (which needs ~diameter rounds).
    def logBound(n: Long): Int =
      2 * (64 - java.lang.Long.numberOfLeadingZeros(n - 1)) + 2

    // long chain: diameter 512 >> log2(512) = 9 → bound 20 rounds
    val chainN = 512L
    val chain = Dedup.connectedComponents(
        (0L until chainN).toDF("id"), "id",
        (0L until chainN - 1).map(i => (i + 1, i)).toDF("a", "b"), "a", "b",
        maxIters = logBound(chainN), localEdgeMax = 0L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert((0L until chainN).forall(chain(_)._1 == 0L))
    assert(chain(0L)._2 == chainN)

    // single giant component, min id at the wrong end of every edge:
    // a hub at the HIGHEST id fanning out to all others plus a chain
    // through the spokes — one 1000-node component, bound 22 rounds
    val hubN = 1000L
    val hubPairs = (0L until hubN - 1).map(i => (hubN - 1, i)) ++
      (0L until hubN - 2).map(i => (i + 1, i))
    val hub = Dedup.connectedComponents(
        (0L until hubN).toDF("id"), "id",
        hubPairs.toDF("a", "b"), "a", "b",
        maxIters = logBound(hubN), localEdgeMax = 0L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert((0L until hubN).forall(hub(_)._1 == 0L))
    assert(hub(0L)._2 == hubN)
  }

  test("non-convergence inside maxIters fails loudly, not silently") {
    // star contraction halves a chain per round, so a 4000-node chain
    // cannot possibly finish in 1 round
    val nodes = (0L to 4000L).toDF("id")
    val pairs = (0L until 4000L).map(i => (i + 1, i)).toDF("a", "b")
    val err = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(nodes, "id", pairs, "a", "b", maxIters = 1,
        localEdgeMax = 0L).collect()
    }
    assert(err.getMessage.contains("converge"))
  }

  test("reliable checkpointDir path produces the same labeling") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt").toString
    // 600-node chain: enough rounds to cross the every-5-rounds
    // checkpoint cadence, so a real checkpoint file is written and read
    val nodes = (0L to 600L).toDF("id")
    val pairs = (0L until 600L).map(i => (i + 1, i)).toDF("a", "b")
    val got = Dedup.connectedComponents(nodes, "id", pairs, "a", "b",
        maxIters = 40, checkpointDir = Some(dir), localEdgeMax = 0L)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 600L).forall(got(_) == 0L))
  }

  test("incremental fold equals full recompute, including cluster merges") {
    // old graph: two clusters {0,1,2} and {10,11}, singleton 20.
    // delta: new nodes 30,31 with a new↔new pair (30,31) and old↔new
    // pairs (11,31) and (2,31) — so the two OLD clusters must fuse
    // through a path that exists only in the delta, the case a naive
    // "append new assignments" implementation gets wrong
    val oldNodes = Seq(0L, 1L, 2L, 10L, 11L, 20L).toDF("id")
    val oldPairs = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("a", "b")
    val prev = Dedup.connectedComponents(oldNodes, "id", oldPairs, "a", "b")
      .select(col("id"), col("cluster_id"))
    val newNodes = Seq(30L, 31L).toDF("id")
    val delta = Seq((30L, 31L), (11L, 31L), (2L, 31L)).toDF("a", "b")
    val got = Dedup.incrementalClusters(prev, "id", "cluster_id",
        newNodes, delta, "a", "b")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val full = Dedup.connectedComponents(
        oldNodes.unionByName(newNodes), "id",
        oldPairs.unionByName(delta), "a", "b")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.sameElements(full))
    // the fused component {0,1,2,10,11,30,31} labels to the global min 0
    assert(got.filter(_._1 != 20L).forall(_._2 == 0L))
  }
}
