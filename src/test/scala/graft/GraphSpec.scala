package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** Pins [[Graph.pageRank]]'s integral algebra against HAND-COMPUTED
  * scores on a tiny graph — independent of the g30 oracle, which
  * replays the same dataflow in SQL and so cannot catch a shared
  * misunderstanding of the recurrence itself.
  */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pageRank matches the hand-computed integral recurrence on a star") {
    // undirected star c—p2, c—p3 (node 1 = hub, degree 2; nodes 2, 3
    // leaves, degree 1). By hand, scores in e6 units, damping 850000:
    //   s0: all 1_000_000
    //   iter1: hub ← 2 leaf contribs of 1_000_000:
    //            150000 + (2_000_000·850000) div 1e6 = 1_850_000
    //          leaf ← hub contrib 1_000_000 div 2 = 500_000:
    //            150000 + (500_000·850000) div 1e6 = 575_000
    //   iter2: hub: 150000 + (1_150_000·850000) div 1e6 = 1_127_500
    //          leaf: 150000 + (925_000·850000) div 1e6 = 936_250
    //   iter3: hub: 150000 + (1_872_500·850000) div 1e6 = 1_741_625
    //          leaf: 150000 + (563_750·850000) div 1e6 = 629_187
    //            (floor of 479_187.5 — the div truncation the float
    //             formulation would round differently)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    def run(iters: Int): Map[Long, Long] =
      Graph.pageRank(edges, iters).as[(Long, Long)].collect().toMap
    assert(run(0) == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
    assert(run(1) == Map(1L -> 1850000L, 2L -> 575000L, 3L -> 575000L))
    assert(run(3) == Map(1L -> 1741625L, 2L -> 629187L, 3L -> 629187L))
  }

  test("pageRank conserves total mass up to truncation and teleport") {
    // on a regular graph (a 4-cycle) every node keeps exactly the
    // uniform score at every iteration: contrib = score div 1, one
    // in-edge each, 150000 + score·850000 div 1e6 is a fixpoint at
    // score = 1e6 — the damping normalization check
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val scores = Graph.pageRank(cyc, 3).as[(Long, Long)].collect().toMap
    assert(scores == Map(1L -> 1000000L, 2L -> 1000000L,
      3L -> 1000000L, 4L -> 1000000L))
  }

  test("pageRank keeps pure-source nodes at the teleport term every round") {
    // 1→2, 2→3, 3→2: node 1 has out-edges but NO in-edges. Advisor
    // r11: the pre-fix superstep aggregated by dst only, so node 1
    // dropped out of the score frame after round 1 and its teleport
    // mass stopped feeding node 2 from round 2 on. Hand-computed:
    //   iter1: s1 = 150000 (teleport only)
    //          s2 = 150000 + (1e6+1e6)·0.85        = 1_850_000
    //          s3 = 150000 + 1e6·0.85              = 1_000_000
    //   iter2: s1 = 150000
    //          s2 = 150000 + (150000+1_000_000)·0.85 = 1_127_500
    //          s3 = 150000 + 1_850_000·0.85          = 1_722_500
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val got = Graph.pageRank(edges, 2).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 150000L, 2L -> 1127500L, 3L -> 1722500L))
  }

  test("pageRank includeDangling widens the universe and redistributes") {
    // single edge 1→2 with includeDangling: node 2 (out-degree 0)
    // holds score and its damped mass spreads uniformly (dshare =
    // dtot div 2). Hand-computed:
    //   iter1: dshare = 1e6 div 2 = 500_000
    //          s1 = 150000 + 500_000·0.85           = 575_000
    //          s2 = 150000 + (1e6+500_000)·0.85     = 1_425_000
    //   iter2: dshare = 1_425_000 div 2 = 712_500
    //          s1 = 150000 + 712_500·0.85           = 755_625
    //          s2 = 150000 + (575_000+712_500)·0.85 = 1_244_375
    //          (total 2_000_000 — conserved exactly, no truncation)
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val got = Graph.pageRank(edges, 2, includeDangling = true)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 755625L, 2L -> 1244375L))
    // default mode on the same edge list: universe is src-only {1}
    val noDangling = Graph.pageRank(edges, 2).as[(Long, Long)].collect().toMap
    assert(noDangling == Map(1L -> 150000L))
  }

  test("pageRank shuffled mode and checkpoint cadence reproduce the broadcast scores") {
    // the broadcast-vs-shuffle choice and the barrier cadence are
    // EXECUTION strategy only (r21): broadcastMaxNodes = 0 forces the
    // shuffled contribution join, checkpointEvery = 1 forces the old
    // every-round barrier — both must reproduce the hand-computed
    // star scores bit-for-bit
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val want = Map(1L -> 1741625L, 2L -> 629187L, 3L -> 629187L)
    val shuffled = Graph.pageRank(edges, 3, broadcastMaxNodes = 0L)
      .as[(Long, Long)].collect().toMap
    assert(shuffled == want, s"shuffled mode diverged: $shuffled")
    val eager = Graph.pageRank(edges, 3, checkpointEvery = 1)
      .as[(Long, Long)].collect().toMap
    assert(eager == want, s"every-round barrier diverged: $eager")
  }

  test("triangleCounts: hand-computed K4 + pendant, robust to duplicate/reversed/self-loop input") {
    // K4 on {1,2,3,4} has C(4,3) = 4 triangles, each node in exactly
    // 3; the pendant edge 4–5 and the disconnected path 6–7–8 add
    // none. Input deliberately dirty: both orientations of (1,2),
    // a duplicate (3,4), and a self-loop (2,2).
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 3L), (4L, 5L), (6L, 7L), (7L, 8L), (2L, 2L))
      .toDF("a", "b")
    val got = Graph.triangleCounts(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"got $got")
    // triangle-free graph: EMPTY output, not zero rows per node
    val path = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    assert(Graph.triangleCounts(path).count() == 0)
    // the SHUFFLED fallback (what auto mode picks past
    // broadcastMaxEdges) computes the identical counts — same algebra,
    // different exchange strategy; auto with a tiny threshold must
    // route there too
    val shuffled = Graph.triangleCounts(edges, broadcastAdj = Some(false))
      .as[(Long, Long)].collect().toMap
    assert(shuffled == got, s"shuffled mode diverged: $shuffled")
    val auto = Graph.triangleCounts(edges, broadcastMaxEdges = 2L)
      .as[(Long, Long)].collect().toMap
    assert(auto == got, s"auto-shuffled mode diverged: $auto")
    // assumeCanonical on an ALREADY-canonical pair list (distinct,
    // a < b, no self-loops) must reproduce the default path exactly —
    // the flag only skips the canonicalization machinery
    val canonical = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (6L, 7L), (7L, 8L)).toDF("a", "b")
    val pre = Graph.triangleCounts(canonical, assumeCanonical = true)
      .as[(Long, Long)].collect().toMap
    assert(pre == got, s"assumeCanonical diverged: $pre")
  }
}
