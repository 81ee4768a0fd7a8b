package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms as plain joins + aggregations — the
  * Pregel superstep shape (join scores to edges, aggregate
  * contributions by destination) with Catalyst planning every round.
  * Companion to [[Dedup.connectedComponents]]'s RDD loop: here the
  * per-round state is a (node, score) FRAME, so each superstep stays
  * inside the declarative planner.
  */
object Graph {

  /** PageRank over a directed edge list, `iters` unrolled supersteps,
    * EXACT integral arithmetic: scores in e6 units, per-edge
    * contribution = score div out-degree, damping applied as
    * ·dampE6 div 1e6, teleport = 1e6 − dampE6 scaled the same way.
    * Integer sums are accumulation-order-free, so the result is a
    * pure function of the edge set — replayable cell-for-cell by any
    * engine, where float PageRank diverges in the last ulps per
    * partitioning.
    *
    * Scale shape: `edges` is pinned once (every round reads the same
    * materialized frame); each round is one broadcast of the
    * node-sized score frame + ONE contribution shuffle, and a
    * `localCheckpoint` superstep barrier so round N never re-executes
    * rounds 1..N−1 (the iterative-lineage blowup GraphX/MLlib
    * checkpoint against). On a graph whose node set rivals its edge
    * count, drop the broadcast hint and the same algebra runs as a
    * sort-merge join on the shared edge partitioning — the rounds and
    * the arithmetic are unchanged.
    *
    * Node universe: by default the nodes WITH out-edges (`src`
    * occurrences) — a destination that never appears as a source
    * (a sink/dangling node) is excluded, and mass flowing to it
    * leaves the system (the documented modeling exclusion g30
    * relies on: its symmetrized graph has no such nodes). With
    * `includeDangling = true` the universe widens to src ∪ dst and
    * dangling nodes participate fully: they hold score, and each
    * round their damped mass is redistributed uniformly (the
    * standard dangling-mass correction), at the cost of one extra
    * single-row aggregate per round. Either way, a node with
    * out-edges but NO in-edges (a pure source) keeps contributing
    * every round: each superstep re-seeds the score frame from the
    * full degree frame, so its score stays at the teleport term
    * rather than the node silently vanishing after round 1.
    *
    * @param edges (src, dst) directed edge frame; undirected graphs
    *              pass both directions
    * @param includeDangling widen the node universe to src ∪ dst and
    *              redistribute dangling (out-degree-0) mass uniformly
    * @return (node, score) — score in e6 units (1e6 = the uniform
    *         initial mass)
    */
  def pageRank(edges: DataFrame, iters: Int, dampE6: Long = 850000L,
      includeDangling: Boolean = false): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(dampE6 >= 0 && dampE6 <= 1000000L, s"dampE6 out of range: $dampE6")
    val teleportE6 = 1000000L - dampE6
    val pinned = edges.select(col("src"), col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val outDeg = pinned.groupBy("src").agg(count(lit(1)).as("deg"))
      .withColumnRenamed("src", "node")
    val degN = (if (!includeDangling) outDeg
      else pinned.select(col("src").as("node"))
        .union(pinned.select(col("dst").as("node"))).distinct()
        .join(outDeg, Seq("node"), "left")
        .select(col("node"), coalesce(col("deg"), lit(0L)).as("deg")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // dangling redistribution divides by |V| — one driver count up
    // front (NOT per round); skipped entirely on the default path
    val nNodes = if (includeDangling) degN.count() else 0L
    // deg rides INSIDE the score frame: the per-round broadcast side
    // is then a pure projection of the checkpointed state (no
    // score⋈deg collect chain per round), and deg re-attaches in the
    // same job's broadcast join
    var score = degN.select(col("node"), lit(1000000L).as("score"), col("deg"))
    for (_ <- 1 to iters) {
      val perSrc = score.filter(col("deg") > 0).select(col("node").as("src"),
        call_function("div", col("score"), col("deg")).as("contrib"))
      val contribs = pinned.join(broadcast(perSrc), Seq("src"))
        .select(col("dst").as("node"), col("contrib"))
        .groupBy("node")
        .agg(sum("contrib").as("in_mass"))
      // re-seed from degN (LEFT join, contribs broadcast): a node
      // whose in-mass is empty this round — a pure source, or a
      // dangling node — stays in the frame at the teleport term
      // instead of dropping out of every later superstep
      val reseeded = degN.join(broadcast(contribs), Seq("node"), "left")
      val withDangling =
        if (!includeDangling) reseeded.withColumn("dshare", lit(0L))
        else {
          val dShare = score.filter(col("deg") === 0)
            .agg(coalesce(sum("score"), lit(0L)).as("dtot"))
            .select(call_function("div", col("dtot"), lit(nNodes)).as("dshare"))
          reseeded.crossJoin(broadcast(dShare))
        }
      score = withDangling
        .select(col("node"),
          (lit(teleportE6) + call_function("div",
            (coalesce(col("in_mass"), lit(0L)) + col("dshare")) * dampE6,
            lit(1000000L))).as("score"),
          col("deg"))
        .localCheckpoint()
    }
    score.select(col("node"), col("score"))
  }
}
