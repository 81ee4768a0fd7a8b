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
    * Nodes with no out-edges do not exist here (every node in the
    * returned frame has degree ≥ 1); dangling-mass redistribution is
    * the caller's modeling choice.
    *
    * @param edges (src, dst) directed edge frame; undirected graphs
    *              pass both directions
    * @return (node, score) — score in e6 units (1e6 = the uniform
    *         initial mass)
    */
  def pageRank(edges: DataFrame, iters: Int, dampE6: Long = 850000L): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(dampE6 >= 0 && dampE6 <= 1000000L, s"dampE6 out of range: $dampE6")
    val teleportE6 = 1000000L - dampE6
    val pinned = edges.select(col("src"), col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val degN = pinned.groupBy("src").agg(count(lit(1)).as("deg"))
      .withColumnRenamed("src", "node")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // deg rides INSIDE the score frame: the per-round broadcast side
    // is then a pure projection of the checkpointed state (no
    // score⋈deg collect chain per round), and deg re-attaches in the
    // same job's broadcast join
    var score = degN.select(col("node"), lit(1000000L).as("score"), col("deg"))
    for (_ <- 1 to iters) {
      val perSrc = score.select(col("node").as("src"),
        call_function("div", col("score"), col("deg")).as("contrib"))
      score = pinned.join(broadcast(perSrc), Seq("src"))
        .select(col("dst").as("node"), col("contrib"))
        .groupBy("node")
        .agg((lit(teleportE6) + call_function("div",
          sum("contrib") * dampE6, lit(1000000L))).as("score"))
        .join(broadcast(degN), Seq("node"))
        .localCheckpoint()
    }
    score.select(col("node"), col("score"))
  }
}
