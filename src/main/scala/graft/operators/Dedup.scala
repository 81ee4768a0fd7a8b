package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFns

/** Document deduplication operators for the LLM-data-pipeline surface.
  * The reference has no dedup at all (its CDC merge is keyed identity,
  * not content identity) — this is BASELINE.json north-star surface,
  * designed Spark-first for 100 TB:
  *
  *  - exact dedup is one hash-groupBy: a single shuffle of (hash, id),
  *    never of document payloads;
  *  - near-dup is MinHash + banded LSH: candidates meet only inside a
  *    (band, bandhash) bucket — the join key is the bucket, so the
  *    shuffle is linear in corpus size and there is NEVER an all-pairs
  *    comparison (an O(n²) cross join at 1000-executor scale is the
  *    design bug this module exists to avoid);
  *  - SimHash gives a 60-bit content sketch whose Hamming distance
  *    approximates cosine similarity of term vectors — near-dup
  *    bucketing by signature prefix is a cheap first-pass filter.
  */
object Dedup {

  /** Exact dedup on an arbitrary key expression (typically a content
    * hash): every row is annotated with its group's canonical id (min
    * id) and group size. One wide shuffle of (key, id) pairs + a
    * narrow re-join; document bodies never shuffle.
    */
  def exactDedup(df: DataFrame, idCol: String, key: Column): DataFrame = {
    val keyed = df.select(col(idCol), key.as("dup_key"))
    val groups = keyed.groupBy("dup_key").agg(
      min(col(idCol)).as("canonical_id"),
      count(lit(1)).as("group_size"))
    keyed.join(groups, "dup_key")
      .select(col(idCol), col("canonical_id"), col("group_size"),
        (col(idCol) === col("canonical_id")).as("is_canonical"))
  }

  /** Per-document MinHash signature table: (id, hs, sig), where `hs`
    * is the 60-bit hashed shingle set — longs, not strings, so the
    * verification joins shuffle ~8 bytes per shingle instead of the
    * shingle text. Computed by the typed kernel
    * ([[graft.functions.TextKernels.minhashSignatures]]): md5 inside
    * Catalyst `transform` lambdas is interpreted and was the d3
    * bench bottleneck.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, k: Int): DataFrame =
    graft.functions.TextKernels.minhashSignatures(docs, idCol, textCol, n, k)

  /** MinHash + banded-LSH near-duplicate pairs, verified by exact
    * shingle Jaccard.
    *
    * Plan shape (the 100 TB story): signatures are computed in one
    * narrow pass; each doc emits `nBands` (band, bandhash) keys; the
    * self-join shuffles on the bucket key only (ids + band hashes, no
    * text); candidate pairs are distinct-ed BEFORE shingle arrays are
    * re-attached, so the expensive payload join touches only the few
    * candidate ids. Band/row parameters trade recall vs bucket size as
    * usual (threshold ≈ (1/b)^(1/r)).
    *
    * @param jaccardMin verification threshold on exact shingle Jaccard
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, k: Int = 8, nBands: Int = 4,
                      jaccardMin: Double = 0.4): DataFrame = {
    require(k % nBands == 0, s"k=$k must divide into nBands=$nBands")
    val rows = k / nBands
    // The signature frame feeds three plan branches (bands, and both
    // sides of the verification join); without pinning, the
    // tokenize+shingle+hash subtree would execute three times. Here
    // that is a cache; at 100 TB the signature table is materialized
    // to storage once and reused across dedup runs — it is the
    // standard first-class artifact of a corpus dedup pipeline.
    val sh = minhashSignatures(docs, idCol, textCol, n, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val bandCols = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        TextFns.bandHash(col("sig"), b * rows + 1, rows).as("bh"))
    }
    val bands = sh.select(col(idCol),
        explode(array(bandCols: _*)).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.bh").as("bh"))

    val cand = bands.as("a")
      .join(bands.as("b"), Seq("band", "bh"))
      .filter(col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .distinct()

    val shA = sh.select(col(idCol).as("doc_a"), col("hs").as("sh_a"))
    val shB = sh.select(col(idCol).as("doc_b"), col("hs").as("sh_b"))
    val ni = size(array_intersect(col("sh_a"), col("sh_b"))).cast(LongType)
    val nu = (size(col("sh_a")) + size(col("sh_b"))).cast(LongType) - ni
    val jac = ni.cast(DoubleType) / nu.cast(DoubleType)

    cand.join(shA, "doc_a").join(shB, "doc_b")
      .select(col("doc_a"), col("doc_b"), ni.as("ni"), nu.as("nu"),
        floor(jac * 1e6).cast(LongType).as("jac_e6"))
      .filter(col("jac_e6") >= (jaccardMin * 1e6).toLong)
  }

  /** Exact n-gram Jaccard of every document against one probe document
    * — the brute-force similarity scan (linear, probe broadcast; the
    * scale path for many probes is [[minhashLshPairs]] bucketing).
    */
  def jaccardAgainstProbe(docs: DataFrame, idCol: String, textCol: String,
                          probeId: Long, n: Int, topK: Int): DataFrame = {
    val sh = graft.functions.TextKernels.shingleHashTable(docs, idCol, textCol, n)
      .withColumnRenamed("hs", "shingles")
    val probe = sh.filter(col(idCol) === probeId)
      .select(col("shingles").as("p_sh"))
    val ni = size(array_intersect(col("shingles"), col("p_sh"))).cast(LongType)
    val nu = (size(col("shingles")) + size(col("p_sh"))).cast(LongType) - ni
    val jac = ni.cast(DoubleType) / nu.cast(DoubleType)
    sh.filter(col(idCol) =!= probeId)
      .crossJoin(broadcast(probe))
      .select(col(idCol), ni.as("ni"), nu.as("nu"),
        floor(jac * 1e6).cast(LongType).as("jac_e6"),
        jac.as("jac_raw"))
      .orderBy(col("jac_raw").desc, col(idCol))
      .limit(topK)
      .drop("jac_raw")
  }

  /** Per-document 60-bit SimHash sketch over the token multiset.
    *
    * Implemented as a typed `mapPartitions` kernel rather than
    * Catalyst higher-order functions: the 60-bit majority vote as an
    * expression is 60 nested `aggregate` passes over the token-hash
    * array, which are interpreted (HOFs don't codegen) — measured
    * ~22 s for 5 000 docs at sf0.1 vs ~2 s for this kernel. The
    * arithmetic is bit-identical to the SQL oracle: tokens =
    * `split(trim_spaces(lower(text)), \s+)` exactly as
    * [[TextFns.toks]], hash = first 15 hex chars of md5.
    */
  def simhashTable(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast(LongType), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val votes = new Array[Int](60)
          graft.functions.TextKernels.toks(text).foreach { tok =>
            val h = graft.functions.TextKernels.hash60(md, tok)
            var b = 0
            while (b < 60) {
              votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1); b += 1
            }
          }
          var sh = 0L
          var b = 0
          while (b < 60) { if (votes(b) > 0) sh |= 1L << b; b += 1 }
          (id, sh)
        }
      }.toDF(idCol, "simhash")
  }

  /** D8 — dedup CLUSTERS from a near-dup pair graph: connected
    * components by iterative min-label propagation. Every document
    * gets `cluster_id` = the smallest doc id reachable through
    * near-dup edges (documents in no pair are their own singleton
    * cluster), plus the cluster size and a canonical flag — the
    * keep-one-per-cluster decision a corpus dedup actually ships.
    *
    * Plan shape: each round is one (edges ⋈ labels) shuffle on the
    * node id + a min-aggregate, and `localCheckpoint` cuts the lineage
    * so round N+1 does not replay rounds 1..N. Rounds needed =
    * component diameter, which for near-dup graphs (dense clique-ish
    * clusters) is small; the published O(log n)-round alternating
    * large-star/small-star contraction (Kiveris et al., "Connected
    * Components in MapReduce and Beyond") is the drop-in upgrade if a
    * corpus ever shows long chains. Non-convergence inside `maxIters`
    * throws rather than returning a half-propagated labeling.
    */
  def connectedComponents(nodes: DataFrame, idCol: String,
                          pairs: DataFrame, aCol: String, bCol: String,
                          maxIters: Int = 25): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Iterate over the CONNECTED SUBGRAPH only: a near-dup pair graph
    // is orders of magnitude smaller than the corpus, so the per-round
    // shuffles move |dup graph| rows, never |corpus| rows; singleton
    // documents join back in one final pass as their own cluster.
    var labels = edges.select(col("src").as(idCol)).distinct()
      .withColumn("cluster_id", col(idCol))
      .localCheckpoint(true)
    // One min-propagation hop as a lazy plan transform; two hops run
    // between materialization barriers, halving the checkpoint+count
    // jobs per unit of progress (the barriers, not the shuffles, are
    // the fixed cost of driver-looped iteration).
    def hop(l: DataFrame): DataFrame = {
      val nbrMin = edges.join(l, edges("src") === l(idCol))
        .groupBy(col("dst").as(idCol))
        .agg(min("cluster_id").as("nbr_min"))
      l.join(nbrMin, Seq(idCol), "left")
        .select(col(idCol),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
            .as("cluster_id"))
    }
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      val before = labels.withColumnRenamed("cluster_id", "prev")
      val step = hop(hop(labels))
        .join(before, Seq(idCol))
        .select(col(idCol), col("cluster_id"),
          (col("cluster_id") < col("prev")).as("chg"))
        .localCheckpoint(true)
      changed = step.filter(col("chg")).count()
      // superseded rounds: the old checkpoint's blocks are freed by
      // the ContextCleaner once this reassignment drops the last
      // reference (Dataset.unpersist cannot release localCheckpoint
      // storage — it only clears CacheManager entries); ≤ maxIters
      // small frames may be transiently pinned, bounded by |dup graph|
      labels = step.drop("chg")
      iter += 1
    }
    edges.unpersist(blocking = false)
    require(changed == 0,
      s"connected components did not converge in $maxIters rounds")
    val all = nodes.select(col(idCol)).join(labels, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
    val sizes = all.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    all.join(sizes, "cluster_id")
      .select(col(idCol), col("cluster_id"), col("cluster_size"),
        (col(idCol) === col("cluster_id")).as("is_canonical"))
  }

  /** SimHash near-duplicate pairs via multi-index Hamming search:
    * each 60-bit sketch is cut into `nBands` bit-bands; documents
    * sharing ANY band value become candidates (bucket equi-join —
    * never all-pairs), then candidates are verified by exact Hamming
    * distance `bit_count(a XOR b) <= maxHamming`. With r < nBands
    * differing bits, pigeonhole guarantees a matching band (exact
    * recall); larger thresholds make the index approximate in the
    * usual multi-probe sense. Shuffle carries only (id, band, value)
    * triples + 8-byte sketches.
    */
  def simhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                          nBands: Int = 4, bandBits: Int = 15,
                          maxHamming: Int = 6): DataFrame = {
    // pinned: the sketch table feeds both sides of the bucket
    // self-join (16 bytes/doc; materialized to storage at corpus scale)
    val sim = simhashTable(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mask = (1L << bandBits) - 1
    val bandCols = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("simhash"), b * bandBits).bitwiseAND(lit(mask)).as("bv"))
    }
    val bands = sim.select(col(idCol), col("simhash"),
        explode(array(bandCols: _*)).as("bs"))
      .select(col(idCol), col("simhash"), col("bs.band").as("band"), col("bs.bv").as("bv"))
    val cand = bands.as("a").join(bands.as("b"), Seq("band", "bv"))
      .filter(col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"),
        col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
      .distinct()
    cand.select(col("doc_a"), col("doc_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast(LongType).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
