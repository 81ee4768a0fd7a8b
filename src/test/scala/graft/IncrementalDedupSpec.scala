package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** The incremental dedup contract: probing a persisted signature
  * index with a delta must return EXACTLY the full-recompute pairs
  * that touch the delta — no old↔old pairs re-reported, no cross-
  * boundary pair missed — and appending a resolved batch must make it
  * visible to the next batch.
  */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val baseA = "the quick brown fox jumps over the lazy dog again and again"
  private val baseB = "structured streaming state stores keep watermarked aggregates warm"
  private val baseC = "parquet partition pruning keeps the scan narrow and the bytes cold"

  // old corpus 0–7 (contains an old↔old near-dup 2≈3), delta 8–11
  // (8≈10 new↔new, 1≈9 old↔new)
  private def allDocs = Seq(
    (0L, "completely unrelated words about catalyst execution plans"),
    (1L, baseA),
    (2L, baseB),
    (3L, baseB + " tonight"),
    (4L, "another singleton document with its own vocabulary entirely"),
    (5L, baseC),
    (6L, "yet more filler text that matches nothing else in the corpus"),
    (7L, "sixth unrelated document full of distinct nouns and verbs"),
    (8L, baseC + " always"),
    (9L, baseA + " tonight"),
    (10L, baseC + " always indeed"),
    (11L, "the newest document shares no phrasing with anything prior")
  ).toDF("doc_id", "text")

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_incr_spec").toString

  test("incremental pairs equal the full recompute filtered to delta-touching") {
    val docs = allDocs
    val path = tmp()
    Dedup.writeMinhashIndex(docs.filter(col("doc_id") < 8), "doc_id", "text", path)

    val incremental = Dedup.incrementalLshPairs(
        docs.filter(col("doc_id") >= 8), "doc_id", "text", path)
      .select("doc_a", "doc_b", "jac_e6")
      .as[(Long, Long, Long)].collect().toSet

    val full = Dedup.minhashLshPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b", "jac_e6")
      .as[(Long, Long, Long)].collect().toSet

    assert(incremental == full.filter { case (a, b, _) => a >= 8 || b >= 8 })
    // the old↔old near-dup exists in the full recompute but must NOT
    // be re-reported by the incremental probe
    assert(full.exists { case (a, b, _) => (a, b) == ((2L, 3L)) })
    assert(!incremental.exists { case (a, b, _) => (a, b) == ((2L, 3L)) })
    // cross-boundary and new↔new pairs must both surface
    assert(incremental.exists { case (a, b, _) => (a, b) == ((1L, 9L)) })
    assert(incremental.exists { case (a, b, _) => (a, b) == ((8L, 10L)) })
  }

  test("indexedLshPairs equals the from-text recompute over the indexed corpus") {
    val docs = allDocs
    val path = tmp()
    Dedup.writeMinhashIndex(docs, "doc_id", "text", path)
    // derived entirely from the persisted parts (bands, counts, sigs:
    // text never re-read) yet must be pair-for-pair the from-text run
    val fromIndex = Dedup.indexedLshPairs(spark, path, "doc_id")
      .select("doc_a", "doc_b", "jac_e6")
      .as[(Long, Long, Long)].collect().toSet
    val fromText = Dedup.minhashLshPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b", "jac_e6")
      .as[(Long, Long, Long)].collect().toSet
    assert(fromIndex == fromText)
    assert(fromText.nonEmpty) // fixture sanity: 2≈3 at minimum
  }

  test("appending a resolved batch makes it visible to the next batch") {
    val docs = allDocs
    val path = tmp()
    Dedup.writeMinhashIndex(docs.filter(col("doc_id") < 8), "doc_id", "text", path)
    // fold batch1 (ids 8–9) into the index, then probe with batch2
    Dedup.writeMinhashIndex(docs.filter(col("doc_id").isin(8L, 9L)),
      "doc_id", "text", path, overwrite = false)
    val batch2 = Dedup.incrementalLshPairs(
        docs.filter(col("doc_id") >= 10), "doc_id", "text", path)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // 10 pairs with indexed 5 (old) AND with indexed 8 (batch1)
    assert(batch2.contains((5L, 10L)))
    assert(batch2.contains((8L, 10L)))
    assert(!batch2.exists { case (a, b) => b < 10 }) // only delta-touching
  }

  test("streamNearDupProbe (batch form) = incremental pairs restricted to index matches") {
    val docs = allDocs
    val path = tmp()
    Dedup.writeMinhashIndex(docs.filter(col("doc_id") < 8), "doc_id", "text", path)
    val delta = docs.filter(col("doc_id") >= 8)
    val probe = Dedup.streamNearDupProbe(delta, "doc_id", "text", path)
      .select("doc_id", "matched_id", "jac_e6")
      .as[(Long, Long, Long)].collect().toSet
    val incr: Set[(Long, Long, Long)] =
      Dedup.incrementalLshPairs(delta, "doc_id", "text", path)
        .select("doc_a", "doc_b", "jac_e6")
        .as[(Long, Long, Long)].collect().toSet
    val incrToIndex = incr
      .filter { case (a, _, _) => a < 8 } // drop new↔new, probe's non-goal
      .map { case (a, b, j) => (b, a, j) } // reorient to (incoming, indexed)
    assert(probe == incrToIndex)
    assert(probe.exists { case (id, m, _) => (id, m) == ((9L, 1L)) })
  }

  test("ngramContamination flags planted eval overlap and drops boilerplate n-grams") {
    val evalSet = Seq(
      (0L, "what is the capital city of france paris is the answer indeed"),
      (1L, "compute the sum of the first hundred natural numbers quickly"))
      .toDF("doc_id", "text")
    val boiler = "click here to subscribe to our newsletter for updates"
    val corpus = Seq(
      // verbatim half of eval doc 0 → ≥3 shared shingles
      (10L, "trivia page what is the capital city of france paris unrelated tail"),
      // no overlap
      (11L, "completely unrelated text about catalyst optimizer rules"),
      // boilerplate-only doc: shares nothing with eval
      (12L, boiler))
      .toDF("doc_id", "text")
    val flagged = Dedup.ngramContamination(corpus, "doc_id", "text", evalSet,
        n = 3, minShared = 3)
      .select("doc_id", "eval_id").as[(Long, Long)].collect().toSet
    assert(flagged == Set((10L, 0L)))

    // a shingle present in many corpus docs is dropped by maxDf: give
    // every corpus doc the contaminating phrase — with maxDf below the
    // doc count the collision hashes are boilerplate and nothing flags
    val saturated = (10L until 20L).map(i =>
      (i, s"prefix $i what is the capital city of france paris suffix"))
      .toDF("doc_id", "text")
    val capped = Dedup.ngramContamination(saturated, "doc_id", "text", evalSet,
        n = 3, minShared = 3, maxDf = 5)
      .count()
    assert(capped == 0, "df-capped boilerplate shingles must not flag")
    val uncapped = Dedup.ngramContamination(saturated, "doc_id", "text", evalSet,
        n = 3, minShared = 3, maxDf = 1000)
      .count()
    assert(uncapped == 10, "below the cap all ten docs flag against eval 0")
  }

  test("fold-in maintains bucket counts that match a direct recount of the band table") {
    val docs = allDocs
    val path = tmp()
    Dedup.writeMinhashIndex(docs.filter(col("doc_id") < 8), "doc_id", "text", path)
    Dedup.writeMinhashIndex(docs.filter(col("doc_id").isin(8L, 9L)),
      "doc_id", "text", path, overwrite = false)
    val merged = graft.io.BatchedIndex.read(spark, path, "bucket_counts")
      .groupBy("band", "bh").agg(sum("n").as("n"))
      .as[(Int, String, Long)].collect().toSet
    val recount = graft.io.BatchedIndex.read(spark, path, "bands")
      .groupBy("band", "bh").agg(count(lit(1)).as("n"))
      .as[(Int, String, Long)].collect().toSet
    assert(merged == recount,
      "merged pre-aggregated counts must equal a recount over both folded batches")
  }

  test("incremental probe derives the valve from the counts part, not a band-table scan") {
    val docs = allDocs
    val path = tmp()
    Dedup.writeMinhashIndex(docs.filter(col("doc_id") < 8), "doc_id", "text", path)
    val plan = Dedup.incrementalLshPairs(
      docs.filter(col("doc_id") >= 8), "doc_id", "text", path)
    val scans = plan.queryExecution.sparkPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
    }.flatten
    assert(scans.exists(_.contains("/bucket_counts/")),
      s"valve must read the pre-aggregated counts part; scans were $scans")
    // the full per-doc band table is scanned exactly once (the
    // candidate join) — a second scan would mean the valve still
    // re-aggregates it per batch
    assert(scans.count(_.contains("/bands/")) == 1,
      s"band table must be scanned once, not re-aggregated; scans were $scans")
    assert(Dedup.streamNearDupProbe(docs.filter(col("doc_id") >= 8),
        "doc_id", "text", path)
      .queryExecution.sparkPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.rootPaths.map(_.toString)
      }.flatten.exists(_.contains("/bucket_counts/")),
      "streaming probe must also derive its valve from the counts part")
  }

  test("a writer dying mid-fold leaves the index exactly as it was") {
    val docs = allDocs
    val path = tmp()
    Dedup.writeMinhashIndex(docs.filter(col("doc_id") < 8), "doc_id", "text", path)
    val before = Dedup.incrementalLshPairs(
        docs.filter(col("doc_id") >= 10), "doc_id", "text", path)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val committedBefore = graft.io.BatchedIndex.committed(spark, path)

    // kill the fold-in right after the sigs part lands — the exact
    // failure window the old two-append layout could not survive;
    // withValue scopes the injection to this block
    graft.io.BatchedIndex.afterPartWrite.withValue((p, part) =>
      if (p == path && part == "sigs") throw new RuntimeException("injected fold-in death")) {
      intercept[RuntimeException] {
        Dedup.writeMinhashIndex(docs.filter(col("doc_id").isin(8L, 9L)),
          "doc_id", "text", path, overwrite = false)
      }
    }

    assert(graft.io.BatchedIndex.committed(spark, path) == committedBefore,
      "a failed fold must not publish a batch")
    val after = Dedup.incrementalLshPairs(
        docs.filter(col("doc_id") >= 10), "doc_id", "text", path)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(after == before, "readers must see the whole batch or none of it")
    assert(!after.contains((8L, 10L)), "the half-written batch must be invisible")

    // the same fold, uninjected, publishes once and becomes visible
    Dedup.writeMinhashIndex(docs.filter(col("doc_id").isin(8L, 9L)),
      "doc_id", "text", path, overwrite = false)
    val healed = Dedup.incrementalLshPairs(
        docs.filter(col("doc_id") >= 10), "doc_id", "text", path)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(healed.contains((8L, 10L)))
    assert(graft.io.BatchedIndex.committed(spark, path).size == committedBefore.size + 1)
  }

  test("overwrite rebuild is an atomic generation switch; scrub reclaims dead orphans only") {
    import graft.io.BatchedIndex
    val docs = allDocs
    val path = tmp()
    Dedup.writeMinhashIndex(docs.filter(col("doc_id") < 8), "doc_id", "text", path)
    val gen0 = BatchedIndex.committed(spark, path)
    assert(gen0.size == 1)

    // leave an orphan behind: a fold that dies after its parts land
    // but before its marker
    BatchedIndex.afterPartWrite.withValue((p, part) =>
      if (p == path && part == "bucket_counts")
        throw new RuntimeException("injected death")) {
      intercept[RuntimeException] {
        Dedup.writeMinhashIndex(docs.filter(col("doc_id").isin(8L, 9L)),
          "doc_id", "text", path, overwrite = false)
      }
    }
    def batchDirs() = new java.io.File(s"$path/sigs").listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).toSet
    assert(batchDirs().size == 2, "orphan dir present beside the committed batch")

    // the orphan is NEWER than the newest marker — an in-flight fold
    // would look exactly like this, so scrub must leave it alone
    assert(BatchedIndex.scrub(spark, path) == 0)
    assert(batchDirs().size == 2)

    // a later successful append proves the orphan's writer dead;
    // scrub now reclaims it (3 parts × 1 orphan dir) and never
    // touches marked batches
    Thread.sleep(20) // distinct mtimes on the marker vs the orphan
    Dedup.writeMinhashIndex(docs.filter(col("doc_id").isin(8L, 9L)),
      "doc_id", "text", path, overwrite = false)
    assert(BatchedIndex.scrub(spark, path) == 3)
    assert(batchDirs().size == 2, "the two committed batches survive the scrub")
    assert(BatchedIndex.committed(spark, path).size == 2)

    // overwrite rebuild: the manifest switches generations in one
    // marker-create — committed() is NEVER empty and never mixes
    // generations, and the superseded batch dirs are swept
    Dedup.writeMinhashIndex(docs, "doc_id", "text", path, overwrite = true)
    val gen1 = BatchedIndex.committed(spark, path)
    assert(gen1.size == 1 && !gen1.exists(gen0.contains(_)))
    assert(batchDirs().size == 1, "superseded generation swept after the switch")
    val pairs = Dedup.incrementalLshPairs(
        docs.filter(col("doc_id") >= 10), "doc_id", "text", path)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((8L, 10L)), "rebuilt index serves reads")
  }

  test("a pre-manifest legacy layout fails with a dedicated migration error") {
    val path = tmp()
    // simulate an r6-era index: a bare parquet part dir, no manifest
    allDocs.limit(2).write.parquet(s"$path/sigs")
    val e = intercept[IllegalStateException] {
      graft.io.BatchedIndex.read(spark, path, "sigs")
    }
    assert(e.getMessage.contains("legacy"))
    assert(e.getMessage.contains("overwrite=true"))
  }

  test("oversized union buckets are capped exactly like the full recompute") {
    val boiler = "lorem ipsum boilerplate navigation footer copyright terms"
    val docs = ((0L until 30L).map(i => (i, boiler)) ++
      (30L until 40L).map(i => (i, boiler)) ++
      Seq((100L, baseA), (101L, baseA + " tonight")))
      .toDF("doc_id", "text")
    val path = tmp()
    Dedup.writeMinhashIndex(docs.filter(col("doc_id") < 30), "doc_id", "text", path)
    // 30 indexed + 10 delta boilerplate docs: union bucket = 40 > 20
    val pairs = Dedup.incrementalLshPairs(
        docs.filter(col("doc_id") >= 30), "doc_id", "text", path, maxBucket = 20)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((100L, 101L)),
      "union-oversized boilerplate bucket must emit nothing; planted pair survives")
  }
}
