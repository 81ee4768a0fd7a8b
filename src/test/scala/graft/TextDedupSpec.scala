package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextFns, TextKernels}
import graft.operators.{Dedup, Similarity}

/** Unit coverage for the LLM-pipeline primitives: shingling edge
  * cases, fingerprint order-sensitivity, exact/near dedup on planted
  * duplicates, and cosine math on known vectors.
  */
class TextDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("shingle hashes of a text shorter than n tokens are empty, not null") {
    val df = Seq((1L, "one two"), (2L, "one two three four")).toDF("id", "text")
    val out = TextKernels.shingleHashTable(df, "id", "text", 3)
      .select(col("id"), size(col("hs")).as("n")).orderBy("id")
      .as[(Long, Int)].collect().toSeq
    assert(out == Seq((1L, 0), (2L, 2)))
  }

  test("fingerprint is order-sensitive and stable") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"),
      (3L, "alpha beta gamma")).toDF("id", "text")
    val fps = TextKernels.fingerprints(df, "id", "text")
      .orderBy("id").select("fp").as[Long].collect().toSeq
    assert(fps(0) == fps(2))
    assert(fps(0) != fps(1))
    assert(fps.forall(f => f >= 0 && f < TextFns.FoldP))
  }

  test("chunkDedup strips cross-doc boilerplate chunks, keeps order, empties all-boilerplate docs") {
    // 2-token chunks; "hdr txt" opens three docs (df=3 > maxDf=2) so it
    // is boilerplate; doc 4 is nothing BUT boilerplate and must come
    // back as '' rather than disappear; unique tails survive in order.
    val df = Seq(
      (1L, "hdr txt alpha beta gamma delta"),
      (2L, "hdr txt epsilon zeta eta theta"),
      (3L, "iota kappa lambda mu nu xi"),
      (4L, "hdr txt")).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(df, "doc_id", "text", chunkTokens = 2, maxDf = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq(
      (1L, "alpha beta gamma delta", 3L, 2L),
      (2L, "epsilon zeta eta theta", 3L, 2L),
      (3L, "iota kappa lambda mu nu xi", 3L, 3L),
      (4L, "", 1L, 0L)))
  }

  test("duplicateSpanStats: copied spans count at any offset, exact dups fully covered") {
    // span = 3 tokens. Docs 1/2 are exact duplicates → every window
    // duplicated (dup_milli = 1000). Doc 3 embeds doc 1's "a b c d"
    // at an OFFSET inside unique text: its windows "a b c" and
    // "b c d" match doc 1's — the any-offset catch aligned chunking
    // misses. Doc 4 is unique → 0. Doc 5 is shorter than the span →
    // zero windows, zero (not a negative-sequence explosion).
    val df = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e"),
      (3L, "x y a b c d z w"),
      (4L, "p q r s t u"),
      (5L, "one two")).toDF("doc_id", "text")
    val out = Dedup.duplicateSpanStats(df, "doc_id", "text", spanTokens = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq(
      (1L, 3L, 3L, 1000L),
      (2L, 3L, 3L, 1000L),
      (3L, 6L, 2L, 333L),
      (4L, 4L, 0L, 0L),
      (5L, 0L, 0L, 0L)))
  }

  test("removeDuplicateSpans: the copied span vanishes from every copy at any offset, unique prose survives") {
    // span = 3. Doc 3 embeds doc 1's "a b c d e" at an offset: the
    // shared windows cover a..e in BOTH docs, so the copied paragraph
    // disappears everywhere while doc 3's unique frame (x y / z w)
    // and doc 4's unique text survive untouched. Doc 1 is wholly
    // duplicated -> empty output. Doc 5 is shorter than the span ->
    // no windows, fully kept. Doc 6 repeats a span WITHIN itself only
    // (df = 1 doc) -> cross-document removal must NOT touch it.
    val df = Seq(
      (1L, "a b c d e"),
      (3L, "x y a b c d e z w"),
      (4L, "p q r s t u"),
      (5L, "one two"),
      (6L, "m n o m n o")).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(df, "doc_id", "text", spanTokens = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(out == Seq(
      (1L, 5L, 0L, ""),
      (3L, 9L, 4L, "x y z w"),
      (4L, 6L, 6L, "p q r s t u"),
      (5L, 2L, 2L, "one two"),
      (6L, 6L, 6L, "m n o m n o")))
  }

  test("exactDedup groups identical keys and elects min id as canonical") {
    val df = Seq((10L, "same"), (3L, "same"), (7L, "other")).toDF("id", "text")
    val out = Dedup.exactDedup(df, "id", md5(col("text")))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(out == Seq(
      (3L, 3L, 2L, true),
      (7L, 7L, 1L, true),
      (10L, 3L, 2L, false)))
  }

  test("minhash signatures are equal for identical shingle sets, length k") {
    val df = Seq((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "q r s t u v"))
      .toDF("id", "text")
    val sig = Dedup.minhashSignatures(df, "id", "text", n = 3, k = 8)
      .select("id", "sig").as[(Long, Seq[Long])].collect().toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L))
    assert(sig(1L).length == 8)
  }

  test("LSH pairs surface a planted near-duplicate and skip unrelated docs") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, base),
      (2L, base + " tonight"), // near-dup of 1
      (3L, "completely different words about spark catalyst execution plans"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
        n = 3, k = 8, nBands = 4, jaccardMin = 0.4)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("oversized LSH buckets emit no pairs; normal buckets are untouched") {
    // 40 identical boilerplate docs land in one bucket per band —
    // 780 quadratic pairs that the maxBucket safeguard must suppress —
    // while a planted 2-doc near-dup bucket must keep pairing
    val boiler = "lorem ipsum boilerplate navigation footer copyright terms"
    val near = "the quick brown fox jumps over the lazy dog again and again"
    val docs = ((0L until 40L).map(i => (i, boiler)) ++
      Seq((100L, near), (101L, near + " tonight")))
      .toDF("doc_id", "text")

    val capped = Dedup.minhashLshPairs(docs, "doc_id", "text",
        n = 3, k = 8, nBands = 4, jaccardMin = 0.4, maxBucket = 20)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped == Set((100L, 101L)),
      "hot-bucket pairs must be suppressed, planted pair kept")

    val uncapped = Dedup.minhashLshPairs(docs, "doc_id", "text",
        n = 3, k = 8, nBands = 4, jaccardMin = 0.4, maxBucket = 1000)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(uncapped.size == 40 * 39 / 2 + 1,
      "below the cap every pair must survive")

    val simCapped = Dedup.simhashNearDupPairs(docs, "doc_id", "text",
        maxBucket = 20)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(!simCapped.exists { case (a, b) => a < 40 && b < 40 },
      "simhash hot-bucket pairs must be suppressed")
  }

  test("simhashNearDupPairs pairs identical docs at distance 0, skips unrelated") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // identical → hamming 0
      (3L, "utterly unrelated vocabulary cluster misc words"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDupPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L, 0L)))
  }

  test("cosineNearDupPairs surfaces the planted aligned pair only") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.02f, 0.0f)),
      (2L, Seq(0.98f, 0.01f, 0.01f)), // near-dup of 1
      (3L, Seq(-0.1f, 0.99f, 0.0f)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding",
        minCos = 0.9, nPlanes = 2, dims = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))).toDF("a", "b")
    val cos = df.select(Similarity.cosine(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(cos(0) - 1.0) < 1e-12)
    assert(math.abs(cos(1)) < 1e-12)
  }

  test("cosineTopK ranks the aligned vector first") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f)),
      (4L, Seq(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") === 1L)
    val top = Similarity.cosineTopK(probes, corpus, "vec_id", "embedding", k = 2)
      .orderBy("rn").select("vec_id").as[Long].collect().toSeq
    assert(top == Seq(2L, 3L))
  }

  test("ivfAssign sends each vector to its highest-cosine centroid, ties to lowest id") {
    val centroids = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val vecs = Seq(
      (10L, Seq(0.9f, 0.1f)),  // → cell 0
      (11L, Seq(0.1f, 0.9f)),  // → cell 1
      (12L, Seq(0.5f, 0.5f)))  // equidistant → tie broken to cell 0
      .toDF("vec_id", "embedding")
    val cells = Similarity.ivfAssign(vecs, "vec_id", "embedding", centroids)
      .select("vec_id", "cell_id").as[(Long, Long)].collect().toMap
    assert(cells == Map(10L -> 0L, 11L -> 1L, 12L -> 0L))
  }

  test("srpBucket assigns equal vectors to equal buckets, deterministically") {
    val planes = Similarity.srpPlanes(4, 3)
    assert(planes.length == 4 && planes(0).length == 3)
    assert(planes.flatten.forall(w => w >= -1000 && w <= 1000))
    val df = Seq((1L, Seq(0.5f, -0.2f, 0.8f)), (2L, Seq(0.5f, -0.2f, 0.8f)))
      .toDF("vec_id", "embedding")
    val buckets = df.select(Similarity.srpBucket(col("embedding"), planes))
      .as[Long].collect().toSeq
    assert(buckets(0) == buckets(1))
    assert(buckets(0) >= 0 && buckets(0) < 16)
  }
}
