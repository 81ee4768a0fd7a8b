package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal surface as oracle-checked queries. Image rows
  * (doc_id % 3 = 0) carry a REAL encoded PNG that the engine REALLY
  * decodes ([[Multimodal.Codec]] via `javax.imageio`); the DuckDB
  * oracle recomputes the expected dimensions/channel means from the
  * [[Multimodal.Fixture]] arithmetic — a match proves the decode
  * recovered the constructed pixels, not that two stubs agree.
  * Audio/video rows keep the documented SQL-reproducible stub
  * arithmetic, so the mapPartitions plumbing (encoders, batch loop,
  * explode fan-out) still gets full cell-level verification.
  */
object MultimodalQueries {

  /** DuckDB mirror of the synthetic audio/video payload: UTF-8 bytes
    * of `documents.text`.
    */
  private val nBytesSql = "octet_length(encode(text))"

  /** DuckDB expressions for mm2's eight features, image arm replaying
    * the Fixture arithmetic ([[Multimodal.Fixture]]: width=16+id%48,
    * height=16+(id*7)%48, fill colour = (id*37, id*59, id*83) % 256 —
    * exact because the fills are solid and the PNG roundtrip is
    * lossless), stub arm replaying the digest slices. Shared with
    * mm4's oracle ([[SimilarityQueries]]) so the two cannot diverge.
    */
  val featureSql: Seq[String] = {
    val w = "(16 + doc_id % 48)"
    val h = "(16 + (doc_id * 7) % 48)"
    val r = "((doc_id * 37) % 256)"
    val g = "((doc_id * 59) % 256)"
    val b = "((doc_id * 83) % 256)"
    val imgArm = Seq(w, h, s"$w * $h", r, g, b, s"$r + $g + $b", s"greatest($r, $g, $b)")
    (0 until 8).map { i =>
      s"""CAST(CASE WHEN doc_id % 3 = 0 THEN ${imgArm(i)}
         |       ELSE CAST(('0x' || substr(md5(text), ${i * 4 + 1}, 4)) AS BIGINT) END
         |     AS BIGINT)""".stripMargin
    }
  }

  val qs: Seq[Q] = Seq(

    // MM1 — decode pass: binary payload → typed image metadata. Image
    // rows: width/height/channels are REAL `javax.imageio` decode
    // output, verified against the Fixture arithmetic. The PNG
    // container's byte length and byte-level md5 are properties of
    // the encoder's output stream, not reproducible in SQL — those
    // two cells are masked to NULL on the image arm ONLY (the decode
    // proof lives in the dimension columns here and the channel means
    // in mm2); audio/video rows keep all six verified columns.
    Q("mm1_decode_meta",
      (s, d) => {
        val isImg = col("media_id") % 3 === 0
        Multimodal.decodeMeta(Multimodal.mediaTable(s, d)).toDF()
          .withColumn("n_bytes", when(isImg, lit(null)).otherwise(col("n_bytes")))
          .withColumn("checksum", when(isImg, lit(null)).otherwise(col("checksum")))
          .orderBy("media_id")
      },
      Some(s"""SELECT doc_id AS media_id,
             |  CAST(CASE WHEN doc_id % 3 = 0 THEN NULL
             |       ELSE $nBytesSql END AS BIGINT) AS n_bytes,
             |  CAST(CASE WHEN doc_id % 3 = 0 THEN 16 + doc_id % 48
             |       ELSE 16 + $nBytesSql % 64 END AS BIGINT) AS width,
             |  CAST(CASE WHEN doc_id % 3 = 0 THEN 16 + (doc_id * 7) % 48
             |       ELSE 16 + ($nBytesSql // 64) % 64 END AS BIGINT) AS height,
             |  CAST(3 AS BIGINT) AS channels,
             |  CASE WHEN doc_id % 3 = 0 THEN NULL ELSE md5(text) END AS checksum
             |FROM documents ORDER BY media_id""".stripMargin)),

    // MM2 — feature extraction: payload → 8 integer features. Image
    // rows: REAL pixel-derived features (decoded dimensions + channel
    // means read back from the raster) checked against the Fixture
    // fill colours; audio/video rows: digest-slice stub embedding.
    // Both arms feed the Similarity operators identically.
    Q("mm2_media_features",
      (s, d) => Multimodal.extractFeatures(Multimodal.mediaTable(s, d))
        .toDF().orderBy("media_id"),
      Some(s"""SELECT doc_id AS media_id,
             |  ${featureSql.zipWithIndex.map { case (e, i) => s"$e AS f${i + 1}" }
                  .mkString(",\n             |  ")}
             |FROM documents ORDER BY media_id""".stripMargin)),

    // MM3 — frame sampling: stub video duration → one derived row per
    // second; the binary payload never multiplies, only (id, idx,
    // signature) rows do.
    Q("mm3_frame_sample",
      (s, d) => Multimodal.sampleFrames(Multimodal.mediaTable(s, d), intervalMs = 1000L)
        .toDF().orderBy("media_id", "frame_idx"),
      Some(s"""SELECT doc_id AS media_id, CAST(i AS BIGINT) AS frame_idx,
             |  CAST(i * 1000 AS BIGINT) AS ts_ms,
             |  md5(md5(text) || ':' || CAST(i AS VARCHAR)) AS frame_sig
             |FROM documents,
             |  unnest(range(0, (40 * $nBytesSql) // 1000 + 1)) AS t(i)
             |WHERE doc_id % 3 = 2
             |ORDER BY media_id, frame_idx""".stripMargin)),

    // MM7 — SHOT-BOUNDARY keyframe selection over mm3's sampled frame
    // stream: one representative frame per shot instead of embedding
    // every frame — the curation step that cuts video featurization
    // 10× before any model runs. A cut opens where the per-frame luma
    // surrogate jumps > 96 (or at frame 0); lag + running cut-sum are
    // two stacked windows over ONE media_id shuffle and the payload
    // never multiplies. The luma is a stub off the frame signature
    // (the documented Codec swap point); the windowing, shot
    // numbering and keyframe pick are the real machinery and the
    // oracle replays them over the identical stub arithmetic.
    Q("mm7_keyframes",
      (s, d) => Multimodal.keyframes(
          Multimodal.sampleFrames(Multimodal.mediaTable(s, d), intervalMs = 1000L),
          threshold = 96L)
        .orderBy("media_id", "frame_idx"),
      Some(s"""WITH f AS (
             |  SELECT doc_id AS media_id, CAST(i AS BIGINT) AS frame_idx,
             |    CAST(i * 1000 AS BIGINT) AS ts_ms,
             |    md5(md5(text) || ':' || CAST(i AS VARCHAR)) AS frame_sig
             |  FROM documents,
             |    unnest(range(0, (40 * $nBytesSql) // 1000 + 1)) AS t(i)
             |  WHERE doc_id % 3 = 2),
             |l AS (
             |  SELECT media_id, frame_idx, ts_ms,
             |    CAST(('0x' || substr(frame_sig, 1, 4)) AS BIGINT) % 256 AS luma
             |  FROM f),
             |c AS (
             |  SELECT media_id, frame_idx, ts_ms,
             |    CASE WHEN lag(luma) OVER win IS NULL
             |           OR abs(luma - lag(luma) OVER win) > 96
             |         THEN 1 ELSE 0 END AS cut
             |  FROM l
             |  WINDOW win AS (PARTITION BY media_id ORDER BY frame_idx)),
             |sh AS (
             |  SELECT media_id, frame_idx, ts_ms, cut,
             |    sum(cut) OVER (PARTITION BY media_id ORDER BY frame_idx
             |                   ROWS UNBOUNDED PRECEDING) AS shot_idx
             |  FROM c)
             |SELECT media_id, CAST(shot_idx AS BIGINT) AS shot_idx,
             |       frame_idx, ts_ms
             |FROM sh WHERE cut = 1
             |ORDER BY media_id, frame_idx""".stripMargin)),

    // MM5 — PERCEPTUAL image dedup (aHash): the image rows re-render
    // as 8×8 band-gradient PNGs whose visual content is a pure
    // function of media_id % 7 but whose pixel DIMENSIONS (and thus
    // encoded bytes and md5) differ per id — resized copies, the
    // duplicate class byte checksums (mm1) can never catch. The
    // engine REALLY decodes each PNG and computes the 8×8 average
    // hash from the raster at cell centers (exactly scale-invariant
    // for band images — floor algebra in Codec.aHash); grouping by
    // the hash collapses every resize family to one canonical id.
    // The oracle recomputes the hash from the fixture arithmetic, so
    // a match proves the raster round trip, and grouping is checked
    // end to end. Decode is map-only; only (id, 64-char hash) rows
    // shuffle.
    Q("mm5_phash_groups",
      (s, d) => {
        // group stats attached as WINDOW functions over the hash
        // shuffle instead of aggregate + join-back (r20 optimization,
        // same move as d13's df valve): ONE exchange, no join — and,
        // decisively, the perceptual-hash subtree (a REAL per-image
        // PNG decode) is referenced once, where the join shape decoded
        // the corpus twice (agg side + probe side). Identical rows:
        // min/count per ahash attached to every member.
        val w = org.apache.spark.sql.expressions.Window.partitionBy("ahash")
        Multimodal.perceptualHash(Multimodal.bandImageTable(s, d)).toDF()
          .withColumn("canonical_id", min("media_id").over(w))
          .withColumn("group_n", count(lit(1)).over(w))
          .select("media_id", "ahash", "canonical_id", "group_n")
          .orderBy("media_id")
      },
      Some("""WITH img AS (
             |  SELECT doc_id AS media_id FROM documents WHERE doc_id % 3 = 0),
             |s AS (SELECT media_id,
             |        list_transform(range(0, 64),
             |          k -> ((media_id % 7) * 31 + (k % 8) * 13 + (k // 8) * 29) % 256) AS gs
             |      FROM img),
             |m AS (SELECT media_id, gs, list_sum(gs) // 64 AS mn FROM s),
             |hb AS (SELECT media_id,
             |         array_to_string(list_transform(gs,
             |           g -> CASE WHEN g > mn THEN '1' ELSE '0' END), '') AS ahash
             |       FROM m),
             |gr AS (SELECT ahash, min(media_id) AS canonical_id,
             |              count(*) AS group_n
             |       FROM hb GROUP BY 1)
             |SELECT hb.media_id, hb.ahash, gr.canonical_id, gr.group_n
             |FROM hb JOIN gr USING (ahash) ORDER BY media_id""".stripMargin)),

    // MM6 — perceptual NEAR-dup pairs: the Hamming-close image
    // families mm5's exact grouping can't connect (crops/edits flip
    // a few aHash bits). Collapse to DISTINCT hashes FIRST — the
    // sketch table is bounded by visual diversity, not corpus size —
    // then 8×8-bit banding (d6's machinery on image sketches) with
    // bounded buckets, then exact bit-parallel Hamming ≤ 16 on the
    // candidates. The oracle replays the same bands, so the LSH
    // recall contract (guaranteed < 8, heuristic above) is checked,
    // not assumed. Pairs connect canonical ids with family sizes —
    // downstream clustering unions whole resize families.
    Q("mm6_phash_neardup",
      (s, d) => Multimodal.phashNearDupPairs(
          Multimodal.perceptualHash(Multimodal.bandImageTable(s, d)).toDF(),
          maxHamming = 16)
        .orderBy("id_a", "id_b"),
      Some("""WITH img AS (
             |  SELECT doc_id AS media_id FROM documents WHERE doc_id % 3 = 0),
             |s AS (SELECT media_id,
             |        list_transform(range(0, 64),
             |          k -> ((media_id % 7) * 31 + (k % 8) * 13 + (k // 8) * 29) % 256) AS gs
             |      FROM img),
             |m AS (SELECT media_id, gs, list_sum(gs) // 64 AS mn FROM s),
             |hb AS (SELECT media_id,
             |         array_to_string(list_transform(gs,
             |           g -> CASE WHEN g > mn THEN '1' ELSE '0' END), '') AS ahash
             |       FROM m),
             |gr AS (SELECT ahash, min(media_id) AS canonical_id,
             |              count(*) AS group_n
             |       FROM hb GROUP BY 1),
             |bands AS (SELECT ahash, canonical_id, group_n, b,
             |            substr(ahash, b * 8 + 1, 8) AS bv
             |          FROM gr, unnest(range(0, 8)) AS t(b)),
             |okb AS (SELECT b, bv FROM bands GROUP BY b, bv
             |        HAVING count(*) <= 1000),
             |bd AS (SELECT bands.* FROM bands JOIN okb USING (b, bv)),
             |cand AS (SELECT DISTINCT a.ahash AS ha, b.ahash AS hb2,
             |           a.canonical_id AS id_a, b.canonical_id AS id_b,
             |           a.group_n AS n_a, b.group_n AS n_b
             |         FROM bd a JOIN bd b
             |           ON a.b = b.b AND a.bv = b.bv
             |          AND a.canonical_id < b.canonical_id),
             |h AS (SELECT id_a, id_b, n_a, n_b,
             |        CAST(len(list_filter(range(1, 65),
             |          i -> substr(ha, i, 1) <> substr(hb2, i, 1))) AS BIGINT)
             |          AS hamming
             |      FROM cand)
             |SELECT id_a, id_b, n_a, n_b, hamming FROM h
             |WHERE hamming <= 16 ORDER BY id_a, id_b""".stripMargin))
  )
}
