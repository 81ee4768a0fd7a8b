package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal surface as oracle-checked queries. The decode is the
  * documented STUB ([[Multimodal.Codec]]), but its arithmetic is
  * SQL-reproducible, so the mapPartitions plumbing (encoders, batch
  * loop, explode fan-out) gets full cell-level DuckDB verification —
  * the strongest check available without real codecs in the image.
  */
object MultimodalQueries {

  /** DuckDB mirror of the synthetic media payload: UTF-8 bytes of
    * `documents.text`.
    */
  private val nBytesSql = "octet_length(encode(text))"

  val qs: Seq[Q] = Seq(

    // MM1 — decode pass: binary payload → typed image metadata.
    Q("mm1_decode_meta",
      (s, d) => Multimodal.decodeMeta(Multimodal.mediaTable(s, d))
        .toDF().orderBy("media_id"),
      Some(s"""SELECT doc_id AS media_id,
             |  CAST($nBytesSql AS BIGINT) AS n_bytes,
             |  CAST(16 + $nBytesSql % 64 AS BIGINT) AS width,
             |  CAST(16 + ($nBytesSql // 64) % 64 AS BIGINT) AS height,
             |  CAST(3 AS BIGINT) AS channels,
             |  md5(text) AS checksum
             |FROM documents ORDER BY media_id""".stripMargin)),

    // MM2 — feature extraction: payload → 8 integer features (stub
    // embedding), consumable by the Similarity operators.
    Q("mm2_media_features",
      (s, d) => Multimodal.extractFeatures(Multimodal.mediaTable(s, d))
        .toDF().orderBy("media_id"),
      Some(s"""SELECT doc_id AS media_id,
             |  ${(0 until 8).map(i =>
                  s"CAST(('0x' || substr(md5(text), ${i * 4 + 1}, 4)) AS BIGINT) AS f${i + 1}")
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
             |ORDER BY media_id, frame_idx""".stripMargin))
  )
}
