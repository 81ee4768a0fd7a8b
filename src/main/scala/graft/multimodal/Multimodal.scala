package graft.multimodal

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Multimodal (image/audio/video) column plumbing for the
  * LLM-data-pipeline surface: media is an opaque BINARY column plus
  * typed metadata, and every per-item operator (decode, feature
  * extraction, frame sampling) runs as imperative per-partition batch
  * logic over `Dataset[T]` — the Scala analog of `mapInPandas`
  * (partition iterator in, batched records out, executor-local
  * libraries do the work).
  *
  * REAL vs STUB: the Spark-side plumbing — schema, encoders,
  * partition/batch shape, explode fan-out — is real and tested. The
  * codec itself ([[FakeCodec]]) is a clearly-marked deterministic
  * STUB: this container has no image/audio libraries, so "decode"
  * derives metadata arithmetically from the bytes (size, MD5). The
  * arithmetic is chosen to be reproducible in ANSI SQL so even the
  * stubbed operators get full DuckDB-oracle verification, not just
  * row counts. Swapping in a real codec = replacing FakeCodec's
  * method bodies; every signature and plan stays put.
  *
  * Scale notes (100 TB): media rows are large (MBs) — the operators
  * never shuffle the binary payload; decode/features are map-only
  * stages that pipeline with the parquet scan, and the frame-sample
  * fan-out explodes AFTER metadata is derived so only (id, idx, sig)
  * rows multiply, never the source bytes. Batches inside a partition
  * are bounded ([[batchSize]]) so per-task memory stays flat no
  * matter how large the partition is.
  */
object Multimodal {

  /** One media item: opaque payload + routing metadata. */
  final case class Media(media_id: Long, kind: String, content: Array[Byte])

  // integer fields are Long throughout: the oracle compare is typed
  // and DuckDB arithmetic lands on BIGINT
  final case class ImageMeta(media_id: Long, n_bytes: Long, width: Long,
                             height: Long, channels: Long, checksum: String)

  final case class MediaFeatures(media_id: Long, f1: Long, f2: Long, f3: Long,
                                 f4: Long, f5: Long, f6: Long, f7: Long, f8: Long)

  final case class Frame(media_id: Long, frame_idx: Long, ts_ms: Long, frame_sig: String)

  /** Records per in-partition batch — the Arrow-batch analog; bounds
    * per-task memory for arbitrarily large partitions.
    */
  val batchSize = 512

  /** ======================= STUB CODEC =======================
    * Deterministic fake decoder. A production build replaces these
    * bodies with real library calls (JNI/javacpp decoders); the
    * values here are pure functions of the payload bytes so tests
    * and the SQL oracle can verify the plumbing end-to-end.
    */
  object FakeCodec extends Serializable {
    def md5Hex(bytes: Array[Byte]): String =
      MessageDigest.getInstance("MD5").digest(bytes)
        .map("%02x".format(_)).mkString

    /** STUB decode: "dimensions" derived from payload size. */
    def decodeImage(bytes: Array[Byte]): (Int, Int, Int) = {
      val n = bytes.length
      (16 + n % 64, 16 + (n / 64) % 64, 3)
    }

    /** STUB duration: 40 ms of "video" per payload byte. */
    def durationMs(bytes: Array[Byte]): Long = 40L * bytes.length
  }

  /** Synthetic media table over `documents` (the container ships no
    * binary fixtures): payload = UTF-8 bytes of the text, kind cycles
    * image/audio/video. Binary column + metadata exactly as a real
    * ingest would land them.
    */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[Media] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id").as("media_id"),
        element_at(typedlit(Seq("image", "audio", "video")),
          (col("doc_id") % 3).cast("int") + 1).as("kind"),
        // null text → empty payload: the decode kernels take the
        // binary column as-is and must never see a null pointer
        encode(coalesce(col("text"), lit("")), "UTF-8").as("content"))
      .as[Media]
  }

  /** Decode pass: binary → typed image metadata, per-partition batch
    * loop (mapInPandas shape: iterator-of-batches in, records out;
    * the digest instance is amortized per batch, as a real decoder
    * context would be).
    */
  def decodeMeta(media: Dataset[Media]): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          val (w, h, c) = FakeCodec.decodeImage(m.content)
          ImageMeta(m.media_id, m.content.length.toLong, w.toLong, h.toLong,
            c.toLong, FakeCodec.md5Hex(m.content))
        }
      }
    }
  }

  /** Feature extraction: binary → 8 integer features (60-bit hex
    * slices of the payload digest — the stub stand-in for an
    * embedding model). Downstream these feed the same
    * [[graft.operators.Similarity]] bucketing as real embeddings.
    */
  def extractFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          val hex = FakeCodec.md5Hex(m.content)
          def f(i: Int): Long = java.lang.Long.parseLong(hex.substring(i * 4, i * 4 + 4), 16)
          MediaFeatures(m.media_id, f(0), f(1), f(2), f(3), f(4), f(5), f(6), f(7))
        }
      }
    }
  }

  /** Frame sampling: one output row per `intervalMs` of stub video
    * duration. The fan-out happens on derived (id, idx, signature)
    * rows — the heavy source bytes never multiply.
    */
  def sampleFrames(media: Dataset[Media], intervalMs: Long): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "video").mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { m =>
          val dur = FakeCodec.durationMs(m.content)
          val base = FakeCodec.md5Hex(m.content)
          (0L to dur / intervalMs).iterator.map { i =>
            Frame(m.media_id, i, i * intervalMs,
              FakeCodec.md5Hex(s"$base:$i".getBytes(StandardCharsets.UTF_8)))
          }
        }
      }
    }
  }

  /** "Resize": recompute stub metadata at a target box, keeping the
    * payload opaque — models a transform that rewrites metadata
    * without shuffling bytes.
    */
  def resizeMeta(meta: Dataset[ImageMeta], maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide) / greatest(col("width"), col("height")).cast("double"))
    meta.withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
  }
}
