package graft.multimodal

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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
  * codec ([[Codec]]) genuinely decodes PNG payloads via
  * `javax.imageio`; for audio/video this container has no libraries,
  * so those branches are a clearly-marked deterministic STUB whose
  * arithmetic is reproducible in ANSI SQL — even the stubbed
  * operators get full DuckDB-oracle verification, not just row
  * counts. Swapping in real audio/video codecs = replacing Codec's
  * stub branches; every signature and plan stays put.
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

  /** ================ CODEC: real PNG, stub otherwise ================
    * Image decode is REAL: payloads carrying the PNG magic are decoded
    * with `javax.imageio` (JDK built-in — no external media libs
    * needed), returning true pixel dimensions, channel count, and
    * channel means read back from the raster. Non-PNG payloads
    * (audio/video stand-ins — this environment has no such codecs)
    * take the clearly-marked deterministic STUB arithmetic, chosen to
    * be reproducible in ANSI SQL so the plumbing still gets full
    * DuckDB-oracle verification. Swapping in real audio/video codecs =
    * replacing the stub branches; every signature and plan stays put.
    */
  object Codec extends Serializable {
    def md5Hex(bytes: Array[Byte]): String =
      MessageDigest.getInstance("MD5").digest(bytes)
        .map("%02x".format(_)).mkString

    def isPng(bytes: Array[Byte]): Boolean =
      bytes.length >= 4 && bytes(0) == 0x89.toByte &&
        bytes(1) == 'P'.toByte && bytes(2) == 'N'.toByte && bytes(3) == 'G'.toByte

    private def readPng(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      // ImageIO.read returns null (not an exception) for a payload that
      // carries the 4 magic bytes but is truncated/corrupt past them —
      // surface a descriptive decode error instead of an executor NPE
      if (img == null)
        throw new IllegalArgumentException(
          s"payload has the PNG magic but is not decodable (${bytes.length} bytes)")
      img
    }

    /** (width, height, channels): REAL decode for PNG, stub
      * size-arithmetic otherwise.
      */
    def decodeImage(bytes: Array[Byte]): (Int, Int, Int) =
      if (isPng(bytes)) {
        val img = readPng(bytes)
        (img.getWidth, img.getHeight, img.getColorModel.getNumComponents)
      } else {
        val n = bytes.length
        (16 + n % 64, 16 + (n / 64) % 64, 3)
      }

    /** One-pass PNG decode: (width, height, channels, meanR, meanG,
      * meanB). Channel means are floor-divided pixel sums — exact for
      * the solid-fill fixtures. One `ImageIO.read` serves both the
      * dimension and the mean needs; decoding twice per row doubled
      * the feature-extraction cost in the r5 bench.
      */
    def imageStats(bytes: Array[Byte]): (Int, Int, Int, Long, Long, Long) = {
      val img = readPng(bytes)
      val w = img.getWidth; val h = img.getHeight
      var r = 0L; var g = 0L; var b = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      (w, h, img.getColorModel.getNumComponents, r / n, g / n, b / n)
    }

    /** Solid-fill RGB PNG encoder (fixture generation + tests). */
    def encodePng(width: Int, height: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** STUB duration: 40 ms of "video" per payload byte. */
    def durationMs(bytes: Array[Byte]): Long = 40L * bytes.length

    /** 8×8 AVERAGE HASH (aHash) over the REAL decoded raster — the
      * classic perceptual image fingerprint: sample the image at the
      * 64 cell centers `x_i = (2i+1)·W/16`, `y_j = (2j+1)·H/16`,
      * gray = (r+g+b)/3, and emit bit k = 8j+i as '1' iff
      * gray > floor(Σgray/64). All-integer arithmetic, so a SQL
      * oracle replays it exactly. CENTER sampling makes the hash
      * exactly scale-invariant for band-constant images (the center
      * of cell i lands in band i for any W ≥ 16 — the floor algebra
      * in the mm5 scaladoc), which is what lets resized copies
      * collapse to one hash while their byte checksums differ.
      * Returned as a 64-char '0'/'1' string: the oracle compare is
      * signedness-free and band prefixes slice trivially.
      */
    def aHash(bytes: Array[Byte]): String = {
      val img = readPng(bytes)
      val w = img.getWidth; val h = img.getHeight
      val gs = new Array[Int](64)
      var sum = 0L
      var k = 0
      var j = 0
      while (j < 8) {
        val y = ((2 * j + 1) * h) / 16
        var i = 0
        while (i < 8) {
          val x = ((2 * i + 1) * w) / 16
          val p = img.getRGB(x, y)
          val g = (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
          gs(k) = g; sum += g; k += 1; i += 1
        }
        j += 1
      }
      val mean = sum / 64
      val sb = new java.lang.StringBuilder(64)
      k = 0
      while (k < 64) { sb.append(if (gs(k) > mean) '1' else '0'); k += 1 }
      sb.toString
    }
  }

  /** The synthetic image fixtures' ground truth: dimensions and fill
    * color as PURE FUNCTIONS of the media id. The PNG payload is
    * genuinely encoded from these, the engine genuinely decodes the
    * payload back, and the DuckDB oracle recomputes the same values
    * arithmetically — so an oracle match PROVES the decode recovered
    * the constructed pixels, not that two stubs agree.
    */
  object Fixture {
    def width(id: Long): Int = (16 + id % 48).toInt
    def height(id: Long): Int = (16 + (id * 7) % 48).toInt
    def r(id: Long): Int = ((id * 37) % 256).toInt
    def g(id: Long): Int = ((id * 59) % 256).toInt
    def b(id: Long): Int = ((id * 83) % 256).toInt
    def rgb(id: Long): Int = (r(id) << 16) | (g(id) << 8) | b(id)

    /** Encoded-payload memo: PNG encode (deflate) is the expensive
      * half of fixture generation, and r5 paid it for every image row
      * on EVERY query run (mm4 twice per run) — it dominated the
      * multimodal bench rows. Payloads are pure functions of the id,
      * so memoize per JVM (executor-local on a real cluster; shared
      * across queries on local[n]). Bounded: past `pngCacheMax`
      * entries new ids encode without caching, so fixture generation
      * can never grow executor memory with the corpus.
      */
    private val pngCache = new java.util.concurrent.ConcurrentHashMap[Long, Array[Byte]]()
    private val pngCacheMax = 1 << 18

    def png(id: Long): Array[Byte] = {
      val hit = pngCache.get(id)
      if (hit != null) hit
      else {
        val bytes = Codec.encodePng(width(id), height(id), rgb(id))
        if (pngCache.size < pngCacheMax) pngCache.putIfAbsent(id, bytes)
        bytes
      }
    }
  }

  /** Block-gradient fixtures for the perceptual-hash surface: an 8×8
    * grid of grayscale bands whose level is a pure function of
    * (id % 7, band coords) — so ids sharing `id % 7` render the SAME
    * visual content at DIFFERENT pixel dimensions (the [[Fixture]]
    * size arithmetic), i.e. resized copies: different encoded bytes,
    * different md5, same picture. That is the duplicate class a
    * byte-level checksum can never catch and [[Codec.aHash]] must.
    */
  object BandFixture {
    def gray(id: Long, bx: Int, by: Int): Int =
      (((id % 7) * 31 + bx * 13L + by * 29L) % 256).toInt

    private def encode(id: Long): Array[Byte] = {
      val w = Fixture.width(id); val h = Fixture.height(id)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        val by = y * 8 / h
        var x = 0
        while (x < w) {
          val v = gray(id, x * 8 / w, by)
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    private val cache = new java.util.concurrent.ConcurrentHashMap[Long, Array[Byte]]()
    private val cacheMax = 1 << 18

    /** Memoized like [[Fixture.png]], same boundedness contract. */
    def png(id: Long): Array[Byte] = {
      val hit = cache.get(id)
      if (hit != null) hit
      else {
        val bytes = encode(id)
        if (cache.size < cacheMax) cache.putIfAbsent(id, bytes)
        bytes
      }
    }
  }

  /** One perceptual fingerprint per image. */
  final case class PHash(media_id: Long, ahash: String)

  /** The image rows of the corpus re-rendered as band-gradient PNGs
    * (doc_id % 3 = 0, like [[mediaTable]]'s image arm) — the input to
    * the perceptual-dedup surface.
    */
  def bandImageTable(spark: SparkSession, sfDir: String): Dataset[Media] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 3 === 0) // Column filter: pushed to the scan
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map(id => Media(id, "image", BandFixture.png(id))))
  }

  /** Perceptual-hash pass: REAL decode + [[Codec.aHash]] per image,
    * per-partition batch loop like [[decodeMeta]]. Map-only — the
    * payload never shuffles; downstream grouping shuffles only
    * (id, 64-char hash) rows.
    */
  def perceptualHash(media: Dataset[Media]): Dataset[PHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map(m =>
        PHash(m.media_id, Codec.aHash(m.content))))
    }
  }

  /** Synthetic media table over `documents` (the container ships no
    * binary fixtures): kind cycles image/audio/video; image rows carry
    * a REAL PNG payload ([[Fixture]] — decoded, not trusted, by the
    * operators below), audio/video rows carry the UTF-8 text bytes.
    * Binary column + metadata exactly as a real ingest would land
    * them; generation is a map-only kernel that pipelines with the
    * scan.
    */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[Media] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      // null text → empty payload: the decode kernels take the binary
      // column as-is and must never see a null pointer
      .select(col("doc_id").cast("long"), coalesce(col("text"), lit("")))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          (id % 3) match {
            case 0 => Media(id, "image", Fixture.png(id))
            case 1 => Media(id, "audio", text.getBytes(StandardCharsets.UTF_8))
            case _ => Media(id, "video", text.getBytes(StandardCharsets.UTF_8))
          }
        }
      }
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
          val (w, h, c) = Codec.decodeImage(m.content)
          ImageMeta(m.media_id, m.content.length.toLong, w.toLong, h.toLong,
            c.toLong, Codec.md5Hex(m.content))
        }
      }
    }
  }

  /** Feature extraction: binary → 8 integer features. PNG payloads
    * get REAL pixel-derived features (dimensions, area, per-channel
    * means read back from the decoded raster); other payloads get the
    * stub digest slices (the stand-in for an embedding model).
    * Downstream these feed the same [[graft.operators.Similarity]]
    * bucketing as real embeddings.
    */
  def extractFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          if (Codec.isPng(m.content)) {
            val (w, h, _, r, g, b) = Codec.imageStats(m.content)
            MediaFeatures(m.media_id, w.toLong, h.toLong, w.toLong * h,
              r, g, b, r + g + b, math.max(r, math.max(g, b)))
          } else {
            val hex = Codec.md5Hex(m.content)
            def f(i: Int): Long = java.lang.Long.parseLong(hex.substring(i * 4, i * 4 + 4), 16)
            MediaFeatures(m.media_id, f(0), f(1), f(2), f(3), f(4), f(5), f(6), f(7))
          }
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
          val dur = Codec.durationMs(m.content)
          val base = Codec.md5Hex(m.content)
          (0L to dur / intervalMs).iterator.map { i =>
            Frame(m.media_id, i, i * intervalMs,
              Codec.md5Hex(s"$base:$i".getBytes(StandardCharsets.UTF_8)))
          }
        }
      }
    }
  }

  /** SHOT-BOUNDARY detection + keyframe selection over a
    * [[sampleFrames]] stream — the video-curation step that picks one
    * representative frame per shot instead of embedding every sampled
    * frame (a 10× cost cut before any model sees pixels). A per-frame
    * scalar luma surrogate is derived from the frame signature (STUB —
    * swapping in a real codec's per-frame luma/histogram is exactly
    * the [[Codec]] stub-branch contract; the windowing below is the
    * real machinery), a cut opens wherever the luma jumps past
    * `threshold` (or at the first frame), and the cut frame IS the
    * shot's keyframe.
    *
    * Plan shape: lag + running cut-sum are two stacked windows over
    * ONE media_id shuffle (same partitioning and sort), then a
    * map-side filter — frames shuffle once, payloads never.
    */
  def keyframes(frames: Dataset[Frame], threshold: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_idx")
    val luma = conv(substring(col("frame_sig"), 1, 4), 16, 10)
      .cast("long") % 256
    frames.toDF()
      .withColumn("_luma", luma)
      .withColumn("_cut", when(lag(col("_luma"), 1).over(w).isNull ||
        abs(col("_luma") - lag(col("_luma"), 1).over(w)) > threshold, 1L)
        .otherwise(0L))
      .withColumn("shot_idx", sum(col("_cut")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .filter(col("_cut") === 1)
      .select(col("media_id"), col("shot_idx"), col("frame_idx"), col("ts_ms"))
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

  /** Perceptual NEAR-dup pairs over a [[perceptualHash]] table — the
    * Hamming-close image families mm5's exact-hash grouping can't
    * connect (small crops/edits flip a few aHash bits; resizes flip
    * none). Two-stage shape, and the staging IS the scale design:
    * (1) collapse to DISTINCT hashes first — the sketch table is
    * bounded by visual diversity, not corpus size, so every later
    * stage is off the image count entirely; (2) band each 64-bit
    * hash into 8×8-bit keys (the d6 SimHash machinery on image
    * sketches) and bucket-join — never all-pairs, `maxBucket`
    * capping any degenerate band; (3) exact Hamming ≤ `maxHamming`
    * on the bit-parallel XOR of the survivors. Banding is the d6
    * recall heuristic: pigeonhole guarantees a shared band only for
    * hamming < 8, beyond that recall decays gracefully — the
    * standard LSH trade, and the oracle replays the same bands so
    * the contract is checked, not assumed. Pairs are emitted between
    * CANONICAL ids (each side an entire exact-dup family, with its
    * size), so downstream clustering unions families, not images.
    */
  def phashNearDupPairs(ph: DataFrame, maxHamming: Int,
                        maxBucket: Int = 1000): DataFrame = {
    require(maxBucket >= 2, s"maxBucket must allow pairs, got $maxBucket")
    val gr = ph.groupBy("ahash").agg(
      min("media_id").as("canonical_id"), count(lit(1)).as("group_n"))
    val bandCols = (0 until 8).map { b =>
      struct(lit(b).as("band"), substring(col("ahash"), b * 8 + 1, 8).as("bv"))
    }
    val bands = gr.select(col("ahash"), col("canonical_id"), col("group_n"),
        explode(array(bandCols: _*)).as("bs"))
      .select(col("ahash"), col("canonical_id"), col("group_n"),
        col("bs.band").as("band"), col("bs.bv").as("bv"))
    val okBuckets = bands.groupBy("band", "bv")
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") <= maxBucket).select("band", "bv")
    val bounded = bands.join(okBuckets, Seq("band", "bv"))
    val cand = bounded.as("a").join(bounded.as("b"), Seq("band", "bv"))
      .filter(col("a.canonical_id") < col("b.canonical_id"))
      .select(col("a.ahash").as("ha"), col("b.ahash").as("hb"),
        col("a.canonical_id").as("id_a"), col("b.canonical_id").as("id_b"),
        col("a.group_n").as("n_a"), col("b.group_n").as("n_b"))
      .distinct()
    // bit-parallel Hamming: 4×16-bit chunks → long → XOR → popcount
    def chunk(c: Column, i: Int) =
      conv(substring(c, i * 16 + 1, 16), 2, 10)
        .cast(org.apache.spark.sql.types.LongType)
    val ham = (0 until 4)
      .map(i => bit_count(chunk(col("ha"), i).bitwiseXOR(chunk(col("hb"), i))))
      .reduce(_ + _)
    cand.select(col("id_a"), col("id_b"), col("n_a"), col("n_b"),
        ham.cast(org.apache.spark.sql.types.LongType).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
