package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{Codec, Media}

/** Unit coverage for the multimodal plumbing: binary schema, batch
  * loop, frame fan-out arithmetic, resize math — the parts a real
  * codec swap must not disturb.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def media(items: (Long, String, String)*) =
    spark.createDataset(items.map { case (id, kind, text) =>
      Media(id, kind, text.getBytes(StandardCharsets.UTF_8))
    })

  test("decodeMeta derives typed metadata from the payload bytes") {
    val meta = Multimodal.decodeMeta(media((1L, "image", "x" * 100)))
      .collect().head
    assert(meta.n_bytes == 100L)
    assert(meta.width == 16 + 100 % 64 && meta.height == 16 + (100 / 64) % 64)
    assert(meta.checksum == Codec.md5Hex("x".repeat(100).getBytes))
  }

  test("decodeMeta batch loop covers partitions larger than one batch") {
    val many = media((1L to (Multimodal.batchSize * 2L + 7L)).map(i =>
      (i, "image", s"payload-$i")): _*).repartition(2)
    val out = Multimodal.decodeMeta(many)
    assert(out.count() == Multimodal.batchSize * 2 + 7)
    assert(out.select(countDistinct(col("checksum"))).as[Long].head() ==
      Multimodal.batchSize * 2 + 7)
  }

  test("sampleFrames fans out only video, one frame per interval inclusive") {
    // 100 bytes * 40 ms = 4000 ms → frames at 0..4000 = 5 rows
    val frames = Multimodal.sampleFrames(
      media((1L, "video", "x" * 100), (2L, "image", "x" * 100)), intervalMs = 1000L)
    val rows = frames.orderBy("frame_idx").collect()
    assert(rows.map(_.media_id).distinct.toSeq == Seq(1L))
    assert(rows.map(_.ts_ms).toSeq == Seq(0L, 1000L, 2000L, 3000L, 4000L))
    // signatures chain off the payload digest + index
    val base = Codec.md5Hex("x".repeat(100).getBytes)
    assert(rows(2).frame_sig == Codec.md5Hex(s"$base:2".getBytes))
  }

  test("truncated payload with a PNG magic fails with a decode error, not an NPE") {
    // ImageIO.read returns null (not an exception) for this shape
    val bogus = Array[Byte](0x89.toByte, 'P', 'N', 'G', 1, 2, 3)
    val err = intercept[IllegalArgumentException] {
      Multimodal.Codec.decodeImage(bogus)
    }
    assert(err.getMessage.contains("not decodable"))
  }

  test("real PNG roundtrip: encode → decode recovers dimensions and fill color") {
    val bytes = Multimodal.Codec.encodePng(23, 17, 0x406080)
    assert(Multimodal.Codec.isPng(bytes))
    val (w, h, c, r, g, b) = Multimodal.Codec.imageStats(bytes)
    assert((w, h, c) == ((23, 17, 3)))
    assert((r, g, b) == ((0x40L, 0x60L, 0x80L)))
  }

  test("aHash is identical for resized copies and distinct for different content") {
    // ids 0 and 21 share id % 7 = 0 (same band pattern) but differ in
    // Fixture dimensions — resized copies: the encoded BYTES differ
    // (md5 dedup misses them) while the perceptual hash collapses them
    val a0 = Multimodal.BandFixture.png(0L)
    val a21 = Multimodal.BandFixture.png(21L)
    assert(Multimodal.Codec.md5Hex(a0) != Multimodal.Codec.md5Hex(a21))
    assert(Multimodal.Codec.aHash(a0) == Multimodal.Codec.aHash(a21))
    // id 3 renders a different pattern (3 % 7 = 3) → different hash
    assert(Multimodal.Codec.aHash(a0) !=
      Multimodal.Codec.aHash(Multimodal.BandFixture.png(3L)))
    assert(Multimodal.Codec.aHash(a0).length == 64)
  }

  test("extractFeatures is deterministic and 16-bit bounded") {
    val f1 = Multimodal.extractFeatures(media((1L, "audio", "same bytes"))).collect().head
    val f2 = Multimodal.extractFeatures(media((9L, "audio", "same bytes"))).collect().head
    assert(Seq(f1.f1, f1.f2, f1.f3, f1.f4) == Seq(f2.f1, f2.f2, f2.f3, f2.f4))
    assert(Seq(f1.f1, f1.f5, f1.f8).forall(v => v >= 0 && v < 65536))
  }

  test("resizeMeta shrinks the long side to the box, never upscales") {
    val meta = Multimodal.decodeMeta(media((1L, "image", "x" * 10)))
    val out = Multimodal.resizeMeta(meta, maxSide = 13)
      .select("width", "height", "out_width", "out_height")
      .as[(Long, Long, Int, Int)].collect().head
    // width 16+10=26, height 16 → scale 13/26=0.5 → 13 x 8
    assert(out == ((26L, 16L, 13, 8)))
    val noUp = Multimodal.resizeMeta(meta, maxSide = 1000)
      .select("out_width", "out_height").as[(Int, Int)].collect().head
    assert(noUp == ((26, 16)))
  }

  test("phashNearDupPairs: exact families collapse, close hashes pair, far hashes don't") {
    // guaranteed-recall arm of the banding contract: hamming < 8
    // MUST be found (pigeonhole over 8×8-bit bands), and exact-dup
    // family members must contribute ONE canonical node with the
    // family size, not per-image pairs.
    val base = "01" * 32 // 64 bits
    val flip2 = "10" + base.substring(2) // hamming 2 vs base
    val far = "10" * 32 // hamming 64 vs base
    val ph = Seq(
      (1L, base), (5L, base), (9L, base), // one exact family of 3
      (2L, flip2),
      (3L, far))
      .toDF("media_id", "ahash")
    val pairs = Multimodal.phashNearDupPairs(ph, maxHamming = 6)
      .select("id_a", "id_b", "n_a", "n_b", "hamming")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 3L, 1L, 2L)),
      s"expected exactly the canonical (family-of-3, flip2) pair, got $pairs")
  }

  test("phashNearDupPairs maxBucket valve suppresses degenerate bands") {
    // five DISTINCT hashes differing only in the last band: bands
    // 0–6 are all-zero 5-member buckets (degenerate), band 7 is a
    // singleton per hash. Valve below 5 → every shared bucket is
    // suppressed → no pairs; at 5 → all C(5,2) pairs form.
    val hs = (0 until 5).map { i =>
      val tail = String.format("%8s", (i + 1).toBinaryString).replace(' ', '0')
      (i.toLong, "0" * 56 + tail)
    }
    val ph = hs.toDF("media_id", "ahash")
    val valved = Multimodal.phashNearDupPairs(ph, maxHamming = 64, maxBucket = 4)
      .count()
    val open = Multimodal.phashNearDupPairs(ph, maxHamming = 64, maxBucket = 5)
      .count()
    assert(valved == 0L && open == 10L,
      s"valve must drop the 5-member band buckets: valved=$valved open=$open")
  }
}
