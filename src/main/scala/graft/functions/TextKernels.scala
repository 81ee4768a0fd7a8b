package graft.functions

import java.security.MessageDigest
import java.util.Locale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Typed per-partition kernels for the text-hashing hot paths
  * (shingle hashes, MinHash signatures, rolling fingerprints).
  *
  * Why kernels and not `Column` expressions: these ops apply md5 to
  * every token/shingle INSIDE `transform(...)` lambdas, and Catalyst
  * higher-order functions are interpreted (no whole-stage codegen) —
  * measured 5–10× slower than the same arithmetic in a JVM loop
  * (cf. the SimHash kernel in [[graft.operators.Dedup]]). Every
  * kernel reproduces the Column semantics bit-for-bit: tokens =
  * `split(trim-of-spaces(lower(text)), \s+)` (Spark's `trim` strips
  * only ASCII 0x20 — NOT Java `String.trim`), hash = first 15 hex
  * chars of md5 (= [[TextFns.hash60]]), and the DuckDB oracles are
  * unchanged.
  *
  * Scale shape: map-only stages that pipeline with the parquet scan;
  * one digest instance per partition; no shuffle.
  */
object TextKernels {

  /** JVM twin of the tokenizer semantics in [[TextFns.toks]];
    * null-tolerant (null text → no tokens, mirroring how the Column
    * form's null propagates to a null/empty result downstream).
    */
  def toks(text: String): Array[String] = {
    if (text == null) return Array.empty
    val lowered = text.toLowerCase(Locale.ROOT)
    val from = lowered.indexWhere(_ != ' ')
    val until = lowered.lastIndexWhere(_ != ' ') + 1
    val t = if (from < 0) "" else lowered.substring(from, until)
    t.split("\\s+", -1)
  }

  /** First 15 hex chars of md5 as a long (= `parseLong(hex.take(15),
    * 16)`), read straight from the digest bytes: 60 bits = bytes 0–6
    * big-endian plus the high nibble of byte 7. No hex-string
    * round-trip — the `%02x`-per-byte formatting was measurably the
    * hot allocation site in the dedup kernels.
    */
  def hash60(md: MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  /** Distinct word n-gram shingles, hashed to distinct 60-bit longs
    * (order of first occurrence, matching `array_distinct`).
    */
  def shingleHashArray(md: MessageDigest, text: String, n: Int): Array[Long] = {
    val tk = toks(text)
    if (tk.length < n) Array.empty[Long]
    else {
      val seenS = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i <= tk.length - n) {
        seenS.add(tk.slice(i, i + n).mkString(" ")); i += 1
      }
      val out = new java.util.LinkedHashSet[java.lang.Long]()
      seenS.forEach(s => out.add(hash60(md, s)))
      val arr = new Array[Long](out.size)
      var j = 0
      out.forEach { h => arr(j) = h; j += 1 }
      arr
    }
  }

  /** (id, hs, sig): hashed shingle set + k-wide MinHash signature via
    * the (a·h + b) mod P permutation family of
    * [[TextFns.permuteParams]]. Signature entries are null for empty
    * shingle sets (matching `array_min` over an empty array).
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val perms = TextFns.permuteParams(k).toArray
    val p = TextFns.FoldP
    docs.select(col(idCol).cast(LongType), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val hs = shingleHashArray(md, text, n)
          val sig: Array[Option[Long]] =
            if (hs.isEmpty) Array.fill(k)(Option.empty[Long])
            else perms.map { case (a, b) =>
              var m = Long.MaxValue
              var i = 0
              while (i < hs.length) {
                val v = ((hs(i) % p) * a + b) % p
                if (v < m) m = v
                i += 1
              }
              Some(m)
            }
          (id, hs, sig)
        }
      }.toDF(idCol, "hs", "sig")
  }

  /** (id, hs): hashed shingle sets only (no signature). */
  def shingleHashTable(docs: DataFrame, idCol: String, textCol: String,
                       n: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast(LongType), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.map { case (id, text) => (id, shingleHashArray(md, text, n)) }
      }.toDF(idCol, "hs")
  }

  /** (id, fp): order-sensitive polynomial rolling fingerprint over
    * the FULL token stream (multiset, in order) —
    * fold h = (h·31 + hash60(tok) mod P) mod P.
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val p = TextFns.FoldP
    docs.select(col(idCol).cast(LongType), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          var acc = 0L
          toks(text).foreach { t => acc = (acc * 31 + hash60(md, t) % p) % p }
          (id, acc)
        }
      }.toDF(idCol, "fp")
  }
}
