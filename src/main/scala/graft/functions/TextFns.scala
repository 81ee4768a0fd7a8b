package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level text primitives (tokenize, stopword votes, LSH band
  * hash, permutation constants). The hashing-heavy per-document
  * kernels (shingle hashes, MinHash signatures, fingerprints,
  * SimHash) live in [[TextKernels]] — md5 inside Catalyst
  * higher-order-function lambdas is interpreted and measured 4–10×
  * slower than the typed kernels, while everything here stays cheap
  * and codegen-friendly.
  *
  * Hashing design: the only hash both engines (and any other SQL
  * engine) compute identically is MD5 of UTF-8 bytes —
  * [[TextKernels.hash60]] takes the first 15 hex chars (60 bits,
  * always positive in a signed 64-bit long), wide enough that
  * birthday collisions stay negligible at 100 TB shingle
  * cardinalities. At scale you would swap in xxhash64 for speed; md5
  * is chosen for cross-engine verifiability.
  */
object TextFns {

  /** Modulus for polynomial rolling fingerprints (large prime, keeps
    * the 31x fold inside 63 bits: acc < P ⇒ acc*31 + h < 3.2e10).
    */
  val FoldP = 1000000007L

  /** Whitespace tokens of lowercased, trimmed text. */
  def toks(c: Column): Column = split(trim(lower(c)), "\\s+")

  /** 60-bit md5-prefix hash as a Column — the declarative twin of
    * [[TextKernels.hash60]] (first 15 hex chars = first 60 bits), so
    * sketch inputs hash identically in codegen'd expressions, typed
    * kernels, and the DuckDB oracles' `hash60Sql`.
    */
  def hash60Col(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(org.apache.spark.sql.types.LongType)

  /** Deterministic (a, b) pairs for the (a·h + b) mod P permutation
    * family, derived from md5 so any engine regenerates them; a ≠ 0.
    */
  def permuteParams(k: Int): Seq[(Long, Long)] =
    (0 until k).map { j =>
      def h(tag: String): Long = {
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"minhash_${tag}_$j".getBytes("UTF-8"))
        java.lang.Long.parseLong(md.map("%02x".format(_)).mkString.take(15), 16)
      }
      (h("a") % (FoldP - 1) + 1, h("b") % FoldP)
    }

  /** LSH band hash for a signature: md5 of the comma-joined band rows.
    * Bands of `rows` signature entries starting at 1-based `start`.
    */
  def bandHash(sig: Column, start: Int, rows: Int): Column =
    md5(concat_ws(",",
      (0 until rows).map(r => element_at(sig, start + r).cast(StringType)): _*))

  /** Count of tokens drawn from a fixed vocabulary (stopword votes). */
  def vocabHits(tk: Column, vocab: Seq[String]): Column =
    size(filter(tk, t => t.isInCollection(vocab))).cast(LongType)
}
