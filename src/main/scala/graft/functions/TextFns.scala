package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis primitives for the LLM-data-pipeline surface
  * (tokenize, shingle, deterministic hashing, MinHash, SimHash,
  * rolling fingerprints). All are pure Catalyst `Column` expressions —
  * no UDFs — so they stay inside whole-stage codegen, and every one is
  * reproducible bit-for-bit in ANSI SQL (the DuckDB oracle), which is
  * what makes the dedup/similarity operators oracle-checkable.
  *
  * Hashing design: the only hash both engines (and any other SQL
  * engine) compute identically is MD5 of UTF-8 bytes. [[hash60]] takes
  * the first 15 hex chars of md5 (60 bits, always positive in a signed
  * 64-bit long) — wide enough that birthday collisions stay negligible
  * at 100 TB shingle cardinalities. At scale you would swap in
  * xxhash64 for speed; md5 is chosen for cross-engine verifiability,
  * and the swap is a one-line change inside [[hash60]].
  */
object TextFns {

  /** Modulus for polynomial rolling fingerprints (large prime, keeps
    * the 31x fold inside 63 bits: acc < P ⇒ acc*31 + h < 3.2e10).
    */
  val FoldP = 1000000007L

  /** 60-bit positive hash of a string column: first 15 hex chars of
    * md5, base-16 → long. DuckDB equivalent:
    * `CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)`.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Whitespace tokens of lowercased, trimmed text. */
  def toks(c: Column): Column = split(trim(lower(c)), "\\s+")

  /** Distinct word n-gram shingles (space-joined), empty array for
    * texts with fewer than n tokens.
    */
  def shingles(tk: Column, n: Int): Column =
    when(size(tk) >= n,
      array_distinct(transform(sequence(lit(0), size(tk) - n),
        i => array_join(slice(tk, i + lit(1), lit(n)), " "))))
      .otherwise(array().cast(ArrayType(StringType)))

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

  /** 60-bit hashes of the shingle set, distinct AFTER hashing — the
    * integer basis for both minhash and Jaccard verification. Longs
    * intersect/shuffle far cheaper than shingle strings, and because
    * both engines hash identically, even the (negligible) collision
    * cases agree cell-for-cell.
    */
  def shingleHashes(sh: Column): Column = array_distinct(transform(sh, s => hash60(s)))

  /** MinHash signature from a pre-hashed shingle set ([[shingleHashes]]). */
  def minhashSigFromHashes(hs: Column, k: Int): Column = {
    val hsP = transform(hs, h => h % FoldP)
    array(permuteParams(k).map { case (a, b) =>
      array_min(transform(hsP, h => (h * a + b) % FoldP))
    }: _*)
  }

  /** MinHash signature: k min-hashes over the shingle set via the
    * textbook (a·h + b) mod P permutation family on a SINGLE 60-bit
    * shingle hash. One md5 pass per shingle (the identical `hs`
    * subtree is shared by whole-stage codegen's subexpression
    * elimination) + k codegen'd integer folds — the salted-md5
    * alternative costs k md5 passes, which dominated the round-3
    * bench (58 s → ~1 s at sf0.1). h < P and a < P keep a·h + b
    * inside 63 bits (exact in any engine). Null entries for empty
    * shingle sets.
    */
  def minhashSig(sh: Column, k: Int): Column = {
    val hs = transform(sh, s => hash60(s) % FoldP)
    array(permuteParams(k).map { case (a, b) =>
      array_min(transform(hs, h => (h * a + b) % FoldP))
    }: _*)
  }

  /** LSH band hash for a signature: md5 of the comma-joined band rows.
    * Bands of `rows` signature entries starting at 1-based `start`.
    */
  def bandHash(sig: Column, start: Int, rows: Int): Column =
    md5(concat_ws(",",
      (0 until rows).map(r => element_at(sig, start + r).cast(StringType)): _*))

  /** Polynomial rolling fingerprint over the token stream:
    * fold h = (h*31 + hash60(tok) mod P) mod P. Order-sensitive (a
    * permuted document fingerprints differently), exact integer math —
    * both engines fold left over the same token order.
    */
  def fingerprint(tk: Column): Column =
    aggregate(
      transform(tk, t => hash60(t) % FoldP),
      lit(0L),
      (acc, h) => (acc * 31 + h) % FoldP)

  /** Count of tokens drawn from a fixed vocabulary (stopword votes). */
  def vocabHits(tk: Column, vocab: Seq[String]): Column =
    size(filter(tk, t => t.isInCollection(vocab))).cast(LongType)
}
