package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic hashing primitives for dedup/LSH, built on md5.
  *
  * Design decision: every hash here is derived from md5 over explicit
  * strings rather than engine-native hash functions (Spark's murmur3
  * `hash()`, xxhash64) so that (a) results are identical across engines —
  * each pipeline is verifiable against an independent SQL oracle — and
  * (b) signatures are stable across Spark versions and cluster layouts.
  * md5 is a codegen'd built-in expression; for 100 TB runs the cost is
  * scan-dominated, and the k-permutation trick (seeded re-hash) avoids any
  * driver-side randomness or broadcast state.
  */
object Hashing {

  /** md5 hex (lowercase, 32 chars) of a string column. */
  def md5Hex(c: Column): Column = md5(c.cast("binary"))

  /** The i-th "permutation" hash of a value: md5 over a seed prefix.
    * Fixed-width lowercase hex compares lexicographically as an unsigned
    * 128-bit integer, so `min` over these IS MinHash.
    */
  def seededHash(seed: Column, c: Column): Column =
    md5(concat(seed.cast("string"), lit(":"), c).cast("binary"))

  /** MinHash signature: array of `numHashes` minima over the shingle set.
    * Null/empty shingle arrays yield an empty signature.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    when(size(shingles) > 0,
      transform(sequence(lit(0), lit(numHashes - 1)),
        i => array_min(transform(shingles, s => seededHash(i, s)))))
      .otherwise(array().cast("array<string>"))

  /** LSH band keys: split the signature into `bands` bands of `rowsPerBand`
    * and hash each band. Docs sharing ANY band key become candidates.
    * Output: array of "bandIndex|bandHash" strings (band index included so
    * buckets from different bands never collide).
    */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => concat(
        b.cast("string"), lit("|"),
        md5(array_join(slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)), ",")
          .cast("binary"))))

  /** 32-bit SimHash over a token array, as a signed sum per bit position of
    * ±1 votes from each token's 32-bit hash (first 8 md5 hex digits).
    * Implemented with pure per-hex-digit arithmetic (strpos into a hex
    * alphabet) so an independent SQL engine reproduces it bit-for-bit.
    */
  def simhash(toks: Column): Column = {
    val hexDigits = "0123456789abcdef"
    // per token: 8 hex chars -> 32 bits, bit b in {0,1}
    def bitOf(tokenHash: Column, b: Int): Column = {
      val digitIdx = b / 4 + 1 // 1-based position in the hex string
      val shift = 3 - (b % 4) // hex digit holds 4 bits, MSB first
      val v = instr(lit(hexDigits), tokenHash.substr(lit(digitIdx), lit(1))) - 1
      (v / math.pow(2, shift).toInt).cast("int") % 2
    }
    val hashes = transform(toks, t => substring(md5Hex(t), 1, 8))
    val bitCols: Seq[Column] = (0 until 32).map { b =>
      // sum of votes for bit b: (#ones - #zeros) >= 0  => bit set
      val ones = aggregate(hashes, lit(0),
        (acc, h) => acc + bitOf(h, b))
      when(ones * 2 >= size(hashes), lit(1L << (31 - b))).otherwise(lit(0L))
    }
    when(size(toks) > 0, bitCols.reduce((a, b) => a + b)).otherwise(lit(0L))
  }

  /** Hamming distance between two simhash longs (popcount of xor). */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
