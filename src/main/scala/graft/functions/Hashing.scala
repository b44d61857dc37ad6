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

  /** MinHash modulus: largest prime below 2^30 would do; 1e9+7 is the
    * conventional choice. Products (i+1)*v with v < P stay far inside
    * signed-64 range, so the same arithmetic is exact in any engine.
    */
  val MinhashP: Long = 1000000007L

  /** 60-bit integer fingerprint of a string: value of the first 15 hex
    * digits of its md5, reduced mod [[MinhashP]]. ONE md5 per value — the
    * k permutations are derived arithmetically (below), not by k re-hashes,
    * which matters when shingle sets are large (k× fewer digest calls).
    */
  def md5Mod(c: Column): Column =
    (conv(substring(md5(c.cast("binary")), 1, 15), 16, 10)
      .cast("long") % MinhashP)

  /** The i-th permutation of a base fingerprint v: ((i+1)*v + 40503*i)
    * mod P — the classic (a*x+b) universal-hash family with fixed,
    * engine-portable constants.
    */
  def permute(i: Int, v: Column): Column =
    (v * (i + 1) + 40503L * i) % MinhashP

  /** Kernel-side twin of [[md5Mod]] over a dedup'd gram set: hash each
    * gram (first 15 md5 hex digits = top 8 bytes >>> 4, mod
    * [[MinhashP]]), dedupe ON THE HASH, return ascending-sorted — the
    * shared tail of every shingle kernel (char shingles, token
    * n-grams). One definition so the hash convention can never drift
    * between kernels and silently break their shared oracle mirror.
    */
  private[graft] def hashGramSet(
      grams: java.util.LinkedHashSet[String],
      md: java.security.MessageDigest): Array[Long] = {
    val vmSet = new java.util.LinkedHashSet[java.lang.Long]()
    val it = grams.iterator()
    while (it.hasNext) {
      val d = md.digest(it.next().getBytes("UTF-8"))
      val v = java.nio.ByteBuffer.wrap(d, 0, 8).getLong >>> 4
      vmSet.add(v % MinhashP)
    }
    val vms = new Array[Long](vmSet.size)
    val vit = vmSet.iterator(); var jj = 0
    while (vit.hasNext) { vms(jj) = vit.next(); jj += 1 }
    java.util.Arrays.sort(vms)
    vms
  }

  /** MinHash signature: array of `numHashes` minima over the shingle set.
    * Null/empty shingle arrays yield an empty signature. NOTE: prefer
    * computing the base array into its own materialized column and calling
    * [[minhashFromBase]] — Catalyst inlines `base` into every permutation
    * lambda here (no CSE across HOF bodies), re-hashing k times.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    minhashFromBase(transform(shingles, s => md5Mod(s)), numHashes)

  /** Signature from a precomputed base-fingerprint array (see md5Mod). */
  def minhashFromBase(base: Column, numHashes: Int): Column =
    when(size(base) > 0,
      transform(sequence(lit(0), lit(numHashes - 1)),
        i => array_min(transform(base, v => permute0(i, v)))))
      .otherwise(array().cast("array<bigint>"))

  private def permute0(i: Column, v: Column): Column =
    (v * (i + 1) + lit(40503L) * i) % MinhashP

  /** LSH band keys: split the signature into `bands` bands of `rowsPerBand`
    * and join each band's values into a bucket key. Docs sharing ANY band
    * key become candidates. Band index is part of the key so buckets from
    * different bands never collide.
    */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => concat(
        b.cast("string"), lit("|"),
        array_join(slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)), ",")))

  /** 64-bit SimHash over a token array: majority vote per bit position of
    * each token's 64-bit hash (first 16 md5 hex digits). Single pass over
    * the tokens with an array-of-counts accumulator — one md5 + 64 cheap
    * integer ops per token, instead of 64 re-scans. Computed as two
    * 32-bit halves because the double-safe bit-extraction trick below
    * (exact only to 2^53) and `conv(...).cast("long")` (unsigned
    * overflow) both break past 32 bits; the halves recombine with a
    * plain shift. 64 bits, not 32, for the same banding-collision
    * reason as `Dedup.simhashSignatures` (whose kernel this must match
    * bit-for-bit).
    */
  def simhash(toks: Column): Column = {
    // one 32-bit value per token half (hex digits are exact in a
    // double-free path)
    def vals(from: Int) = transform(toks,
      t => conv(substring(md5Hex(t), from, 8), 16, 10).cast("long"))
    // 2^e as long — powers of two are exact in double for all e here, and
    // the HOF lambdas need Column shifts, which shiftleft/right don't take
    def pow2(e: Column): Column = pow(lit(2.0), e.cast("double")).cast("long")
    // counts[b] = number of tokens with bit b set (b=0 is the half's MSB);
    // bit extraction (v / 2^(31-b)) % 2 is exact: dividing by a power of
    // two only shifts the float exponent
    def half(from: Int): Column = {
      val vs = vals(from)
      val counts = aggregate(vs,
        array_repeat(lit(0L), 32),
        (acc, v) => zip_with(acc,
          transform(sequence(lit(0), lit(31)),
            b => (v.cast("double") / pow2(lit(31) - b)).cast("long") % 2),
          (a, x) => a + x))
      val n = size(vs)
      aggregate(
        zip_with(counts, sequence(lit(0), lit(31)),
          (c, b) => when(c * 2 >= n, pow2(lit(31) - b)).otherwise(lit(0L))),
        lit(0L), (acc, x) => acc + x)
    }
    val sh = shiftleft(half(1), 32).bitwiseOR(half(9))
    when(size(toks) > 0, sh).otherwise(lit(0L))
  }

  /** Hamming distance between two simhash longs (popcount of xor). */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
