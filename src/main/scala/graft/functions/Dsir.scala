package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
  * pick raw-corpus documents whose hashed-n-gram distribution looks
  * like a target corpus. The slot in the reference is the scored
  * record filter of a mapper stage (/root/reference/src/Hadron/
  * Basic.hs); the method itself is the published hashed-bag-of-ngrams
  * importance weight
  *
  *   score(doc) = Σ over tokens of [ log p̂(b(t)) − log q̂(b(t)) ]
  *
  * with p̂/q̂ add-one-smoothed bucket frequencies under the target and
  * raw corpora and b(t) an md5 token bucket.
  *
  * Determinism: the logs are [[ilog2Fx]] — an EXACT integer binary
  * logarithm at 2^20 scale (20 rounds of fixed-point squaring, the
  * textbook bit-by-bit algorithm). Unlike `ln`/`log2` floats it is
  * bit-identical in every engine (the DuckDB oracle replays the same
  * loop in a recursive CTE), extending the `LangModel`/`Classifier`
  * fixed-point discipline to log space — which is what lets this
  * operator keep the PUBLISHED log-likelihood-ratio scoring rather
  * than fall back to a linear-sum proxy.
  *
  * Scale shape: bucket counts are ONE groupBy over the exploded token
  * stream with both corpora counted in the same pass (map-side combine
  * into ≤ `buckets` partials per partition — the shuffle carries at
  * most `buckets` rows per partition regardless of corpus size). The
  * λ table is a driver-computed bounded statistic (`buckets` rows,
  * same contract as the k-means/PQ training collects) broadcast back
  * into a map-only scoring join; the token stream is recomputed for
  * the scoring pass rather than cached (two scans beat materializing
  * a corpus-sized exploded stream — the q34 no-cache measurement).
  * Top-k select is orderBy+limit → TakeOrderedAndProject (per-partition
  * heaps, no global sort shuffle).
  */
object Dsir {

  val Scale: Long = 1L << 20

  /** [[ilog2Fx]] accepts v in [1, 2^43): v << 20 must stay inside a
    * signed 64-bit long. Token totals beyond ~8.8e12 per side need
    * count pre-scaling before the smoothing add.
    */
  val MaxLogInput: Long = 1L << 43

  /** floor-truncated log2(v) in 2^20 fixed point, exact integer
    * arithmetic only: integer part from the bit length, then 20 rounds
    * of mantissa squaring emit one fraction bit each. Error vs the real
    * log2 is < 2^-19 (one truncation per round); exact at powers of 2.
    */
  def ilog2Fx(v: Long): Long = {
    require(v >= 1 && v < MaxLogInput, s"ilog2Fx domain is [1, 2^43), got $v")
    val ipart = 63 - java.lang.Long.numberOfLeadingZeros(v)
    var x = (v << 20) >> ipart // mantissa in [2^20, 2^21)
    var acc = 0L
    var i = 0
    while (i < 20) {
      val x2 = (x * x) >> 20 // in [2^20, 2^22)
      if (x2 >= (1L << 21)) { x = x2 >> 1; acc = (acc << 1) | 1L }
      else { x = x2; acc = acc << 1 }
      i += 1
    }
    ipart * Scale + acc
  }

  /** md5 token bucket in [0, buckets): first 8 md5 hex digits (< 2^32,
    * exact in a long) mod the bucket count.
    */
  def bucketOf(token: Column, buckets: Int): Column =
    conv(substring(Hashing.md5Hex(token), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Score every document: (id, n_tokens, dsir_fx) where dsir_fx is the
    * fixed-point log-likelihood ratio summed over tokens. `isTarget`
    * marks the rows whose token distribution defines p̂; q̂ comes from
    * ALL rows. Zero-token documents are absent. Buckets never seen in
    * the corpus have no λ entry — they cannot match a scored token,
    * since scored docs ARE the corpus.
    */
  def importanceScores(
      docs: DataFrame,
      id: Column,
      text: Column,
      isTarget: Column,
      buckets: Int = 1024): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20),
      s"buckets must be in [2, 2^20], got $buckets")
    val spark = docs.sparkSession
    def tokenStream = docs.select(
      id.as("id"), isTarget.as("tgt"), explode(Text.tokens(text)).as("t"))
      .select(col("id"), col("tgt"), bucketOf(col("t"), buckets).as("b"))

    // one pass, one ≤`buckets`-row-per-partition shuffle for BOTH sides
    val counts = tokenStream
      .groupBy("b")
      .agg(count(lit(1)).as("qn"),
        sum(when(col("tgt"), 1L).otherwise(0L)).as("pn"))
      .collect() // bounded: ≤ `buckets` rows — the sufficient statistic
    require(counts.nonEmpty, "no tokens in any document")
    val qt = counts.map(_.getLong(1)).sum
    val pt = counts.map(_.getLong(2)).sum
    require(pt > 0, "target side has no tokens")
    require(qt + buckets < MaxLogInput,
      s"token total $qt overflows the fixed-point log domain")
    val lpt = ilog2Fx(pt + buckets)
    val lqt = ilog2Fx(qt + buckets)
    val lambdaRows = counts.map { r =>
      val lam = (ilog2Fx(r.getLong(2) + 1) - lpt) -
        (ilog2Fx(r.getLong(1) + 1) - lqt)
      Row(r.getLong(0), lam)
    }
    val lambdaDf = spark.createDataFrame(
      spark.sparkContext.parallelize(lambdaRows.toIndexedSeq, 1),
      StructType(Seq(StructField("b", LongType, nullable = false),
        StructField("lam", LongType, nullable = false))))

    tokenStream
      .join(broadcast(lambdaDf), Seq("b")) // map-only: λ is buckets rows
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("lam")).as("dsir_fx"))
  }

  /** The resampling step: top-k documents by importance score,
    * deterministic tie-break on id.
    */
  def resampleTopK(
      docs: DataFrame,
      id: Column,
      text: Column,
      isTarget: Column,
      k: Int,
      buckets: Int = 1024): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    importanceScores(docs, id, text, isTarget, buckets)
      .orderBy(col("dsir_fx").desc, col("id").asc)
      .limit(k)
  }
}
