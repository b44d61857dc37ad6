package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-prefiltered semi/anti joins: the standard scale pattern for
  * "keep (or drop) the corpus rows whose key appears in a reference
  * set" when the reference is too big to broadcast as an exact set but
  * its MEMBERSHIP fits a bloom filter.
  *
  * Results are always EXACT: the bloom only pre-filters map-side
  * before an exact join resolves its false positives, so the filter
  * parameters trade shuffle volume, never correctness (the same
  * argument as [[Sketch.heavyHitters]]'s candidate pass, and the
  * generalization of the inline lever in
  * [[graft.dedup.Decontaminate]]).
  *
  * The bloom is built with Spark's own `DataFrameStatFunctions
  * .bloomFilter` aggregate (map-side combined partials; one bitset
  * reaches the driver) and broadcast back. With `fpp` 1% and a mostly-
  * non-matching corpus, ~99% of non-members never reach the exchange.
  */
object BloomJoin {

  /** `left LEFT SEMI JOIN right` on `leftKey == rightKey`, bloom-
    * prefiltered. Key columns must be integral or string (what the
    * bloom hashes); output = left rows whose key is in right, exactly.
    *
    * @param expectedItems sizing for the bloom (approximate distinct
    *   count of right keys; overshooting costs bits, undershooting
    *   costs false-positive shuffle).
    */
  def semiJoin(
      left: DataFrame,
      leftKey: Column,
      right: DataFrame,
      rightKey: Column,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val (maybe, _) = split(left, leftKey, right, rightKey,
      expectedItems, fpp)
    maybe.join(rightKeys(right, rightKey),
      leftKey === col("__bloom_key"), "left_semi")
  }

  /** `left ANTI JOIN right`: left rows whose key is NOT in right.
    * Two arms: definite non-members (bloom says no — never shuffled,
    * emitted directly) union the bloom's maybe-rows that the exact
    * anti join clears. At a high non-match rate almost everything
    * takes the map-only arm.
    */
  def antiJoin(
      left: DataFrame,
      leftKey: Column,
      right: DataFrame,
      rightKey: Column,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val (maybe, definiteNo) = split(left, leftKey, right, rightKey,
      expectedItems, fpp)
    definiteNo.unionByName(
      maybe.join(rightKeys(right, rightKey),
        leftKey === col("__bloom_key"), "left_anti"))
  }

  private def rightKeys(right: DataFrame, rightKey: Column): DataFrame =
    right.select(rightKey.as("__bloom_key")).where(
      col("__bloom_key").isNotNull)

  /** (bloom-maybe rows, bloom-definitely-not rows) of `left`. */
  private def split(
      left: DataFrame,
      leftKey: Column,
      right: DataFrame,
      rightKey: Column,
      expectedItems: Long,
      fpp: Double): (DataFrame, DataFrame) = {
    require(expectedItems > 0, "expectedItems must be positive")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val spark = left.sparkSession
    import org.apache.spark.sql.types._
    // integral keys are PUT and TESTED as longs on both sides — a
    // width mismatch (int right, long left) must not change the hash.
    // The FAMILIES must agree outright: a string-vs-integral pair
    // would put long hashes and probe string hashes, and the resulting
    // bloom false NEGATIVES silently drop matching rows (the one
    // mistake the exact downstream join cannot repair).
    def family(dt: DataType, side: String): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case StringType => false
      case other => throw new IllegalArgumentException(
        s"bloom join $side key must be integral or string, got " +
          s"${other.catalogString}")
    }
    val leftIntegral = family(left.select(leftKey).schema.head.dataType,
      "left")
    val rightIntegral = family(right.select(rightKey).schema.head.dataType,
      "right")
    require(leftIntegral == rightIntegral,
      "bloom join key families differ (one side integral, one string) — " +
        "hash domains would not match; cast one side explicitly")
    val buildKey = if (rightIntegral) rightKey.cast("long") else rightKey
    val bf = right.stat.bloomFilter(buildKey, expectedItems, fpp)
    val bc = spark.sparkContext.broadcast(bf)
    val hit: Column =
      if (leftIntegral)
        udf((k: java.lang.Long) =>
          k != null && bc.value.mightContainLong(k)).apply(
          leftKey.cast("long"))
      else
        udf((k: String) =>
          k != null && bc.value.mightContainString(k)).apply(leftKey)
    (left.filter(hit), left.filter(!hit))
  }
}
