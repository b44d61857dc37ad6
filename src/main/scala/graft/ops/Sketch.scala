package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distinct-count sketching for corpus-scale profiling ("how many
  * distinct urls/domains/fingerprints?") where an exact
  * `count_distinct` would shuffle every distinct value.
  *
  * KMV (k minimum values, Bar-Yossef et al. 2002) rather than
  * HyperLogLog, deliberately: the sketch state is the k smallest
  * md5-derived unit hashes of the DISTINCT values — a pure function of
  * the value set, so the estimate is bit-identical across engines and
  * runs (graft's determinism rule; HLL implementations differ by
  * library and are unverifiable against an independent oracle).
  * Standard error ~ 1/sqrt(k-2): k=1024 gives ~3%.
  */
object Sketch {

  /** One-row (n_kept, estimate) distinct-count estimate of `valueCol`.
    *
    * Plan shape: the k smallest hashes ride graft's bounded `topk_by`
    * aggregate (score = -hash, distinct-by-value fold) — every map-side
    * partial holds at most k entries, ONE k-row partial per task
    * reaches the single final combine, and nothing else shuffles. With
    * fewer than k distinct values the sketch holds them all and the
    * estimate is exact; otherwise estimate = (k-1) / u_k with u_k the
    * k-th smallest unit hash.
    */
  def kmvDistinct(
      df: DataFrame,
      valueCol: Column,
      k: Int = 1024,
      salt: String = "kmv"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    df.select(valueCol.cast("string").as("v"))
      .filter(col("v").isNotNull)
      .withColumn("score", -Sampling.unitHash(col("v"), salt))
      .agg(call_function("topk_by", col("v"), col("score"), lit(k)).as("top"))
      .select(
        size(col("top")).cast("long").as("n_kept"),
        when(size(col("top")) < k, size(col("top")).cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            -element_at(col("top"), k).getField("score"))
          .as("estimate"))
  }
}
