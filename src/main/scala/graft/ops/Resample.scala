package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: aggregate events onto a fixed bucket grid
  * per key, MATERIALIZING the empty buckets (gap fill) — the step
  * every downstream windowed model or chart needs and plain `groupBy`
  * cannot give (absent groups produce no rows), with optional
  * forward-fill of value columns across the gaps.
  */
object Resample {

  /** Per-(keys, bucket) aggregates on a complete per-key grid from the
    * key's first to last observed bucket.
    *
    * Shape: one map-side-combined aggregation onto the grid, a tiny
    * per-key (min, max) span agg, a `sequence` explode of the span
    * into the full grid (guarded by `maxBucketsPerKey` — a key
    * spanning millions of buckets is a data bug and an explode-bomb at
    * scale; widen the bucket or split the key range upstream), and one
    * equi-join of grid to aggregates. Forward-fill is one window pass
    * per call (`last(..., ignoreNulls)` ascending — the as-of
    * carry-forward, bounded by the window's own spill machinery).
    *
    * Determinism: bucket indices are integer micros division; `n` is 0
    * (not null) on gap rows; `aggs` stay null on gaps unless listed in
    * `ffill`. Forward-filled columns stay null before a key's first
    * observed value.
    *
    * @param aggs named aggregate columns over the rows of one bucket
    *   (e.g. `sum(col("v")).as("v")`); must not be named `n`.
    * @param ffill output names from `aggs` to forward-fill over gaps.
    * @return keys ++ (bucket_start timestamp, n long, aggs...)
    */
  def resample(
      df: DataFrame,
      keys: Seq[String],
      tsCol: Column,
      bucketMicros: Long,
      aggs: Seq[Column] = Seq.empty,
      ffill: Seq[String] = Seq.empty,
      maxBucketsPerKey: Int = 1000000): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    require(keys.nonEmpty, "resample needs at least one key column")
    val base = df.withColumn("__b",
      floor(unix_micros(tsCol.cast("timestamp")) / bucketMicros)
        .cast("long"))
    val perBucket = base.groupBy((keys :+ "__b").map(col): _*)
      .agg(count(lit(1)).as("n"), aggs: _*)
    require(perBucket.columns.count(_ == "n") == 1,
      "aggs must not be named n")

    val grid = perBucket.groupBy(keys.map(col): _*)
      .agg(min("__b").as("__lo"), max("__b").as("__hi"))
      .withColumn("__span", col("__hi") - col("__lo") + 1)
      .withColumn("__b", explode(
        when(col("__span") <= maxBucketsPerKey,
          sequence(col("__lo"), col("__hi")))
          .otherwise(raise_error(concat(
            lit("resample: key spans "), col("__span"),
            lit(s" buckets, over the $maxBucketsPerKey cap — widen " +
              s"bucketMicros=$bucketMicros or split the time range"))))))
      .drop("__lo", "__hi", "__span")

    val joined = grid.join(perBucket, keys :+ "__b", "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val filled = ffill.foldLeft(joined) { (acc, c) =>
      require(joined.columns.contains(c), s"no agg column to ffill: $c")
      acc.withColumn(c, last(col(c), ignoreNulls = true).over(
        Window.partitionBy(keys.map(col): _*).orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    }
    val aggNames = perBucket.columns.drop(keys.size + 1)
    filled.select(
      keys.map(col) ++
        Seq(expr(s"timestamp_micros(__b * ${bucketMicros}L)")
          .as("bucket_start")) ++
        aggNames.map(col): _*)
  }
}
