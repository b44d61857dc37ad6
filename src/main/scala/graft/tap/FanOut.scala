package graft.tap

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Data-dependent multi-file sink — `fanOutTap` analog
  * (/root/reference/src/Hadron/Controller.hs:479-514 and Run/FanOut.hs).
  *
  * The reference routes each record to an output file chosen by a
  * `a -> FilePath` function, keeps an MVar map of buffered handles, writes
  * tmp files and renames on close, and emits counts-per-file as the job's
  * regular output (Run/FanOut.hs:83-157). On Spark every one of those
  * mechanics is the committer's job: `partitionBy(dispatchCol)` routes rows
  * to `dispatch=<value>/part-*` files with task-temp + atomic-rename commit
  * semantics built in; the per-file stats output is a `groupBy.count`.
  *
  * Scale notes: the dispatch column should be low-to-moderate cardinality
  * (like the reference's open-handle map, which holds every distinct target
  * in memory). `sortWithinPartitions(dispatchCol)` before the write mirrors
  * `sequentialSinkFanout` (Run/FanOut.hs:164-186): each task streams one
  * open writer at a time instead of one per distinct value.
  */
object FanOut {

  /** Write `df` partitioned by `dispatch`, returning the per-target counts
    * (the reference's `fanStats`, Run/FanOut.hs:140-146).
    */
  def write(
      df: DataFrame,
      dispatch: Column,
      outDir: String,
      format: String = "parquet",
      mode: SaveMode = SaveMode.Overwrite): DataFrame = {
    val routed = df.withColumn("__route", dispatch)
    routed
      .sortWithinPartitions("__route") // one open writer per task at a time
      .write.format(format).mode(mode)
      .partitionBy("__route")
      .save(outDir)
    stats(df, dispatch)
  }

  /** Counts-per-target, usable standalone (and oracle-checkable). */
  def stats(df: DataFrame, dispatch: Column): DataFrame =
    df.groupBy(dispatch.as("route")).agg(count(lit(1)).as("n_records"))
}
