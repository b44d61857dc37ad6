package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rolling (trailing-window) EXACT distinct counts — "7-day active
  * users per day", the retention/health curve every corpus or product
  * dashboard opens with. The naive forms both fail at scale: a
  * per-day `countDistinct` over a self-joined window re-scans the
  * fact table per day, and a sliding `approx_count_distinct` window
  * isn't exact (and a sliding EXACT distinct window buffers every key
  * per frame). KMV sketches ([[Sketch]] / streaming q168) trade
  * exactness for state; this keeps exactness by trading bounded
  * REPLICATION instead.
  */
object Rolling {

  /** Exact trailing-`windowDays` distinct keys per day.
    *
    * Shape (the day-grid trick, the rangeJoin bucket idea specialized
    * to day granularity): distinct (key, activity_day) rows — one
    * map-side-combined dedup, the only corpus-sized exchange — then
    * each row EMITS its ≤ `windowDays` window-end days map-side,
    * a second distinct over (key, window_end) collapses multi-active
    * keys inside one window, and a count per window_end finishes.
    * Total volume is windowDays × |distinct (key, day)| narrow rows —
    * linear in activity, independent of raw event count, no per-frame
    * buffers anywhere. Window ends are clamped to the observed
    * [min_day, max_day] span (a trailing window past the data would
    * report partial truth); days inside the span with an empty window
    * are absent from the output (join a calendar spine downstream if
    * zeros are wanted).
    *
    * @return (day, n_distinct) — one row per day in the observed span
    *   whose trailing window holds ≥ 1 key
    */
  def rollingDistinct(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1 && windowDays <= 3660,
      s"windowDays must be in [1, 3660], got $windowDays")
    val ud = df.select(keyCol.as("k"), to_date(tsCol).as("d"))
      .filter(col("k").isNotNull && col("d").isNotNull)
      .distinct()
    val span = ud.agg(min(col("d")).as("__lo"), max(col("d")).as("__hi"))
    ud.crossJoin(broadcast(span))
      .select(col("k"), explode(sequence(lit(0),
        lit(windowDays - 1))).as("__i"), col("d"), col("__hi"))
      .select(col("k"), expr("date_add(d, __i)").as("day"), col("__hi"))
      .filter(col("day") <= col("__hi"))
      .select("k", "day").distinct()
      .groupBy("day").agg(count(lit(1)).as("n_distinct"))
  }
}
