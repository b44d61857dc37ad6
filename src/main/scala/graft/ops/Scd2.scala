package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 — change events folded into
  * validity INTERVALS (valid_from, valid_to, is_current per key),
  * the warehouse-classic shape that lets any fact row join the
  * attribute values that were true AT ITS TIME (via
  * [[TemporalJoin.asofJoin]] or a plain range predicate on the
  * interval). No reference analog — hadron pipelines rebuilt
  * dimensions from scratch each run; intervals make the history a
  * first-class table.
  */
object Scd2 {

  /** Fold a change stream into SCD2 validity intervals.
    *
    * Consecutive rows of a key whose tracked attributes are UNCHANGED
    * are collapsed (a re-delivered identical record must not split an
    * interval — null-safe comparison, so null attribute values compare
    * equal to null); each surviving change opens an interval at its
    * own order key and closes at the NEXT surviving change
    * (`valid_to_us` null = current row, `is_current` true).
    * Timestamps travel as exact epoch MICROSECONDS (the house
    * formatted-or-integer rule — no engine-dependent timestamp
    * rendering).
    *
    * Shape: ONE window shuffle on the key; the change-collapse lag and
    * the interval lead share the same sorted run (.explain shows a
    * single Exchange + sort feeding two Window nodes). `orderCols`
    * must pin a total order per key (house rule — ts alone ties, add
    * the record id).
    *
    * @param attrs the tracked attribute columns (change = any of them
    *   differs null-safely from the key's previous row)
    * @return (key, attrs..., valid_from_us, valid_to_us, is_current)
    */
  def buildIntervals(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      orderCols: Seq[Column],
      attrs: Seq[(String, Column)]): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must pin a total order")
    require(attrs.nonEmpty, "attrs must name at least one tracked column")
    val base = df.select(
      keyCol.as("key") +: tsCol.as("__ts") +:
        (attrs.map { case (n, c) => c.as(n) } ++
          orderCols.zipWithIndex.map { case (c, i) => c.as(s"__o$i") }): _*)
      .filter(col("key").isNotNull && col("__ts").isNotNull)
      .withColumn("__us", expr("unix_micros(__ts)"))
    val w = Window.partitionBy(col("key"))
      .orderBy(orderCols.indices.map(i => col(s"__o$i")): _*)
    val attrStruct = struct(attrs.map { case (n, _) => col(n) }: _*)
    val changed = base
      .withColumn("__prev", lag(attrStruct, 1).over(w))
      // first row per key (__prev null) always opens an interval;
      // <=> is the null-safe compare, so null attrs collapse correctly
      .filter(col("__prev").isNull || !(col("__prev") <=> attrStruct))
    changed
      .withColumn("valid_from_us", col("__us"))
      .withColumn("valid_to_us", lead(col("__us"), 1).over(w))
      .withColumn("is_current", col("valid_to_us").isNull)
      .select(col("key") +: attrs.map { case (n, _) => col(n) } :+
        col("valid_from_us") :+ col("valid_to_us") :+
        col("is_current"): _*)
  }
}
