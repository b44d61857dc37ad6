package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Column-level data profiling — the "what is actually in this table"
  * pass a pipeline runs on unfamiliar corpus drops before trusting
  * them: null counts, exact distinct counts, min/max per column.
  */
object Profile {

  final case class ColumnProfile(
      col_name: String, n_nulls: Long, n_distinct: Long,
      min_value: String, max_value: String)

  /** One `ColumnProfile` row per (selected) column.
    *
    * Shape: ONE aggregation pass over the table computes every
    * column's stats together (Catalyst expands the multi-distinct into
    * one plan with map-side partials); exactly one row reaches the
    * driver, which pivots it into the per-column rows — the bounded
    * collect idiom. min/max surface as strings so the profile schema
    * is column-type-agnostic (binary/string ordering, matching any
    * engine's default collation for ASCII).
    *
    * Exact distincts are the expensive arm at corpus scale (a
    * distinct-expand shuffle per column); profile a column subset via
    * `cols`, or use `Sketch.kmvDistinct` per column when an estimate
    * is enough.
    */
  def describe(df: DataFrame, cols: Seq[String] = Seq.empty): DataFrame = {
    val names = if (cols.isEmpty) df.columns.toSeq else cols
    require(names.nonEmpty, "no columns to profile")
    names.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    val aggs = names.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__n_$c"),
        count_distinct(col(c)).as(s"__d_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).collect().head
    val spark = df.sparkSession
    import spark.implicits._
    names.map { c =>
      ColumnProfile(c,
        r.getAs[Long](s"__n_$c"),
        r.getAs[Long](s"__d_$c"),
        r.getAs[String](s"__min_$c"),
        r.getAs[String](s"__max_$c"))
    }.toDF()
  }
}
