package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Frequent consecutive event-type sequences — the behavioral-mining
  * counterpart of [[graft.functions.Collocations]]: which n-step
  * paths (view→click→purchase) actually happen, ranked by count. The
  * degenerate-but-dominant case of PrefixSpan: contiguous
  * subsequences only, which is what funnel design and transition
  * analysis consume, and what stays one-pass at corpus scale.
  *
  * Determinism: the per-key order is (orderCols..., then the rows are
  * whatever that order pins) — callers MUST pass a total order (ts
  * alone ties on same-micro events; add the event id). Ranking is
  * (count desc, gram asc), a total order.
  *
  * Scale shape: ONE window shuffle per key (no per-user collect — the
  * n−1 `lead`s walk the sorted run in place), one map-side-combined
  * count shuffle over grams, then orderBy+limit →
  * TakeOrderedAndProject. A user with millions of events costs the
  * sort of their run, never a buffered list.
  */
object Sequences {

  /** Top-k most frequent n-grams of `typ` per consecutive run within
    * `key`, ordered by `orderCols`. Output: (gram string
    * space-joined, n bigint).
    */
  def frequentTypeNgrams(
      df: DataFrame,
      key: Column,
      typ: Column,
      orderCols: Seq[Column],
      n: Int,
      minCount: Long = 1L,
      k: Int = 20): DataFrame = {
    require(n >= 2 && n <= 8, s"n must be in [2, 8], got $n")
    require(minCount >= 1 && k >= 1, "minCount and k must be positive")
    require(orderCols.nonEmpty, "orderCols must pin a total order")
    val base = df.select(
      key.as("__k") +: typ.cast("string").as("__t0") +:
        orderCols.zipWithIndex.map { case (c, i) => c.as(s"__o$i") }: _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(orderCols.indices.map(i => col(s"__o$i")): _*)
    val withLeads = (1 until n).foldLeft(base) { (d, i) =>
      d.withColumn(s"__t$i", lead(col("__t0"), i).over(w))
    }
    withLeads
      .filter((1 until n).map(i => col(s"__t$i").isNotNull)
        .reduce(_ && _))
      .select(concat_ws(" ",
        (0 until n).map(i => col(s"__t$i")): _*).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc, col("gram").asc)
      .limit(k)
  }
}
