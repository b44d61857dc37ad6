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

  /** First-order Markov transition table over per-key event-type
    * sequences — the empirical next-event model behind "what do users
    * do after X" questions and behavioral anomaly baselines (a session
    * whose transitions are improbable under this table is the outlier
    * [[graft.ops.Anomaly]] scores). For every observed (prev → next)
    * consecutive pair: its count, the prev-state total, the exact
    * fixed-point probability `p_fx = count·2^20 div total` (positive ÷
    * positive — truncate ≡ floor, engine-neutral), and the next-event
    * rank within prev (count desc, next asc — a total order).
    *
    * Determinism: same contract as [[frequentTypeNgrams]] — `orderCols`
    * must pin a TOTAL order per key (ts alone ties; add the event id).
    *
    * Scale shape: one window shuffle per key (a single `lead` walking
    * each sorted run in place — no per-key collect), one map-side-
    * combined count shuffle over (prev, next) pairs — at most
    * |types|² rows out — then the per-prev total and rank as windows
    * over that tiny table. A hot key costs its sorted run, never a
    * buffered list; the states table after the count is vocabulary-
    * sized, not data-sized.
    */
  def transitionCounts(
      df: DataFrame,
      key: Column,
      typ: Column,
      orderCols: Seq[Column]): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must pin a total order")
    val base = df.select(
      key.as("__k") +: typ.cast("string").as("prev") +:
        orderCols.zipWithIndex.map { case (c, i) => c.as(s"__o$i") }: _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(orderCols.indices.map(i => col(s"__o$i")): _*)
    val pairs = base
      .withColumn("next", lead(col("prev"), 1).over(w))
      .filter(col("next").isNotNull)
    val counted = pairs.groupBy(col("prev"), col("next"))
      .agg(count(lit(1)).as("cnt"))
    val byPrev = Window.partitionBy(col("prev"))
    counted
      .withColumn("total", sum(col("cnt")).over(byPrev))
      .withColumn("nxt_rank",
        row_number().over(byPrev.orderBy(col("cnt").desc, col("next").asc)))
      .select(col("prev"), col("next"), col("cnt"), col("total"),
        expr("cnt * 1048576L div total").as("p_fx"),
        col("nxt_rank").cast("long").as("nxt_rank"))
  }
}
