package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Funnel analysis: how many users performed a given event sequence in
  * timestamp order ("signup, then view, then purchase"). The classic
  * product-analytics reach query.
  */
object Funnel {

  /** Per-step reach counts for the ordered `steps` sequence.
    *
    * Chained-min formulation — THE scale-correct funnel shape: step i's
    * reach is "users whose earliest step-i event is strictly after
    * their step-(i-1) completion time", computed as one filter + join +
    * min-aggregation per step over (user, ts) pairs. No per-user event
    * buffers anywhere (the collect-the-sequence-per-user alternative
    * holds a user's whole history in one aggregation buffer — a bot
    * user is an OOM); reach tables only shrink as steps progress, and
    * AQE broadcasts them once they are small. Ties: a same-timestamp
    * event does NOT advance the funnel (strictly greater — document
    * order within equal timestamps is not defined at scale).
    *
    * Conversion window (`maxGapSeconds`): when set, step i only counts
    * events within `(prev, prev + maxGap]` of the user's step-(i-1)
    * time — "purchase within 7 days of view", the form the question is
    * actually asked in. Attribution is FIRST-TOUCH and deterministic:
    * each step's time is the earliest qualifying event after the
    * user's first qualifying previous-step completion; a user whose
    * window lapses does not convert even if a LATER previous-step
    * occurrence would have opened a fresh window (re-attribution needs
    * a per-user sequence scan — exactly the unbounded per-user buffer
    * this shape exists to avoid — and the first-touch answer is the
    * standard one). The gap compares `unix_micros` values, exact on
    * both engines — which means `tsCol` must be a TIMESTAMP when
    * `maxGapSeconds` is set (the unwindowed funnel accepts any
    * orderable type; `unix_micros` does not resolve on numeric epoch
    * columns — cast them first).
    *
    * @return (step int 1-based, event_type, n_users) — one row per step
    */
  def funnel(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      typeCol: Column,
      steps: Seq[String],
      maxGapSeconds: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(maxGapSeconds.forall(_ > 0), "maxGapSeconds must be positive")
    val e = events.select(userCol.as("u"), tsCol.as("ts"), typeCol.as("et"))
    var cur = e.filter(col("et") === steps.head)
      .groupBy("u").agg(min(col("ts")).as("t"))
    val inWindow = maxGapSeconds match {
      case Some(gap) =>
        unix_micros(col("ts")) - unix_micros(col("prev")) <= gap * 1000000L
      case None => lit(true)
    }
    val perStep = scala.collection.mutable.ArrayBuffer[(String, Int, DataFrame)](
      (steps.head, 1, cur))
    steps.drop(1).zipWithIndex.foreach { case (st, i) =>
      cur = e.filter(col("et") === st)
        .join(cur.select(col("u"), col("t").as("prev")), Seq("u"))
        .filter(col("ts") > col("prev") && inWindow)
        .groupBy("u").agg(min(col("ts")).as("t"))
      perStep += ((st, i + 2, cur))
    }
    perStep.map { case (st, idx, df) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(idx).as("step"), lit(st).as("event_type"),
          col("n_users"))
    }.reduce(_ unionByName _)
  }
}
