package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention — the warehouse classic "of the users first seen
  * in period P, what fraction was still active k periods later".
  * The freshness dual of [[Profile.halfLifeScore]] (that scores one
  * key's recency; this profiles the POPULATION's comeback curve) and
  * the source-health statistic a data-collection pipeline watches to
  * see a scraper or feed silently losing its returning population.
  */
object Cohort {

  /** Exact retention triangle. Periods are whole `periodDays`-day
    * blocks of the Unix epoch (`epoch_days div periodDays` — integer
    * and engine-replayable; timestamps must be at/after the epoch,
    * where `div` truncation equals floor). A user's cohort is their
    * FIRST active period; they count as retained at offset k when
    * active in cohort+k (classic unbounded retention, not range
    * retention).
    *
    * Shape: one map-side-combined distinct over (user, period) — the
    * activity set, |users|·|periods| at most, usually far under the
    * event count — one min-per-user aggregation, one user-keyed join
    * back (both sides user-sized), one final (cohort, offset) count.
    * Every exchange carries two longs; nothing scales with raw event
    * volume past the first distinct.
    *
    * @return (cohort_period, week_offset, n_active, n_cohort,
    *   retention_fx = n_active·2^20 div n_cohort); week_offset 0 rows have
    *   retention_fx = 2^20 by construction
    */
  def retention(
      df: DataFrame,
      userCol: Column,
      tsCol: Column,
      periodDays: Int = 7): DataFrame = {
    require(periodDays >= 1, s"periodDays must be >= 1, got $periodDays")
    val act = df.select(userCol.as("u"), tsCol.as("__ts"))
      .filter(col("u").isNotNull && col("__ts").isNotNull)
      .withColumn("__ts", when(unix_micros(col("__ts")) >= 0, col("__ts"))
        .otherwise(raise_error(concat(
          lit("Cohort.retention timestamps must be at/after the " +
            "Unix epoch, got "), col("__ts").cast("string")))))
      .select(col("u"),
        expr(s"(unix_micros(__ts) div 86400000000L) div " +
          s"${periodDays.toLong}L").as("period"))
      .distinct()
      // (user x period)-sized — materialized eagerly so the cohort
      // derivation and the retention join share ONE distinct pass
      // over the events. localCheckpoint, not .cache(): the
      // ContextCleaner frees the blocks once the result is dropped,
      // where a .cache() entry pins the session cache until someone
      // remembers to unpersist (the price: truncated lineage, so an
      // executor loss mid-query recomputes the whole query, not just
      // the lost blocks)
      .localCheckpoint(true)
    val first = act.groupBy("u").agg(min(col("period")).as("cohort"))
    val sizes = first.groupBy("cohort").agg(count(lit(1)).as("n_cohort"))
    act.join(first, Seq("u"))
      .groupBy(col("cohort"),
        (col("period") - col("cohort")).as("week_offset"))
      // act is (u, period)-distinct, so count(1) IS distinct users
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, Seq("cohort"))
      .select(col("cohort").as("cohort_period"), col("week_offset"),
        col("n_active"), col("n_cohort"),
        expr("(n_active * 1048576L) div n_cohort").as("retention_fx"))
  }
}
