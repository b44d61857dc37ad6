package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group z-score anomaly flags over integer series — the
  * monitoring primitive every ingest pipeline runs (which hours'
  * event volumes, which sources' document counts, are out of
  * distribution?). Exact where the textbook formulation is not: the
  * z-score test  |v − μ| > z·σ  is kept in integers by multiplying
  * through the denominators,
  *
  *   (n·v − S)² > z² · (n·Q − S²)        S = Σv, Q = Σv²
  *
  * (both sides exact decimal(38,0) — no μ, no σ, no float, no sqrt),
  * so flags are bit-identical across engines and an oracle replays
  * the inequality verbatim. n·Q − S² ≥ 0 by Cauchy–Schwarz;
  * single-row groups never flag (both sides 0). Two-sided by
  * construction. Bound: |n·v| and S below ~10¹⁸ keep the squares
  * within 38 digits — counts of anything real qualify.
  *
  * Scale shape: one map-side-combined groupBy for the per-group
  * moments (3 longs per group), broadcast-joined back (groups ≪
  * rows), flag computed map-only. Nothing collects, nothing sorts.
  */
object Anomaly {

  /** Flag rows whose `value` deviates more than `z` standard
    * deviations from its group's mean. Output: ALL input columns plus
    * `n` (group size) and `anomaly` (boolean) — non-key columns (the
    * bucket/timestamp identifying WHICH row spiked) ride along.
    */
  def zScoreFlags(
      df: DataFrame,
      keys: Seq[String],
      value: Column,
      z: Int = 3): DataFrame = {
    require(keys.nonEmpty, "zScoreFlags needs at least one key column")
    require(z >= 1, s"z must be positive, got $z")
    val base = df.withColumn("__v", value.cast("long"))
    val stats = base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col("__v")).as("__s"),
        sum(col("__v") * col("__v")).as("__q"))
    // every operand to decimal BEFORE any product: n·v etc. can pass
    // 2^63 as longs while staying comfortably inside 38 digits
    def dec(s: String): Column = expr(s"cast($s as decimal(38,0))")
    val dev = dec("n") * dec("__v") - dec("__s")
    base.join(broadcast(stats), keys)
      .withColumn("anomaly",
        dev * dev >
          lit(z.toLong * z) *
            (dec("n") * dec("__q") - dec("__s") * dec("__s")))
      .drop("__v", "__s", "__q")
  }

  /** Per-key EWMA smoothing, exact — the denoised baseline a drift
    * report plots against the raw series, and the third member of the
    * monitoring family (global [[zScoreFlags]], sequential
    * [[cusumAlarms]], now a smoother):
    *
    *   s₁ = v₁·2^8;  sᵢ = (α·vᵢ·2^8 + (2^4 − α)·sᵢ₋₁) >> 4
    *
    * with α ∈ [1, 16] the 16-denominated smoothing weight and values
    * carried at 2^8 sub-unit precision so the per-step floor loses
    * <1/256 of a unit. `>>` on non-negative values is a floor —
    * engine-neutral — so outputs replay bit-for-bit (loud guard: v
    * must be non-negative). Like CUSUM this is a genuinely sequential
    * recurrence (the floor breaks the closed-form geometric sum), so
    * it runs as the same secondary-sorted streaming reducer: one
    * exchange, O(1) state per key.
    *
    * @param alpha numerator of α/16 (1 = heavy smoothing, 16 = copy)
    * @return (key, id, v, ewma_fx) every input row, ewma_fx 2^8-scaled
    */
  def ewmaSmooth(
      df: DataFrame,
      key: Column,
      idCol: Column,
      orderCols: Seq[Column],
      value: Column,
      alpha: Int): DataFrame = {
    require(alpha >= 1 && alpha <= 16, s"alpha must be in [1,16], got $alpha")
    require(orderCols.nonEmpty, "orderCols must pin a total order")
    val base = df.select(
      key.cast("long").as("key") +: idCol.cast("long").as("id") +:
        value.cast("long").as("v") +:
        orderCols.zipWithIndex.map { case (c, i) => c.as(s"__o$i") }: _*)
      .filter(col("key").isNotNull && col("id").isNotNull &&
        col("v").isNotNull)
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val enc: Encoder[(Long, Long, Long, Long)] = Encoders.tuple(
      Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaLong)
    GroupReduce.secondarySort[(Long, Long, Long, Long)](
      base,
      groupCols = Seq("key"),
      sortCols = orderCols.indices.map(i => col(s"__o$i")))
    { (groupKey, rows) =>
      val k = groupKey.getLong(0)
      var s = -1L
      rows.map { r =>
        val v = r.getLong(2)
        require(v >= 0, s"ewmaSmooth values must be non-negative " +
          s"(>> is floor only there), got $v for key $k")
        // *Exact arithmetic: v near 2^51 would silently wrap the
        // α·v·2^8 step under raw long ops — raise loudly instead,
        // matching the SQL side's ANSI-overflow discipline.
        val v256 = Math.multiplyExact(v, 256L)
        s = if (s < 0) v256
            else Math.addExact(
              Math.multiplyExact(alpha.toLong, v256),
              Math.multiplyExact((16 - alpha).toLong, s)) >> 4
        (k, r.getLong(1), v, s)
      }
    }.toDF("key", "id", "v", "ewma_fx")
  }

  /** Rolling (trailing-window) z-score flags — [[zScoreFlags]]'
    * exact integer inequality against the PRECEDING `window` rows of
    * the same key instead of the whole group: the "is this point off
    * versus its own recent past" monitor, robust to slow level drift
    * that poisons a global mean. The current row is excluded from its
    * own baseline (else a spike inflates the variance that judges it).
    * Rows with fewer than `minPoints` trailing points never flag
    * (insufficient baseline ≠ anomaly). Same exact form, windowed:
    *
    *   (n·v − S)² > z²·(n·Q − S²),  S/Q = trailing sum / sum of squares
    *
    * all in DECIMAL(38,0) — no float, no sqrt. Scale shape: ONE window
    * shuffle per key (three codegen'd sliding aggregates share the
    * frame), map-only flag math; a hot key costs its sorted run.
    *
    * @return input key/id/v plus (n trailing count, anomaly boolean)
    */
  def rollingZFlags(
      df: DataFrame,
      key: Column,
      idCol: Column,
      orderCols: Seq[Column],
      value: Column,
      window: Int,
      z: Int = 3,
      minPoints: Int = 8): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(z >= 1, s"z must be positive, got $z")
    require(minPoints >= 2 && minPoints <= window,
      s"minPoints must be in [2, window], got $minPoints")
    require(orderCols.nonEmpty, "orderCols must pin a total order")
    val base = df.select(
      key.cast("long").as("key") +: idCol.cast("long").as("id") +:
        value.cast("long").as("v") +:
        orderCols.zipWithIndex.map { case (c, i) => c.as(s"__o$i") }: _*)
      .filter(col("key").isNotNull && col("id").isNotNull &&
        col("v").isNotNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key"))
      .orderBy(orderCols.indices.map(i => col(s"__o$i")): _*)
      .rowsBetween(-window, -1)
    def dec(s: String): Column = expr(s"cast($s as decimal(38,0))")
    base
      // pre-project v² so all three sliding aggregates bind to existing
      // columns — Spark otherwise splits them into two Window nodes
      // (same sort, but two passes over every run; .explain-verified
      // single Window after this)
      .withColumn("__v2", col("v") * col("v"))
      .withColumn("__n", count(col("v")).over(w))
      .withColumn("__s", sum(col("v")).over(w))
      .withColumn("__q", sum(col("__v2")).over(w))
      .withColumn("anomaly",
        col("__n") >= minPoints &&
          (dec("__n") * dec("v") - dec("__s")) *
            (dec("__n") * dec("v") - dec("__s")) >
          lit(z.toLong * z) *
            (dec("__n") * dec("__q") - dec("__s") * dec("__s")))
      .select(col("key"), col("id"), col("v"),
        col("__n").as("n"), col("anomaly"))
  }

  /** CUSUM changepoint alarms per key (Page 1954) — the sequential
    * drift detector z-scores can't replace: a level shift too small to
    * flag any single point accumulates until the cumulative sum
    * crosses the threshold. The ingest-monitoring classic ("this
    * source's mean document quality drifted down over the last week"),
    * exact in integers so alarms replay bit-identically.
    *
    * Recurrence per key, rows in (orderCols) order:
    *   s₀ = 0;  sᵢ = max(0, sᵢ₋₁ + vᵢ − target − slack)
    * an alarm fires where sᵢ ≥ threshold, and s resets to 0 after each
    * alarm (restart detection — the standard practice so one long
    * excursion is N independent alarms, not one smeared flag). This is
    * a genuinely sequential recurrence (the max-with-zero reset breaks
    * prefix-sum decomposition), so it runs as the hadron-style
    * secondary-sorted streaming reducer — [[GroupReduce.secondarySort]]'s
    * one repartition + in-partition sort, each group scanned once with
    * O(1) state, never a per-key collect.
    *
    * One-sided (upward drift); detect downward by negating `value` and
    * `target` at the call site. `orderCols` must pin a total order per
    * key (house rule — ts alone ties, add the event id). The reducer
    * arithmetic is add/subtractExact — a series whose cumulative sum
    * leaves long range raises instead of wrapping (the SQL-side
    * ANSI-overflow discipline, carried into the JVM kernel).
    *
    * @param value long-valued series (fix floats upstream — exactness
    *   needs integers; e.g. cents, not dollars-as-double)
    * @param target the in-control level subtracted each step
    * @param slack the CUSUM allowance k (half the shift magnitude
    *   worth detecting, in the same units)
    * @param threshold alarm level h (same units)
    * @return one row per alarm: (key, id at the alarm row, s_alarm =
    *   the crossing value, alarm_seq = 1-based alarm index within key)
    */
  def cusumAlarms(
      df: DataFrame,
      key: Column,
      idCol: Column,
      orderCols: Seq[Column],
      value: Column,
      target: Long,
      slack: Long,
      threshold: Long): DataFrame = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    require(slack >= 0, s"slack must be non-negative, got $slack")
    require(orderCols.nonEmpty, "orderCols must pin a total order")
    val base = df.select(
      key.cast("long").as("key") +: idCol.cast("long").as("id") +:
        value.cast("long").as("v") +:
        orderCols.zipWithIndex.map { case (c, i) => c.as(s"__o$i") }: _*)
      .filter(col("key").isNotNull && col("id").isNotNull &&
        col("v").isNotNull)
    val drop = target + slack
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val enc: Encoder[(Long, Long, Long, Long)] = Encoders.tuple(
      Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaLong)
    GroupReduce.secondarySort[(Long, Long, Long, Long)](
      base,
      groupCols = Seq("key"),
      sortCols = orderCols.indices.map(i => col(s"__o$i")))
    { (groupKey, rows) =>
      val k = groupKey.getLong(0)
      var s = 0L
      var alarmSeq = 0L
      rows.flatMap { r =>
        val v = r.getLong(2)
        s = math.max(0L, Math.subtractExact(Math.addExact(s, v), drop))
        if (s >= threshold) {
          alarmSeq += 1
          val out = (k, r.getLong(1), s, alarmSeq)
          s = 0L
          Iterator.single(out)
        } else Iterator.empty
      }
    }.toDF("key", "id", "s_alarm", "alarm_seq")
  }

  /** LEAD-LAG cross-correlation sums between two event streams — "do
    * clicks LEAD purchases, and by how many days": bucket both
    * series to `bucketSec` windows, align bucket t of series A with
    * bucket t+lag of series B for every lag in [−maxLag, maxLag],
    * and emit the EXACT integer regression sums per lag —
    *
    *   (lag, n_days, sa, sb, sab, saa, sbb)
    *
    * from which Pearson r(lag) = (n·sab − sa·sb) /
    * √((n·saa − sa²)(n·sbb − sb²)) in the consumer's float space
    * (the no-division-in-data [[Profile.cohenKappa]] precedent —
    * signed division is a cross-engine hazard, and the sums are the
    * reusable artifact anyway). The argmax lag over r(lag) is the
    * lead time; missing buckets count as ZERO events (a silent day
    * is data, not absence of data), so both series ride a dense
    * bucket spine from the observed min to max bucket.
    *
    * Loud domains: epoch seconds ≥ 0 (integer div is floor only for
    * non-negatives), bucket span ≤ 2^20 buckets, per-bucket counts
    * < 2^20 (keeps every sum ≤ 2^60 — pre-bucket coarser or
    * pre-aggregate past that).
    *
    * Shape: one map-side-combined (bucket, which) count over the
    * filtered scan; everything after — spine, lag spine, shifted
    * self-join, per-lag aggregate — is bucket-spine-sized (≤ 2^20
    * rows × (2·maxLag+1)). Parallelism source: the map-side count;
    * the bounded tail is broadcast work.
    *
    * @return (lag, n_days, sa, sb, sab, saa, sbb), one row per lag,
    *   lag > 0 meaning A leads B by that many buckets
    */
  def leadLagCorrelation(
      df: DataFrame,
      tsCol: Column,
      typeCol: Column,
      typeA: String,
      typeB: String,
      maxLag: Int,
      bucketSec: Long = 86400L): DataFrame = {
    require(maxLag >= 1 && maxLag <= 512,
      s"maxLag must be in [1, 512], got $maxLag")
    require(bucketSec >= 1L, s"bucketSec must be >= 1, got $bucketSec")
    require(typeA != typeB, "typeA and typeB must differ")
    val secs = tsCol.cast("long")
    val counts = df
      .select(secs.as("s"), typeCol.as("t"))
      .filter(col("s").isNotNull &&
        (col("t") === typeA || col("t") === typeB))
      .withColumn("s", when(col("s") >= 0L, col("s"))
        .otherwise(raise_error(concat(lit(
          "leadLagCorrelation needs epoch >= 0 (floor div), got "),
          col("s")))))
      .withColumn("day", expr(s"s div ${bucketSec}L")) // long div; s >= 0 so floor
      .groupBy("day")
      .agg(coalesce(sum(when(col("t") === typeA, 1L)), lit(0L)).as("a"),
        coalesce(sum(when(col("t") === typeB, 1L)), lit(0L)).as("b"))
      .localCheckpoint(true)
    val span = counts.agg(min(col("day")).as("d0"),
        max(col("day")).as("d1"))
      .filter(col("d0").isNotNull)
      .withColumn("d1", when(col("d1") - col("d0") < lit(1L << 20),
          col("d1"))
        .otherwise(raise_error(concat(lit(
          "leadLagCorrelation bucket span cap 2^20 exceeded: "),
          col("d1") - col("d0"), lit(" buckets — coarsen bucketSec")))))
    val spine = span
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(counts, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("a"), lit(0L)).as("a"),
        coalesce(col("b"), lit(0L)).as("b"))
      .withColumn("a", when(col("a") < lit(1L << 20), col("a"))
        .otherwise(raise_error(concat(lit(
          "leadLagCorrelation per-bucket cap 2^20 exceeded, got "),
          col("a")))))
      .withColumn("b", when(col("b") < lit(1L << 20), col("b"))
        .otherwise(raise_error(concat(lit(
          "leadLagCorrelation per-bucket cap 2^20 exceeded, got "),
          col("b")))))
      .localCheckpoint(true)
    val lags = spine.sparkSession.range(-maxLag.toLong, maxLag + 1L)
      .select(col("id").cast("long").as("lag"))
    val shifted = spine.select(col("day"), col("a"))
      .crossJoin(broadcast(lags))
      .join(broadcast(spine.select(col("day").as("db"), col("b"))),
        col("db") === col("day") + col("lag"))
    shifted.groupBy(col("lag").as("lag_buckets"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("a")).as("sa"), sum(col("b")).as("sb"),
        sum(col("a") * col("b")).as("sab"),
        sum(col("a") * col("a")).as("saa"),
        sum(col("b") * col("b")).as("sbb"))
  }
}
