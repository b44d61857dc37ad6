package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch conversion attribution over an event stream — for each
  * conversion event, credit the user's preceding touch events inside a
  * lookback window under the three standard models at once
  * (first-touch, last-touch, linear), then roll credit up per channel.
  * The marketing-analytics classic, but the same shape grades any
  * "which upstream signal preceded the outcome" question (which crawl
  * source preceded a dup cluster, which referrer preceded an error).
  *
  * Credits are exact integer BASIS POINTS so per-conversion credit
  * sums to 10000 in every model and every engine: first/last give the
  * full 10000 to one touch; linear gives each of the n touches
  * `10000 div n` with the remainder `10000 mod n` assigned to the LAST
  * touch (a deterministic convention, documented rather than float-
  * split). Touch order inside a conversion is (ts asc, id asc) — a
  * total order, the house determinism rule. Conversions with zero
  * in-window touches earn no row (no credit to assign).
  *
  * Scale shape: the touch⋈conversion pairing is [[TemporalJoin.rangeJoin]]'s
  * bucket-grid trick SPECIALIZED to the "interval length = lookback"
  * case, with the user id welded into the join key: each conversion's
  * window [cts − lookback, cts) spans at most two lookback-width
  * buckets, so the conversion side explodes ×≤2 and an equi-join on
  * (user, bucket) + the exact range filter replaces the inequality
  * join Spark would plan as BNLJ. Shuffle ∝ touches + 2·conversions,
  * never their product; a hot (user, bucket) cell is AQE-skew-split
  * territory and the exact filter keeps output identical. The
  * per-conversion rank/count window is partitioned by (user, conv) —
  * bounded by the window's touch count, never a global sort.
  */
object Attribution {

  /** @param events  event table.
    * @param userCol grouping key (castable to long not required —
    *   any equi-joinable type).
    * @param tsCol   event-time TIMESTAMP column.
    * @param idCol   unique long event id (tie-break + output key).
    * @param typeCol channel / event-type string column.
    * @param convType value of `typeCol` that marks a conversion.
    * @param touchTypes values of `typeCol` creditable as touches
    *   (must not contain `convType`; the conversion itself is never
    *   a touch).
    * @param lookbackMicros window size: touches with
    *   `cts − lookback <= tts < cts` are in scope.
    * @return one row per channel:
    *   (channel, n_touches, n_conversions, first_bp, last_bp, linear_bp)
    */
  def multiTouch(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      idCol: Column,
      typeCol: Column,
      convType: String,
      touchTypes: Seq[String],
      lookbackMicros: Long): DataFrame = {
    require(lookbackMicros > 0,
      s"lookbackMicros must be positive, got $lookbackMicros")
    require(!touchTypes.contains(convType),
      s"touchTypes must not contain the conversion type '$convType'")
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    val base = events.select(userCol.as("user"),
      unix_micros(tsCol).as("t"), idCol.cast("long").as("id"),
      typeCol.as("ch"))
    // bucket ids via integer `div`, not double floor(/): epoch micros
    // are ~2^50 and a float roundtrip can misround a boundary. `div`
    // truncates toward zero — identical to floor for the non-negative
    // epoch times this targets (loud guard below keeps it honest).
    val touches = base.filter(col("ch").isin(touchTypes: _*))
      .withColumn("__bucket", expr(s"t div ${lookbackMicros}L"))
    // window [cts − lookback, cts), width exactly lookback ⇒ it meets
    // buckets floor((cts−lookback)/W) .. floor((cts−1)/W): at most two,
    // adjacent. array_distinct collapses the aligned single-bucket case
    // so each (touch, conversion) pair joins exactly once.
    val convs = base.filter(col("ch") === convType)
      .select(col("user"), col("t").as("cts"), col("id").as("cid"))
      .withColumn("cts", when(col("cts") >= lookbackMicros, col("cts"))
        .otherwise(raise_error(concat(
          lit("multiTouch event times must be >= lookback micros " +
            "(truncating div == floor only for non-negative), got "),
          col("cts")))))
      .withColumn("__bucket", explode(array_distinct(array(
        expr(s"(cts - ${lookbackMicros}L) div ${lookbackMicros}L"),
        expr(s"(cts - 1L) div ${lookbackMicros}L")))))
    val paired = touches.join(convs, Seq("user", "__bucket"))
      .filter(col("t") < col("cts") &&
        col("t") >= col("cts") - lookbackMicros)
      .drop("__bucket")
    val w = Window.partitionBy(col("user"), col("cid"))
    val ordered = paired
      .withColumn("rn", row_number().over(w.orderBy(col("t").asc,
        col("id").asc)))
      .withColumn("n", count(lit(1)).over(w))
    val credited = ordered.select(col("ch"), col("cid"),
      when(col("rn") === 1, lit(10000L)).otherwise(lit(0L)).as("first_bp"),
      when(col("rn") === col("n"), lit(10000L)).otherwise(lit(0L))
        .as("last_bp"),
      (expr("10000L div n") +
        when(col("rn") === col("n"), expr("10000L % n"))
          .otherwise(lit(0L))).as("linear_bp"))
    credited.groupBy(col("ch").as("channel"))
      .agg(count(lit(1)).as("n_touches"),
        countDistinct(col("cid")).as("n_conversions"),
        sum("first_bp").as("first_bp"),
        sum("last_bp").as("last_bp"),
        sum("linear_bp").as("linear_bp"))
  }
}
