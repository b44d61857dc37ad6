package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-travel joins Spark lacks as builtins: as-of (latest-prior match)
  * and interval/range (point-in-window match). Both are composed from
  * shuffle-friendly primitives — a single window pass for as-of, a
  * bucketed equi-join for range — never a per-key buffer, sort-merge
  * over the cross product, or a broadcast nested loop.
  *
  * Reference analog: hadron has no temporal join (its joinStep is
  * equality-keyed, Join.hs:1-120); these are the extensions a
  * time-series/analytics workload needs on top of §2.4.
  */
object TemporalJoin {

  /** As-of join: attach to each left row the LATEST right row with
    * `right.tsCol <= left.tsCol` (backward direction, inclusive) on the
    * same key — or, with `direction = "forward"`, the EARLIEST right
    * row with `right.tsCol >= left.tsCol` — as one window pass over the
    * union of both sides.
    *
    * Shape, and why it scales: both sides are tagged and unioned, then
    * a single `Window.partitionBy(keys).orderBy(ts, side)` carries the
    * last right-side payload forward (`last(..., ignoreNulls)` over a
    * struct — the struct is non-null for every right row, so a null
    * payload VALUE does not skip to an older match). One shuffle on the
    * join keys, sorted once within partitions, streaming frame
    * (unboundedPreceding → currentRow) — no buffering of a key's
    * history beyond Spark's window spill machinery. The classic
    * alternative (range condition join) degenerates to
    * per-key cross products; this stays n log n per partition.
    *
    * Ties: a right row at exactly `left.ts` matches (side orders right
    * before left within equal timestamps). Multiple right rows on the
    * same (key, ts) are non-deterministic — pre-aggregate the right
    * side to one row per (key, ts) first (q76 does `max(value)`).
    *
    * Skew: one key's full history lands in one window partition — the
    * semantics require it. For a pathological key (20%+ of rows),
    * range-bucket the key by time first and stitch the bucket
    * boundaries (carry each bucket's last right row into the next).
    *
    * @param toleranceMicros when set, a match further than `tolerance`
    *   from `left.ts` (older for backward, later for forward) is nulled
    *   out (the match is still found — tolerance filters, it does not
    *   redefine "latest"/"earliest").
    * @param rightPayload right columns to carry (must not collide with
    *   left column names; `rightTs` is always carried as `matched_ts`).
    * @param direction "backward" (default: latest prior) or "forward"
    *   (earliest following) — both inclusive at equal timestamps.
    * @return every left row (all its columns), plus `matched_ts` and
    *   the payload columns, null when no match (or out of tolerance).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      toleranceMicros: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward or forward, got $direction")
    val leftCols = left.columns.toSeq
    require(!leftCols.contains("matched_ts"),
      "left side already has a matched_ts column")
    require(rightPayload.forall(!leftCols.contains(_)),
      s"right payload collides with left columns: " +
        rightPayload.filter(leftCols.contains).mkString(", "))

    // Right rows carry their (ts, payload) as one struct; left rows carry
    // null. `__side` 0-before-1 makes an equal-ts right row visible to the
    // left row (inclusive as-of).
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"),
        lit(0).as("__side"),
        struct((col(rightTs).as("matched_ts") +:
          rightPayload.map(col)): _*).as("__payload")) ++
        leftCols.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"),
        lit(1).as("__side"),
        lit(null).cast(r.schema("__payload").dataType).as("__payload")) ++
        leftCols.filterNot(keys.contains).map(col): _*)

    // Backward walks time ascending and carries the last prior right
    // row; forward is the mirror image — descending, carrying the last
    // FOLLOWING right row. Both order __side after __ts so an equal-ts
    // right row is already visible to the left row (inclusive).
    val tsOrder =
      if (direction == "backward") col("__ts").asc else col("__ts").desc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = r.unionByName(l)
      .withColumn("__m", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val inTol = toleranceMicros match {
      case Some(tol) =>
        // cast("timestamp") is a no-op for TIMESTAMP and interprets
        // TIMESTAMP_NTZ in the session zone — unix_micros alone rejects
        // NTZ columns outright
        val gap =
          if (direction == "backward")
            unix_micros(col(leftTs).cast("timestamp")) -
              unix_micros(col("__m.matched_ts").cast("timestamp"))
          else
            unix_micros(col("__m.matched_ts").cast("timestamp")) -
              unix_micros(col(leftTs).cast("timestamp"))
        col("__m").isNotNull && gap <= tol
      case None => col("__m").isNotNull
    }
    val gated = matched.withColumn(
      "__g", when(inTol, col("__m")))
    gated.select(
      leftCols.map(col) ++
        (("matched_ts" +: rightPayload).map(p =>
          col(s"__g.$p").as(p))): _*)
  }

  /** Interval (range) join: pair each point with every interval
    * containing it — `lo <= point < hi` — with NO equality key between
    * the sides.
    *
    * Shape: both sides are mapped onto a shared bucket grid of width
    * `bucketWidth` (same units as the value columns — micros for
    * timestamps). Each interval explodes to the buckets it overlaps,
    * each point to exactly one, and a plain equi-join on the bucket id
    * + the exact range filter finishes it. Because a point lives in ONE
    * bucket, each qualifying (point, interval) pair joins exactly once —
    * no post-join dedup. This is the standard replacement for the
    * BroadcastNestedLoopJoin Spark would otherwise plan for a pure
    * inequality condition: shuffle is proportional to points +
    * intervals × spanned-buckets, never |points| × |intervals|.
    *
    * Pick `bucketWidth` near the TYPICAL interval length: width >> the
    * interval length wastes the pruning (many false candidates per
    * bucket); width << it explodes each interval into many buckets.
    * Long-tail intervals are capped by `maxBucketsPerInterval`
    * (hard-error beyond it — an interval spanning millions of buckets
    * is a data bug, and silently exploding it is a job-killer at
    * scale). Dense hot buckets (many intervals overlapping one window)
    * are AQE-skew-split territory; the exact filter downstream keeps
    * output identical.
    *
    * @param points DataFrame with `pointCol` (numeric/long — cast
    *   timestamps to `unix_micros` first) plus carried columns.
    * @param intervals DataFrame with `loCol`/`hiCol` (same units);
    *   hi is EXCLUSIVE.
    * @return inner join: every (point, interval) pair with
    *   lo <= point < hi, carrying all columns of both sides.
    */
  def rangeJoin(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      bucketWidth: Long,
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn(
      "__bucket", floor(col(pointCol).cast("long") / bucketWidth))
    // hi is exclusive: an interval [lo, hi) overlaps buckets
    // floor(lo/W) .. floor((hi-1)/W). Empty intervals (hi <= lo) span
    // nothing and are dropped by the sequence guard.
    val iv = intervals
      .withColumn("__b_lo",
        floor(col(loCol).cast("long") / bucketWidth))
      .withColumn("__b_hi",
        floor((col(hiCol).cast("long") - 1) / bucketWidth))
      .filter(col(hiCol).cast("long") > col(loCol).cast("long"))
      .withColumn("__span", col("__b_hi") - col("__b_lo") + 1)
    val guarded = iv.withColumn("__bucket",
      explode(when(col("__span") <= maxBucketsPerInterval,
        sequence(col("__b_lo"), col("__b_hi")))
        .otherwise(raise_error(concat(
          lit(s"rangeJoin: interval spans more than " +
            s"$maxBucketsPerInterval buckets ("),
          col("__span"),
          lit(s") — widen bucketWidth=$bucketWidth or chunk the " +
            "interval upstream"))))))
      .drop("__b_lo", "__b_hi", "__span")
    p.join(guarded, Seq("__bucket"))
      .filter(col(pointCol).cast("long") >= col(loCol).cast("long") &&
        col(pointCol).cast("long") < col(hiCol).cast("long"))
      .drop("__bucket")
  }
}
