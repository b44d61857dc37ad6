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
}
