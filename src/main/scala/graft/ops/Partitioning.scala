package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shuffle/sort control — ports of hadron's `PartitionStrategy` and
  * `Comparator` (/root/reference/src/Hadron/Run/Hadoop.hs:129-166).
  *
  * Hadron's keys are tab-joined strings: `Partition(keySegs, partSegs)`
  * routes on the first `partSegs` segments and sorts groups on all
  * `keySegs` (secondary sort); `NumericComp(start, end, rev)` makes Hadoop
  * compare selected key fields numerically instead of lexicographically.
  * On Spark, keys are typed columns, so both collapse into column lists:
  * partition columns + sort columns, with native type ordering — the
  * property the reference's one QuickCheck test protects (string-sorted
  * UTCTime ≡ chronological, test/Tests.hs:22-33) holds by construction.
  */
object Partitioning {

  /** `mkKey` analog (/root/reference/src/Hadron/Types.hs:25-26): join key
    * pieces with "|". Provided for wire-compatibility; multi-column keys
    * are preferred (typed, prunable, no separator-collision hazard).
    */
  def mkKey(cols: Column*): Column = concat_ws("|", cols: _*)

  /** Partition(keySegs, partSegs) analog: repartition on the key prefix,
    * sort within partitions on the full key. The result iterates each
    * key-prefix group contiguously in full-key order — exactly Hadoop's
    * shuffle contract that hadron's reducers rely on (Basic.hs:255-268).
    */
  def partitionSort(
      df: DataFrame,
      partCols: Seq[Column],
      sortCols: Seq[Column]): DataFrame =
    df.repartition(partCols: _*)
      .sortWithinPartitions(partCols ++ sortCols: _*)

  /** NumericComp analog: numeric (optionally reversed) ordering of a
    * string-typed key field (Run/Hadoop.hs:145-150). With typed columns
    * this is a cast + sort direction.
    */
  def numericOrder(c: Column, reverse: Boolean = false): Column = {
    val n = c.cast("double")
    if (reverse) n.desc else n.asc
  }

  /** Salted equi-join for skewed key distributions (no reference analog —
    * hadron inherits Hadoop's one-reducer-per-key and simply stalls on hot
    * keys). The skewed side gets a deterministic salt derived from its
    * whole row; the other side is replicated across all `salt` values, so
    * a hot key's rows spread over `salt` shuffle partitions instead of
    * one. Inner-join semantics are unchanged.
    *
    * WHICH SKEW LEVER — decision table (measure the skew FIRST with
    * [[Profile.keySkew]]: top_share_fx and the Gini say whether any
    * lever is needed before the job stalls, not after). Mechanics
    * pinned by PartitioningSpec's AQE-vs-salting arm over the q157
    * fixture:
    *
    *  1. Other side broadcastable (under
    *     `spark.sql.autoBroadcastJoinThreshold`, or hinted):
    *     BROADCAST. The fact side never shuffles on the key, so key
    *     skew cannot materialize. Always the first choice.
    *  2. Sort-merge / shuffled-hash join whose hot post-shuffle
    *     partition exceeds BOTH AQE gates —
    *     `skewedPartitionFactor` (default 5× the median partition)
    *     AND `skewedPartitionThresholdInBytes` (default 256 MB):
    *     AQE skew-join splits it at runtime, no code change. The
    *     common case for 100 TB fact-to-fact joins, where hot keys
    *     are multi-GB.
    *  3. Hot partitions BELOW the 256 MB byte gate but still many×
    *     the median (the straggler band a 32-core box feels long
    *     before AQE's threshold — PartitioningSpec shows AQE leaving
    *     such a join unsplit under default gates and splitting it
    *     once the gates are lowered); OR the join sits where AQE
    *     cannot re-plan (user-pinned repartitioning it must preserve,
    *     streaming micro-batches); OR the skewed relation feeds a
    *     non-join shuffle first: THIS helper. Pick
    *     `salt ≈ hot-key rows / per-task row budget` (q157 uses the
    *     lane count); cost = |other| × salt replicated rows, so keep
    *     the replicated side dimension-sized.
    *  4. Skew in a plain AGGREGATION (no join): AQE never splits one
    *     hot GROUP — pre-aggregate on (key, salt) then re-aggregate
    *     on key (two-stage fold), or lean on map-side combine when
    *     the aggregate is algebraic. Not this helper.
    */
  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      keys: Seq[String],
      salt: Int): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val saltCol = "__graft_salt"
    val s = skewed.withColumn(
      saltCol, pmod(hash(skewed.columns.map(col): _*), lit(salt)))
    val o = other.withColumn(
      saltCol, explode(sequence(lit(0), lit(salt - 1))))
    s.join(o, keys :+ saltCol).drop(saltCol)
  }
}
