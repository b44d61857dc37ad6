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
    * Prefer AQE's skew-join handling (on by default here) for sort-merge
    * joins it can split; reach for explicit salting when the hot key is
    * known and the replicated side is small-ish (cost = |other| x salt
    * shuffle rows), or when the join runs inside an operator AQE can't
    * re-plan.
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
