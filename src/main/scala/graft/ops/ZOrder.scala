package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-column clustering
  * trick behind Delta/Iceberg OPTIMIZE ZORDER: interleave the bits of
  * grid-normalized column values so rows close in EVERY dimension land
  * in the same partition/file, and min/max file statistics prune scans
  * on any prefix-free combination of the clustered columns (a
  * single-column sort only prunes its leading column).
  *
  * The z-value is exact integer arithmetic end to end: each column is
  * normalized to a 2^bits grid cell via
  * `floor((x − min)·(2^bits − 1) / (max − min))` (global min/max from
  * one broadcast aggregate row; max = min collapses to cell 0), then
  * cells are bit-interleaved with a folded shift/and/or Column
  * expression — fully codegen'd, no kernel, and an oracle replays it
  * verbatim. Input columns are read as longs; ranges must stay under
  * ~2^47 so the grid product fits a long (any real id/bucket/count
  * qualifies — pre-bucket timestamps to micros/hours first).
  *
  * Scale shape: one 1-row min/max aggregate (broadcast crossJoin — the
  * [[Hits]] normalize idiom), then a map-only zval projection;
  * [[clusterByZOrder]] adds the one range-partitioning shuffle any
  * layout rewrite costs, with `sortWithinPartitions` so writers emit
  * tight min/max ranges per file.
  */
object ZOrder {

  /** df plus a `zval` column interleaving `cols` at `bits` bits each.
    * Total z-width = cols.size · bits ≤ 63.
    */
  def withZValue(
      df: DataFrame,
      cols: Seq[String],
      bits: Int = 16): DataFrame = {
    require(cols.size >= 2, s"z-order needs >= 2 columns, got ${cols.size}")
    require(bits >= 1 && cols.size * bits <= 63,
      s"${cols.size} cols x $bits bits must fit in 63 z-bits")
    val d = cols.size
    val grid = (1L << bits) - 1
    val stats = df.select(
      cols.flatMap(c => Seq(min(col(c).cast("long")).as(s"__mn_$c"),
        max(col(c).cast("long")).as(s"__mx_$c"))): _*)
    val withCells = df.crossJoin(broadcast(stats))
    val cells = cols.map { c =>
      val mn = col(s"__mn_$c"); val mx = col(s"__mx_$c")
      when(mx === mn, lit(0L)).otherwise(
        expr(s"((cast(`$c` as bigint) - `__mn_$c`) * ${grid}L)" +
          s" div (`__mx_$c` - `__mn_$c`)"))
    }
    // zval bit (j*d + i) = bit j of cell i — folded into one codegen'd
    // expression: 32 shift/and terms at the default 2x16 bits
    val zval = (0 until bits).flatMap { j =>
      cells.zipWithIndex.map { case (cell, i) =>
        shiftleft(shiftright(cell, j).bitwiseAND(lit(1L)), j * d + i)
      }
    }.reduce(_ + _)
    withCells.withColumn("zval", zval)
      .drop(cols.flatMap(c => Seq(s"__mn_$c", s"__mx_$c")): _*)
  }

  /** Range-partition + in-partition sort by zval: the layout rewrite.
    * Output schema = input + zval, `numPartitions` output partitions.
    */
  def clusterByZOrder(
      df: DataFrame,
      cols: Seq[String],
      numPartitions: Int,
      bits: Int = 16): DataFrame = {
    require(numPartitions >= 1, s"numPartitions must be >= 1")
    withZValue(df, cols, bits)
      .repartitionByRange(numPartitions, col("zval"))
      .sortWithinPartitions(col("zval"))
  }
}
