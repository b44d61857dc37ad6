package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.util.LongAccumulator

/** Job counters and progress — ports of hadron's Hadoop-counter plumbing.
  *
  * `emitCounter` (/root/reference/src/Hadron/Basic.hs:95-111) writes
  * `reporter:counter:grp,name,inc` lines to stderr for Hadoop to scrape;
  * Spark's `LongAccumulator` is the native equivalent (merged on the
  * driver, visible in the UI). `emitStatus` (Basic.hs:115-119) maps to
  * `setJobDescription`. `performEvery` (Utils.hs:23-38) — a side effect
  * every n records — is a counter bump inside the row pipeline.
  */
final class Counters(spark: SparkSession) {
  private val registry =
    scala.collection.concurrent.TrieMap.empty[String, LongAccumulator]

  /** Get or create a named counter (hadron's group,name collapses to a
    * single label).
    */
  def counter(name: String): LongAccumulator =
    registry.getOrElseUpdate(name,
      spark.sparkContext.longAccumulator(name))

  /** emitStatus analog: label the current job in the scheduler/UI. */
  def status(msg: String): Unit =
    spark.sparkContext.setJobDescription(msg)

  /** performEvery analog: count rows flowing through this point of the
    * pipeline (and, every `every` rows per partition, run `f`). Passes the
    * DataFrame through unchanged.
    */
  def countRows(df: DataFrame, name: String, every: Long = 0)(
      f: Long => Unit = _ => ()): DataFrame = {
    val acc = counter(name)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(df.schema)
    df.mapPartitions { it =>
      var local = 0L
      it.map { r =>
        local += 1
        acc.add(1)
        if (every > 0 && local % every == 0) f(local)
        r
      }
    }(enc)
  }

  def value(name: String): Long =
    registry.get(name).fold(0L)(_.value.longValue())
}
