package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** Shared SparkSession defaults for all entry points (Verify, Bench,
  * tests). Centralized so the scan/shuffle configuration that queries rely
  * on (UTC, nanos handling, AQE) is identical everywhere, and so graft's
  * custom Catalyst functions are registered in every session.
  */
object Sessions {

  /** graft's native Catalyst extensions, registered the supported way
    * (SparkSessionExtensions) — usable from `call_function` and SQL.
    */
  def registerExtensions(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction((
      new FunctionIdentifier("collect_list_capped"),
      new ExpressionInfo(
        classOf[graft.plans.CollectListCapped].getName, "collect_list_capped"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "collect_list_capped(expr, cap) takes exactly 2 arguments")
        val cap = children(1) match {
          case Literal(i: Int, IntegerType) => i
          case other => throw new IllegalArgumentException(
            s"collect_list_capped cap must be an int literal, got $other")
        }
        graft.plans.CollectListCapped(children.head, cap)
      }))

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // events.ts is parquet TIMESTAMP(NANOS); Spark 4 otherwise refuses it
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // bucketed tables (Tap.writeBucketed) land here, not in the cwd
      .config("spark.sql.warehouse.dir",
        sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-warehouse")
      // ObjectHashAggregate (collect_list/_capped, typed buffers) falls
      // back to SORT-based aggregation after this many distinct keys per
      // partition; the default (128) turns every posting-list grouping
      // into a full sort. graft's aggregation buffers are size-capped
      // (CollectListCapped), so a ~1M-entry hash map stays ~100 MB/task.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        (1 << 20).toString)
      .withExtensions(registerExtensions)
}
