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
  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case other => throw new IllegalArgumentException(
      s"$fn '$arg' argument must be an int literal, got $other")
  }

  def registerExtensions(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("collect_list_capped"),
      new ExpressionInfo(
        classOf[graft.plans.CollectListCapped].getName, "collect_list_capped"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "collect_list_capped(expr, cap) takes exactly 2 arguments")
        graft.plans.CollectListCapped(
          children.head, intLit(children(1), "collect_list_capped", "cap"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(
        classOf[graft.plans.NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "nfc_normalize(str) takes exactly 1 argument")
        graft.plans.NfcNormalize(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("topk_by"),
      new ExpressionInfo(
        classOf[graft.plans.TopKByScore].getName, "topk_by"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "topk_by(id, score, k) takes exactly 3 arguments")
        graft.plans.TopKByScore(
          children(0),
          org.apache.spark.sql.catalyst.expressions.Cast(
            children(1), org.apache.spark.sql.types.DoubleType),
          intLit(children(2), "topk_by", "k"))
      }))
  }

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
      // into a full sort. This is a PER-TASK heap budget and every core
      // runs a task: a posting-list buffer costs ~200 B of object
      // overhead even at df=1, so 2^18 keys ~ 50 MB/task ~ 1.6 GiB at
      // 32 cores. The earlier 2^20 setting OOM'd the x100 ladder's
      // 35M-distinct-shingle grouping (ObjectAggregationIterator
      // allocates the WHOLE map before the fallback check fires) —
      // past the threshold, sort-based aggregation spills properly,
      // which is the correct regime for key counts that outgrow memory.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        (1 << 18).toString)
      // A terminated streaming query's state-store providers (and their
      // in-heap version maps — the stream-stream join holds both sides)
      // are only unloaded by the maintenance sweep, default every 60 s:
      // in a session that runs many short streaming queries (the bench
      // suite, any orchestrated pipeline), up to a minute of DEAD state
      // stays pinned per query, charged as GC pressure to whatever runs
      // next. 15 s bounds that lingering 4× tighter; for the queries
      // themselves the sweep is a no-op (they run seconds, snapshots
      // barely ever fire mid-run).
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "15s")
      .withExtensions(registerExtensions)
}
