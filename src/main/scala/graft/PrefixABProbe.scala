package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Same-JVM interleaved A/B for the round-17 Prefix internal-row
  * reshape: the pre-round two-pass implementation ran BOTH passes on
  * `Dataset.rdd` — an external-Row hop that re-boxes every field of
  * every row (toSeq out, CatalystTypeConverters back in) around sums
  * and appends of plain longs. The shipped form runs both passes on
  * `queryExecution.toRdd` (InternalRow): pass 1 over a narrow
  * projection of the cached columnar layout, pass 2 appending the
  * running columns via JoinedRow + internalCreateDataFrame.
  *
  * Arm A replicates the OLD Row-based `runningTotal(s)` /
  * `runningTotalsByGroup` verbatim; arm B calls the shipped
  * [[graft.ops.Prefix]]. Arms alternate A,B,A,B inside one process
  * (box-drift-proof) and must be result-identical (sig compare).
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_scale_root/events/x100 \
  *   SPARK_GRAFT_CPUS=32 tools/run_main.sh graft.PrefixABProbe
  *
  * Results in NOTES.md ("prefix-ab").
  */
object PrefixABProbe {

  /** The pre-round implementation, verbatim shape (Row-based). */
  private def runningTotalsOld(
      df: DataFrame,
      orderCol: String,
      valueCols: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val n = spark.sparkContext.defaultParallelism
    val ranged = df
      .repartitionByRange(n, col(orderCol))
      .sortWithinPartitions(orderCol)
      .persist()
    val vIdxs = valueCols.map { case (v, _) => ranged.schema.fieldIndex(v) }
    val names = valueCols.map(_._1)
    def valueOf(r: Row, j: Int): Long =
      r.get(vIdxs(j)) match {
        case l: Long => l
        case i: Int => i.toLong
        case null => 0L
        case other => throw new IllegalArgumentException(
          s"${names(j)} must be integral, got $other")
      }
    val k = vIdxs.length
    val totals = ranged.rdd
      .mapPartitionsWithIndex { (pid, rows) =>
        val s = new Array[Long](k)
        rows.foreach { r =>
          var j = 0
          while (j < k) { s(j) += valueOf(r, j); j += 1 }
        }
        Iterator((pid, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(new Array[Long](k)) { (acc, t) =>
      Array.tabulate(k)(j => acc(j) + t(j))
    }
    val schema = valueCols.foldLeft(ranged.schema) { case (sc, (_, out)) =>
      sc.add(StructField(out, LongType, false))
    }
    val out = ranged.rdd
      .mapPartitionsWithIndex { (pid, rows) =>
        val run = offsets(pid).clone()
        rows.map { r =>
          var j = 0
          while (j < k) { run(j) += valueOf(r, j); j += 1 }
          Row.fromSeq(r.toSeq ++ run.toSeq)
        }
      }
    spark.createDataFrame(out, schema)
  }

  /** The pre-round grouped implementation, verbatim shape (Row-based). */
  private def runningTotalsByGroupOld(
      df: DataFrame,
      groupCol: String,
      orderCol: String,
      valueCols: Seq[(String, String)])(
      use: DataFrame => DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val n = spark.sparkContext.defaultParallelism
    val ranged = df
      .repartitionByRange(n, col(groupCol), col(orderCol))
      .sortWithinPartitions(groupCol, orderCol)
      .persist()
    try {
      val gIdx = ranged.schema.fieldIndex(groupCol)
      val vIdxs = valueCols.map { case (v, _) =>
        ranged.schema.fieldIndex(v) }.toArray
      val names = valueCols.map(_._1)
      val k = vIdxs.length
      def valueOf(r: Row, j: Int): Long =
        r.get(vIdxs(j)) match {
          case l: Long => l
          case i: Int => i.toLong
          case null => 0L
          case other => throw new IllegalArgumentException(
            s"${names(j)} must be integral, got $other")
        }
      val summaries: Array[Option[(Any, Any, Array[Long])]] = ranged.rdd
        .mapPartitionsWithIndex { (pid, rows) =>
          var firstG: Any = null
          var lastG: Any = null
          var lastSums = new Array[Long](k)
          var any = false
          rows.foreach { r =>
            val g = r.get(gIdx)
            if (!any) { firstG = g; lastG = g; any = true }
            if (!java.util.Objects.equals(g, lastG)) {
              lastG = g; lastSums = new Array[Long](k)
            }
            var j = 0
            while (j < k) { lastSums(j) += valueOf(r, j); j += 1 }
          }
          Iterator((pid,
            if (any) Some((firstG, lastG, lastSums)) else None))
        }
        .collect().sortBy(_._1).map(_._2)
      val offsets = Array.fill(summaries.length)(new Array[Long](k))
      var curG: Any = null
      var curSums = new Array[Long](k)
      var started = false
      summaries.zipWithIndex.foreach {
        case (Some((firstG, lastG, lastSums)), pid) =>
          offsets(pid) =
            if (started && java.util.Objects.equals(firstG, curG))
              curSums.clone()
            else new Array[Long](k)
          if (started && java.util.Objects.equals(lastG, curG) &&
              java.util.Objects.equals(firstG, lastG)) {
            var j = 0
            while (j < k) { curSums(j) += lastSums(j); j += 1 }
          } else { curG = lastG; curSums = lastSums.clone() }
          started = true
        case (None, pid) =>
          offsets(pid) = new Array[Long](k)
      }
      val schema = valueCols.foldLeft(ranged.schema) {
        case (sc, (_, out)) => sc.add(StructField(out, LongType, false))
      }
      val outRdd = ranged.rdd
        .mapPartitionsWithIndex { (pid, rows) =>
          var run: Array[Long] = null
          var prevG: Any = null
          var first = true
          rows.map { r =>
            val g = r.get(gIdx)
            if (first) { run = offsets(pid).clone(); first = false }
            else if (!java.util.Objects.equals(g, prevG))
              run = new Array[Long](k)
            prevG = g
            var j = 0
            while (j < k) { run(j) += valueOf(r, j); j += 1 }
            Row.fromSeq(r.toSeq ++ run.toSeq)
          }
        }
      val out = spark.createDataFrame(outRdd, schema)
      use(out).localCheckpoint(true)
    } finally ranged.unpersist(false)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/tmp/graft_scale_root/events/x100")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    // the consumers' common shapes: a narrow (ord, v) stream for the
    // global form, a (g, v) stream with a long payload column for the
    // grouped form (payload exercises the full-row pass-2 append)
    val narrow = ev.select(
      col("event_id").cast("long").as("ord"),
      expr("CAST(CAST(value AS DECIMAL(18,4)) * 100 AS BIGINT)").as("v"))
      .filter(col("ord").isNotNull && col("v").isNotNull)
    val grouped = ev.select(
      col("event_type").as("g"),
      expr("CAST(CAST(value AS DECIMAL(18,4)) * 100 AS BIGINT)").as("v"),
      col("user_id").cast("long").as("payload"))
      .filter(col("g").isNotNull && col("v").isNotNull)

    def sig(df: DataFrame): String = // mod keeps the sum overflow-proof
      df.agg(sum(pmod(col("s1"), lit(1000003L))), count(lit(1))).collect()
        .map(_.toString).mkString.hashCode.toString

    // each arm materializes to the same tiny signature; caches cleared
    // between arms so every run pays its own two passes
    def globalArm(f: (DataFrame, String, Seq[(String, String)]) => DataFrame)
        (): String = {
      val out = f(narrow, "ord", Seq("v" -> "run"))
        .select(col("run").as("s1"))
      val s = sig(out)
      spark.catalog.clearCache()
      s
    }
    def groupArm(
        f: (DataFrame, String, String, Seq[(String, String)]) =>
          (DataFrame => DataFrame) => DataFrame)(): String = {
      val out = f(grouped, "g", "v", Seq("v" -> "cum"))(
        r => r.groupBy("g").agg(max("cum").as("s1"), sum("payload")))
      val s = sig(out)
      spark.catalog.clearCache()
      s
    }

    val arms: Seq[(String, () => String)] = Seq(
      "global-old" -> globalArm { (d, o, v) => runningTotalsOld(d, o, v) },
      "global-new" -> globalArm { (d, o, v) =>
        graft.ops.Prefix.runningTotals(d, o, v) },
      "group-old " -> groupArm { (d, g, o, v) => u =>
        runningTotalsByGroupOld(d, g, o, v)(u) },
      "group-new " -> groupArm { (d, g, o, v) => u =>
        graft.ops.Prefix.runningTotalsByGroup(d, g, o, v)(u) })

    // interleave: warm round (untimed), then 3 timed rounds A,B,A,B
    arms.foreach { case (_, run) => run() }
    val times = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    val sigs = scala.collection.mutable.Map[String, String]()
    for (_ <- 1 to 3; (label, run) <- arms) {
      val t0 = System.nanoTime()
      val s = run()
      times(label) = ((System.nanoTime() - t0) / 1e9) :: times(label)
      sigs(label) = s
    }
    for ((label, _) <- arms) {
      val ts = times(label).sorted
      println(f"[prefix-ab] $sfDir $label: med=${ts(ts.length / 2)}%.2f s " +
        f"lo=${ts.head}%.2f hi=${ts.last}%.2f (sig=${sigs(label)})")
    }
    require(sigs("global-old") == sigs("global-new"),
      "global arms diverged")
    require(sigs("group-old ") == sigs("group-new "),
      "grouped arms diverged")
    println("[prefix-ab] arms hash-equal")
    spark.stop()
  }
}
