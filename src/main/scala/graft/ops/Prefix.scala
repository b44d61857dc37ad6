package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed global running totals — the scale-correct form of
  * `Window.orderBy(...)` with no partition spec, which Spark executes by
  * MOVING EVERY ROW TO ONE PARTITION (it even warns). The classic
  * two-pass prefix-sum instead:
  *
  *   1. range-repartition on the order column (a range exchange — the
  *      same machinery a global `orderBy` uses, so partitions hold
  *      contiguous key ranges across the cluster);
  *   2. per-partition local prefix sums, plus one tiny driver collect of
  *      per-partition totals (hadron's runOnce idiom — nPartitions
  *      longs, not data) whose exclusive scan gives each partition its
  *      starting offset, added back in the same pass.
  *
  * Wall-clock is one exchange + one narrow pass regardless of cluster
  * size; the only driver state is O(partitions).
  */
object Prefix {

  /** Append `outCol` = running total of `valueCol` in ascending
    * `orderCol` order (ties broken by the order column's full value —
    * supply a unique key like doc_id for determinism). Output rows keep
    * the range partitioning (sorted within partitions by `orderCol`).
    *
    * The materialization of the ranged table between the two passes is
    * CORRECTNESS-load-bearing, not a speed knob: `repartitionByRange`
    * SAMPLES the data to pick partition boundaries, so an uncached
    * recompute of pass 2 could draw different boundaries than the ones
    * pass 1's totals were computed over — per-partition offsets would
    * then be added to the wrong rows. Both passes must read the SAME
    * materialized layout; do not remove the persist.
    *
    * @param storageLevel where that mandatory materialization lives.
    *   MEMORY_AND_DISK default suits working-set-sized inputs; at corpus
    *   scale pass `StorageLevel.DISK_ONLY` (the table is the full input
    *   plus ordering — memory caching it evicts everything else), or
    *   write the ranged table to a tap and run both passes against the
    *   tap. LIFECYCLE: the persist is pinned until the session drops it
    *   (the returned plan depends on it, so it cannot be unpersisted
    *   here) — a loop calling this per increment should
    *   `spark.catalog.clearCache()` between invocations, or use the
    *   files.
    */
  def runningTotal(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      outCol: String = "running_total",
      storageLevel: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): DataFrame =
    runningTotals(df, orderCol, Seq(valueCol -> outCol), storageLevel)

  /** [[runningTotal]] over SEVERAL value columns in ONE range exchange
    * and one narrow pass — the shape for cumulative pairs (two-sample
    * CDFs, paired counters): chaining single-column calls would pay
    * one exchange + two passes PER column over the same ordered table.
    * Each `(valueCol, outCol)` appends one running total; all share
    * the single `orderCol` range partitioning and per-partition
    * offset vectors (driver state O(partitions × columns) longs).
    */
  def runningTotals(
      df: DataFrame,
      orderCol: String,
      valueCols: Seq[(String, String)],
      storageLevel: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
    require(valueCols.nonEmpty, "runningTotals needs >= 1 value column")
    val spark = df.sparkSession
    val n = spark.sparkContext.defaultParallelism
    val ranged = df
      .repartitionByRange(n, col(orderCol))
      .sortWithinPartitions(orderCol)
      .persist(storageLevel) // both passes MUST read this same layout

    val vIdxs = valueCols.map { case (v, _) =>
      ranged.schema.fieldIndex(v) }.toArray
    val isLong = integralFlags(ranged.schema, valueCols.map(_._1))
    val k = vIdxs.length

    // Both passes run on InternalRow (queryExecution.toRdd), NOT
    // Dataset.rdd: the external hop would re-box EVERY field of EVERY
    // row twice (toSeq out, CatalystTypeConverters back in) just to
    // sum longs and append longs. Pass 1 additionally projects to the
    // value columns only, so the cached columnar layout serves the
    // narrow read. NULL sums as 0 (the window-cumsum contract).

    // pass 1: per-partition totals -> exclusive-scan offsets (driver,
    // O(partitions x columns) longs)
    val totals = ranged
      .select(valueCols.map { case (v, _) => col(v) }: _*)
      .queryExecution.toRdd
      .mapPartitionsWithIndex { (pid, rows) =>
        val s = new Array[Long](k)
        rows.foreach { r =>
          var j = 0
          while (j < k) {
            if (!r.isNullAt(j))
              s(j) += (if (isLong(j)) r.getLong(j) else r.getInt(j).toLong)
            j += 1
          }
        }
        Iterator((pid, s))
      }
      .collect().sortBy(_._1).map(_._2)
    // offsets(pid)(j) = column j's sum over partitions before pid
    val offsets = totals.scanLeft(new Array[Long](k)) { (acc, t) =>
      Array.tabulate(k)(j => acc(j) + t(j))
    }

    // pass 2: local prefix + partition offset, same partitioning. Each
    // output row is the input row (copied out of the scan's reused
    // buffer) joined to its k running totals; RDDScanExec's
    // UnsafeProjection flattens the pair downstream.
    val schema = valueCols.foldLeft(ranged.schema) { case (sc, (_, out)) =>
      sc.add(StructField(out, LongType, false))
    }
    val out = ranged.queryExecution.toRdd
      .mapPartitionsWithIndex { (pid, rows) =>
        val run = offsets(pid).clone()
        rows.map { r =>
          var j = 0
          while (j < k) {
            val i = vIdxs(j)
            if (!r.isNullAt(i))
              run(j) += (if (isLong(j)) r.getLong(i) else r.getInt(i).toLong)
            j += 1
          }
          val right = new GenericInternalRow(k)
          j = 0
          while (j < k) { right.update(j, run(j)); j += 1 }
          new JoinedRow(r.copy(), right): InternalRow
        }
      }
    org.apache.spark.sql.GraftRows.internalDataFrame(spark, out, schema)
  }

  /** Plan-time integral check for the prefix value columns: LongType →
    * true, IntegerType → false, anything else raises loudly (the same
    * "must be integral" contract the old per-row check enforced, now
    * before any job runs). */
  private def integralFlags(
      schema: org.apache.spark.sql.types.StructType,
      names: Seq[String]): Array[Boolean] = {
    import org.apache.spark.sql.types._
    names.map { v =>
      schema(v).dataType match {
        case LongType => true
        case IntegerType => false
        case other => throw new IllegalArgumentException(
          s"$v must be integral, got type $other")
      }
    }.toArray
  }

  /** PER-GROUP ranks through a (group, order) RANGE exchange — the
    * scale-correct form of `row_number() over (partition by g order by
    * v)`, which sorts EACH GROUP'S ENTIRE RUN inside one task: with a
    * handful of giant groups, parallelism = group count no matter how
    * big the cluster. Here the corpus range-partitions on the
    * composite (group, order) key instead — a group larger than one
    * partition spans SEVERAL contiguous partitions, each ranked in
    * parallel — and per-partition start offsets come from the same
    * O(partitions) driver scan [[runningTotal]] uses: a partition's
    * first group may continue from previous partitions, so its offset
    * is that group's row count so far (every OTHER group in the
    * partition starts inside it, offset 0 by construction).
    *
    * Rank is a per-group `row_number` ascending by `orderCol`, 1-based;
    * ties take arbitrary rank order (same contract as the window form
    * without a tiebreaker — callers needing tie determinism must make
    * `orderCol` unique). Group values use object equality in the
    * driver/boundary scans; NULL groups are the caller's to filter
    * (they'd range-sort first and rank like any other group).
    *
    * Bracket shape: `use` receives the ranked table (input columns +
    * `outCol`), its group-sized (or otherwise SMALL — it gets
    * `localCheckpoint`ed eagerly) result is materialized, and the
    * mandatory two-pass persist is dropped before returning — no
    * session-cache debt survives the call.
    */
  def rankByGroup(
      df: DataFrame,
      groupCol: String,
      orderCol: String,
      outCol: String = "rank",
      storageLevel: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)(
      use: DataFrame => DataFrame): DataFrame =
    runningTotalsByGroup(df.withColumn("__rbg_one", lit(1L)),
      groupCol, orderCol, Seq("__rbg_one" -> outCol), storageLevel)(
      ranked => use(ranked.drop("__rbg_one")))

  /** PER-GROUP running totals through a (group, order) RANGE
    * exchange — [[rankByGroup]]'s general form (rank = the running
    * total of 1), and the grouped counterpart of [[runningTotals]]:
    * each `(valueCol, outCol)` appends that column's running sum in
    * ascending `orderCol` order WITHIN its group, resetting at every
    * group boundary. The scale shape is rankByGroup's: a group larger
    * than one partition spans several contiguous partitions, each
    * summed in parallel, with per-(partition, column) start offsets
    * from one O(partitions × columns) driver boundary scan — never a
    * `partitionBy(g).orderBy(v)` window, whose single-task group runs
    * cap parallelism at the group count.
    *
    * Ties in `orderCol` accumulate in arbitrary order (the window
    * form without a tiebreaker); consumers selecting a CROSSING row
    * (first row where the running total passes a threshold) are
    * tie-safe when the selected OUTPUT is the order value itself —
    * the crossing lands somewhere in the tie run, and every row of
    * the run carries the same order value.
    *
    * Bracket contract as [[rankByGroup]]: `use`'s (small) result is
    * localCheckpoint'ed eagerly and the mandatory two-pass persist is
    * dropped before returning.
    */
  def runningTotalsByGroup(
      df: DataFrame,
      groupCol: String,
      orderCol: String,
      valueCols: Seq[(String, String)],
      storageLevel: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)(
      use: DataFrame => DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    require(valueCols.nonEmpty, "runningTotalsByGroup needs >= 1 column")
    val spark = df.sparkSession
    val n = spark.sparkContext.defaultParallelism
    val ranged = df
      .repartitionByRange(n, col(groupCol), col(orderCol))
      .sortWithinPartitions(groupCol, orderCol)
      .persist(storageLevel) // both passes MUST read this same layout
    try {
      import org.apache.spark.sql.catalyst.InternalRow
      import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
      val gIdx = ranged.schema.fieldIndex(groupCol)
      val gType = ranged.schema(gIdx).dataType
      val vIdxs = valueCols.map { case (v, _) =>
        ranged.schema.fieldIndex(v) }.toArray
      val isLong = integralFlags(ranged.schema, valueCols.map(_._1))
      val k = vIdxs.length

      // Both passes on InternalRow, as in [[runningTotals]] — the scan
      // reuses its row buffer, so any group value RETAINED across rows
      // (firstG/lastG/prevG) must be copied out (InternalRow.copyValue;
      // per-row comparisons against the live buffer are fine).

      // pass 1: per-partition (first group, last group, last group's
      // in-partition sums) -> driver scan in partition order. Sorted
      // by (g, ord), a group's rows occupy ONE contiguous run across
      // partitions, so the only cross-partition state is "the sums of
      // the group straddling this boundary so far". Projected to
      // (group, values): the cached columnar layout serves the narrow
      // read, partition indices unchanged (narrow projection).
      val summaries: Array[Option[(Any, Any, Array[Long])]] = ranged
        .select(col(groupCol) +: valueCols.map { case (v, _) => col(v) }: _*)
        .queryExecution.toRdd
        .mapPartitionsWithIndex { (pid, rows) =>
          var firstG: Any = null
          var lastG: Any = null
          var lastSums = new Array[Long](k)
          var any = false
          rows.foreach { r =>
            val g = r.get(0, gType)
            if (!any) {
              val gc = InternalRow.copyValue(g)
              firstG = gc; lastG = gc; any = true
            } else if (!java.util.Objects.equals(g, lastG)) {
              lastG = InternalRow.copyValue(g)
              lastSums = new Array[Long](k)
            }
            var j = 0
            while (j < k) {
              if (!r.isNullAt(1 + j))
                lastSums(j) +=
                  (if (isLong(j)) r.getLong(1 + j) else r.getInt(1 + j).toLong)
              j += 1
            }
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
            var j = 0 // whole partition continues the run
            while (j < k) { curSums(j) += lastSums(j); j += 1 }
          } else { curG = lastG; curSums = lastSums.clone() }
          started = true
        case (None, pid) => // empty: state flows past
          offsets(pid) = new Array[Long](k)
      }

      // pass 2: local per-group accumulators, first group seeded with
      // its cross-partition offsets, every group change resets to 0
      val schema = valueCols.foldLeft(ranged.schema) {
        case (sc, (_, out)) => sc.add(StructField(out, LongType, false))
      }
      val outRdd = ranged.queryExecution.toRdd
        .mapPartitionsWithIndex { (pid, rows) =>
          var run: Array[Long] = null
          var prevG: Any = null
          var first = true
          rows.map { r =>
            val g = r.get(gIdx, gType)
            if (first) {
              run = offsets(pid).clone()
              prevG = InternalRow.copyValue(g)
              first = false
            } else if (!java.util.Objects.equals(g, prevG)) {
              run = new Array[Long](k)
              prevG = InternalRow.copyValue(g)
            }
            var j = 0
            while (j < k) {
              val i = vIdxs(j)
              if (!r.isNullAt(i))
                run(j) +=
                  (if (isLong(j)) r.getLong(i) else r.getInt(i).toLong)
              j += 1
            }
            val right = new GenericInternalRow(k)
            j = 0
            while (j < k) { right.update(j, run(j)); j += 1 }
            new JoinedRow(r.copy(), right): InternalRow
          }
        }
      val out = org.apache.spark.sql.GraftRows
        .internalDataFrame(spark, outRdd, schema)
      // eager: the persist must outlive every job that reads it
      use(out).localCheckpoint(true)
    } finally ranged.unpersist(false)
  }

  /** Token-budget shard packing: documents in `orderCol` order are cut
    * into contiguous shards of roughly `budget` tokens. shard id =
    * which budget-multiple the document's token range STARTS in, so a
    * shard overflows its budget by at most one document (exact bin
    * packing is inherently sequential; this is the standard
    * sharding rule). A pure function of the running total — the
    * assignment is deterministic and engine-portable given a unique
    * `orderCol`. The "pack the corpus into ~N-token training shards"
    * step.
    */
  def packIntoShards(
      df: DataFrame,
      orderCol: String,
      tokenCol: String,
      budget: Long,
      shardCol: String = "shard",
      storageLevel: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    runningTotal(df, orderCol, tokenCol, "__run", storageLevel)
      .withColumn(shardCol,
        floor((col("__run") - col(tokenCol)) / budget).cast("long"))
      .drop("__run")
  }

  /** Concat-and-chop sequence packing — the training-batch layout step:
    * documents concatenated in `orderCol` order are cut into fixed
    * `seqLen`-token sequences, documents CHOPPED at sequence boundaries
    * (unlike `packIntoShards`, which lets a shard overflow to keep
    * documents whole). Every sequence except the last is exactly full —
    * zero padding waste, the standard LM pre-training layout.
    *
    * Each output row is one span: document `orderCol`'s tokens
    * [tok_from, tok_to) (0-based, exclusive end, in DOCUMENT coords)
    * land in sequence `seq_id` at offset `seq_off`. A document crossing
    * k boundaries emits k+1 rows; zero-token documents emit nothing.
    * All span arithmetic is integer (long `div`), a pure function of
    * the running total — deterministic and engine-portable given a
    * unique `orderCol`.
    *
    * Scale shape: `runningTotal`'s range exchange + O(partitions)
    * driver offsets, then map-only span math; per-doc fan-out is
    * ceil(tokens/seqLen)+1 rows, bounded. Nothing buffers a sequence's
    * documents together — materializing actual packed sequences is the
    * downstream writer's group-by, which this span table feeds with one
    * narrow (seq_id-keyed) shuffle.
    */
  def packSequences(
      df: DataFrame,
      orderCol: String,
      tokenCol: String,
      seqLen: Long,
      storageLevel: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    runningTotal(df, orderCol, tokenCol, "__run", storageLevel)
      .filter(col(tokenCol) > 0)
      .withColumn("__s", col("__run") - col(tokenCol).cast("long"))
      .withColumn("seq_id", explode(sequence(
        expr(s"__s div ${seqLen}L"),
        expr(s"(__run - 1) div ${seqLen}L"))))
      .withColumn("tok_from",
        greatest(col("seq_id") * seqLen, col("__s")) - col("__s"))
      .withColumn("tok_to",
        least((col("seq_id") + 1) * seqLen, col("__run")) - col("__s"))
      .withColumn("seq_off",
        greatest(col("seq_id") * seqLen, col("__s")) - col("seq_id") * seqLen)
      .drop("__run", "__s")
  }

  /** First-fit-decreasing bin packing within content-addressed
    * segments — the low-waste alternative to [[packIntoShards]]'s
    * running-total cut: FFD places each document (largest first) into
    * the first bin that still fits it, padding waste ≤ ~22% of OPT
    * worst-case and typically a few percent, where the running-total
    * rule wastes whatever the budget boundary slices. The price is
    * sequential placement — so the corpus is segmented by the id's
    * 52-bit md5 hash (exact integer mod, engine-portable) and FFD runs
    * independently per segment: bins never span segments, and at any
    * corpus size the parallelism dial is `segments`, each segment's
    * walk an in-task loop over its own rows.
    *
    * Determinism: placement order is (tokens DESC, id ASC) within a
    * segment — a total order for unique orderable ids
    * ([[graft.dedup.Dedup.requireOrderableId]] at plan time). A
    * document larger than `budget` opens its own (overflowing) bin:
    * its remaining capacity goes negative and never fits anything
    * again — loud in the data (`fill > budget`), not an error, so one
    * giant document cannot kill a corpus job. NULL token counts pack
    * as 0.
    *
    * Scale shape: one hash exchange on the segment key + an in-task
    * sorted walk (the GroupReduce secondary-sort idiom: repartition by
    * segment, sortWithinPartitions, boundary-detecting pass — group
    * state is the bins' remaining capacities, O(bins), never the
    * rows). FFD's first-fit scan is O(bins) per row; size `segments`
    * so a segment's bin count stays task-sized (the caller's explicit
    * knob, like every cap in this repo).
    *
    * @return (segment, id, tok, bin 1.. within segment, rank 1.. =
    *         placement order within segment)
    */
  def packBinsFfd(
      df: DataFrame,
      idCol: Column,
      tokenCol: Column,
      budget: Long,
      segments: Int,
      salt: String): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(segments >= 1, s"segments must be >= 1, got $segments")
    import org.apache.spark.sql.types._
    val base = df.select(idCol.as("id"),
      coalesce(tokenCol.cast("long"), lit(0L)).as("tok"))
    graft.dedup.Dedup.requireOrderableId(base.schema("id").dataType,
      "packBinsFfd")
    val seg = pmod(
      conv(substring(md5(concat(col("id").cast("string"),
        lit(":" + salt))), 1, 13), 16, 10).cast("long"),
      lit(segments.toLong))
    val ranged = base.withColumn("segment", seg)
      .repartition(col("segment"))
      .sortWithinPartitions(col("segment"), col("tok").desc, col("id").asc)
    val schema = StructType(Seq(
      StructField("segment", LongType, false),
      ranged.schema("id"),
      StructField("tok", LongType, false),
      StructField("bin", LongType, false),
      StructField("rank", LongType, false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    ranged.mapPartitions { rows =>
      var curSeg: Long = -1L
      var started = false
      val rem = new scala.collection.mutable.ArrayBuffer[Long]()
      var rank = 0L
      rows.map { r =>
        val s = r.getLong(2)
        if (!started || s != curSeg) {
          curSeg = s; started = true; rem.clear(); rank = 0L
        }
        val tok = r.getLong(1)
        var bin = -1
        var i = 0
        while (bin < 0 && i < rem.length) {
          if (rem(i) >= tok) bin = i
          i += 1
        }
        if (bin < 0) { rem += (budget - tok); bin = rem.length - 1 }
        else rem(bin) -= tok
        rank += 1L
        org.apache.spark.sql.Row(s, r.get(0), tok, bin + 1L, rank)
      }
    }(enc)
  }
}
