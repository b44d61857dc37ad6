package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Corpus snapshot delta — the incremental-ingest primitive a pipeline
  * runs between two crawls/releases before reprocessing anything.
  * hadron re-runs whole stages on changed inputs (`RerunStrategy`,
  * /root/reference/src/Hadron/Controller.hs:668-680, with tap identity
  * by location, :342-343); a content-level diff is what lets a Spark
  * pipeline reprocess ONLY the delta instead.
  */
object SnapshotDiff {

  /** Per-id delta between two snapshots: 'added' (id only in `neu`),
    * 'removed' (id only in `old`), 'changed' (both sides, content hash
    * differs — null-safe, so two null texts are equal). Unchanged rows
    * are dropped: at corpus scale they are the overwhelming majority,
    * and emitting them would make the delta corpus-sized.
    *
    * Scale shape: both sides project to (id, 16-byte md5) BEFORE the
    * join — the full-outer shuffle moves hashes, never documents (the
    * same narrow-shuffle discipline as `Dedup.exact`). Presence is
    * tracked by indicator columns, not hash nullness, so null-text rows
    * diff correctly. Snapshots bucketed by id on disk co-locate this
    * join entirely.
    */
  def diff(
      old: DataFrame, oldId: Column, oldText: Column,
      neu: DataFrame, newId: Column, newText: Column): DataFrame = {
    val o = old.select(oldId.as("id"),
      Hashing.md5Hex(oldText).as("old_hash"), lit(true).as("in_old"))
    val n = neu.select(newId.as("id"),
      Hashing.md5Hex(newText).as("new_hash"), lit(true).as("in_new"))
    o.join(n, Seq("id"), "full_outer")
      .withColumn("status",
        when(col("in_old").isNull, lit("added"))
          .when(col("in_new").isNull, lit("removed"))
          .when(!(col("old_hash") <=> col("new_hash")), lit("changed")))
      .filter(col("status").isNotNull)
      .select(col("id"), col("status"), col("old_hash"), col("new_hash"))
  }
}
