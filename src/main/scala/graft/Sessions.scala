package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession defaults for all entry points (Verify, Bench,
  * tests). Centralized so the scan/shuffle configuration that queries rely
  * on (UTC, nanos handling, AQE) is identical everywhere.
  */
object Sessions {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // events.ts is parquet TIMESTAMP(NANOS); Spark 4 otherwise refuses it
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
}
