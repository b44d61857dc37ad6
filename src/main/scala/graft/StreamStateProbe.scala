package graft

import org.apache.spark.sql.functions._

/** State-growth evidence for `Streaming.nearDupStream`'s NoTimeout
  * design: the scaladoc's claim is that per-bucket state is CAPPED
  * (maxBucketState members + 8x overflow ids), so total state grows
  * with DISTINCT band buckets — linear in distinct documents, never
  * with stream length on re-deliveries or dup storms. This probe
  * drives a real ~20-micro-batch file-stream run (q73's staging,
  * more splits) and prints one JSON line per micro-batch from
  * `StreamingQuery.recentProgress` — rows/bytes in the state store —
  * plus a `state_curve` summary:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *   SPARK_GRAFT_BATCHES=20 sbt "runMain graft.StreamStateProbe"
  *
  * Results in NOTES.md ("nearDupStream state growth").
  */
object StreamStateProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_BATCHES", "20").toInt
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val base = java.nio.file.Files.createTempDirectory("graft_stateprobe_")
    val streamDir = base.resolve("stream"); val tmpDir = base.resolve("tmp")
    java.nio.file.Files.createDirectories(streamDir)
    docs.withColumn("b", pmod(col("doc_id"), lit(nBatches)))
      .repartition(col("b"))
      .write.mode("overwrite").partitionBy("b").parquet(tmpDir.toString)
    (0 until nBatches).foreach { b =>
      val part = new java.io.File(tmpDir.resolve(s"b=$b").toString)
        .listFiles().find(f => f.getName.endsWith(".parquet")).get
      val dst = streamDir.resolve(f"batch_$b%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst)
      dst.toFile.setLastModified(1500000000000L + b * 60000L)
    }

    val src = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir.toString)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q = graft.streaming.Streaming.nearDupStream(
        src, idCol = "doc_id", textCol = "text",
        shingleK = 8, numHashes = 12, bands = 3, threshold = 0.5,
        maxBucketState = 64) // the PRODUCTION default cap, not q73's lifted one
      .writeStream.format("noop")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .start()
    try {
      q.processAllAvailable()
      // re-delivery phase: the SAME documents arrive again as new
      // files — per-bucket `stored.exists` dedup means state must NOT
      // grow, the claim behind "state is linear in DISTINCT docs, not
      // stream length"
      if (sys.env.get("SPARK_GRAFT_REDELIVER").contains("1")) {
        (0 until nBatches).foreach { b =>
          val src = streamDir.resolve(f"batch_$b%02d.parquet")
          val dst = streamDir.resolve(f"redeliver_$b%02d.parquet")
          java.nio.file.Files.copy(src, dst)
          dst.toFile.setLastModified(1500000000000L + (nBatches + b) * 60000L)
        }
        q.processAllAvailable()
      }
    } finally q.stop()

    val rows = q.recentProgress.toSeq
      .filter(p => p.numInputRows > 0 || p.batchId < nBatches)
      .sortBy(_.batchId)
    rows.foreach { p =>
      val so = p.stateOperators.headOption
      println(s"""{"metric":"state_batch","batch":${p.batchId},""" +
        s""""input_rows":${p.numInputRows},""" +
        s""""state_rows":${so.map(_.numRowsTotal).getOrElse(-1L)},""" +
        s""""state_updated":${so.map(_.numRowsUpdated).getOrElse(-1L)},""" +
        s""""state_bytes":${so.map(_.memoryUsedBytes).getOrElse(-1L)}}""")
    }
    val tot = rows.flatMap(_.stateOperators.headOption)
    if (tot.nonEmpty) {
      val rowsPerBatch = tot.map(_.numRowsTotal)
      println(s"""{"metric":"state_curve","batches":${rows.size},""" +
        s""""first_rows":${rowsPerBatch.head},""" +
        s""""last_rows":${rowsPerBatch.last},""" +
        s""""last_bytes":${tot.last.memoryUsedBytes},""" +
        s""""docs":${docs.count()}}""")
    }
    spark.stop()
  }
}
