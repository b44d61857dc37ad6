package graft

import org.apache.spark.sql.functions._

/** State-store BACKEND evidence for the streaming recurrences
  * (round-19 verdict item): cusumStream/ewmaStream keep a few scalars
  * of GroupState per key, so the scale limit is the state BACKEND,
  * not the operator — the default HDFSBackedStateStoreProvider holds
  * every key's state in executor heap (bounded by memory at 100×
  * key cardinality), while RocksDBStateStoreProvider keeps it
  * off-heap/on-disk with a block-cache working set. Semantics are
  * backend-independent (this probe hash-checks the two arms equal);
  * what changes is the wall/memory trade, measured here per backend
  * at an events rung:
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_scale_root/events/x10 \
  *   SPARK_GRAFT_CPUS=32 tools/run_main.sh graft.StateBackendProbe
  *
  * Drives ewmaStream (the q183 staging: four time-quartile file
  * batches keyed by user_id). Results in NOTES.md ("state backend").
  */
object StateBackendProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/tmp/graft_scale_root/events/x10")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // q183's staging: four event-time-quartile batches (ordering
    // contract holds across batches), keyed by user_id
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    // testdata events carry TIMESTAMP(NANOS) read as long (the t()
    // convention); the scale rungs carry a plain timestamp
    val tsCol = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        expr("timestamp_micros(CAST(ts AS BIGINT) div 1000)")
      case _ => col("ts").cast("timestamp") // NTZ rungs -> TIMESTAMP
    }
    val ev0 = raw
      .filter(col("user_id").isNotNull && col("event_id").isNotNull &&
        col("value").isNotNull && col("ts").isNotNull)
      .select(col("user_id").as("key"), col("event_id").as("id"),
        tsCol.as("ts"),
        expr("CAST(CAST(value AS DECIMAL(18,4)) * 100 AS BIGINT)").as("v"))
    // TRUE event-time quartiles (the rungs span several months, so
    // q160's day-of-month rule would interleave event time across
    // batches and trip the disorder guard — correctly)
    val r = ev0.agg(min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi")).first()
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    val span = math.max(hi - lo + 1, 1L)
    val ev = ev0.withColumn("b",
      least(((unix_micros(col("ts")) - lit(lo)) * 4 / lit(span))
        .cast("int"), lit(3)))
    val base = java.nio.file.Files.createTempDirectory("graft_backend_")
    val streamDir = base.resolve("stream"); val tmpDir = base.resolve("tmp")
    java.nio.file.Files.createDirectories(streamDir)
    ev.repartition(col("b"))
      .write.mode("overwrite").partitionBy("b").parquet(tmpDir.toString)
    (0 until 4).foreach { b =>
      val dirF = new java.io.File(tmpDir.resolve(s"b=$b").toString)
      if (dirF.isDirectory) {
        val part = dirF.listFiles()
          .find(f => f.getName.endsWith(".parquet")).get
        val dst = streamDir.resolve(f"batch_$b%02d.parquet")
        java.nio.file.Files.move(part.toPath, dst)
        dst.toFile.setLastModified(1500000000000L + b * 60000L)
      }
    }
    val nKeys = ev.select(col("key")).distinct().count()
    val nRows = ev.count()

    val providers = Seq(
      "hdfs" -> ("org.apache.spark.sql.execution.streaming.state." +
        "HDFSBackedStateStoreProvider"),
      "rocksdb" -> ("org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider"))
    val sigs = scala.collection.mutable.Map[String, (Long, String)]()
    for ((label, cls) <- providers) {
      val outDir = base.resolve(s"out_$label")
      val ckpt = base.resolve(s"ckpt_$label")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", cls)
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      val src = spark.readStream
        .schema("key BIGINT, id BIGINT, ts TIMESTAMP, v BIGINT")
        .option("maxFilesPerTrigger", "1").parquet(streamDir.toString)
      val t0 = System.nanoTime()
      val q = graft.streaming.Streaming.ewmaStream(
          src.as[graft.streaming.Streaming.EwmaPoint], alpha = 4)
        .toDF()
        .writeStream.format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .start()
      try q.processAllAvailable() finally q.stop()
      val sec = (System.nanoTime() - t0) / 1e9
      val so = q.recentProgress.toSeq.sortBy(_.batchId)
        .flatMap(_.stateOperators.headOption)
      val out = spark.read.parquet(outDir.toString)
      val h = out.select(xxhash64(out.columns.map(col): _*)
          .cast("decimal(38,0)").as("h"))
        .agg(count(lit(1)), sum(col("h"))).first()
      sigs(label) = (h.getLong(0), String.valueOf(h.getDecimal(1)))
      println(f"[statebackend] $sfDir $label: $sec%.2f s, " +
        f"keys=$nKeys rows=$nRows, " +
        f"state_rows=${so.lastOption.map(_.numRowsTotal).getOrElse(-1L)}, " +
        f"state_bytes=${so.lastOption.map(_.memoryUsedBytes).getOrElse(-1L)}, " +
        f"n_out=${sigs(label)._1}")
    }
    println(s"[statebackend] arms_equal=" +
      s"${sigs.values.toSet.size == 1} " +
      s"(${sigs.map { case (k, v) => s"$k=${v._2.take(12)}" }.mkString(", ")})")
    spark.stop()
  }
}
