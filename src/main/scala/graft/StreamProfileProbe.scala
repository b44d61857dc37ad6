package graft

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Where does the streaming family's per-batch floor go? Runs the named
  * streaming queries (default q93/q96) a few times with a
  * StreamingQueryListener attached and prints every micro-batch's
  * durationMs breakdown (triggerExecution = total; addBatch = plan+run;
  * queryPlanning, getBatch, latestOffset, walCommit, commitOffsets,
  * getOffset are the machinery slices). Guide §1: measure first — the
  * micro-batch machinery is invisible to the bench's wall-clock, this
  * makes it visible per slice.
  *
  *   tools/run_main.sh graft.StreamProfileProbe [sfDir] [q1,q2,...] [reps]
  */
object StreamProfileProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qs = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("q93_stream_enrich", "q96_stream_join"))
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // (query-run label, batchId, durationMs map) per progress event
    val prog = ArrayBuffer.empty[(Long, Map[String, Long])]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        prog.synchronized {
          import scala.jdk.CollectionConverters._
          prog += ((e.progress.batchId,
            e.progress.durationMs.asScala.toMap
              .map { case (k, v) => (k, v.longValue) }))
        }
    }
    spark.streams.addListener(listener)

    qs.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { rep =>
        prog.synchronized(prog.clear())
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        // the listener delivers asynchronously — give it a beat
        Thread.sleep(300)
        val events = prog.synchronized(prog.toVector)
        println(f"== $name rep $rep wall ${sec}%.2f s, " +
          s"${events.length} micro-batches")
        val keys = events.flatMap(_._2.keys).distinct.sorted
        events.sortBy(_._1).foreach { case (bid, m) =>
          val parts = keys.map(k => s"$k=${m.getOrElse(k, -1L)}")
          println(s"   batch $bid: ${parts.mkString(" ")}")
        }
        keys.foreach { k =>
          val tot = events.map(_._2.getOrElse(k, 0L)).sum
          println(s"   TOTAL $k = $tot ms")
        }
      }
    }
    spark.stop()
  }
}
