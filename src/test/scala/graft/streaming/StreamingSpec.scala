package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import Streaming._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("sessionize (batch mode) splits on the inactivity gap") {
    import spark.implicits._
    val events = Seq(
      Event(1, ts(0), 1L, "a", 1.0),
      Event(2, ts(5), 1L, "a", 2.0),
      // 40-min gap > 30-min session gap => new session
      Event(3, ts(45), 1L, "a", 3.0),
      Event(4, ts(10), 2L, "b", 5.0)).toDS()
    val sessions = Streaming.sessionize(events, gapMs = 30 * 60 * 1000L)
      .collect().toSeq.sortBy(s => (s.user_id, s.session_start.getTime))
    assert(sessions.map(s => (s.user_id, s.n_events, s.total_value)) ==
      Seq((1L, 2L, 3.0), (1L, 1L, 3.0), (2L, 1L, 5.0)))
  }

  test("windowedCounts over a MemoryStream emits tumbling-window aggregates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(0), 1L, "click", 1.0),
      Event(2, ts(1), 2L, "click", 2.0),
      Event(3, ts(16), 1L, "view", 4.0))
    val q = Streaming.windowedCounts(
      mem.toDF(), window = "15 minutes", watermark = "1 hour")
      .writeStream.format("memory").queryName("wc")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_type, n, total_value FROM wc")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(rows == Set(("click", 2L, 3.0), ("view", 1L, 4.0)))
    } finally q.stop()
  }
}
