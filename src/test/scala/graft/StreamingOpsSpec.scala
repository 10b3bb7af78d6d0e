package graft

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.DedupDoc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Streaming-native operators: watermarked windowed aggregation (streaming
  * q22) and cross-batch stateful exact dedup (streaming q11). */
class StreamingOpsSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed event stats: streaming (complete) matches the batch aggregation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String, Double)]
    val events = in.toDF.toDF("event_id", "ts", "event_type", "value")

    val q = StreamingOps.windowedEventStats(events)
      .writeStream.format("memory").queryName("winstats").outputMode("complete").start()
    try {
      in.addData(
        (1L, ts("2026-01-01 10:05:00"), "click", 1.25),
        (2L, ts("2026-01-01 10:45:00"), "click", 2.5),
        (3L, ts("2026-01-01 10:50:00"), "view", 0.75))
      q.processAllAvailable()
      in.addData(
        (4L, ts("2026-01-01 11:10:00"), "click", 3.0),
        (5L, ts("2026-01-01 10:59:00"), "view", 1.0)) // in-watermark late row
      q.processAllAvailable()

      val got = spark.table("winstats")
        .select($"w_start", $"event_type", $"n", $"val_m")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == Set(
        (ts("2026-01-01 10:00:00"), "click", 2L, 3750L),
        (ts("2026-01-01 10:00:00"), "view", 2L, 1750L),
        (ts("2026-01-01 11:00:00"), "click", 1L, 3000L)))
    } finally q.stop()
  }

  test("windowed event stats: append mode emits a window once its watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String, Double)]
    val events = in.toDF.toDF("event_id", "ts", "event_type", "value")

    val q = StreamingOps.windowedEventStats(events)
      .writeStream.format("memory").queryName("winappend").outputMode("append").start()
    try {
      in.addData((1L, ts("2026-01-01 10:05:00"), "click", 1.0))
      q.processAllAvailable()
      assert(spark.table("winappend").isEmpty) // watermark still inside the window

      // an event 3 hours later pushes the watermark past the 10:00 window end
      in.addData((2L, ts("2026-01-01 13:30:00"), "view", 1.0))
      q.processAllAvailable()
      in.addData((3L, ts("2026-01-01 13:31:00"), "view", 1.0)) // batch to flush finalized state
      q.processAllAvailable()

      val rows = spark.table("winappend")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(rows.contains((ts("2026-01-01 10:00:00"), "click", 1L)))
    } finally q.stop()
  }

  test("streaming exact dedup: duplicates suppressed across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[DedupDoc]

    val q = StreamingOps.streamingExactDedup(in.toDS)
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      in.addData(DedupDoc(2, "alpha"), DedupDoc(1, "alpha"), DedupDoc(3, "beta"))
      q.processAllAvailable()
      in.addData(DedupDoc(4, "alpha"), DedupDoc(5, "gamma")) // 4 is a cross-batch dup
      q.processAllAvailable()

      val got = spark.table("dedup").as[DedupDoc].collect().map(d => (d.doc_id, d.text)).toSet
      assert(got == Set((1L, "alpha"), (3L, "beta"), (5L, "gamma")))
    } finally q.stop()
  }
}
