package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Sessions

/** Pins [[Sessions.gapSessions]] on a live stream: sessions emit in
  * append mode only once the watermark passes their end (no further
  * event can extend them), within-gap events merge across micro-batches,
  * and session state is evicted rather than accumulating — the shared
  * batch/streaming definition the `sessionize` query uses. */
class StreamingSessionSpec extends SparkSpec {

  test("sessions merge across micro-batches and emit on watermark close") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)] // (user, epoch-second)
    val events = input.toDS().toDF("user", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val out = Sessions.gapSessions(
      events, timeCol = "ts", keyCol = "user", gap = "10 seconds",
      aggs = Seq(count(lit(1)).as("n_events")),
      watermark = Some("5 seconds"))
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    def emitted(): Seq[(Long, Long, Long, Long)] =
      spark.table("sess_out")
        .select(col("user"), unix_timestamp(col("session_start")),
          unix_timestamp(col("session_end")), col("n_events"))
        .as[(Long, Long, Long, Long)].collect().toSeq
    try {
      val t0 = 1000000L
      // batch 1: two events 4s apart — one open session, nothing emits
      // (watermark still before its end)
      input.addData((1L, t0), (1L, t0 + 4))
      q.processAllAvailable()
      assert(emitted().isEmpty)

      // batch 2: an event 8s after the last one extends the SAME
      // session across the micro-batch boundary (8 < 10 gap)
      input.addData((1L, t0 + 12))
      q.processAllAvailable()
      assert(emitted().isEmpty)

      // batch 3: a far-future event pushes the watermark past the
      // session end → the merged 3-event session emits, end = last+gap
      input.addData((2L, t0 + 100))
      q.processAllAvailable()
      assert(emitted() === Seq((1L, t0, t0 + 12 + 10, 3L)))
    } finally q.stop()
  }
}
