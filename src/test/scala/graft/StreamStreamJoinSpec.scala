package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pins the stream-stream interval join contract the engine relies on
  * for live attribution (the streaming twin of `asof_tolerance`):
  * purchases join clicks of the same user within a bounded trailing
  * window, both sides watermarked so join state is evicted instead of
  * growing with the stream — the 100 TB streaming property. */
class StreamStreamJoinSpec extends SparkSpec {

  test("purchases match clicks within the interval across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long)]    // (user, epoch-sec)
    val purchases = MemoryStream[(Long, Long)] // (user, epoch-sec)
    val c = clicks.toDS().toDF("c_user", "c_sec")
      .withColumn("c_ts", timestamp_seconds(col("c_sec")))
      .withWatermark("c_ts", "10 seconds")
    val p = purchases.toDS().toDF("p_user", "p_sec")
      .withColumn("p_ts", timestamp_seconds(col("p_sec")))
      .withWatermark("p_ts", "10 seconds")
    // purchase claims clicks in the preceding 20s (inclusive bounds)
    val joined = p.join(c, expr(
      "p_user = c_user AND c_ts BETWEEN p_ts - INTERVAL 20 SECONDS AND p_ts"))
      .select(col("p_user"), col("p_sec"), col("c_sec"))
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    def emitted(): Set[(Long, Long, Long)] =
      spark.table("ssj_out").as[(Long, Long, Long)].collect().toSet
    try {
      val t0 = 1000000L
      // click lands first, purchase arrives in a LATER micro-batch —
      // the join must buffer the click in state across batches
      clicks.addData((1L, t0), (2L, t0))
      q.processAllAvailable()
      purchases.addData((1L, t0 + 15))
      q.processAllAvailable()
      assert(emitted() === Set((1L, t0 + 15, t0)))

      // in-window click (5s before) matches; out-of-window click (25s
      // before) does not; other-user click never matches
      clicks.addData((1L, t0 + 30))
      purchases.addData((1L, t0 + 35), (2L, t0 + 55))
      q.processAllAvailable()
      assert(emitted() === Set(
        (1L, t0 + 15, t0),        // first match, unchanged
        (1L, t0 + 35, t0 + 30)))  // 5s-old click matches; t0 is 35s old
    } finally q.stop()
  }
}
