package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingAnomalies
import graft.streaming.StreamingAnomalies.{HourUs, RateEvent}

/** Pins the live rate-anomaly feed against a sequential reference
  * fold on the same sf0.001 events: hours must close in event-time
  * order per type regardless of arrival scrambling, each scored
  * against the moments of the hours that closed before it (the
  * history-only population — deliberately NOT the batch query's
  * full-hindsight distribution), exactly once.
  */
class StreamingAnomaliesSpec extends SparkSpec {

  test("live per-hour z-scores equal the sequential history fold on " +
      "sf0.001 events, exactly once, across scrambled triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ev = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_type"), expr("ts div 1000").as("ts_us"))
      .as[(String, Long)].collect()
      .map(e => RateEvent(e._1, e._2))
    assert(ev.nonEmpty)

    val src = MemoryStream[RateEvent]
    val q = StreamingAnomalies.report(src.toDS())
      .writeStream.format("memory").queryName("sanom_out")
      .outputMode("update").start()
    try {
      val sorted = ev.sortBy(_.tsUs)
      val chunks = sorted.grouped(math.max(1, sorted.length / 5 + 1))
        .map(_.reverse).toSeq
      chunks.foreach { c => src.addData(c.toSeq); q.processAllAvailable() }
      val flushTs = ev.map(_.tsUs).max + 5 * HourUs
      src.addData(RateEvent("zz_flush", flushTs))
      q.processAllAvailable()
      src.addData(RateEvent("zz_flush", flushTs + 5 * HourUs))
      q.processAllAvailable()

      val streamed = spark.table("sanom_out")
        .filter(col("eventType") =!= "zz_flush")
        .select("eventType", "hourBucket", "nEvents", "nPrior", "z1e6")
        .as[(String, Long, Long, Long, Long)].collect()

      // sequential reference: per type, hours ascending, each scored
      // against the moments of the strictly earlier hours
      val reference = ev.groupBy(_.eventType).flatMap { case (typ, es) =>
        val hours = es.groupBy(_.tsUs / HourUs)
          .view.mapValues(_.length.toLong).toSeq.sortBy(_._1)
        var (h, s, qq) = (0L, 0L, 0L)
        hours.map { case (hour, n) =>
          val row =
            if (h >= 3L)
              (typ, hour, n, h, StreamingAnomalies.z1e6(n, h, s, qq))
            else (typ, hour, n, 0L, 0L)
          h += 1L; s += n; qq += n * n
          row
        }
      }.toSet

      assert(reference.exists(_._4 >= 3L),
        "degenerate fixture: no hour ever scored against real history")
      assert(streamed.toSet === reference,
        s"missing=${(reference -- streamed.toSet).take(3)} " +
          s"extra=${(streamed.toSet -- reference).take(3)}")
      assert(streamed.length === reference.size,
        s"rows re-emitted or dropped: ${streamed.length} vs " +
          s"${reference.size}")
    } finally q.stop()
  }

  test("an hour emits only when the watermark passes its end; " +
      "in-horizon stragglers fold into the closing count") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[RateEvent]
    val q = StreamingAnomalies.report(src.toDS(), maxDelay = "1 hour")
      .writeStream.format("memory").queryName("sanom_late")
      .outputMode("update").start()
    val h0 = 2000000L * HourUs
    try {
      src.addData(RateEvent("a", h0), RateEvent("a", h0 + 1L))
      q.processAllAvailable()
      assert(spark.table("sanom_late").count() === 0,
        "emitted before the watermark closed the hour")
      // straggler for the same hour, inside the 1h horizon
      src.addData(RateEvent("a", h0 + 2L))
      q.processAllAvailable()
      // advance the watermark past the hour end: close + emit with
      // empty history (nPrior = 0, z = 0)
      src.addData(RateEvent("a", h0 + 3 * HourUs))
      q.processAllAvailable()
      src.addData(RateEvent("a", h0 + 6 * HourUs))
      q.processAllAvailable()
      val rows = spark.table("sanom_late")
        .filter(col("hourBucket") === 2000000L)
        .select("eventType", "nEvents", "nPrior", "z1e6")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(rows === Set(("a", 3L, 0L, 0L)), s"closed-hour row: $rows")
    } finally q.stop()
  }
}
