package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingTopK
import graft.streaming.StreamingTopK.{HourUs, TypedEvent}

/** Pins the live per-window top-k against the batch window-function
  * formulation on the same events (rank() over per-hour counts,
  * count desc / type asc, rank ≤ 3), fed through a MemoryStream in
  * event-time-scrambled chunks: watermark-driven CLOSE — not arrival
  * order — decides when a ranking finalizes, each closed hour's rows
  * emit exactly once, and open hours emit nothing (no provisional
  * ranking ever reshuffles).
  */
class StreamingTopKSpec extends SparkSpec {

  test("streaming top-3 rows equal the batch per-hour ranking on " +
      "sf0.001 events, exactly once, across scrambled triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ev = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_type"), expr("ts div 1000").as("ts_us"))
      .as[(String, Long)].collect()
      .map(e => TypedEvent(e._1, e._2))
    assert(ev.nonEmpty)

    val src = MemoryStream[TypedEvent]
    val q = StreamingTopK.report(src.toDS())
      .writeStream.format("memory").queryName("stopk_out")
      .outputMode("update").start()
    try {
      val sorted = ev.sortBy(_.tsUs)
      val chunks = sorted.grouped(math.max(1, sorted.length / 5 + 1))
        .map(_.reverse).toSeq
      chunks.foreach { c => src.addData(c.toSeq); q.processAllAvailable() }
      val flushTs = ev.map(_.tsUs).max + 5 * HourUs
      src.addData(TypedEvent("flush", flushTs))
      q.processAllAvailable()
      src.addData(TypedEvent("flush", flushTs + 5 * HourUs))
      q.processAllAvailable()

      val streamed = spark.table("stopk_out")
        .filter(col("eventType") =!= "flush")
        .select("hourBucket", "rank", "eventType", "nEvents")
        .as[(Long, Int, String, Long)].collect()

      val batch = ev.groupBy(e => (e.tsUs / HourUs, e.eventType))
        .view.mapValues(_.length.toLong).toSeq
        .map { case ((h, t), n) => (h, t, n) }
        .groupBy(_._1).toSeq.flatMap { case (h, rows) =>
          rows.sortBy { case (_, t, n) => (-n, t) }.take(3).zipWithIndex
            .map { case ((_, t, n), i) => (h, i + 1, t, n) }
        }.toSet

      assert(batch.size > 6, "degenerate fixture: need several hours")
      assert(streamed.toSet === batch,
        s"missing=${(batch -- streamed.toSet).take(3)} " +
          s"extra=${(streamed.toSet -- batch).take(3)}")
      assert(streamed.length === batch.size,
        s"rows re-emitted or dropped: ${streamed.length} vs ${batch.size}")
    } finally q.stop()
  }

  test("rankings emit only on close; in-horizon stragglers can " +
      "reorder the final top-k before emission but never after") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[TypedEvent]
    val q = StreamingTopK.report(src.toDS(), k = 2)
      .writeStream.format("memory").queryName("stopk_late")
      .outputMode("update").start()
    val h0 = 2000000L * HourUs
    try {
      // b leads 2-1 before the straggler arrives
      src.addData(TypedEvent("b", h0), TypedEvent("b", h0 + 1L),
        TypedEvent("a", h0 + 2L))
      q.processAllAvailable()
      assert(spark.table("stopk_late").count() === 0,
        "emitted a provisional ranking before close")
      // two a-stragglers inside the horizon flip the lead to a 3-2
      src.addData(TypedEvent("a", h0 + 3L), TypedEvent("a", h0 + 4L))
      q.processAllAvailable()
      src.addData(TypedEvent("c", h0 + 3 * HourUs))
      q.processAllAvailable()
      src.addData(TypedEvent("c", h0 + 6 * HourUs))
      q.processAllAvailable()
      val rows = spark.table("stopk_late")
        .filter(col("hourBucket") === 2000000L)
        .select("rank", "eventType", "nEvents")
        .as[(Int, String, Long)].collect().toSet
      assert(rows === Set((1, "a", 3L), (2, "b", 2L)),
        s"closed-hour ranking wrong: $rows")
    } finally q.stop()
  }
}
