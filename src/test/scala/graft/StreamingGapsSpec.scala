package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingGaps
import graft.streaming.StreamingGaps.{GapRow, ShardEvent}

/** Pins the streaming gap detector against the batch formulation on
  * the same events: every (prev, next, gap) pair at-or-above the floor
  * emitted by the live path must equal the batch lag-window's set on
  * the sf0.001 events table — fed through a MemoryStream in chunks
  * whose arrival order SCRAMBLES event time across triggers, so the
  * buffered-fold discipline (not arrival order) is what's pinned.
  */
class StreamingGapsSpec extends SparkSpec {

  private val HourUs = 3600000000L

  test("streaming gaps equal the batch lag-window set on sf0.001 " +
      "events across event-time-scrambled triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val minGap = 3 * HourUs
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select(concat(lit("S|"), pmod(col("user_id"), lit(4))).as("shard"),
        col("event_id"), expr("ts div 1000").as("ts_us"))
      .as[(String, Long, Long)].collect()
      .map(e => ShardEvent(e._1, e._2, e._3))
    assert(ev.nonEmpty)

    val src = MemoryStream[ShardEvent]
    val q = StreamingGaps.gaps(src.toDS(), minGapUs = minGap)
      .writeStream.format("memory").queryName("sgaps_out")
      .outputMode("update").start()
    try {
      // interleave: chunk by event_id % 3 so each trigger carries a
      // slice spanning the WHOLE time range — event-time order across
      // triggers is maximally scrambled, inside the 1h-watermark? No:
      // the watermark advances to max-seen per trigger, so slices 2
      // and 3 arrive mostly BEHIND it. To keep every event inside the
      // horizon, feed chunks of the time-sorted stream but rotate
      // WITHIN each chunk (local scramble, bounded by the chunk span).
      val sorted = ev.sortBy(e => (e.tsUs, e.eventId))
      val chunks = sorted.grouped(math.max(1, sorted.length / 5 + 1))
        .map(c => c.reverse).toSeq // reversed: arrival ≠ event order
      chunks.foreach { c => src.addData(c.toSeq); q.processAllAvailable() }
      // flush: advance the watermark far past every buffered event
      val flushTs = ev.map(_.tsUs).max + 10 * minGap
      src.addData(ShardEvent("S|flush", 1L, flushTs))
      q.processAllAvailable()
      src.addData(ShardEvent("S|flush", 2L, flushTs + minGap))
      q.processAllAvailable()

      val streamed = spark.table("sgaps_out")
        .filter(col("shardId") =!= "S|flush")
        .select("shardId", "prevId", "eventId", "gapUs")
        .as[(String, Long, Long, Long)].collect().toSet

      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("shard").orderBy("ts_us", "event_id")
      val batch = ev.toSeq.toDF("shard", "event_id", "ts_us")
        .withColumn("prev_id", lag("event_id", 1).over(w))
        .withColumn("gap_us", col("ts_us") - lag("ts_us", 1).over(w))
        .filter(col("gap_us") >= minGap)
        .select(col("shard"), col("prev_id"), col("event_id"),
          col("gap_us"))
        .as[(String, Long, Long, Long)].collect().toSet

      assert(batch.nonEmpty, "degenerate fixture: no gaps at the floor")
      assert(batch.size < ev.length, "degenerate floor: every gap fires")
      assert(streamed === batch,
        s"missing=${(batch -- streamed).take(3)} " +
          s"extra=${(streamed -- batch).take(3)}")
      // each gap must be emitted exactly once across all triggers
      val emitted = spark.table("sgaps_out")
        .filter(col("shardId") =!= "S|flush").count()
      assert(emitted === batch.size.toLong,
        s"gaps re-emitted or dropped: $emitted vs ${batch.size}")
    } finally q.stop()
  }

  test("a straggler inside the watermark horizon lands in its correct " +
      "event-time position (gap SPLITS instead of duplicating)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[ShardEvent]
    val q = StreamingGaps.gaps(src.toDS(), minGapUs = 10L,
        maxDelay = "1 hour")
      .writeStream.format("memory").queryName("sgaps_ooo")
      .outputMode("update").start()
    val t0 = 5000000000000L
    try {
      // trigger 1: events at t0 and t0+100 (gap 100 — but NOT yet
      // finalized: watermark sits at t0+100 minus 1h, so nothing emits)
      src.addData(ShardEvent("s", 1L, t0), ShardEvent("s", 3L, t0 + 100L))
      q.processAllAvailable()
      // trigger 2: straggler BETWEEN them, within the horizon
      src.addData(ShardEvent("s", 2L, t0 + 40L))
      q.processAllAvailable()
      // flush the watermark far past
      src.addData(ShardEvent("s", 9L, t0 + HourUs * 3))
      q.processAllAvailable()
      src.addData(ShardEvent("s", 10L, t0 + HourUs * 6))
      q.processAllAvailable()

      val rows = spark.table("sgaps_ooo")
        .select("prevId", "eventId", "gapUs")
        .as[(Long, Long, Long)].collect().toSet
      // the straggler SPLIT the 100-gap: 1→2 (40) and 2→3 (60); the
      // un-split 1→3 (100) must never have been emitted
      assert(rows.contains((1L, 2L, 40L)), s"missing split head: $rows")
      assert(rows.contains((2L, 3L, 60L)), s"missing split tail: $rows")
      assert(!rows.exists(r => r._1 == 1L && r._2 == 3L),
        s"un-split gap emitted despite in-horizon straggler: $rows")
    } finally q.stop()
  }
}
