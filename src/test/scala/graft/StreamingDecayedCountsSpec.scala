package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingDecayedCounts
import graft.streaming.StreamingDecayedCounts.{DayUs, HorizonDays, TypedEvent}

/** Pins the live decayed-activity scores against the batch shift-decay
  * formula evaluated at every closed day, fed through a MemoryStream
  * in event-time-scrambled chunks: every emitted (day, type) row must
  * equal `Σ count·(10⁶ >> age)` over the retained horizon, rows for
  * all data days must emit exactly once, and nothing emits before a
  * day closes. */
class StreamingDecayedCountsSpec extends SparkSpec {

  /** The batch half's per-close-day formula. */
  private def formula(dayCounts: Map[Long, Long], d: Long): (Long, Long) = {
    val horizon = dayCounts.filter { case (day, _) =>
      day <= d && day >= d - HorizonDays }
    (horizon.values.sum,
      horizon.iterator.map { case (day, c) =>
        c * (1000000L >> (d - day).toInt) }.sum)
  }

  test("streaming decayed scores equal the batch shift-decay formula " +
      "at every closed day on sf0.001 events, exactly once, across " +
      "scrambled triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ev = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_type"), expr("ts div 1000").as("ts_us"))
      .as[(String, Long)].collect()
      .map(e => TypedEvent(e._1, e._2))
    assert(ev.nonEmpty)

    val src = MemoryStream[TypedEvent]
    val q = StreamingDecayedCounts.report(src.toDS())
      .writeStream.format("memory").queryName("sdecay_out")
      .outputMode("update").start()
    try {
      val sorted = ev.sortBy(_.tsUs)
      val chunks = sorted.grouped(math.max(1, sorted.length / 5 + 1))
        .map(_.reverse).toSeq
      chunks.foreach { c => src.addData(c.toSeq); q.processAllAvailable() }
      val flushTs = ev.map(_.tsUs).max + 5 * DayUs
      src.addData(TypedEvent("flush", flushTs))
      q.processAllAvailable()
      src.addData(TypedEvent("flush", flushTs + 5 * DayUs))
      q.processAllAvailable()

      val perTypeKeys = ev.map(_.eventType).distinct
      // restrict to fixture types rather than just excluding "flush":
      // whether the flush sentinels' own closed days emit depends on
      // Spark's shouldRunAnotherBatch scheduling (version-dependent);
      // the assertions below must only ever see types that perType can
      // answer for (r14 ADVICE)
      val streamed = spark.table("sdecay_out")
        .filter(col("eventType").isin(perTypeKeys: _*))
        .select("dayBucket", "eventType", "nEvents", "decayed1e6")
        .as[(Long, String, Long, Long)].collect()

      // exactly-once: no (day, type) appears twice
      val keys = streamed.map(r => (r._1, r._2))
      assert(keys.distinct.length === keys.length,
        "a (day, type) score re-emitted")

      val perType = ev.groupBy(_.eventType).view.mapValues(
        _.groupBy(_.tsUs / DayUs).view.mapValues(_.length.toLong).toMap)
        .toMap
      val maxDataDay = ev.map(_.tsUs / DayUs).max

      // CORRECTNESS: every emitted row matches the batch formula
      streamed.foreach { case (d, tpe, n, dec) =>
        val (en, edec) = formula(perType(tpe), d)
        assert((n, dec) === ((en, edec)),
          s"day $d type $tpe: got ($n,$dec) expected ($en,$edec)")
      }
      // COMPLETENESS through the data horizon: for each type, every
      // day from its first event to maxDataDay with a non-empty
      // horizon must have emitted (closure is watermark-driven and
      // the flushes push the watermark well past the data)
      perType.foreach { case (tpe, dayCounts) =>
        val have = streamed.collect { case (d, t, _, _) if t == tpe => d }
          .toSet
        (dayCounts.keys.min to maxDataDay).foreach { d =>
          assert(have.contains(d),
            s"type $tpe missing closed day $d (have ${have.toSeq.sorted})")
        }
      }
      // the panel keeps decaying after traffic stops: some type must
      // have emitted at least one post-data day with a shrunken score
      assert(streamed.exists(_._1 > maxDataDay),
        "no trailing decayed rows after traffic stopped")
    } finally q.stop()
  }

  test("scores emit only on close; an in-horizon straggler lands in " +
      "the day's final score, and trailing closes halve the score " +
      "per day (exact shift decay)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[TypedEvent]
    val q = StreamingDecayedCounts.report(src.toDS())
      .writeStream.format("memory").queryName("sdecay_late")
      .outputMode("update").start()
    val d0 = 20000L * DayUs
    try {
      src.addData(TypedEvent("a", d0), TypedEvent("a", d0 + 1L))
      q.processAllAvailable()
      assert(spark.table("sdecay_late").count() === 0,
        "emitted a provisional score before close")
      // straggler inside the watermark horizon joins day 20000
      src.addData(TypedEvent("a", d0 + 2L))
      q.processAllAvailable()
      // advance the watermark three days past the data
      src.addData(TypedEvent("z", d0 + 4 * DayUs))
      q.processAllAvailable()
      src.addData(TypedEvent("z", d0 + 8 * DayUs))
      q.processAllAvailable()
      val rows = spark.table("sdecay_late")
        .filter(col("eventType") === "a")
        .select("dayBucket", "nEvents", "decayed1e6")
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      // close day 20000: 3 events at weight 1e6; then exact halving
      val expected = Seq.tabulate(rows.length)(i =>
        (20000L + i, 3L, 3L * (1000000L >> i)))
      assert(rows.length >= 3, s"too few trailing closes: ${rows.toSeq}")
      assert(rows.toSeq === expected,
        s"decay ladder wrong: ${rows.toSeq} vs $expected")
    } finally q.stop()
  }
}
