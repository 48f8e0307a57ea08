package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingFunnel
import graft.streaming.StreamingFunnel.{FunnelEvent, FunnelProgress}

/** Pins the streaming funnel's 3-long state machine against the BATCH
  * funnel windows on the same events: latest-wins per-user stages from
  * the live path must equal the batch `funnel_stages` per-user stages
  * on the sf0.001 events table, fed through a MemoryStream in
  * event-time-ordered micro-batches. Plus transition unit cases for
  * the deadline edges the dataset may not hit.
  */
object StreamingFunnelSpec {
  /** foreachBatch target for the restart case — static so the closure
    * stays serializable and both query incarnations append here. */
  val restartOut = new java.util.concurrent.ConcurrentLinkedQueue[
    (Long, Long, String)]()
}

class StreamingFunnelSpec extends SparkSpec {
  import StreamingFunnel.DayUs

  private val Unset = Long.MaxValue
  private def st(s: Long = Unset, c: Long = Unset, p: Long = Unset) =
    FunnelProgress(0L, s, c, p)
  private def step(q: FunnelProgress, ts: Long, t: String) =
    StreamingFunnel.step(q, ts, t)

  test("transition edges: deadlines inclusive, pre-signup clicks and " +
      "pre-click purchases never qualify, mins keep the earliest") {
    // click exactly AT the 24h deadline qualifies (batch `<=`)
    assert(step(st(s = 100L), 100L + DayUs, "click").c === 100L + DayUs)
    // one microsecond past does not
    assert(step(st(s = 100L), 100L + DayUs + 1, "click").c === Unset)
    // click with no signup yet: batch window sees null s_ts
    assert(step(st(), 50L, "click").c === Unset)
    // purchase gated on the CLICK time, not signup
    assert(step(st(s = 1L, c = 200L), 200L + DayUs, "purchase").p ===
      200L + DayUs)
    assert(step(st(s = 1L, c = 200L), 200L + DayUs + 1, "purchase").p ===
      Unset)
    // a second, earlier-in-window signup lowers the floor
    assert(step(st(s = 500L), 300L, "signup").s === 300L)
  }

  test("streaming stages equal batch funnel_stages per-user on sf0.001 " +
      "events across ordered micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ev = graft.sources.Tables.events(spark, sf0001)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_type"))
      .as[(Long, Long, String)].collect()
      .map(e => FunnelEvent(e._1, e._2, e._3)).sortBy(_.tsUs)
    assert(ev.nonEmpty)

    val src = MemoryStream[FunnelEvent]
    val q = StreamingFunnel.stages(src.toDS())
      .writeStream.format("memory").queryName("sfunnel_out")
      .outputMode("update").start()
    val flushUser = 999999999L
    try {
      // three event-time-ordered chunks → state must carry across
      val chunks = ev.grouped(math.max(1, ev.length / 3 + 1)).toSeq
      chunks.foreach { c => src.addData(c.toSeq); q.processAllAvailable() }
      // watermark-buffered events finalize only once the watermark
      // passes them: advance it far past every real event (two rounds —
      // the watermark updates at batch END, timeouts fire after)
      val flushTs = ev.map(_.tsUs).max + 3 * DayUs
      src.addData(FunnelEvent(flushUser, flushTs, "signup"))
      q.processAllAvailable()
      src.addData(FunnelEvent(flushUser, flushTs + DayUs, "signup"))
      q.processAllAvailable()

      val streamed = spark.table("sfunnel_out")
        .filter(col("userId") =!= flushUser)
        .groupBy("userId")
        .agg(max_by(col("stage"), col("gen")).as("stage"))
        .as[(Long, String)].collect().toMap

      // batch twin: the funnel_stages windows, kept at per-user grain
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val e = ev.toSeq.toDF("user_id", "ts_us", "event_type")
      val batch = e
        .withColumn("s_ts",
          min(when(col("event_type") === "signup", col("ts_us"))).over(w))
        .withColumn("c_ts", min(when(col("event_type") === "click" &&
          col("ts_us") <= col("s_ts") + DayUs, col("ts_us"))).over(w))
        .withColumn("p_ts", min(when(col("event_type") === "purchase" &&
          col("ts_us") <= col("c_ts") + DayUs, col("ts_us"))).over(w))
        .groupBy("user_id")
        .agg(min("s_ts").as("s"), min("c_ts").as("c"), min("p_ts").as("p"))
        .select(col("user_id"),
          when(col("p").isNotNull, "3_purchase")
            .when(col("c").isNotNull, "2_click")
            .when(col("s").isNotNull, "1_signup")
            .otherwise("0_none").as("stage"))
        .as[(Long, String)].collect().toMap

      assert(streamed.keySet === batch.keySet)
      val diffs = batch.collect {
        case (u, stg) if streamed(u) != stg => (u, stg, streamed(u))
      }
      assert(diffs.isEmpty, s"stage mismatches (user, batch, stream): " +
        s"${diffs.take(5)}")
      // the fixture exercises more than one funnel stage
      assert(batch.values.toSet.size > 1, "degenerate fixture")
    } finally q.stop()
  }

  test("cross-trigger OUT-OF-ORDER events fold in event-time order: a " +
      "click arriving before its signup still qualifies (matches the " +
      "batch windows)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 5000000L
    val src = MemoryStream[FunnelEvent]
    val q = StreamingFunnel.stages(src.toDS())
      .writeStream.format("memory").queryName("sfunnel_ooo")
      .outputMode("update").start()
    try {
      // arrival order scrambles the event-time order ACROSS triggers:
      // click first, its signup one trigger LATER with an older ts,
      // purchase last. The pre-round-11 fold (apply-at-arrival) left
      // this user at 1_signup forever — the click had already been
      // rejected for lack of a signup when it arrived.
      src.addData(FunnelEvent(1L, t0 + 10, "click"))
      q.processAllAvailable()
      src.addData(FunnelEvent(1L, t0, "signup"))
      q.processAllAvailable()
      src.addData(FunnelEvent(1L, t0 + 20, "purchase"))
      q.processAllAvailable()
      // advance the watermark far past the events, twice (update at
      // batch end; event-time timeouts fire after)
      src.addData(FunnelEvent(99L, t0 + 3 * DayUs, "signup"))
      q.processAllAvailable()
      src.addData(FunnelEvent(99L, t0 + 4 * DayUs, "signup"))
      q.processAllAvailable()
      val last = spark.table("sfunnel_ooo")
        .filter(col("userId") === 1L)
        .groupBy("userId")
        .agg(max_by(col("stage"), col("gen")).as("stage"))
        .as[(Long, String)].collect().toMap
      assert(last(1L) === "3_purchase",
        s"out-of-order fold diverged from batch: $last")
    } finally q.stop()
  }

  test("checkpoint restart: funnel state survives a simulated JVM " +
      "restart — a post-restart purchase completes the pre-restart " +
      "signup+click") {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-funnel-restart").toString
    StreamingFunnelSpec.restartOut.clear()
    def startQuery() =
      StreamingFunnel.stages(input.toDS())
        .writeStream
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[StreamingFunnel.UserStage],
              _: Long) =>
            df.collect().foreach(u => StreamingFunnelSpec.restartOut
              .add((u.userId, u.gen, u.stage)))
        }
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()

    val t0 = 5000000L
    val HourUs = 3600000000L
    val q1 = startQuery()
    try {
      input.addData(FunnelEvent(1L, t0, "signup"),
        FunnelEvent(1L, t0 + 10, "click"))
      q1.processAllAvailable()
      // advance the watermark just past user 1's events (flush ts −
      // 1h default delay = t0 + 10ms) so they FOLD into the 3-long
      // state pre-restart — this pins recovery of the folded longs,
      // not just the buffer
      input.addData(FunnelEvent(99L, t0 + HourUs + 10000L, "signup"))
      q1.processAllAvailable()
    } finally { q1.stop(); q1.awaitTermination() }

    // cold restart: only checkpointed state survives. The purchase
    // lands within 24h of the recovered click time — it can only
    // reach 3_purchase if (s, c) were RECOVERED; a fresh query would
    // see a bare purchase and stay at 0_none. Its event time sits
    // ABOVE the recovered watermark (t0 + 10ms), so it is not late;
    // the second flush advances the watermark past it to finalize.
    val q2 = startQuery()
    try {
      input.addData(FunnelEvent(1L, t0 + 20000L, "purchase"))
      q2.processAllAvailable()
      input.addData(FunnelEvent(99L, t0 + 3 * HourUs, "signup"))
      q2.processAllAvailable()
      val last = StreamingFunnelSpec.restartOut.asScala.toSeq
        .filter(_._1 == 1L).maxBy(_._2)
      assert(last._3 === "3_purchase",
        s"state not recovered: ${StreamingFunnelSpec.restartOut.asScala.toSeq}")
    } finally q2.stop()
  }
}
