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
    try {
      // three event-time-ordered chunks → state must carry across
      val chunks = ev.grouped(math.max(1, ev.length / 3 + 1)).toSeq
      chunks.foreach { c => src.addData(c.toSeq); q.processAllAvailable() }

      val streamed = spark.table("sfunnel_out")
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
    val q1 = startQuery()
    try {
      input.addData(FunnelEvent(1L, t0, "signup"),
        FunnelEvent(1L, t0 + 10, "click"))
      q1.processAllAvailable()
    } finally { q1.stop(); q1.awaitTermination() }

    // cold restart: only checkpointed state survives. The purchase
    // lands within 24h of the recovered click time — it can only
    // reach 3_purchase if (s, c) were RECOVERED; a fresh query would
    // see a bare purchase and stay at 0_none.
    val q2 = startQuery()
    try {
      input.addData(FunnelEvent(1L, t0 + 20, "purchase"))
      q2.processAllAvailable()
      val last = StreamingFunnelSpec.restartOut.asScala.toSeq
        .filter(_._1 == 1L).maxBy(_._2)
      assert(last._3 === "3_purchase",
        s"state not recovered: ${StreamingFunnelSpec.restartOut.asScala.toSeq}")
    } finally q2.stop()
  }
}
