package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.AsofJoin
import graft.streaming.StreamingAsof

/** Drives [[StreamingAsof.backward]] across two MemoryStreams with
  * watermarks and pins it against the BATCH as-of operator on ALL
  * finalized left rows — matched rows carry the same
  * at-or-before-inclusive, latest-wins, tolerance-bounded payload, and
  * UNMATCHED left rows surface with a null payload exactly like the
  * batch operator (the left-outer interval join parity added in round
  * 11; these are the unattributed-conversion rows an attribution
  * pipeline reports on). Finalized left events are emitted exactly
  * once. The temporal tier's flagship thus has a live-path contract,
  * not just a batch oracle. */
class StreamingAsofSpec extends SparkSpec {

  test("streaming as-of agrees with the batch operator on ALL left " +
      "rows, unmatched included, across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1000000L
    val clicks = MemoryStream[(Long, Long, String)] // (user, sec, tag)
    val purchases = MemoryStream[(Long, Long)]      // (user, sec)
    val c = clicks.toDS().toDF("c_user", "c_sec", "tag")
      .withColumn("c_ts", timestamp_seconds(col("c_sec")))
      .withWatermark("c_ts", "10 seconds")
    val p = purchases.toDS().toDF("p_user", "p_sec")
      .withColumn("p_ts", timestamp_seconds(col("p_sec")))
      .withWatermark("p_ts", "10 seconds")
    val out = StreamingAsof.backward(
      p, leftKey = "p_user", leftTime = "p_ts",
      right = c, rightKey = "c_user", rightTime = "c_ts",
      payload = Seq("tag"), tolerance = "20 seconds")
      .select(col("p_user"), col("p_sec"), col("tag"),
        unix_timestamp(col("matched_time")).as("m_sec"))
    val q = out.writeStream.format("memory").queryName("sasof_out")
      .outputMode("append").start()
    try {
      // clicks land FIRST, purchases in a later micro-batch: the join
      // buffers clicks in state across batches
      clicks.addData((1L, t0, "a"), (1L, t0 + 5, "b"), (2L, t0, "c"))
      q.processAllAvailable()
      purchases.addData(
        (1L, t0 + 7),   // latest at-or-before within 20s: "b" @ t0+5
        (2L, t0 + 30),  // only click is 30s old: outside tolerance
        (3L, t0 + 7))   // no click for this user at all
      q.processAllAvailable()
      // advance both watermarks past every event above so finalized
      // groups flush (two rounds: watermark updates at batch END)
      clicks.addData((9L, t0 + 200, "z")); purchases.addData((9L, t0 + 200))
      q.processAllAvailable()
      clicks.addData((9L, t0 + 300, "z2")); purchases.addData((9L, t0 + 300))
      q.processAllAvailable()

      val streamed = spark.table("sasof_out")
        .as[(Long, Long, Option[String], Option[Long])].collect().toSet

      // batch twin on the SAME events (purchase 9@t0+200 included —
      // its watermark passed; 9@t0+300 may still be open, so compare
      // only rows the stream finalized)
      val lb = Seq((1L, t0 + 7), (2L, t0 + 30), (3L, t0 + 7),
        (9L, t0 + 200), (9L, t0 + 300)).toDF("p_user", "p_sec")
      val rb = Seq((1L, t0, "a"), (1L, t0 + 5, "b"), (2L, t0, "c"),
        (9L, t0 + 200, "z"), (9L, t0 + 300, "z2"))
        .toDF("c_user", "c_sec", "tag")
      val batch = AsofJoin.backward(lb, rb,
          lb("p_user"), rb("c_user"), lb("p_sec"), rb("c_sec"),
          payload = Seq("tag" -> rb("tag")),
          matchedTimeCol = Some("m_sec"),
          tolerance = Some(lit(20L)))
        .select("p_user", "p_sec", "tag", "m_sec")
        .as[(Long, Long, Option[String], Option[Long])].collect().toSet

      // the known-finalized matches are present and correct
      assert(streamed.contains((1L, t0 + 7, Some("b"), Some(t0 + 5))),
        s"latest-at-or-before match missing: $streamed")
      assert(streamed.contains((9L, t0 + 200, Some("z"), Some(t0 + 200))),
        "inclusive at-time match missing")
      // unmatched left rows DO surface, with null payloads, matching
      // the batch operator (outside-tolerance and no-click users)
      assert(streamed.contains((2L, t0 + 30, None, None)),
        s"outside-tolerance row should emit with null payload: $streamed")
      assert(streamed.contains((3L, t0 + 7, None, None)),
        s"no-match row should emit with null payload: $streamed")
      // exactly-once per finalized left row
      val emitted = spark.table("sasof_out").collect()
      assert(emitted.length == streamed.size,
        s"duplicate emissions: ${emitted.length} rows, ${streamed.size} distinct")
      // and EVERY streamed row equals the batch operator's answer
      assert(streamed.subsetOf(batch),
        s"live path diverged from batch: ${streamed.diff(batch)}")
    } finally q.stop()
  }
}
