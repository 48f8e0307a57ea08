package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters
import graft.streaming.StreamingHotKeys
import graft.streaming.StreamingHotKeys.{HourUs, KeyEvent}

/** Pins for the live hot-key candidate feed: fold-equivalence of the
  * streaming MG update to the batch summary (so the batch operator's
  * guarantee transfers), exact batch parity in the no-eviction
  * regime, the no-false-negative line under eviction pressure, and
  * the watermark-close/straggler discipline shared with
  * StreamingSkew. */
class StreamingHotKeysSpec extends SparkSpec {

  test("mgUpdate fold equals the batch mgSummary on the same stream " +
      "(the guarantee transfers verbatim to streaming state)") {
    val data = (0 until 5000).map { i =>
      if (i % 3 == 0) 1L else if (i % 7 == 1) 2L else (100 + i % 131).toLong
    }
    val folded = data.foldLeft(Map.empty[Long, Long])(
      (m, k) => HeavyHitters.mgUpdate(m, k, 32))
    val batch = HeavyHitters.mgSummary(data.iterator, 32).toMap
    assert(folded === batch)
    assert(folded.size <= 32)
  }

  test("with capacity above the bucket's key cardinality the candidate " +
      "feed equals the exact per-(hour, key) batch counts on sf0.001 " +
      "events, exactly once, across scrambled triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"))
      .as[(Long, Long)].collect()
      .map(e => KeyEvent(e._1, e._2))
    assert(ev.nonEmpty)
    val src = MemoryStream[KeyEvent]
    // capacity 4096 >> distinct users: no eviction, MG counts exact
    val q = StreamingHotKeys.candidates(src.toDS(), buckets = 4,
        capacity = 4096)
      .writeStream.format("memory").queryName("shot_out")
      .outputMode("update").start()
    try {
      val sorted = ev.sortBy(_.tsUs)
      val chunks = sorted.grouped(math.max(1, sorted.length / 5 + 1))
        .map(_.reverse).toSeq
      chunks.foreach { c => src.addData(c.toSeq); q.processAllAvailable() }
      val flushTs = ev.map(_.tsUs).max + 5 * HourUs
      src.addData(KeyEvent(-1L, flushTs)); q.processAllAvailable()
      src.addData(KeyEvent(-1L, flushTs + 5 * HourUs))
      q.processAllAvailable()

      val streamed = spark.table("shot_out")
        .filter(col("key") =!= -1L)
        .select("hourBucket", "key", "minCount")
        .as[(Long, Long, Long)].collect()
      val batch = ev.groupBy(e => (e.tsUs / HourUs, e.key))
        .map { case ((h, k), es) => (h, k, es.length.toLong) }.toSet
      assert(batch.size > 10, "degenerate fixture")
      assert(streamed.toSet === batch,
        s"missing=${(batch -- streamed.toSet).take(3)} " +
          s"extra=${(streamed.toSet -- batch).take(3)}")
      assert(streamed.length === batch.size,
        s"rows re-emitted or dropped: ${streamed.length} vs ${batch.size}")
    } finally q.stop()
  }

  test("under eviction pressure every key above the bucketTotal/capacity " +
      "line is emitted with a lower-bound count (no false negatives)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val h0 = 2000000L * HourUs
    // one bucket (buckets=1), capacity 8, 4000 events: heavy keys 1
    // and 2 (1/3 and 1/7 of traffic) among ~131 tail keys — the
    // sketch evicts constantly
    val data = (0 until 4000).map { i =>
      val k = if (i % 3 == 0) 1L else if (i % 7 == 1) 2L
        else (100 + i % 131).toLong
      KeyEvent(k, h0 + i.toLong)
    }
    val src = MemoryStream[KeyEvent]
    val q = StreamingHotKeys.candidates(src.toDS(), buckets = 1,
        capacity = 8)
      .writeStream.format("memory").queryName("shot_evict")
      .outputMode("update").start()
    try {
      src.addData(data); q.processAllAvailable()
      src.addData(KeyEvent(-1L, h0 + 5 * HourUs)); q.processAllAvailable()
      src.addData(KeyEvent(-1L, h0 + 10 * HourUs)); q.processAllAvailable()
      val rows = spark.table("shot_evict")
        .filter(col("hourBucket") === 2000000L)
        .select("key", "minCount", "bucketTotal")
        .as[(Long, Long, Long)].collect()
      val exact = data.groupBy(_.key).view.mapValues(_.size.toLong).toMap
      val total = data.size.toLong
      val byKey = rows.map(r => r._1 -> r._2).toMap
      assert(rows.forall(_._3 == total))
      assert(rows.length <= 8, s"state exceeded capacity: ${rows.length}")
      // the guarantee: keys above total/capacity survive with a
      // lower-bound count
      exact.filter(_._2 > total / 8).keys.foreach { k =>
        assert(byKey.contains(k), s"heavy key $k missing from feed")
        assert(byKey(k) <= exact(k), s"key $k overcounted")
      }
    } finally q.stop()
  }

  test("checkpoint restart: sketch state survives a simulated JVM " +
      "restart — post-restart events fold onto recovered counters and " +
      "the closed hour emits combined counts exactly once") {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyEvent]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-hotkeys-restart").toString
    StreamingHotKeysSpec.restartOut.clear()
    def startQuery() =
      StreamingHotKeys.candidates(input.toDS(), buckets = 1,
          capacity = 64)
        .writeStream
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[
              graft.streaming.StreamingHotKeys.HotKeyCandidate],
              _: Long) =>
            df.collect().foreach(c => StreamingHotKeysSpec.restartOut
              .add((c.hourBucket, c.key, c.minCount)))
        }
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()

    val h0 = 3000000L * HourUs
    val q1 = startQuery()
    try {
      // 30 occurrences of key 7 pre-restart; capacity 64 >> keys, so
      // counters are exact — the final count can only be 50 if these
      // 30 are RECOVERED from the checkpoint
      input.addData((0 until 30).map(i => KeyEvent(7L, h0 + i)))
      q1.processAllAvailable()
    } finally { q1.stop(); q1.awaitTermination() }

    val q2 = startQuery()
    try {
      input.addData((0 until 20).map(i => KeyEvent(7L, h0 + 100 + i)))
      q2.processAllAvailable()
      // close the hour (two flushes: advance watermark, then fire the
      // event-time timeout for the closed group)
      input.addData(KeyEvent(-1L, h0 + 5 * HourUs))
      q2.processAllAvailable()
      input.addData(KeyEvent(-1L, h0 + 10 * HourUs))
      q2.processAllAvailable()
      val rows = StreamingHotKeysSpec.restartOut.asScala.toSeq
        .filter(r => r._1 == 3000000L && r._2 == 7L)
      assert(rows === Seq((3000000L, 7L, 50L)),
        s"state not recovered or re-emitted: $rows")
    } finally q2.stop()
  }
}

object StreamingHotKeysSpec {
  val restartOut = new java.util.concurrent.ConcurrentLinkedQueue[
    (Long, Long, Long)]()
}
