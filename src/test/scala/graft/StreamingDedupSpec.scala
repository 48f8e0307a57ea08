package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingDedup

/** Pins [[StreamingDedup.exactWithinWatermark]]: duplicates inside the
  * watermark horizon are suppressed, state is EVICTED once the
  * watermark passes (bounded state — the 100 TB property), and a
  * post-eviction replay re-emits (the documented at-least-once
  * contract, absorbed by batch dedup at rest).
  */
class StreamingDedupSpec extends SparkSpec {

  test("within-horizon duplicates suppressed; post-eviction replay " +
      "re-emits (bounded state)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = StreamingDedup.exactWithinWatermark(
      input.toDS().toDF("ts", "text"),
      eventTime = col("ts"),
      fingerprint = md5(col("text")),
      horizon = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sd_out")
      .outputMode("append").start()
    def emitted(): Seq[String] =
      spark.table("sd_out").select("text").as[String].collect().toSeq
    try {
      val t0 = 1000000L
      // batch 1: A twice in one batch + once more shortly after → one A
      input.addData((t0, "A"), (t0, "A"), (t0 + 60, "A"))
      q.processAllAvailable()
      assert(emitted().count(_ == "A") === 1)

      // batch 2: within-horizon duplicate of A suppressed; B emits and
      // advances the watermark past A's state (t0+1200-600 > t0)
      input.addData((t0 + 300, "A"), (t0 + 1200, "B"))
      q.processAllAvailable()
      assert(emitted().sorted === Seq("A", "B"))

      // batch 3: A's state was evicted → the late replay re-emits; B
      // within horizon stays suppressed
      input.addData((t0 + 1300, "A"), (t0 + 1300, "B"))
      q.processAllAvailable()
      assert(emitted().count(_ == "A") === 2)
      assert(emitted().count(_ == "B") === 1)
    } finally q.stop()
  }
}
