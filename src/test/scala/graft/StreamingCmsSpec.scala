package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Sketches
import graft.streaming.StreamingCms
import graft.streaming.StreamingCms.{CellCount, KeyedEvent}

/** Pins [[StreamingCms]]: the compiled cell derivation equals the
  * batch sketch's SQL derivation value-for-value, a closed hour's
  * streamed cell table equals the batch `cmsCells` of the same data
  * (scrambled arrival — cell increments are commutative), emission is
  * exactly-once at watermark close with nothing provisional before,
  * and the state honours the d×w bound that makes the operator safe
  * under unbounded key cardinality. */
class StreamingCmsSpec extends SparkSpec {

  private def corpusKeys: Seq[String] =
    (1 to 2000).map(i => s"url-${i % 97}-${(i * 7919) % 31}")

  test("compiled cell() equals Sketches.cmsCell's SQL derivation " +
      "for every (row, key) pair (same md5 text, same 60-bit slice, " +
      "same modulus)") {
    import spark.implicits._
    val df = corpusKeys.distinct.toDF("key")
      .select(col("key"), explode(sequence(lit(0), lit(2))).as("r"))
    val sql = df
      .withColumn("c", Sketches.cmsCell(col("r"), col("key"), 256))
      .collect()
      .map(x => (x.getAs[String]("key"), x.getAs[Int]("r")) ->
        x.getAs[Long]("c")).toMap
    sql.keys.foreach { case (key, r) =>
      assert(StreamingCms.cell(r, key, 256) === sql((key, r)),
        s"cell diverged for r=$r key='$key'")
    }
  }

  test("a closed hour's streamed cell table equals the batch CMS of " +
      "the same keys (scrambled batches), emits exactly once at " +
      "watermark close, and never exceeds d*w cells") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = StreamingCms.HourUs * 700
    val keys = corpusKeys
    val (a, rest) = keys.splitAt(700)
    val (b, c) = rest.splitAt(700)
    val input = MemoryStream[KeyedEvent]
    val out = StreamingCms.cells(input.toDS(), maxDelay = "1 second")
    val q = out.writeStream.format("memory").queryName("scms_out")
      .outputMode("update").start()
    def events(): Seq[CellCount] =
      spark.table("scms_out").as[CellCount].collect().toSeq
    try {
      input.addData(b.map(k => KeyedEvent(k, t0 + 1000)): _*)
      q.processAllAvailable()
      input.addData((c ++ b.take(200)).map(k =>
        KeyedEvent(k, t0 + 2000)): _*)
      q.processAllAvailable()
      input.addData((a ++ c.take(100)).map(k =>
        KeyedEvent(k, t0 + 3000)): _*)
      q.processAllAvailable()
      assert(events().isEmpty, "open hour emitted a provisional row")

      input.addData(KeyedEvent("flush-1",
        t0 + StreamingCms.HourUs + 2000000))
      q.processAllAvailable()
      input.addData(KeyedEvent("flush-2",
        t0 + StreamingCms.HourUs + 3000000))
      q.processAllAvailable()
      val closed = events()
      assert(closed.nonEmpty && closed.forall(_.hourBucket === 700L),
        s"expected exactly one closed hour: $closed")
      assert(closed.size <= StreamingCms.D * StreamingCms.W,
        "emitted cell table outgrew the d*w state bound")
      assert(closed.map(cc => (cc.r, cc.c)).distinct.size ===
        closed.size, "duplicate cell rows — hour closed twice?")

      // batch parity on identical keys (duplicates and all)
      val streamed = closed.map(cc => (cc.r, cc.c.toInt) -> cc.cnt)
        .toMap
      val batch = Sketches.cmsCells(
          (b ++ c ++ b.take(200) ++ a ++ c.take(100)).toDF("key"),
          col("key"), StreamingCms.D, StreamingCms.W)
        .collect()
        .map(x => (x.getAs[Int]("r"), x.getAs[Long]("c").toInt) ->
          x.getAs[Long]("cnt")).toMap
      assert(streamed === batch,
        "streamed cell table diverged from batch cmsCells")
    } finally q.stop()
  }
}
