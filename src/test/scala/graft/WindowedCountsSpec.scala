package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.WindowedCounts

class WindowedCountsSpec extends SparkSpec {

  test("tumbling windows close when the watermark passes (append mode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val out = WindowedCounts.perKey(df, "ts", col("event_type"),
      col("value"), "5 minutes", "10 minutes")
    val q = out.writeStream.format("memory").queryName("win")
      .outputMode("append").start()
    def t(min: Int) = Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    try {
      input.addData((t(0), "a", 1.0), (t(2), "a", 2.0), (t(3), "b", 5.0))
      q.processAllAvailable()
      // nothing emitted yet: watermark has not passed the first window
      assert(spark.table("win").count() === 0)
      // an event 30 min later advances the watermark past [10:00,10:05)
      input.addData((t(30), "a", 1.0))
      q.processAllAvailable()
      input.addData((t(59), "a", 1.0)) // push watermark again
      q.processAllAvailable()
      val rows = spark.table("win")
        .select(col("event_type"), col("n_events"), col("sum_value"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(rows.contains(("a", 2L, 3.0))) // [10:00,10:05) key a
      assert(rows.contains(("b", 1L, 5.0))) // [10:00,10:05) key b
    } finally q.stop()
  }
}
