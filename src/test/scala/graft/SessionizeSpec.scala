package graft

import org.apache.spark.sql.functions._

/** Pins the gap-boundary semantics the `sessionize` query (and its
  * relational oracle) rely on: Spark's `session_window` merge is
  * INCLUSIVE — an event arriving exactly `gap` after the previous one
  * (i.e. exactly at the open session's end) still merges; only a gap
  * STRICTLY greater splits. The oracle's break rule must therefore be
  * `diff > gap`, not `>=`, or the two would drift on boundary-timed
  * events (empirically pinned here; random micro-timestamped data
  * never hits the boundary, so only this spec guards it). */
class SessionizeSpec extends SparkSpec {

  test("session_window merges at exactly the gap and splits just past") {
    import spark.implicits._
    val gapUs = 10L * 1000000 // 10s
    val rows = Seq(
      (1L, 0L),              // session head
      (1L, gapUs - 1),       // strictly inside → merges
      (1L, 2 * gapUs - 1),   // EXACTLY at the open session's end
                             // (gap after the previous event) → merges
      (2L, 0L),              // other user
      (2L, gapUs + 1))       // strictly past the gap → splits
      .toDF("user_id", "t_us")
    val out = rows
      .groupBy(col("user_id"),
        session_window(timestamp_micros(col("t_us")), "10 seconds").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), unix_micros(col("w.start")).as("s"),
        unix_micros(col("w.end")).as("e"), col("n"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out === Set(
      (1L, 0L, 3 * gapUs - 1, 3L),                 // fully merged chain
      (2L, 0L, gapUs, 1L),                         // split pair, part 1
      (2L, gapUs + 1, 2 * gapUs + 1, 1L)))         // split pair, part 2
  }
}
