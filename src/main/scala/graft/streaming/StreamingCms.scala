package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live per-window frequency sketching — the streaming sibling of
  * [[graft.operators.Sketches]]' Count-Min sketch, pairing with
  * [[StreamingDistinct]] exactly as the batch CMS pairs with the
  * batch HLL: "about how often was each key seen this hour", where
  * exact per-key streaming counts need state proportional to the
  * live key set and a hot-key stream (crawler URLs, user ids, search
  * terms) can make that set unbounded. The sketch holds d×w = 768
  * exact long counters per open hour whatever the traffic, and the
  * cells are the SAME md5-deterministic cells as the batch sketch
  * ([[graft.operators.Sketches.cmsCells]]), computed here in compiled
  * JVM code ([[StreamingCms.cell]]) and spec-pinned equal to the SQL
  * derivation on identical input.
  *
  * Emission discipline is [[StreamingDistinct]]'s: cell increments
  * are commutative, so arrival order inside the watermark horizon is
  * irrelevant; a closed hour (watermark past hour end) emits its
  * FULL cell table exactly once — sketch STATE, not estimates, so
  * downstream can merge hours by cell-wise addition (the batch merge
  * law, spec-pinned there) or point-query any key after the fact —
  * and drops its state. Open hours emit nothing.
  */
object StreamingCms {

  /** A sighting of `key` at event time `tsUs` (epoch µs). */
  case class KeyedEvent(key: String, tsUs: Long)

  private[streaming] case class TimedKey(key: String, tsUs: Long,
      eventTime: java.sql.Timestamp, hourBucket: Long)

  /** One closed hour's sketch: one row per touched (r, c) cell. */
  case class CellCount(hourBucket: Long, r: Int, c: Long, cnt: Long)

  private[streaming] case class CmsState(cells: Map[String, Long])

  val HourUs: Long = 3600000000L

  /** d=3 × w=256 — cms_bigram_report's shape, so streamed hours are
    * merge- and probe-compatible with batch sketches at these dims. */
  val D: Int = 3
  val W: Int = 256

  /** EXACTLY the cell derivation of Sketches.cmsCell (md5 of
    * "r:cms:key" → first 15 hex = 60 bits → mod w), in compiled form
    * for the per-row hot path. */
  private[graft] def cell(r: Int, key: String, w: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$r:cms:$key"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars = first 7 bytes + the high nibble of byte 8
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (md(i) & 0xffL); i += 1 }
    h = (h << 4) | ((md(7) & 0xf0L) >> 4)
    h % w
  }

  def cells(events: Dataset[KeyedEvent],
      maxDelay: String = "1 hour"): Dataset[CellCount] = {
    implicit val timedEnc = Encoders.product[TimedKey]
    implicit val stateEnc = Encoders.product[CmsState]
    implicit val outEnc = Encoders.product[CellCount]
    events.toDF()
      .withColumn("eventTime", timestamp_micros(col("tsUs")))
      .withWatermark("eventTime", maxDelay)
      .withColumn("hourBucket", expr(s"tsUs div $HourUs"))
      .as[TimedKey]
      .groupByKey(_.hourBucket)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout) {
        (hour: Long, it: Iterator[TimedKey],
            state: GroupState[CmsState]) =>
          val prior = state.getOption.getOrElse(CmsState(Map.empty))
          val cellsNow = it.foldLeft(prior.cells) { (m, e) =>
            (0 until D).foldLeft(m) { (m2, r) =>
              val k = s"$r:${cell(r, e.key, W)}"
              m2.updated(k, m2.getOrElse(k, 0L) + 1L)
            }
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val hourEndUs = (hour + 1L) * HourUs
          if (wmUs >= hourEndUs) {
            state.remove()
            // deterministic emission order: (r, c) ascending
            cellsNow.toSeq.map { case (k, cnt) =>
              val Array(r, c) = k.split(":")
              CellCount(hour, r.toInt, c.toLong, cnt)
            }.sortBy(cc => (cc.r, cc.c)).iterator
          } else {
            state.update(CmsState(cellsNow))
            state.setTimeoutTimestamp(hourEndUs / 1000L)
            Iterator.empty
          }
      }
  }
}
