package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming half of the `rate_anomalies` traffic diagnostic: per
  * event type, each hour's volume scored LIVE against the moments of
  * the hours that closed BEFORE it — the pager alert, where the batch
  * query is the postmortem. The two necessarily differ in reference
  * population: the batch z-score uses the full distribution (it has
  * hindsight); the live score at hour close can only use history,
  * which is exactly what an on-call wants ("is this hour abnormal vs
  * what we'd seen when it happened?").
  *
  * Group key is the event type; state is three integer moments over
  * closed hours (h = hours, s = Σn, q = Σn²) plus the open-hour
  * counts inside the watermark horizon. Hours close in EVENT-TIME
  * ORDER (all open hours ≤ watermark, ascending) regardless of
  * arrival interleaving, so the "prior moments" each hour is scored
  * against are reproducible — the spec pins them against a
  * sequential fold. The z computation mirrors the batch query's
  * integer-exact discipline: moments stay in longs, the zero-variance
  * and thin-history (h < 3) cases are caught in exact integers, and
  * the double expression is evaluated once per closed hour in the
  * same IEEE shape as `zScore1e6Sql`.
  *
  * Emission is exactly once per (type, hour): a row emits only when
  * the watermark passes the hour end, at which point the late-data
  * filter (strictly-below-watermark drop) can no longer admit any
  * event of that hour. State is moments + horizon-bounded open
  * hours — independent of event volume.
  */
object StreamingAnomalies {

  case class RateEvent(eventType: String, tsUs: Long)

  private[streaming] case class TimedRateEvent(eventType: String,
      tsUs: Long, eventTime: java.sql.Timestamp, hourBucket: Long)

  /** One closed hour: its count, how many prior hours informed the
    * score (0 while history is thinner than 3 hours — z reads 0
    * there, mirroring the batch query's integer guards). */
  case class RateRow(eventType: String, hourBucket: Long, nEvents: Long,
      nPrior: Long, z1e6: Long)

  /** Checkpointed per-type state: closed-hour moments + open counts.
    * Product-encoded (schema-ful state, see StreamingGaps). */
  private[streaming] case class RateState(h: Long, s: Long, q: Long,
      open: Map[Long, Long])

  val HourUs: Long = 3600000000L

  /** floor(1e6·z) of count n against prior moments (h, s, q) — the
    * same IEEE tree as the batch `zScore1e6Sql`, with the
    * zero-variance case caught exactly in integers. Requires h ≥ 1. */
  private[graft] def z1e6(n: Long, h: Long, s: Long, q: Long): Long =
    if (h * q == s * s) 0L
    else math.floor(1e6 * ((n.toDouble - s.toDouble / h) /
      math.sqrt((q.toDouble - (s.toDouble * s) / h) / h))).toLong

  def report(events: Dataset[RateEvent],
      maxDelay: String = "1 hour"): Dataset[RateRow] = {
    implicit val timedEnc = Encoders.product[TimedRateEvent]
    implicit val stateEnc = Encoders.product[RateState]
    implicit val outEnc = Encoders.product[RateRow]
    events.toDF()
      .withColumn("eventTime", timestamp_micros(col("tsUs")))
      .withWatermark("eventTime", maxDelay)
      .withColumn("hourBucket", expr(s"tsUs div $HourUs"))
      .as[TimedRateEvent]
      .groupByKey(_.eventType)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout) {
        (typ: String, it: Iterator[TimedRateEvent],
            state: GroupState[RateState]) =>
          val prior = state.getOption.getOrElse(RateState(0L, 0L, 0L,
            Map.empty))
          val open = it.foldLeft(prior.open)((m, e) =>
            m.updated(e.hourBucket, m.getOrElse(e.hourBucket, 0L) + 1L))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // close every open hour whose end the watermark has passed,
          // oldest first — each is scored against the moments of the
          // hours closed before it, then folded into them
          val (closed, stillOpen) =
            open.partition { case (hour, _) => (hour + 1L) * HourUs <= wmUs }
          var (h, s, q) = (prior.h, prior.s, prior.q)
          val rows = closed.toSeq.sortBy(_._1).map { case (hour, n) =>
            val row =
              if (h >= 3L) RateRow(typ, hour, n, h, z1e6(n, h, s, q))
              else RateRow(typ, hour, n, 0L, 0L)
            h += 1L; s += n; q += n * n
            row
          }
          if (stillOpen.isEmpty && rows.isEmpty && h == 0L) {
            // nothing buffered and nothing ever closed: drop the
            // empty group rather than checkpointing it forever
            state.remove()
          } else {
            state.update(RateState(h, s, q, stillOpen))
            if (stillOpen.nonEmpty) {
              // wake exactly when the oldest open hour can close;
              // strictly above the current watermark by construction
              val nextEndUs = (stillOpen.keys.min + 1L) * HourUs
              state.setTimeoutTimestamp(nextEndUs / 1000L)
            }
          }
          rows.iterator
      }
  }
}
