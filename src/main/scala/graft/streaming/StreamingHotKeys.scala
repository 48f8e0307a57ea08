package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.{col, expr, pmod, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming half of the `hot_keys` heavy-hitter report: LIVE hot-key
  * CANDIDATES per hour, with state bounded at any key cardinality —
  * the alert feed an on-call watches while the batch two-pass
  * (operators.HeavyHitters.hotKeys) confirms exact counts offline.
  *
  * Why candidates and not exact counts: exact per-key streaming
  * counts need state proportional to the number of distinct keys in
  * the lateness horizon — unbounded for high-cardinality partition
  * keys (the exact regime heavy hitters exist for). Instead each
  * group keeps a Misra-Gries summary of fixed `capacity`, so state is
  * (open hours × `buckets` salt groups) × (capacity counters + one
  * total) — independent of both event volume and key cardinality.
  *
  * Grouping is (hour, key-salt bucket): a key hashes to exactly ONE
  * bucket, so its in-bucket frequency IS its hour frequency, and the
  * per-bucket MG undercount bound (bucketTotal / capacity) applies to
  * the key's true hour count. Every key with hour frequency above
  * that bound survives its bucket's sketch (same argument as the
  * batch operator — HeavyHittersSpec pins fold-equivalence of the
  * streaming update to the batch summary), so the candidate feed has
  * NO false negatives above the bound; emitted `minCount` is the MG
  * lower bound, and `bucketTotal` lets the consumer compute the bound
  * itself. False positives are possible (that is what the exact
  * recount is for) — the feed is the trigger, not the verdict.
  *
  * Emission is exactly once per (hour, bucket), on hour close — the
  * same watermark-close discipline as [[StreamingSkew]]: counts are
  * commutative so stragglers inside the horizon just fold in,
  * regardless of arrival order, and the close fires when the
  * watermark passes the hour end (after which the late-data filter
  * admits no event of that hour).
  */
object StreamingHotKeys {

  case class KeyEvent(key: Long, tsUs: Long)

  private[streaming] case class TimedKeyEvent(key: Long, tsUs: Long,
      eventTime: java.sql.Timestamp, hourBucket: Long, salt: Long)

  /** One candidate hot key: `minCount` is the Misra-Gries lower bound
    * on the key's count in `hourBucket`; the true count is within
    * `bucketTotal / capacity` above it. */
  case class HotKeyCandidate(hourBucket: Long, key: Long,
      minCount: Long, bucketTotal: Long)

  /** Checkpointed per-(open hour, salt bucket) state: the MG counter
    * map (≤ capacity entries by construction) and the bucket's event
    * total (the quantity the undercount bound is stated in).
    * Product-encoded — schema-ful, evolvable state. */
  private[streaming] case class HotKeyState(counts: Map[Long, Long],
      total: Long)

  val HourUs: Long = StreamingSkew.HourUs

  /** @param buckets   salt-bucket fan-out (state parallelism knob;
    *   groups per open hour)
    * @param capacity  MG counters per bucket — the no-false-negative
    *   line sits at bucketTotal/capacity occurrences
    * @param maxDelay  watermark delay (straggler horizon) */
  def candidates(events: Dataset[KeyEvent], buckets: Int = 16,
      capacity: Int = 256,
      maxDelay: String = "1 hour"): Dataset[HotKeyCandidate] = {
    implicit val timedEnc = Encoders.product[TimedKeyEvent]
    implicit val stateEnc = Encoders.product[HotKeyState]
    implicit val outEnc = Encoders.product[HotKeyCandidate]
    events.toDF()
      .withColumn("eventTime", timestamp_micros(col("tsUs")))
      .withWatermark("eventTime", maxDelay)
      .withColumn("hourBucket", expr(s"tsUs div $HourUs"))
      .withColumn("salt", pmod(col("key"), org.apache.spark.sql
        .functions.lit(buckets.toLong)))
      .as[TimedKeyEvent]
      .groupByKey(e => (e.hourBucket, e.salt))(
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout) {
        (hb: (Long, Long), it: Iterator[TimedKeyEvent],
            state: GroupState[HotKeyState]) =>
          val (hour, _) = hb
          val prior = state.getOption.getOrElse(HotKeyState(Map.empty, 0L))
          val next = it.foldLeft(prior) { (st, e) =>
            HotKeyState(graft.operators.HeavyHitters.mgUpdate(
              st.counts, e.key, capacity), st.total + 1L)
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val hourEndUs = (hour + 1L) * HourUs
          if (wmUs >= hourEndUs) {
            // hour closed: the bucket's totals are final; emit the
            // surviving candidates once and drop the state
            state.remove()
            next.counts.toSeq.sortBy(_._1).iterator.map {
              case (k, c) => HotKeyCandidate(hour, k, c, next.total)
            }
          } else {
            state.update(next)
            state.setTimeoutTimestamp(hourEndUs / 1000L)
            Iterator.empty
          }
      }
  }
}
