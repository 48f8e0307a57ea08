package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming half of the `seq_gaps` stream-health diagnostic: emit
  * per-shard inter-event arrival gaps ≥ a floor, LIVE — the batch
  * query ranks the top-20 after the fact; the streaming operator is
  * the alert that fires while the producer is stalled.
  *
  * Ordering: a gap is defined between events ADJACENT in event time
  * (ties broken by event id, exactly the batch window's ordering), so
  * the operator buffers events in group state until the watermark
  * passes their event time and folds them in (tsUs, eventId) order —
  * the same buffered-fold discipline as [[StreamingFunnel]] (its
  * round-11 out-of-order contract removal). Each gap is emitted
  * exactly once, when its LATER endpoint finalizes; stragglers beyond
  * the watermark horizon belong to the batch backfill path, as with
  * every watermarked stateful operator.
  *
  * Scale shape: finalized state is ONE (ts, id) pair per shard —
  * independent of event volume — plus the watermark-horizon buffer
  * (∝ per-shard rate × `maxDelay`) every out-of-order-tolerant
  * operator pays. Shard cardinality is the group count, so state is
  * shards-sized, not events-sized. Buffered groups flush through
  * event-time timeouts without needing new data to arrive.
  */
object StreamingGaps {

  case class ShardEvent(shardId: String, eventId: Long, tsUs: Long)

  /** [[ShardEvent]] + the TimestampType twin of `tsUs` that carries
    * the watermark through the plan. */
  private[streaming] case class TimedShardEvent(shardId: String,
      eventId: Long, tsUs: Long, eventTime: java.sql.Timestamp)

  case class GapRow(shardId: String, prevId: Long, eventId: Long,
      gapUs: Long)

  /** Checkpointed per-shard state: last finalized (ts, id) — or None
    * before the first finalized event — plus the not-yet-ripe
    * buffer. */
  private[streaming] case class GapState(last: Option[(Long, Long)],
      buf: Vector[(Long, Long)])

  /** @param minGapUs only gaps at or above this floor are emitted
    *   (the alert threshold; the batch query instead ranks top-20)
    * @param maxDelay watermark delay — how far behind the max seen
    *   event time a straggler may arrive and still land in its
    *   correct event-time position */
  def gaps(events: Dataset[ShardEvent], minGapUs: Long,
      maxDelay: String = "1 hour"): Dataset[GapRow] = {
    // product (schema-ful) state encoder: the state store then holds
    // typed columns instead of opaque kryo bytes — checkpoints keep a
    // schema-evolution path when GapState gains a field, and state
    // rows stay on the UnsafeRow fast path. (Swapping from the
    // pre-round-13 kryo encoding is a breaking state-format change:
    // existing checkpoints must be discarded.)
    implicit val timedEnc = Encoders.product[TimedShardEvent]
    implicit val stateEnc = Encoders.product[GapState]
    implicit val outEnc = Encoders.product[GapRow]
    events.toDF()
      .withColumn("eventTime", timestamp_micros(col("tsUs")))
      .withWatermark("eventTime", maxDelay)
      .as[TimedShardEvent]
      .groupByKey(_.shardId)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout) {
        (shard: String, it: Iterator[TimedShardEvent],
            state: GroupState[GapState]) =>
          val prior = state.getOption.getOrElse(GapState(None, Vector.empty))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val buf = prior.buf ++ it.map(e => (e.tsUs, e.eventId))
          // finalize strictly BELOW the watermark: Spark's late-data
          // filter drops only rows strictly older than it, so an
          // event at exactly the watermark can still arrive — a
          // boundary tie finalized on `<=` could then fold a
          // straggler against an already-finalized equal-timestamp
          // event and emit an order diverging from the batch
          // (ts, event_id) ordering. Strict `<` keeps ties buffered
          // until the watermark has strictly passed them, matching
          // the admissibility boundary exactly.
          val (ripe, hold) = buf.partition(_._1 < wmUs)
          val ordered = ripe.sorted // (tsUs, eventId) lexicographic
          val out = Vector.newBuilder[GapRow]
          var last = prior.last
          ordered.foreach { case (ts, id) =>
            last.foreach { case (pts, pid) =>
              val gap = ts - pts
              if (gap >= minGapUs) out += GapRow(shard, pid, id, gap)
            }
            last = Some((ts, id))
          }
          state.update(GapState(last, hold))
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(hold.map(_._1).min / 1000L + 1L)
          out.result().iterator
      }
  }
}
