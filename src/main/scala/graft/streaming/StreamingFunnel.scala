package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming half of the ordered funnel (`funnel_stages`): per-user
  * signup → click-within-24h → purchase-within-24h-of-that-click,
  * live.
  *
  * The batch query computes three cascaded running-min windows over
  * (user, ts). In event-time order those windows reduce to a 3-long
  * state machine per user — earliest signup, earliest QUALIFYING
  * click, earliest qualifying purchase — because each window's value
  * at a row depends only on rows at-or-before it: a signup can only
  * LOWER the future s_ts floor, never re-qualify a click that already
  * arrived before any signup (the batch window sees the same null).
  * `StreamingFunnelSpec` pins the equivalence against the batch
  * operator on the same events.
  *
  * Out-of-order arrival (round 11): events are BUFFERED in group state
  * until the watermark passes their event time, then folded in
  * event-time order — so per-user arrival order across triggers is
  * free to scramble within the `maxDelay` horizon and the fold still
  * sees the batch operator's order (the r10 "events must arrive in
  * event-time order across triggers" contract is gone). Events later
  * than the watermark follow the standard streaming discipline: the
  * stateful operator drops them (out-of-order history beyond the
  * horizon belongs to the batch backfill path).
  *
  * Scale shape: finalized state is exactly three longs per user —
  * independent of event volume, funnel depth encoded in the
  * transition, no FINALIZED event ever retained. The buffer holds only
  * events inside the watermark horizon (∝ per-user rate × `maxDelay`,
  * not history), the same bound every watermarked stateful operator
  * pays for out-of-order tolerance. Buffered groups flush through
  * event-time timeouts — no data needs to arrive for a user to
  * finalize once the watermark passes their buffered events.
  * Output is Update-mode: each trigger re-emits the stage of USERS
  * TOUCHED in that trigger (by data or by timeout), tagged with a
  * per-user update generation so a consumer (and the spec) can take
  * latest-wins without ordering assumptions; stages reflect
  * watermark-FINALIZED events only.
  */
object StreamingFunnel {

  case class FunnelEvent(userId: Long, tsUs: Long, eventType: String)

  /** [[FunnelEvent]] + the TimestampType twin of `tsUs` that carries
    * the watermark through the plan (a projected-away event-time
    * column would leave the stateful operator nothing to filter or
    * time out on). */
  private[streaming] case class TimedEvent(userId: Long, tsUs: Long,
      eventType: String, eventTime: java.sql.Timestamp)

  /** None-free state: Long.MaxValue = "not reached" (safe as a min
    * identity, and keeps the state schema a flat struct of longs). */
  case class FunnelProgress(gen: Long, s: Long, c: Long, p: Long)

  /** Checkpointed per-user state: folded progress over finalized
    * events + the not-yet-ripe buffer (ts, type). */
  private[streaming] case class FunnelState(gen: Long, s: Long, c: Long,
      p: Long, buf: Vector[(Long, String)])

  case class UserStage(userId: Long, gen: Long, stage: String)

  val DayUs: Long = 86400000000L

  private val Unset = Long.MaxValue

  /** One event through the 3-stage transition (exactly the batch
    * windows' semantics in event-time order). */
  private[graft] def step(st: FunnelProgress, tsUs: Long,
      eventType: String): FunnelProgress = eventType match {
    case "signup" => st.copy(s = math.min(st.s, tsUs))
    case "click" if st.s != Unset && tsUs <= st.s + DayUs =>
      st.copy(c = math.min(st.c, tsUs))
    case "purchase" if st.c != Unset && tsUs <= st.c + DayUs =>
      st.copy(p = math.min(st.p, tsUs))
    case _ => st
  }

  private[streaming] def stageOf(st: FunnelProgress): String =
    if (st.p != Unset) "3_purchase"
    else if (st.c != Unset) "2_click"
    else if (st.s != Unset) "1_signup"
    else "0_none"

  /** @param maxDelay watermark delay — the out-of-order horizon: how
    *   far behind the max seen event time a straggler may arrive and
    *   still fold in its correct event-time position */
  def stages(events: Dataset[FunnelEvent],
      maxDelay: String = "1 hour"): Dataset[UserStage] = {
    // product (schema-ful) state encoder — see StreamingGaps: typed
    // state columns keep checkpoints evolvable and on the UnsafeRow
    // fast path (kryo→product is a breaking state-format change;
    // pre-round-13 checkpoints must be discarded).
    implicit val timedEnc = Encoders.product[TimedEvent]
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[UserStage]
    events.toDF()
      .withColumn("eventTime", timestamp_micros(col("tsUs")))
      .withWatermark("eventTime", maxDelay)
      .as[TimedEvent]
      .groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[TimedEvent],
            state: GroupState[FunnelState]) =>
          val prior = state.getOption
            .getOrElse(FunnelState(0L, Unset, Unset, Unset, Vector.empty))
          // watermark is ms-grained; an event is ripe only when the
          // watermark has passed its FULL microsecond timestamp
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val buf = prior.buf ++ it.map(e => (e.tsUs, e.eventType))
          // strict <: the late-data filter admits rows AT the
          // watermark, so an equal-timestamp boundary tie must stay
          // buffered until the watermark strictly passes it — a tie
          // finalized on <= could fold before an admissible
          // equal-timestamp straggler and diverge from the batch
          // fold order (see StreamingGaps for the full argument)
          val (ripe, hold) = buf.partition(_._1 < wmUs)
          val folded = ripe.sortBy(_._1)
            .foldLeft(FunnelProgress(prior.gen, prior.s, prior.c, prior.p))(
              (st, e) => step(st, e._1, e._2))
          val next = FunnelState(prior.gen + 1,
            folded.s, folded.c, folded.p, hold)
          state.update(next)
          // wake this group when the watermark passes its earliest
          // buffered event (min/1000 + 1 rounds UP past the watermark's
          // ms grain, satisfying the must-be-later-than-watermark rule)
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(hold.map(_._1).min / 1000L + 1L)
          Iterator.single(UserStage(user, next.gen, stageOf(folded)))
      }
  }
}
