package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
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
  * Scale shape: state is exactly three longs per user — independent
  * of event volume, funnel depth encoded in the transition, no event
  * list ever buffered (the same bound the batch plan gets from its
  * single exchange + chained Window operators). Output is Update-mode:
  * each trigger re-emits the stage of USERS TOUCHED in that trigger
  * only, tagged with a per-user update generation so a consumer (and
  * the spec) can take latest-wins without ordering assumptions.
  *
  * Ordering contract: within a trigger the group's events are sorted
  * by `tsUs` before applying the transition; ACROSS triggers events
  * must arrive in event-time order per user (the usual
  * watermark-paced replay discipline; out-of-order history belongs to
  * the batch backfill path, as with the other streaming shells).
  */
object StreamingFunnel {

  case class FunnelEvent(userId: Long, tsUs: Long, eventType: String)

  /** None-free state: Long.MaxValue = "not reached" (safe as a min
    * identity and kryo-stable). */
  case class FunnelProgress(gen: Long, s: Long, c: Long, p: Long)

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

  def stages(events: Dataset[FunnelEvent]): Dataset[UserStage] = {
    implicit val stateEnc = Encoders.kryo[FunnelProgress]
    implicit val outEnc = Encoders.product[UserStage]
    events.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[FunnelEvent],
            state: GroupState[FunnelProgress]) =>
          val prior = state.getOption
            .getOrElse(FunnelProgress(0L, Unset, Unset, Unset))
          val next = it.toSeq.sortBy(_.tsUs)
            .foldLeft(prior)((st, e) => step(st, e.tsUs, e.eventType))
            .copy(gen = prior.gen + 1)
          state.update(next)
          Iterator.single(UserStage(user, next.gen, stageOf(next)))
      }
  }
}
