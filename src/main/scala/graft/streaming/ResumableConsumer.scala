package graft.streaming

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.TaskStatus

/** One in-flight message of a sequencing chain. `chainKey` is the unit
  * of ordering AND of state: per-key sequencing uses
  * `shardOrEventID|key`, per-shard uses `shardOrEventID` alone, so chain
  * parallelism maps 1:1 onto Spark group parallelism (SURVEY §7.4 — K
  * chains never repartition(1)). */
final case class StreamMsg(chainKey: String, msgId: String, seqNo: Long,
    payload: String)

/** Persisted per-message outcome (the `ones` task state collapsed to the
  * message level — SURVEY §1.1 tracked state). */
final case class MsgState(chainKey: String, msgId: String, state: String,
    attempts: Int)

/** Cross-batch resumable ordered execution (SURVEY §2.6 T3 + §2.8):
  * the reference's replay-with-prior-state contract
  * (`/root/reference/test/kinesis-consumer.test.js:746-847`: PRIOR state
  * honored, completed work skipped, failed work retried up to the cap)
  * on Structured Streaming's `flatMapGroupsWithState`.
  *
  * Semantics per chain (pinned by
  * `test/sequencing-per-key.test.js:474-622` and
  * `test/kinesis-consumer.test.js:1272-1491`):
  *  - messages run strictly in `(seqNo, msgId)` order;
  *  - already-finalised messages are skipped (resume, not redo);
  *  - a failure blocks all successors in the SAME chain (they stay
  *    Unstarted / incomplete ⇒ the batch would replay), other chains
  *    are unaffected — the poison-batch blocks one shard, not the
  *    stream (SURVEY §7.4);
  *  - a message failing at `attempts >= maxAttempts` is Discarded (T6)
  *    and stops blocking its chain.
  */
object ResumableConsumer {

  /** Pure per-chain fold — the whole state machine, testable without a
    * stream. `prior` is the chain's persisted state; `run` executes the
    * user task for one payload. */
  def executeChain(prior: Map[String, MsgState], msgs: Seq[StreamMsg],
      run: String => Try[Unit], maxAttempts: Int): Seq[MsgState] = {
    var blocked = false
    msgs.sortBy(m => (m.seqNo, m.msgId)).map { m =>
      val prev = prior.get(m.msgId)
      val attempts = prev.map(_.attempts).getOrElse(0)
      val state = prev.map(_.state).getOrElse(TaskStatus.Unstarted)
      if (TaskStatus.isFinalised(state)) prev.get // completed work is skipped
      else if (blocked)
        MsgState(m.chainKey, m.msgId, TaskStatus.Unstarted, attempts)
      else if (attempts >= maxAttempts) // retry budget burned ⇒ Discarded
        MsgState(m.chainKey, m.msgId, TaskStatus.Discarded, attempts)
      else run(m.payload) match {
        case Success(_) =>
          MsgState(m.chainKey, m.msgId, TaskStatus.Completed, attempts + 1)
        case Failure(_) =>
          blocked = true
          MsgState(m.chainKey, m.msgId, TaskStatus.Failed, attempts + 1)
      }
    }
  }

  /** Streaming form: checkpointed `GroupState` replaces the DynamoDB
    * batch-state item (S2/S3); replay ≡ the source redelivering rows
    * with the same msgId. Update-mode output emits each message's
    * latest state per trigger. */
  def stream(msgs: Dataset[StreamMsg], run: String => Try[Unit],
      maxAttempts: Int): Dataset[MsgState] = {
    implicit val stateEnc = Encoders.kryo[Map[String, MsgState]]
    implicit val outEnc = Encoders.product[MsgState]
    msgs.groupByKey(_.chainKey)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[StreamMsg],
            state: GroupState[Map[String, MsgState]]) =>
          val prior = state.getOption.getOrElse(Map.empty)
          val out = executeChain(prior, it.toSeq, run, maxAttempts)
          if (out.nonEmpty) state.update(prior ++ out.map(s => s.msgId -> s))
          out.iterator
      }
  }
}
