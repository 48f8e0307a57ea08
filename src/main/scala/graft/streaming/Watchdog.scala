package graft.streaming

import java.util.concurrent.{TimeoutException => JTimeout}

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._
import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

/** T7 — the phase deadline watchdog (SURVEY §2.6): the reference races
  * every phase against `timeoutAtPercentageOfRemainingTime ×
  * remainingTime` (default 0.8 — `default-kinesis-options.json:36`);
  * on firing, running tasks become TimedOut with their attempt rolled
  * back, state is saved, and the batch rejects ⇒ replay
  * (`test/kinesis-consumer.test.js:2884-3030`).
  *
  * Spark adaptation: the phase body is a driver-side block launching
  * jobs. On deadline we cancel the phase's job group — Spark tears the
  * stage down — and surface a timeout for the caller to translate into
  * a replay (throw from `foreachBatch` ⇒ trigger fails ⇒ source
  * redelivers). Attempt rollback is the natural consequence of
  * cancellation here: attempts are persisted only by the state save at
  * finalise, so a cancelled phase never burns a retry — matching the
  * reference's attempts-decrement semantics
  * (`test/kinesis-consumer.test.js:2985-2988`).
  */
object Watchdog {

  final class PhaseTimeout(msg: String) extends RuntimeException(msg)

  /** Run `body` with a deadline. On timeout the job group is cancelled
    * and [[PhaseTimeout]] is thrown. */
  def runPhase[A](spark: SparkSession, phase: String, deadlineMs: Long)(
      body: => A): A = {
    val sc = spark.sparkContext
    val group = s"graft-watchdog-$phase-${System.nanoTime()}"
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fut = Future {
      sc.setJobGroup(group, s"graft $phase (deadline ${deadlineMs}ms)",
        interruptOnCancel = true)
      try body finally sc.clearJobGroup()
    }
    try Await.result(fut, deadlineMs.millis)
    catch {
      case _: JTimeout =>
        sc.cancelJobGroup(group)
        throw new PhaseTimeout(
          s"phase '$phase' exceeded ${deadlineMs}ms — cancelled for replay")
      case NonFatal(e) => throw e
    }
  }

  /** The reference's deadline arithmetic: fraction of remaining time. */
  def phaseDeadlineMs(remainingMs: Long, fraction: Double): Long =
    math.max(1L, (remainingMs * fraction).toLong)
}
