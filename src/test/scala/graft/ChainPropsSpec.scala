package graft

import scala.util.{Failure, Random, Success, Try}

import org.scalatest.funsuite.AnyFunSuite

import graft.model.TaskStatus
import graft.streaming.{MsgState, ResumableConsumer, StreamMsg}

/** Property-style checks of the resumable chain state machine
  * (SURVEY §7.4: "attempts semantics across replays — easy to get
  * subtly wrong; property-test the state machine"). 200 random
  * scenarios of chain sizes, failure patterns and replay counts,
  * checked for the machine's invariants. Pure JVM — no Spark session.
  */
class ChainPropsSpec extends AnyFunSuite {

  private val rnd = new Random(20260812)

  private case class Scenario(msgs: Seq[StreamMsg],
      failuresLeft: collection.mutable.Map[String, Int], max: Int) {
    var executions = 0
    val task: String => Try[Unit] = payload => {
      executions += 1
      val left = failuresLeft.getOrElse(payload, 0)
      if (left > 0) {
        failuresLeft(payload) = left - 1
        Failure(new RuntimeException("planned failure"))
      } else Success(())
    }
  }

  private def randomScenario(): Scenario = {
    val n = 1 + rnd.nextInt(8)
    val max = 1 + rnd.nextInt(4)
    val msgs = (0 until n).map { i =>
      StreamMsg("chain", f"m$i%02d", i.toLong, f"p$i%02d")
    }
    val failures = collection.mutable.Map.empty[String, Int]
    msgs.foreach { m =>
      if (rnd.nextDouble() < 0.4) failures(m.payload) = rnd.nextInt(6)
    }
    Scenario(msgs, failures, max)
  }

  test("replaying to quiescence always finalises every message, " +
    "attempts never exceed the cap, order is respected") {
    (1 to 200).foreach { _ =>
      val sc = randomScenario()
      var state = Map.empty[String, MsgState]
      var rounds = 0
      var done = false
      while (!done && rounds < 50) {
        rounds += 1
        val out = ResumableConsumer.executeChain(state,
          rnd.shuffle(sc.msgs), sc.task, sc.max)
        // outputs come back in chain order
        assert(out.map(_.msgId) === sc.msgs.map(_.msgId).sorted)
        state = state ++ out.map(s => s.msgId -> s)
        done = out.forall(s => TaskStatus.isFinalised(s.state))
      }
      // 1. quiescence is always reached within the replay budget
      assert(done, s"chain never quiesced: $state")
      state.values.foreach { s =>
        // 2. terminal states are Completed or Discarded only
        assert(s.state == TaskStatus.Completed ||
          s.state == TaskStatus.Discarded, s.toString)
        // 3. the retry budget is never exceeded
        assert(s.attempts <= sc.max, s.toString)
      }
      // 4. a message is Discarded iff its planned failures outlasted
      // the budget
      sc.msgs.foreach { m =>
        val s = state(m.msgId)
        if (s.state == TaskStatus.Discarded)
          assert(sc.failuresLeft.getOrElse(m.payload, 0) > 0 ||
            s.attempts == sc.max)
      }
      // 5. no wasted work: total executions ≤ messages × (max + 1)
      assert(sc.executions <= sc.msgs.size * (sc.max + 1))
    }
  }
}
