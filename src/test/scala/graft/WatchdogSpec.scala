package graft

import graft.streaming.Watchdog

class WatchdogSpec extends SparkSpec {

  test("fast phase completes and returns its value") {
    val out = Watchdog.runPhase(spark, "fast", deadlineMs = 30000) {
      spark.range(1000).count()
    }
    assert(out === 1000L)
  }

  test("over-deadline phase is cancelled and throws PhaseTimeout") {
    import spark.implicits._
    val slow = spark.range(64).as[Long]
    intercept[Watchdog.PhaseTimeout] {
      Watchdog.runPhase(spark, "slow", deadlineMs = 800) {
        slow.map { i => Thread.sleep(5000); i }.count()
      }
    }
  }

  test("deadline arithmetic matches the reference's fraction rule") {
    assert(Watchdog.phaseDeadlineMs(10000, 0.8) === 8000)
    assert(Watchdog.phaseDeadlineMs(1, 0.000001) === 1) // floor at 1ms
  }
}
