package graft

import scala.util.{Failure, Try}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.model.TaskStatus
import graft.streaming.{ChainTasksProcessor, MsgState, StreamMsg, TaskDef}

/** Pins the `transformWithState` twin of streamTasks
  * ([[ChainTasksProcessor]]): same registry semantics as the
  * flatMapGroupsWithState form — completed roots resume from store
  * state across triggers, a flaky sub-task retries, and the verdict
  * flips Failed → Completed — with state in RocksDB-backed typed
  * variables. */
class TransformWithStateSpec extends SparkSpec {
  import TransformWithStateSpec._

  test("registry with flaky sub-task resumes from store state across " +
      "triggers (RocksDB transformWithState)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    runs.clear()
    val registry = Seq(
      TaskDef("t1", counted("t1", _ => false),
        Seq(TaskDef("c1", counted("c1", p =>
          p.contains("flaky") && runs.get("c1|" + p) <= 1)))),
      TaskDef("t2", counted("t2", _ => false)))
    val input = MemoryStream[StreamMsg]
    val out = ChainTasksProcessor.streamTasks(input.toDS(), registry,
      maxAttempts = 2)
    val q = out.writeStream.format("memory").queryName("tws_outcomes")
      .outputMode("update").start()
    try {
      // trigger 1: t1/t2 succeed, c1 fails once ⇒ verdict Failed
      input.addData(StreamMsg("c0", "m1", 1, "tws flaky"))
      q.processAllAvailable()
      val t1 = spark.table("tws_outcomes").as[MsgState].collect()
      assert(t1.map(s => s.msgId -> s.state).toMap ===
        Map("m1" -> TaskStatus.Failed))
      // trigger 2 (redelivery): completed t1/t2 resume from the store
      // (not re-run), c1 retries and succeeds ⇒ Completed
      input.addData(StreamMsg("c0", "m1", 1, "tws flaky"))
      q.processAllAvailable()
      val t2 = spark.table("tws_outcomes").as[MsgState].collect().drop(1)
      assert(t2.map(s => s.msgId -> s.state).toMap ===
        Map("m1" -> TaskStatus.Completed))
      assert(runs.get("t1|tws flaky") === 1)
      assert(runs.get("t2|tws flaky") === 1)
      assert(runs.get("c1|tws flaky") === 2)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("store-state eviction: finalised entries drop after " +
      "retainTriggers, unfinalised survive, post-eviction redelivery " +
      "re-executes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    runs.clear()
    // "m1 ok" completes (finalised ⇒ evictable once untouched past the
    // window); "stuck bad" keeps failing under a high cap (Failed ⇒
    // unfinalised ⇒ must NEVER evict)
    val registry = Seq(TaskDef("t1",
      counted("t1", p => p.contains("bad"))))
    val input = MemoryStream[StreamMsg]
    val out = ChainTasksProcessor.streamTasks(input.toDS(), registry,
      maxAttempts = 100, retainTriggers = 2)
    val q = out.writeStream.format("memory").queryName("tws_evict")
      .outputMode("update").start()
    try {
      input.addData(StreamMsg("c0", "m1", 1, "m1 ok"),
        StreamMsg("c0", "stuck", 2, "stuck bad"))
      q.processAllAvailable()
      assert(runs.get("t1|m1 ok") === 1)
      assert(runs.get("t1|stuck bad") === 1)
      // four more triggers on the same chain advance the generation;
      // m1 and stuck are not redelivered, so m1 (finalised) ages out of
      // the retainTriggers=2 window while stuck must survive eviction
      (2 to 5).foreach { i =>
        input.addData(StreamMsg("c0", s"f$i", 10L + i, s"f$i ok"))
        q.processAllAvailable()
      }
      // redeliver both: m1's state was evicted ⇒ it re-executes from
      // scratch (the documented at-least-once trade); stuck's state
      // survived ⇒ its attempts CONTINUE from the stored count
      input.addData(StreamMsg("c0", "m1", 1, "m1 ok"),
        StreamMsg("c0", "stuck", 2, "stuck bad"))
      q.processAllAvailable()
      assert(runs.get("t1|m1 ok") === 2)
      assert(runs.get("t1|stuck bad") === 2)
      val stuckAttempts = spark.table("tws_evict").as[MsgState].collect()
        .filter(_.msgId == "stuck").map(_.attempts).max
      assert(stuckAttempts === 2) // prior attempt retained, not reset
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}

object TransformWithStateSpec {
  // static counters: task closures serialize per task (see
  // MultiTaskStreamingSpec)
  val runs = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  def counted(name: String, bad: String => Boolean): String => Try[Unit] =
    p => {
      runs.merge(s"$name|$p", 1, (a, b) => a + b)
      if (bad(p)) Failure(new RuntimeException(s"$name failed"))
      else Try(())
    }
}
