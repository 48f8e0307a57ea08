package graft

import org.apache.spark.sql.DataFrame

/** Pins that the survivor anti-joins are strategy-NEUTRAL: no forced
  * broadcast() hint, so the optimizer picks broadcast at toy SFs (where
  * the dropped set is tiny) and a shuffled anti-join once the dropped
  * set outgrows the broadcast threshold — the regime a 30-80%-dup crawl
  * corpus puts us in at 100 TB. A forced hint would pin the broadcast
  * plan regardless of threshold; these tests fail if anyone
  * re-introduces it.
  */
class StrategyNeutralSpec extends SparkSpec {

  private def planOf(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sf0001)
    df.queryExecution.executedPlan.toString
  }

  private def withThreshold[A](bytes: Long)(body: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, bytes.toString)
    try body finally spark.conf.set(key, prev)
  }

  for (q <- Seq("dedup_survivors", "embedding_survivors",
      "dedup_survivors_quality")) {
    test(s"$q anti-join goes shuffle when broadcast is disabled") {
      withThreshold(-1L) {
        val plan = planOf(q)
        assert(!plan.contains("BroadcastHashJoin"),
          s"forced broadcast survives threshold=-1:\n$plan")
        assert(plan.contains("LeftAnti"), s"anti-join missing:\n$plan")
      }
    }

    test(s"$q anti-join broadcasts the small dropped set by default") {
      // The dropped side sits above an RDD-backed components result, so
      // COMPILE-time stats are unknown and the initial plan is shuffle;
      // AQE's runtime stats see the tiny set and demote it to broadcast
      // — read the FINAL adaptive plan after execution.
      withThreshold(10L * 1024 * 1024) {
        val df = SparkEntry.queries(q)(spark, sf0001)
        df.collect()
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("BroadcastHashJoin") ||
               plan.contains("BroadcastNestedLoopJoin"),
          s"AQE should pick broadcast at toy SF:\n$plan")
      }
    }
  }
}
