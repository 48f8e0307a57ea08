package graft

import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters

/** Two-pass Misra-Gries heavy hitters: the no-false-negative guarantee
  * under real eviction pressure (key cardinality ≫ sketch capacity),
  * the per-partition undercount bound, and the exact-output contract
  * against a plain groupBy/HAVING reference. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish stream: key 0 gets 1 of every 3 rows, key 1 one of
    * every 9, …, plus a long uniform tail of rare keys — cardinality
    * far above the sketch capacities used below. Deterministic (no
    * RNG) so failures reproduce. */
  private def zipfish(n: Int): Seq[Long] =
    (0 until n).map { i =>
      if (i % 3 == 0) 0L
      else if (i % 9 == 1) 1L
      else if (i % 27 == 2) 2L
      else 1000L + (i % 971).toLong // tail: ~971 distinct rare keys
    }

  test("mgSummary undercounts any key by at most n/capacity and never " +
      "tracks more than capacity keys") {
    val data = zipfish(9000)
    val exact = data.groupBy(identity).map { case (k, v) => k -> v.size }
    val cap = 64
    val summary = HeavyHitters.mgSummary(data.iterator, cap).toMap
    assert(summary.size <= cap)
    // lower-bound counters, undercount bounded by n/capacity
    summary.foreach { case (k, c) =>
      assert(c <= exact(k), s"key $k overcounted: $c > ${exact(k)}")
    }
    exact.foreach { case (k, n) =>
      val c = summary.getOrElse(k, 0L)
      assert(exact(k) - c <= data.size / cap,
        s"key $k undercounted past n/capacity: $c vs $n")
    }
    // the guarantee that matters downstream: every key above the
    // n/capacity line survives the sketch
    exact.filter(_._2 > data.size / cap).keys.foreach { k =>
      assert(summary.contains(k), s"heavy key $k evicted")
    }
  }

  test("hotKeys output equals the exact groupBy/HAVING reference under " +
      "eviction pressure (cardinality >> capacity) across partitions") {
    val data = zipfish(30000)
    // ~974 distinct keys, capacity 256: every partition's sketch
    // evicts constantly; threshold 2% (20000 ppm) needs capacity >=
    // 100, satisfied with margin
    val df = spark.createDataset(data).toDF("k").repartition(7)
    val got = HeavyHitters.hotKeys(df, col("k"), thresholdPpm = 20000L,
        capacity = 256)
      .select("k", "n_events").orderBy("k")
      .as[(Long, Long)].collect.toSeq
    val exact = data.groupBy(identity).view
      .mapValues(_.size.toLong).toSeq
      .filter { case (_, c) => c * 1000000L >= 20000L * data.size }
      .sortBy(_._1)
    assert(got == exact)
    assert(got.nonEmpty && got.size < 10) // heavy set, not everything
  }

  test("hotKeys refuses a capacity below the 2/epsilon guarantee line") {
    val df = spark.createDataset(Seq(1L)).toDF("k")
    intercept[IllegalArgumentException] {
      HeavyHitters.hotKeys(df, col("k"), thresholdPpm = 100L,
        capacity = 1024) // needs >= 20000
    }
  }

  test("hot_keys' recount join broadcasts the candidate set (no " +
      "sort-merge join of the raw scan) and the candidate rank is " +
      "capacity-capped") {
    val df = SparkEntry.queries("hot_keys")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"candidate recount join is not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"raw-scan-sized shuffle join in the hot-key path:\n$plan")
  }
}
