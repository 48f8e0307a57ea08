package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Pins [[RangeJoin.pointInInterval]]: exact equality with the brute-
  * force BETWEEN join on pseudo-random data (seeded) across bin widths
  * that under- and over-shoot the interval width, the exactly-once
  * property (no duplicate pairs from multi-bin intervals), BETWEEN
  * null/degenerate semantics, and — the reason the operator exists —
  * a plan with NO BroadcastNestedLoopJoin. */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private val rnd = new Random(7)
  private val points = (0 until 400).map(i =>
    (i.toLong, rnd.nextInt(5).toLong, rnd.nextDouble() * 1000))
  private val intervals = (0 until 120).map { i =>
    val lo = rnd.nextDouble() * 1000
    (1000L + i, rnd.nextInt(5).toLong, lo, lo + rnd.nextDouble() * 80)
  }

  private def brute(): Set[(Long, Long)] =
    (for {
      (pid, pk, p) <- points
      (iid, ik, lo, hi) <- intervals
      if pk == ik && p >= lo && p <= hi
    } yield (pid, iid)).toSet

  private def binned(width: Double): Seq[(Long, Long)] = {
    val p = points.toDF("pid", "pk", "p")
    val i = intervals.toDF("iid", "ik", "lo", "hi")
    RangeJoin.pointInInterval(p, col("p"), i, col("lo"), col("hi"),
        binWidth = width,
        pointKey = Some(col("pk")), intervalKey = Some(col("ik")))
      .select("pid", "iid").as[(Long, Long)].collect().toSeq
  }

  test("matches the brute-force BETWEEN join exactly, once per pair, " +
      "for bin widths below / near / above the interval width") {
    val expected = brute()
    assert(expected.nonEmpty, "degenerate fixture: no matches")
    for (w <- Seq(7.0, 80.0, 2000.0)) {
      val got = binned(w)
      assert(got.length === got.distinct.length,
        s"duplicate pairs at binWidth=$w")
      assert(got.toSet === expected, s"binWidth=$w diverged")
    }
  }

  test("null points, null bounds, and hi < lo intervals match nothing " +
      "(SQL BETWEEN semantics)") {
    val p = Seq((1L, Some(5.0)), (2L, None))
      .toDF("pid", "p")
    val i = Seq(
      (10L, Some(0.0), Some(10.0)),  // valid: contains 5.0
      (11L, None, Some(10.0)),       // null lo
      (12L, Some(0.0), None),        // null hi
      (13L, Some(9.0), Some(1.0)))   // inverted
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(p, col("p"), i,
        col("lo"), col("hi"), binWidth = 4.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L)))
  }

  test("plans as an equi-join even with NO equi keys — the case where " +
      "naive Spark falls back to a nested-loop plan") {
    val p = points.toDF("pid", "pk", "p")
    val i = intervals.toDF("iid", "ik", "lo", "hi")
    // keyless: the bin column is the ONLY equi key, and it suffices
    val df = RangeJoin.pointInInterval(p.drop("pk"), col("p"),
      i.drop("ik"), col("lo"), col("hi"), binWidth = 80.0)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
           !plan.contains("CartesianProduct"),
      s"range join fell back to a nested-loop plan:\n$plan")
    // and the naive keyless formulation really does nested-loop (the
    // operator is not redundant)
    val naive = p.drop("pk").join(i.drop("ik"),
      col("p") >= col("lo") && col("p") <= col("hi"))
    val naivePlan = naive.queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
           naivePlan.contains("CartesianProduct"),
      s"baseline unexpectedly planned an equi-join:\n$naivePlan")
    // keyless result still exact
    val expected = (for {
      (pid, _, pv) <- points; (iid, _, lo, hi) <- intervals
      if pv >= lo && pv <= hi
    } yield (pid, iid)).toSet
    val got = df.select("pid", "iid").as[(Long, Long)].collect()
    assert(got.length === got.distinct.length)
    assert(got.toSet === expected)
  }

  test("a hot bin is AQE-skew-splittable: an oversized binWidth that " +
      "funnels the corpus into one bin still splits at runtime") {
    // the binWidth knob's failure mode: width far above the data
    // spread → every point lands in ONE bin → one shuffle partition
    // carries the whole join. Because the operator plans as a plain
    // equi-join, that failure degrades into exactly the shape AQE's
    // skew-join split handles — pin it (with test-sized thresholds)
    // so a regression to a nested-loop or non-splittable plan fails.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "32KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      // many upstream map tasks: AQE splits a skewed reduce partition
      // at map-output granularity, so a single-partition local input
      // would leave it one indivisible block
      val p = (0 until 10000).map(i => (i.toLong, 5.0 + (i % 7) * 0.1))
        .toDF("pid", "p").repartition(16)
      val i = (0 until 20).map(j => (9000L + j, 0.0, 9.0))
        .toDF("iid", "lo", "hi").repartition(4)
      // width 1e6 ≫ spread: all points AND all intervals in bin 0
      val df = RangeJoin.pointInInterval(p, col("p"), i,
        col("lo"), col("hi"), binWidth = 1e6)
      // collect THIS dataframe so ITS adaptive plan finalizes (a
      // count() would plan a separate query execution)
      assert(df.collect().length === 10000 * 20)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"hot bin not skew-split by AQE:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("guards: bad binWidth, one-sided keys, overlapping or reserved " +
      "column names fail fast") {
    val p = points.toDF("pid", "pk", "p")
    val i = intervals.toDF("iid", "ik", "lo", "hi")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(p, col("p"), i, col("lo"), col("hi"), 0.0)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(p, col("p"), i, col("lo"), col("hi"),
        10.0, pointKey = Some(col("pk")), intervalKey = None)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(p, col("p"),
        i.withColumnRenamed("iid", "pid"), col("lo"), col("hi"), 10.0)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(p.withColumn("_rj_x", lit(1)), col("p"),
        i, col("lo"), col("hi"), 10.0)
    }
  }

  // ── intervalOverlap ────────────────────────────────────────────────
  // Fixture: two interval sets with different typical widths (≤60 vs
  // ≤90), dedicated Random so test order can't perturb the data.
  private val rndO = new Random(21)
  private val ivA = (0 until 150).map { i =>
    val lo = rndO.nextDouble() * 1000
    (3000L + i, rndO.nextInt(5).toLong, lo, lo + rndO.nextDouble() * 60)
  }
  private val ivB = (0 until 110).map { i =>
    val lo = rndO.nextDouble() * 1000
    (4000L + i, rndO.nextInt(5).toLong, lo, lo + rndO.nextDouble() * 90)
  }

  private def bruteOverlap(keyed: Boolean): Set[(Long, Long)] =
    (for {
      (aid, ak, aLo, aHi) <- ivA
      (bid, bk, bLo, bHi) <- ivB
      if (!keyed || ak == bk) && aLo <= bHi && bLo <= aHi
    } yield (aid, bid)).toSet

  private def overlapped(width: Double): Seq[(Long, Long)] = {
    val a = ivA.toDF("aid", "ak", "a_lo", "a_hi")
    val b = ivB.toDF("bid", "bk", "b_lo", "b_hi")
    RangeJoin.intervalOverlap(a, col("a_lo"), col("a_hi"),
        b, col("b_lo"), col("b_hi"), binWidth = width,
        leftKey = Some(col("ak")), rightKey = Some(col("bk")))
      .select("aid", "bid").as[(Long, Long)].collect().toSeq
  }

  test("intervalOverlap matches the brute-force overlap join exactly, " +
      "once per pair (claim-bin dedup, no distinct), for bin widths " +
      "below / near / above the interval widths") {
    val expected = bruteOverlap(keyed = true)
    assert(expected.nonEmpty, "degenerate fixture: no overlaps")
    for (w <- Seq(9.0, 75.0, 3000.0)) {
      val got = overlapped(w)
      assert(got.length === got.distinct.length,
        s"claim-bin rule emitted a duplicate pair at binWidth=$w")
      assert(got.toSet === expected, s"binWidth=$w diverged")
    }
  }

  test("intervalOverlap: null bounds and hi < lo intervals on EITHER " +
      "side match nothing") {
    val a = Seq(
      (1L, Some(0.0), Some(10.0)),   // valid
      (2L, None, Some(10.0)),        // null lo
      (3L, Some(0.0), None),         // null hi
      (4L, Some(9.0), Some(1.0)))    // inverted
      .toDF("aid", "a_lo", "a_hi")
    val b = Seq(
      (10L, Some(5.0), Some(15.0)),  // overlaps interval 1
      (11L, Some(11.0), Some(20.0)), // disjoint from interval 1
      (12L, None, None),             // null bounds
      (13L, Some(8.0), Some(2.0)))   // inverted (would overlap 1 if valid)
      .toDF("bid", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlap(a, col("a_lo"), col("a_hi"),
        b, col("b_lo"), col("b_hi"), binWidth = 4.0)
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L)))
  }

  test("intervalOverlap: touching endpoints overlap (inclusive bounds) " +
      "across a bin boundary — the claim bin is max(lo) even when the " +
      "shared region is a single point in another interval's last bin") {
    // [0,8] and [8,16] share exactly the point 8; with binWidth 4 the
    // claim bin is bin(8)=2, inside both explode ranges
    val a = Seq((1L, 0.0, 8.0)).toDF("aid", "a_lo", "a_hi")
    val b = Seq((10L, 8.0, 16.0), (11L, 8.000001, 16.0))
      .toDF("bid", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlap(a, col("a_lo"), col("a_hi"),
        b, col("b_lo"), col("b_hi"), binWidth = 4.0)
      .select("aid", "bid").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 10L)))
  }

  test("intervalOverlap plans as an equi-join even keyless (where the " +
      "naive ON-clause nested-loops), and the keyless result is exact") {
    val a = ivA.toDF("aid", "ak", "a_lo", "a_hi").drop("ak")
    val b = ivB.toDF("bid", "bk", "b_lo", "b_hi").drop("bk")
    val df = RangeJoin.intervalOverlap(a, col("a_lo"), col("a_hi"),
      b, col("b_lo"), col("b_hi"), binWidth = 75.0)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
           !plan.contains("CartesianProduct"),
      s"overlap join fell back to a nested-loop plan:\n$plan")
    val naive = a.join(b,
      col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
    val naivePlan = naive.queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
           naivePlan.contains("CartesianProduct"),
      s"baseline unexpectedly planned an equi-join:\n$naivePlan")
    val got = df.select("aid", "bid").as[(Long, Long)].collect()
    assert(got.length === got.distinct.length,
      "keyless claim-bin rule emitted a duplicate pair")
    assert(got.toSet === bruteOverlap(keyed = false))
  }

  test("intervalOverlap guards: bad binWidth, one-sided keys, " +
      "overlapping or reserved column names fail fast") {
    val a = ivA.toDF("aid", "ak", "a_lo", "a_hi")
    val b = ivB.toDF("bid", "bk", "b_lo", "b_hi")
    intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(a, col("a_lo"), col("a_hi"),
        b, col("b_lo"), col("b_hi"), 0.0)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(a, col("a_lo"), col("a_hi"),
        b, col("b_lo"), col("b_hi"), 10.0,
        leftKey = Some(col("ak")), rightKey = None)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(a, col("a_lo"), col("a_hi"),
        b.withColumnRenamed("bid", "aid"), col("b_lo"), col("b_hi"), 10.0)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(a.withColumn("_rj_x", lit(1)),
        col("a_lo"), col("a_hi"), b, col("b_lo"), col("b_hi"), 10.0)
    }
  }

  test("negative coordinates bin correctly (floor, not truncation, " +
      "at the zero boundary)") {
    // points straddle zero; truncating division would alias bins -1
    // and 0 and either miss or duplicate pairs at the boundary
    val rnd2 = new Random(13)
    val pts = (0 until 300).map(i =>
      (i.toLong, rnd2.nextDouble() * 400 - 200))
    val ivs = (0 until 80).map { i =>
      val lo = rnd2.nextDouble() * 400 - 200
      (5000L + i, lo, lo + rnd2.nextDouble() * 30)
    }
    val expected = (for {
      (pid, pv) <- pts; (iid, lo, hi) <- ivs
      if pv >= lo && pv <= hi
    } yield (pid, iid)).toSet
    assert(expected.nonEmpty)
    for (w <- Seq(7.0, 30.0, 500.0)) {
      val got = RangeJoin.pointInInterval(
          pts.toDF("pid", "p"), col("p"),
          ivs.toDF("iid", "lo", "hi"), col("lo"), col("hi"), binWidth = w)
        .select("pid", "iid").as[(Long, Long)].collect()
      assert(got.length === got.distinct.length,
        s"duplicate pairs at binWidth=$w")
      assert(got.toSet === expected, s"binWidth=$w diverged on negatives")
    }
  }
}
