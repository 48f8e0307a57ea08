package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Cumulative

/** [[Cumulative.rangeCumSum]] must be BIT-EQUAL to the
  * single-partition `Window.orderBy` running sum it replaces (r22
  * verdict #7), for any key spread — the HDR log-bucketing is
  * monotone for all non-negative longs, and global cum = local cum +
  * exclusive bucket prefix holds for any monotone bucketing. */
class CumulativeSpec extends SparkSpec {

  test("rangeCumSum == single-partition window cumsum + global " +
      "totals on gappy unique-keyed histograms across key scales " +
      "(single-bucket tiny keys through multi-octave 2^40 spreads)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260819)
    Seq(1L, 7L, 104729L, 1L << 40).foreach { stride =>
      val hist = (1 to 500)
        .map(i => (i.toLong * stride + rnd.nextInt(5),
          1L + rnd.nextInt(90)))
        .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).sum) }
        .toSeq.toDF("k", "cnt")
      val w = Window.orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val expected = hist
        .select(col("k"), sum("cnt").over(w).as("cum"),
          sum("cnt").over().as("n"))
        .orderBy("k").collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2)))
      val got = Cumulative.rangeCumSum(hist, "k",
          Seq(("cnt", "cum")), Seq(("cnt", "n")))
        .select("k", "cum", "n")
        .orderBy("k").collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.toSeq === expected.toSeq,
        s"two-pass cumsum diverged at key stride=$stride")
    }
  }

  test("rangeCumSum carries multiple running sums through one pass " +
      "(the heaps_law shape)") {
    import spark.implicits._
    val df = Seq((0L, 10L, 3L), (1L, 20L, 0L), (5L, 5L, 2L),
      (9L, 1L, 1L)).toDF("bucket", "a", "b")
    val got = Cumulative.rangeCumSum(df, "bucket",
        Seq(("a", "cum_a"), ("b", "cum_b")))
      .select("bucket", "cum_a", "cum_b")
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((0L, 10L, 3L), (1L, 30L, 3L),
      (5L, 35L, 5L), (9L, 36L, 6L)))
  }
}
