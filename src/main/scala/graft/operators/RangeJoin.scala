package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join that PLANS AS AN EQUI-JOIN.
  *
  * Spark has no native range-join strategy: `a JOIN b ON p BETWEEN lo
  * AND hi` (plus any equi keys) falls back to BroadcastNestedLoopJoin
  * — O(N·M) pair evaluation and a broadcast of one whole side, the
  * classic silent scale-killer (fine at 10⁴ rows, dead at 10⁹). The
  * standard fix, used by every engine that bins (and by interval
  * overlap joins in genomics): quantize the number line into
  * fixed-width bins, explode each interval to the bins it touches,
  * compute each point's single home bin, equi-join on (keys…, bin),
  * and re-check the exact BETWEEN as a residual filter.
  *
  * Correctness: an interval containing point p covers p's home bin,
  * so the pair meets in that bin — no misses; a point has exactly ONE
  * home bin, so each qualifying (point, interval) pair meets exactly
  * once — no duplicate elimination needed (the interval side may
  * carry many bins; the join key is the point's single bin).
  *
  * Scale shape: shuffle hash-partitions on (keys…, bin) — ordinary
  * SMJ/SHJ parallelism, AQE-eligible. Cost knob: each interval
  * explodes to ⌊hi/w⌋−⌊lo/w⌋+1 ≈ width/w + 1 rows. Pick `binWidth`
  * near the TYPICAL interval width: much smaller multiplies the
  * interval side; much larger turns bins into skewed mini-cross-
  * products. Both degrade gracefully (it's still an equi-join), and
  * per-bin skew is exactly what AQE skew-join splits.
  *
  * Null/degenerate semantics match SQL BETWEEN: null points, null
  * bounds, and hi < lo intervals match nothing (filtered before the
  * explode — Spark's `sequence(a, b)` would otherwise count DOWN for
  * hi < lo and fabricate bins).
  */
object RangeJoin {

  /** @param points    driving side; every column passes through
    * @param pointCol  numeric point column on `points`
    * @param intervals interval side; every column passes through
    * @param loCol     inclusive lower bound column on `intervals`
    * @param hiCol     inclusive upper bound column on `intervals`
    * @param binWidth  bin width in point units (see knob note above)
    * @param pointKey / intervalKey optional extra equi-key pair
    * @return matching pairs: points.columns ++ intervals.columns
    *         (names must be disjoint)
    */
  def pointInInterval(
      points: DataFrame, pointCol: Column,
      intervals: DataFrame, loCol: Column, hiCol: Column,
      binWidth: Double,
      pointKey: Option[Column] = None,
      intervalKey: Option[Column] = None): DataFrame = {
    require(binWidth > 0 && java.lang.Double.isFinite(binWidth),
      s"binWidth must be a positive finite number, got $binWidth")
    require(pointKey.isDefined == intervalKey.isDefined,
      "pointKey and intervalKey must be supplied together")
    val pCols = points.columns.toSeq
    val iCols = intervals.columns.toSeq
    val overlap = pCols.intersect(iCols)
    require(overlap.isEmpty,
      s"column name(s) on both sides: ${overlap.mkString(", ")}")
    val reserved = (pCols ++ iCols).filter(_.startsWith("_rj_"))
    require(reserved.isEmpty,
      s"columns may not start with the reserved prefix _rj_: " +
        reserved.mkString(", "))

    def bin(c: Column): Column = floor(c / lit(binWidth)).cast("long")
    val p = points
      .filter(pointCol.isNotNull)
      .withColumn("_rj_bin", bin(pointCol))
    val i = intervals
      .filter(loCol.isNotNull && hiCol.isNotNull && loCol <= hiCol)
      .withColumn("_rj_bin",
        explode(sequence(bin(loCol), bin(hiCol))))
    val keyCond = (pointKey, intervalKey) match {
      case (Some(pk), Some(ik)) => pk === ik
      case _ => lit(true)
    }
    p.join(i,
        p("_rj_bin") === i("_rj_bin") && keyCond &&
          pointCol >= loCol && pointCol <= hiCol)
      .select((pCols ++ iCols).map(col): _*)
  }

  /** Interval-OVERLAP join that plans as an equi-join — the genomics
    * / temporal-analytics sibling of [[pointInInterval]]: all pairs
    * with `[loA, hiA] ∩ [loB, hiB] ≠ ∅` (inclusive bounds,
    * `loA <= hiB && loB <= hiA`). The naive ON-clause falls into the
    * same BroadcastNestedLoopJoin trap as BETWEEN.
    *
    * Both sides explode to their touched bins; overlapping pairs meet
    * in every SHARED bin, so a claim rule dedups by construction: the
    * pair is emitted only in the bin containing `max(loA, loB)` — the
    * later start. Overlap means that start is ≤ both his, i.e. it
    * lies INSIDE both intervals, so its bin is in both explode ranges
    * (no misses), and one number has one home bin (no duplicates) —
    * the same exactly-once-by-construction argument as the point
    * side, without a distinct.
    *
    * Scale shape and the `binWidth` knob are [[pointInInterval]]'s,
    * paid on BOTH sides (each row explodes to ≈ width/w + 1 bins).
    * Degenerate inputs (null bounds, hi < lo) match nothing. */
  def intervalOverlap(
      left: DataFrame, loA: Column, hiA: Column,
      right: DataFrame, loB: Column, hiB: Column,
      binWidth: Double,
      leftKey: Option[Column] = None,
      rightKey: Option[Column] = None): DataFrame = {
    require(binWidth > 0 && java.lang.Double.isFinite(binWidth),
      s"binWidth must be a positive finite number, got $binWidth")
    require(leftKey.isDefined == rightKey.isDefined,
      "leftKey and rightKey must be supplied together")
    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq
    val overlap = lCols.intersect(rCols)
    require(overlap.isEmpty,
      s"column name(s) on both sides: ${overlap.mkString(", ")}")
    val reserved = (lCols ++ rCols).filter(_.startsWith("_rj_"))
    require(reserved.isEmpty,
      s"columns may not start with the reserved prefix _rj_: " +
        reserved.mkString(", "))

    def bin(c: Column): Column = floor(c / lit(binWidth)).cast("long")
    val l = left
      .filter(loA.isNotNull && hiA.isNotNull && loA <= hiA)
      .withColumn("_rj_bin", explode(sequence(bin(loA), bin(hiA))))
    val r = right
      .filter(loB.isNotNull && hiB.isNotNull && loB <= hiB)
      .withColumn("_rj_bin", explode(sequence(bin(loB), bin(hiB))))
    val keyCond = (leftKey, rightKey) match {
      case (Some(lk), Some(rk)) => lk === rk
      case _ => lit(true)
    }
    l.join(r,
        l("_rj_bin") === r("_rj_bin") && keyCond &&
          loA <= hiB && loB <= hiA &&
          l("_rj_bin") === bin(greatest(loA, loB)))
      .select((lCols ++ rCols).map(col): _*)
  }
}
