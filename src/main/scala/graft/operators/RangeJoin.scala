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
}
