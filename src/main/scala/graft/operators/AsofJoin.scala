package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins, both directions ([[AsofJoin.backward]] /
  * [[AsofJoin.forward]]), one plan shape.
  *
  * Backward: for every left row, attach the latest right row
  * whose time is at-or-before the left row's time, per join key — the
  * "state at event time" lookup (prices at trade time, last config at
  * request time, last purchase at click time) that a plain equi-join
  * cannot express and an inequality join expresses only as a quadratic
  * per-key expansion + argmax.
  *
  * Spark has no native as-of join, so this composes one from primitives
  * Catalyst already optimizes, with NO join at all:
  *
  *   1. tag both inputs and union them (left rows carry their payload,
  *      right rows carry theirs; each side's missing columns are typed
  *      nulls),
  *   2. one hash shuffle on the key + one sort on (time, side) per
  *      partition — the same cost as the shuffle half of a sort-merge
  *      join,
  *   3. a running `last(right_payload, ignoreNulls)` window fills each
  *      left row with the most recent right payload seen at-or-before
  *      it; right rows sort BEFORE left rows at equal times, so the
  *      at-or-before match is inclusive exactly like the `>=` in
  *      DuckDB/kdb ASOF semantics,
  *   4. keep the left rows.
  *
  * At 100 TB this is ONE exchange of left+right combined and a
  * per-partition sort — strictly cheaper than the union-of-two-sorts a
  * sort-merge join would do, and there is no per-key quadratic term at
  * all: a key with L lefts and R rights costs (L+R)·log(L+R) in the
  * sort, not L·R. Skew caveat: a single pathological key serializes
  * into one task's sort (documented trade-off; range-partitioning
  * within key on time is the escape hatch, same as for any window).
  *
  * The right payload travels as ONE struct column so the window needs a
  * single `last` regardless of payload width, and `ignoreNulls` cannot
  * be fooled by a genuinely-null right ATTRIBUTE (the struct itself is
  * non-null for every right row).
  *
  * Determinism caveat (same as SQL ASOF): if the right side holds two
  * rows with the SAME (key, time), which one wins is sort-order
  * dependent — pre-deduplicate the right side (e.g. max-by a
  * tiebreaker column) when that can occur; the engine does not pick
  * silently on your behalf in any documented order.
  *
  * Null semantics match SQL ASOF: null-keyed or null-timed right rows
  * match nobody (filtered before the union); null-keyed left rows
  * survive with a null match (their partition holds no right rows);
  * null-timed left rows sort first and match nothing.
  *
  * `tolerance` (same unit as the time columns) bounds the lookback:
  * a match older than `leftTime - tolerance` is discarded — pandas
  * `merge_asof(tolerance=...)` semantics, applied AFTER the window so
  * the plan shape is unchanged.
  */
object AsofJoin {

  /** @param left      driving rows; all its columns pass through
    * @param right     lookup rows
    * @param leftKey   join key column on `left`
    * @param rightKey  join key column on `right`
    * @param leftTime  event-time column on `left` (any orderable type;
    *                  must be comparable with `rightTime`)
    * @param rightTime event-time column on `right`
    * @param payload   (outputName, column-on-right) pairs attached to
    *                  each left row from its matched right row; all
    *                  null when no right row is at-or-before
    * @param matchedTimeCol when set, also emit the matched right row's
    *                  time under this name (null on no-match)
    * @param tolerance max lookback distance as a Column-compatible
    *                  literal; matches with rightTime < leftTime - tol
    *                  are dropped
    */
  def backward(
      left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      payload: Seq[(String, Column)],
      matchedTimeCol: Option[String] = None,
      tolerance: Option[Column] = None): DataFrame =
    join(left, right, leftKey, rightKey, leftTime, rightTime, payload,
      matchedTimeCol, tolerance, forward = false)

  /** Forward as-of join: the EARLIEST right row at-or-after each left
    * row's time, per key — "next event" semantics (next purchase after
    * a click, next error after a deploy, next fill after an order).
    * The time-mirror of [[backward]]: same union-tag + one exchange +
    * one window plan, with the frame flipped to (currentRow,
    * unboundedFollowing) and a running `first(ignoreNulls)`; left rows
    * sort BEFORE right rows at equal times, so the at-or-after match
    * is inclusive like DuckDB ASOF's `<=`. `tolerance` bounds the
    * look-AHEAD: matches with rightTime > leftTime + tolerance are
    * discarded. */
  def forward(
      left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      payload: Seq[(String, Column)],
      matchedTimeCol: Option[String] = None,
      tolerance: Option[Column] = None): DataFrame =
    join(left, right, leftKey, rightKey, leftTime, rightTime, payload,
      matchedTimeCol, tolerance, forward = true)

  private def join(
      left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      payload: Seq[(String, Column)],
      matchedTimeCol: Option[String],
      tolerance: Option[Column],
      forward: Boolean): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(_.startsWith("_asof_")),
      "left columns may not start with the reserved prefix _asof_")
    // Output = left columns ++ payload names (++ matchedTimeCol): any
    // collision would produce duplicate output names that only fail —
    // ambiguously — when something downstream references them. Fail
    // here, at the call site, with the offending names.
    val outNames = payload.map(_._1) ++ matchedTimeCol
    val dupOut = outNames.diff(outNames.distinct).distinct
    require(dupOut.isEmpty,
      s"duplicate output column name(s): ${dupOut.mkString(", ")}")
    val clash = outNames.filter(leftCols.toSet)
    require(clash.isEmpty,
      s"payload/matchedTimeCol name(s) collide with left columns: " +
        clash.mkString(", "))

    // Side tags order rows at EQUAL times so the match is inclusive:
    // backward wants right-then-left (at-or-before), forward wants
    // left-then-right (at-or-after) under the same ascending sort.
    val (rSide, lSide) = if (forward) (1, 0) else (0, 1)

    // Right side: key/time + the payload struct (matched time rides
    // inside so tolerance and matchedTimeCol need no second window).
    val rTagged = right
      .filter(rightKey.isNotNull && rightTime.isNotNull)
      .select(
        rightKey.as("_asof_k"), rightTime.as("_asof_t"),
        lit(rSide).as("_asof_side"),
        struct(
          (payload.map { case (n, c) => c.as(n) } :+
            rightTime.as("_asof_mt")): _*).as("_asof_pay"))

    // Left side: same 4-column shape + the full left row as a struct, so
    // the union schema is fixed no matter how wide the left row is.
    val lTagged = left
      .select(
        leftKey.as("_asof_k"), leftTime.as("_asof_t"),
        lit(lSide).as("_asof_side"),
        lit(null).cast(rTagged.schema("_asof_pay").dataType).as("_asof_pay"),
        struct(leftCols.map(col): _*).as("_asof_row"))

    val unioned = rTagged
      .withColumn("_asof_row",
        lit(null).cast(lTagged.schema("_asof_row").dataType))
      .unionByName(lTagged)

    // Backward: right rows sort before left rows at equal time and a
    // running last() over the preceding frame is the whole join.
    // Forward: left rows sort first and a running first() over the
    // following frame is — same one sort, mirrored frame.
    val wBase = Window.partitionBy(col("_asof_k"))
      .orderBy(col("_asof_t").asc, col("_asof_side").asc)
    val matchedRaw =
      if (forward)
        first(col("_asof_pay"), ignoreNulls = true).over(
          wBase.rowsBetween(Window.currentRow, Window.unboundedFollowing))
      else
        last(col("_asof_pay"), ignoreNulls = true).over(
          wBase.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val bounded = tolerance match {
      case Some(tol) =>
        if (forward) when(
          matchedRaw("_asof_mt") <= col("_asof_t") + tol, matchedRaw)
        else when(
          matchedRaw("_asof_mt") >= col("_asof_t") - tol, matchedRaw)
      case None => matchedRaw
    }
    // Null-timed left rows must match nothing in BOTH directions. They
    // sort first under asc (nulls first), which self-enforces that for
    // backward (no preceding rights) but NOT for forward — the
    // following frame would hand them the key's earliest right row.
    val matched =
      if (forward) when(col("_asof_t").isNotNull, bounded) else bounded

    val outCols =
      leftCols.map(n => col(s"_asof_row.`$n`").as(n)) ++
        payload.map { case (n, _) => col(s"_asof_m.`$n`").as(n) } ++
        matchedTimeCol.map(n => col("_asof_m._asof_mt").as(n)).toSeq
    unioned
      .withColumn("_asof_m", matched)
      .filter(col("_asof_side") === lSide)
      .select(outCols: _*)
  }
}
