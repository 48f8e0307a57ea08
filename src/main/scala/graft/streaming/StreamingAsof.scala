package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming as-of join: for each left (driving) row, the LATEST right
  * row at-or-before it within a mandatory tolerance window — the live
  * twin of `operators.AsofJoin.backward` (batch), sharing its
  * at-or-before inclusive semantics so a deployment's backfilled
  * attribution and its real-time attribution cannot drift on the
  * overlap (pinned by `StreamingAsofSpec` against the batch operator).
  *
  * Why tolerance is REQUIRED here when batch leaves it optional: an
  * unbounded lookback would force the join to retain every right row
  * ever seen (state ∝ stream history). With a tolerance t and
  * watermarks on both sides, Spark's stream-stream interval join
  * evicts right rows once the left watermark passes their time + t —
  * state is bounded by the watermark horizon, the 100 TB streaming
  * property. Batch callers who want unbounded lookback use
  * `AsofJoin.backward`.
  *
  * Shape: LEFT OUTER interval join (right.time ∈ [left.time − t,
  * left.time]) → group by the left row → `max_by(payload,
  * right.time)`. Two stateful operators chained (join + aggregation) —
  * supported since Spark 3.5; the aggregate emits a left row once the
  * watermark passes its event time, i.e. once no earlier-arriving
  * right row can still appear. The outer join emits an unmatched left
  * row (null right columns) once the watermark proves no match can
  * still arrive; `max_by` ignores null-ordered rows, so that left row
  * surfaces with a null payload struct — the same null-payload shape
  * batch emits for unmatched rows (these are the unattributed rows an
  * attribution pipeline reports on).
  *
  * Divergences from batch, by construction:
  * - EXACT duplicate left rows (identical in every column) collapse to
  *   one output row: the final group-by keys on all left columns, and
  *   a streaming-safe per-row discriminator does not exist (monotonic
  *   ids are unsupported on streams). Batch emits one row per
  *   duplicate. Carry a unique id column on the left stream if
  *   duplicates are meaningful.
  * - ties on equal right time follow `max_by` (arbitrary among equal
  *   keys) — pre-dedupe the right side for deterministic ties, same
  *   contract as the batch operator's duplicate-(key,time) caveat.
  *
  * Both inputs MUST already carry `withWatermark` on their time
  * columns; the join and the aggregation both need one to bound state
  * and to finalize append-mode output.
  */
object StreamingAsof {

  /** @param left      driving stream: (leftKey, leftTime, ...rest)
    * @param leftKey   join key column name on `left`
    * @param leftTime  event-time column name on `left` (TimestampType,
    *                  watermarked)
    * @param right     lookup stream
    * @param rightKey  join key column name on `right`
    * @param rightTime event-time column name on `right` (TimestampType,
    *                  watermarked)
    * @param payload   right column names to attach from the matched row
    * @param tolerance SQL interval literal body, e.g. "20 seconds"
    * @return left columns + `<payload>` columns + `matched_time`
    *         (nulls when no right row fell in the window)
    */
  def backward(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      payload: Seq[String], tolerance: String): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    val leftCols = left.columns.toSeq
    val outNames = payload :+ "matched_time"
    val clash = outNames.filter(leftCols.toSet)
    require(clash.isEmpty,
      s"right-side output name(s) collide with left columns: " +
        clash.mkString(", "))
    // The interval condition below resolves columns BY NAME across both
    // inputs, so a key/time name present on both sides would resolve
    // ambiguously (an AnalysisException deep in the join, or worse, a
    // silently self-referential predicate). Fail at the API edge
    // instead, mirroring the payload-clash check above.
    val rightCols = right.columns.toSet
    val ambiguous = (Seq(leftKey, leftTime).filter(rightCols) ++
      Seq(rightKey, rightTime).filter(leftCols.toSet)).distinct
    require(ambiguous.isEmpty,
      "key/time column name(s) appear on BOTH join sides (the interval " +
        "condition would resolve them ambiguously): " +
        ambiguous.mkString(", ") + " — rename one side")
    val joined = left.join(
      right,
      expr(s"$leftKey = $rightKey AND $rightTime BETWEEN " +
        s"$leftTime - INTERVAL $tolerance AND $leftTime"),
      "left_outer")
    val pay = struct((payload.map(col) :+
      col(rightTime).as("matched_time")): _*)
    joined
      .groupBy(leftCols.map(col): _*)
      .agg(max_by(pay, col(rightTime)).as("_asof_pay"))
      .select(leftCols.map(col) ++
        outNames.map(n => col(s"_asof_pay.$n").as(n)): _*)
  }
}
