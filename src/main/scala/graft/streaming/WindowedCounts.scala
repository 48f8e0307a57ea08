package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with watermarking — the standard
  * Structured Streaming analytics surface. The reference engine has no
  * event-time semantics at all (ordering there comes from explicit
  * sequence numbers — SURVEY §2.8), so this is part of the engine's
  * EXTENSION surface: per-key tumbling-window counts with late-data
  * bounds, the building block for stream monitoring/rollups.
  *
  * Scale: the aggregation is partial-aggregable (map-side combine) and
  * the state store holds only open windows per key — the watermark
  * evicts closed windows, so state is bounded by (keys × windows in
  * the lateness horizon), independent of stream length.
  */
object WindowedCounts {

  /** Tumbling-window counts and value sums per key.
    *
    * @param events     streaming DataFrame with an event-time column
    * @param tsCol      event-time timestamp column name
    * @param keyCol     grouping key
    * @param windowSize e.g. "5 minutes"
    * @param lateness   watermark delay, e.g. "10 minutes"
    */
  def perKey(events: DataFrame, tsCol: String, keyCol: Column,
      valueCol: Column, windowSize: String, lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowSize), keyCol)
      .agg(count(lit(1)).as("n_events"),
        sum(valueCol).as("sum_value"))
}
