package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-batch streaming dedup — the streaming half of SURVEY §2.5 F4
  * (`/root/reference/kinesis-processing.js:348`: ids/md5s exist "to
  * complicate duplicate elimination less" across Lambda retries) and
  * the streaming form of the training-pipeline exact dedup
  * ([[graft.operators.Dedup.exact]]).
  *
  * Scale design: `dropDuplicates` on an unbounded stream keeps EVERY
  * fingerprint forever — state grows with the corpus and the job dies
  * at 100 TB. `dropDuplicatesWithinWatermark` bounds state to the
  * watermark horizon: a duplicate arriving within `horizon` of the
  * original is suppressed, state for fingerprints older than the
  * watermark is evicted. The contract is suppression-within-horizon,
  * not global uniqueness — a replay arriving AFTER eviction re-emits,
  * which downstream exact dedup (one batch groupBy at rest) absorbs.
  * This mirrors the reference's at-least-once replay model: streaming
  * dedup narrows the duplicate window; it does not promise exactly-once.
  */
object StreamingDedup {

  /** Exact streaming dedup on a content fingerprint.
    *
    * @param df       streaming DataFrame
    * @param eventTime event-time column (cast to timestamp) driving the
    *                  watermark
    * @param fingerprint deterministic content fingerprint (e.g.
    *                  [[graft.operators.TextAnalysis.fingerprint]]);
    *                  emitted as column `fp`
    * @param horizon  watermark delay, e.g. `"10 minutes"` — the
    *                 duplicate-suppression window AND the state bound
    */
  def exactWithinWatermark(df: DataFrame, eventTime: Column,
      fingerprint: Column, horizon: String): DataFrame =
    df.withColumn("fp", fingerprint)
      .withColumn("event_time", eventTime.cast("timestamp"))
      .withWatermark("event_time", horizon)
      .dropDuplicatesWithinWatermark("fp")
}
