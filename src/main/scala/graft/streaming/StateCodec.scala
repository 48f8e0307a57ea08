package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Codec between the engine's flat per-message state rows
  * ([[MsgState]]) and the reference's nested persisted item shape —
  * one row per `(streamConsumerId, shardOrEventID)` with arrays of
  * message states (`/root/reference/test/persisting.test.json:2-166`:
  * `messageStates[]`, `batchState`). The flat form is what the engine
  * joins/upserts on (partition-friendly); the nested form is the
  * interchange/export shape.
  */
object StateCodec {

  /** Flat `(chainKey, msgId, state, attempts)` rows → one nested item
    * per batch group. Master (`ALL|`) rows become the batch-level
    * state; chain rows nest under `messageStates` sorted by msgId for
    * deterministic output. */
  def toItems(states: DataFrame, streamConsumerId: String): DataFrame = {
    val soid = when(col("chainKey").startsWith(ConsumerPipeline.MasterKeyPrefix),
        expr(s"substring(chainKey, ${ConsumerPipeline.MasterKeyPrefix.length + 1})"))
      .otherwise(col("chainKey"))
    states
      .withColumn("shardOrEventID", soid)
      .withColumn("isMaster",
        col("chainKey").startsWith(ConsumerPipeline.MasterKeyPrefix))
      .groupBy("shardOrEventID")
      .agg(
        sort_array(collect_list(when(!col("isMaster"),
          struct(col("msgId"), col("state"), col("attempts")))))
          .as("messageStates"),
        sort_array(collect_list(when(col("isMaster"),
          struct(col("msgId"), col("state"), col("attempts")))))
          .as("batchState"))
      .withColumn("streamConsumerId", lit(streamConsumerId))
      .select("streamConsumerId", "shardOrEventID", "messageStates",
        "batchState")
  }

  /** Nested items → flat state rows (inverse of [[toItems]]). */
  def toFlat(items: DataFrame): DataFrame = {
    val messages = items
      .select(col("shardOrEventID").as("chainKey"),
        explode(col("messageStates")).as("m"))
      .select(col("chainKey"), col("m.msgId"), col("m.state"),
        col("m.attempts"))
    val masters = items
      .select(concat(lit(ConsumerPipeline.MasterKeyPrefix),
          col("shardOrEventID")).as("chainKey"),
        explode(col("batchState")).as("m"))
      .select(col("chainKey"), col("m.msgId"), col("m.state"),
        col("m.attempts"))
    messages.unionByName(masters)
  }
}
