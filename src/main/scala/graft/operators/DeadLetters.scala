package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}

import graft.model.Schemas

/** Dead-letter routing (SURVEY §2.1 S4/S5): unusable records go to the
  * Dead Record Queue and rejected messages to the Dead Message Queue,
  * wrapped in versioned envelopes.
  *
  * Reference behavior: `/root/reference/kinesis-processing.js:608-746`
  * (DR envelope `634-647`, DM envelope `708-724`).
  *
  * Spark-first: an envelope is `to_json(struct(...))` — codegen'd, no
  * UDF — and a "queue" is whatever sink the pipeline writes the
  * envelope DataFrame to (`foreachBatch` writer, Kinesis sink, parquet
  * dead_records table). The envelope column is deliberately independent
  * of the sink so the same row can be routed anywhere. */
object DeadLetters {

  /** S4 — `ver:"DR|K|2.0"` dead-record envelope
    * (`kinesis-processing.js:634-647`). `discardedAt` is caller-supplied
    * (current_timestamp in production, a literal in tests) to keep the
    * envelope deterministic and replay-stable. */
  def deadRecordEnvelope(streamConsumerId: Column, shardOrEventID: Column,
      record: Column, reasonUnusable: Column, discardedAt: Column): Column =
    to_json(struct(
      streamConsumerId.as("streamConsumerId"),
      shardOrEventID.as("shardOrEventID"),
      lit(Schemas.DeadRecordVer).as("ver"),
      record.as("record"),
      reasonUnusable.as("reasonUnusable"),
      discardedAt.as("discardedAt")))

  /** Schema for reading BOTH envelope kinds back from a dead-letter
    * queue (a DR row leaves the DM-only fields null and vice versa) —
    * the queues are consumable streams, not write-only sinks. */
  def envelopeSchema(recordType: DataType,
      messageType: DataType): StructType = StructType(Seq(
    StructField("streamConsumerId", StringType),
    StructField("shardOrEventID", StringType),
    StructField("ver", StringType),
    StructField("record", recordType),
    StructField("message", messageType),
    StructField("reasonUnusable", StringType),
    StructField("reasonRejected", StringType),
    StructField("discardedAt", StringType)))

  /** Parse an envelope JSON back to its typed struct. */
  def parseEnvelope(envelope: Column, recordType: DataType,
      messageType: DataType): Column =
    from_json(envelope, envelopeSchema(recordType, messageType))

  /** S5 — `ver:"DM|K|2.0"` dead-message envelope with the rejection
    * reason resolved from the message's state
    * (`kinesis-processing.js:708-724`). */
  def deadMessageEnvelope(streamConsumerId: Column, shardOrEventID: Column,
      message: Column, reasonRejected: Column, discardedAt: Column): Column =
    to_json(struct(
      streamConsumerId.as("streamConsumerId"),
      shardOrEventID.as("shardOrEventID"),
      lit(Schemas.DeadMessageVer).as("ver"),
      message.as("message"),
      reasonRejected.as("reasonRejected"),
      discardedAt.as("discardedAt")))
}
