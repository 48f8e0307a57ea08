package graft.model

import org.apache.spark.sql.types._

/** Fixed StructTypes of the engine. The user payload ("message") is
  * schemaless in the reference — here it is carried either as a raw JSON
  * string column or as a configured StructType supplied per pipeline.
  *
  * Shapes follow `/root/repo/FIXTURES.md` (derived from
  * `/root/reference/test/samples.js:195-232` and
  * `/root/reference/kpl-deagg-async.js:111-118`).
  */
object Schemas {

  /** `kinesis` sub-struct of a stream event record. */
  val kinesisStruct: StructType = StructType(Seq(
    StructField("kinesisSchemaVersion", StringType),
    StructField("partitionKey", StringType),
    StructField("sequenceNumber", StringType),
    StructField("data", StringType), // base64 payload
    StructField("approximateArrivalTimestamp", DoubleType),
    StructField("explicitHashKey", StringType)
  ))

  /** One stream event record (one row of the micro-batch). */
  val recordSchema: StructType = StructType(Seq(
    StructField("eventID", StringType),
    StructField("eventVersion", StringType),
    StructField("eventSource", StringType),
    StructField("eventName", StringType),
    StructField("eventSourceARN", StringType),
    StructField("awsRegion", StringType),
    StructField("invokeIdentityArn", StringType),
    StructField("kinesis", kinesisStruct)
  ))

  /** KPL de-aggregated user record (one element of the deagg fan-out).
    * `subSequenceNumber` is null for non-KPL passthrough records. */
  val userRecordSchema: StructType = StructType(Seq(
    StructField("partitionKey", StringType),
    StructField("explicitPartitionKey", StringType),
    StructField("sequenceNumber", StringType),
    StructField("subSequenceNumber", IntegerType),
    StructField("data", StringType)
  ))

  /** Flattened task state node: the recursive sub-task tree is stored as
    * an array of these with a `/`-joined `path` (root task name first). */
  val taskStateSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("path", StringType),
    StructField("kind", StringType), // processOne | processAll | discard
    StructField("state", StringType), // TaskStatus value
    StructField("error", StringType),
    StructField("reason", StringType),
    StructField("attempts", IntegerType),
    StructField("totalAttempts", IntegerType),
    StructField("began", StringType), // ISO-8601
    StructField("took", LongType) // millis
  ))

  /** Per-message tracked state (reference test/persisting.test.json:5-165). */
  val messageStateSchema: StructType = StructType(Seq(
    StructField("md5Message", StringType),
    StructField("md5Data", StringType),
    StructField("eventID", StringType),
    StructField("eventSeqNo", StringType),
    StructField("eventSubSeqNo", IntegerType),
    StructField("id", StringType), // "id1:ID1|id2:1001"
    StructField("key", StringType), // "k1:ABC|k2:10" or " " unsequenced
    StructField("seqNo", StringType), // "n1:1|n2:100|..."
    StructField("ones", ArrayType(taskStateSchema)),
    StructField("alls", ArrayType(taskStateSchema)),
    StructField("reasonRejected", StringType)
  ))

  /** Persisted batch-state item, keyed (streamConsumerId, shardOrEventID)
    * (reference test/persisting.test.js:609-620, 1144-1150). */
  val batchStateItemSchema: StructType = StructType(Seq(
    StructField("streamConsumerId", StringType, nullable = false),
    StructField("shardOrEventID", StringType, nullable = false),
    StructField("messageStates", ArrayType(messageStateSchema)),
    StructField("rejectedMessageStates", ArrayType(messageStateSchema)),
    StructField("unusableRecordStates", ArrayType(messageStateSchema)),
    StructField("batchState", StructType(Seq(
      StructField("alls", ArrayType(taskStateSchema)))))
  ))

  /** Dead-record envelope version tag (reference kinesis-processing.js:634). */
  val DeadRecordVer = "DR|K|2.0"

  /** Dead-message envelope version tag (reference kinesis-processing.js:708). */
  val DeadMessageVer = "DM|K|2.0"
}
