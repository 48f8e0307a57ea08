package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.{ConsumerConfig, TaskStatus}

/** Batch identity, set-splitting and structural counts (SURVEY §2.4 Q7,
  * §2.5 F1–F3, §2.7, §2.1 S6).
  *
  * Reference behavior: `/root/reference/test/batch.test.js:100-221`
  * (batch key), `/root/reference/kinesis-processing.js:743-746`
  * (partition-key fallback), `/root/reference/test/kinesis-consumer.test.js:503-510`
  * (counts).
  *
  * Spark-first: a "batch" is not an object — it is the group of rows
  * sharing `(streamConsumerId, shardOrEventID)`, and the reference's
  * five sub-collections (messages / unusableRecords / rejectedMessages /
  * incompleteMessages / firstMessagesToProcess) are filtered views of
  * ONE DataFrame by status column, never separate datasets. At scale the
  * batch key is the partitioning key for every stateful op, so a skewed
  * shard degrades one group, not the stage (AQE skew-join handles the
  * rest).
  */
object Batching {

  /** Q7 — `"K|<streamName>|<consumerId>"`
    * (`test/batch.test.js:123-128`). */
  def streamConsumerId(streamName: Column, consumerId: Column): Column =
    concat_ws("|", lit("K"), streamName, consumerId)

  /** Q7 — `"S|<shardId>"`, or `"E|<eventID>"` in `batchKeyedOnEventID`
    * mode (`default-kinesis-options.json:33-35`). */
  def shardOrEventID(cfg: ConsumerConfig, shardId: Column,
      eventID: Column): Column =
    if (cfg.batchKeyedOnEventID) concat(lit("E|"), eventID)
    else concat(lit("S|"), shardId)

  /** Kinesis partition keys are capped at 256 chars (public Kinesis API
    * limit — PartitionKey max length). */
  val MaxPartitionKeySize = 256

  /** S6 — partition-key generator with the reference's fallback chain:
    * record's own key → batch's streamConsumerId → `'LAST_RESORT_KEY'`,
    * truncated (`kinesis-processing.js:743-746`; fallback asserted
    * `test/kinesis-processing.test.js:1672-1686`). Blank keys count as
    * missing. */
  def partitionKey(recordKey: Column, streamConsumerId: Column): Column = {
    def blankAsNull(c: Column) = when(trim(c) =!= "", c)
    substring(coalesce(blankAsNull(recordKey), blankAsNull(streamConsumerId),
      lit("LAST_RESORT_KEY")), 1, MaxPartitionKeySize)
  }

  /** F3 — a message is incomplete while ANY task in its trees is not
    * finalised (`test/kinesis-consumer.test.js:1342-1364`); incomplete
    * messages force a replay of the batch. `tasks` is an
    * `array<struct>` of [[graft.model.Schemas.taskStateSchema]]. */
  def isIncomplete(tasks: Column): Column =
    exists(tasks, t =>
      !t.getField("state").isin(TaskStatus.finalisedFamily.toSeq: _*))

  /** F2 — a message is rejected when some task landed in the rejected
    * family (`test/kinesis-consumer.test.js:1450-1465`). */
  def isRejected(tasks: Column): Column =
    exists(tasks, t =>
      t.getField("state").isin(TaskStatus.rejectedFamily.toSeq: _*))

  /** §2.7 — the reference's structural counts per batch
    * (`test/kinesis-consumer.test.js:503-510`), as one partial-aggregable
    * `groupBy` (map-side combine; one shuffle on the batch key). */
  def counts(df: DataFrame, keyCols: Seq[Column], usable: Column,
      rejected: Column, incomplete: Column, firstToProcess: Column): DataFrame =
    df.groupBy(keyCols: _*).agg(
      count(lit(1)).as("records"),
      count(when(usable, 1)).as("messages"),
      count(when(!usable, 1)).as("unusableRecords"),
      count(when(usable && rejected, 1)).as("rejectedMessages"),
      count(when(usable && incomplete, 1)).as("incompleteMessages"),
      count(when(usable && firstToProcess, 1)).as("firstMessagesToProcess"))
}
