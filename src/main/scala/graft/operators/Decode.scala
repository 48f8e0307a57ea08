package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.KplDeagg

/** Decode cluster (SURVEY §2.2 D1–D6): Base64 → UTF-8 → JSON message
  * extraction with error-capture routing, and KPL de-aggregation fan-out.
  *
  * Reference behavior: `/root/reference/kinesis-processing.js:477-598`.
  * The try/catch per-record routing of the reference becomes a two-way
  * column split here: a failed decode yields a null message plus a
  * `reason_unusable`, never an aborted job (D1
  * `kinesis-processing.js:483-488`).
  */
object Decode {

  /** D2 — Base64 `data` → UTF-8 JSON text (`kinesis-processing.js:502-517`).
    * Invalid base64 yields null (try_to_binary), as does empty input. */
  def payloadText(dataB64: Column): Column =
    decode(try_to_binary(dataB64, lit("base64")), "UTF-8")

  /** Validity check used for the usable/unusable split: the decoded text
    * must parse as a JSON value. `try_parse_json` returns null on
    * malformed input instead of throwing (ANSI-safe). */
  def isValidJson(payload: Column): Column =
    payload.isNotNull && try_parse_json(payload).isNotNull

  /** D1 — per-record message extraction with unusable routing: adds
    * `message` (JSON text, null when undecodable) and `reason_unusable`
    * (null when usable). Both outcomes stay in ONE DataFrame — the
    * usable/unusable "collections" of the reference batch are filtered
    * views, not separate datasets (SURVEY §2.5 F1). */
  def extractJsonMessages(df: DataFrame, dataB64: Column): DataFrame = {
    val payload = payloadText(dataB64)
    df.withColumn("message", when(isValidJson(payload), payload))
      .withColumn("reason_unusable",
        when(dataB64.isNull, lit("no data to decode"))
          .when(payload.isNull, lit("invalid base64 data"))
          .when(try_parse_json(payload).isNull,
            lit("unparseable JSON message")))
  }

  /** D6 — identity extract: the raw record IS the message (for
    * non-JSON pipelines; re-export `kinesis-processing.js:114`, pinned
    * by `test/kinesis-processing.test.js:1357-1509`). The record struct
    * becomes the message column unchanged; nothing is unusable. */
  def useRecordAsMessage(df: DataFrame, record: Column): DataFrame =
    df.withColumn("message", record)
      .withColumn("reason_unusable", lit(null).cast("string"))

  /** D3+D4+D5 — KPL de-aggregation fan-out: one row per user record.
    *
    * For KPL-aggregated payloads each protobuf sub-record becomes a row
    * with `subSequenceNumber = i`; non-KPL payloads pass through as a
    * single user record carrying the enclosing record's partition key and
    * data, WITHOUT a subSequenceNumber (`kpl-deagg-async.js:158-184`).
    * Checksum/parse failures become rows with `reason_unusable` set —
    * a partial failure kills only its own user record (D3
    * `kinesis-processing.js:533-570`).
    *
    * Intentional divergence from the reference: for a structurally valid
    * aggregate containing ZERO user records, `kpl-deagg-async.js` yields
    * nothing (the enclosing record silently vanishes), while this
    * operator emits ONE row with `reason_unusable` set — an audit trail
    * beats a silent drop, but unusable counts differ on such inputs.
    *
    * Adds: `subSequenceNumber`, `userPartitionKey`,
    * `userExplicitPartitionKey`, `userData` (base64), `reason_unusable`.
    */
  def kplUserRecords(df: DataFrame, dataB64: Column, partitionKey: Column,
      explicitHashKey: Column): DataFrame = {
    val deagged = KplDeagg.deaggCol(try_to_binary(dataB64, lit("base64")))
    val passthrough = array(struct(
      partitionKey.as("partitionKey"),
      explicitHashKey.as("explicitPartitionKey"),
      lit(null).cast("int").as("subSequenceNumber"),
      dataB64.as("data"),
      lit(null).cast("string").as("error")))
    val urs = coalesce(deagged, passthrough)
    // explode_outer: a structurally valid KPL aggregate containing ZERO
    // user records must surface as one unusable row, not vanish — with
    // plain explode the enclosing record would be silently dropped.
    df.withColumn("ur", explode_outer(urs))
      .withColumn("subSequenceNumber", col("ur.subSequenceNumber"))
      .withColumn("userPartitionKey", col("ur.partitionKey"))
      .withColumn("userExplicitPartitionKey", col("ur.explicitPartitionKey"))
      .withColumn("userData", col("ur.data"))
      .withColumn("reason_unusable",
        when(col("ur").isNull, lit("empty KPL aggregate (no user records)"))
          .otherwise(col("ur.error")))
      .drop("ur")
  }
}
