package graft.streaming

import scala.util.Try

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.{ConsumerConfig, TaskStatus}
import graft.operators.{Batching, Decode, DeadLetters, Identify}
import graft.sources.StateStore

/** The reference's `processStreamEvent` phase structure
  * (`/root/reference/kinesis-consumer.js:197-206` delegating to the core
  * initiate/process/finalise flow, SURVEY §3.3) as one `foreachBatch`
  * body:
  *
  * {{{
  * initiateBatch   decode (D1/D2) → identify (I3) → sequence (Q4–Q6)
  *                 → load prior state (S2) → revive (T2)
  * processBatch    ordered multi-task execution with resume (T3, Q5)
  * finaliseBatch   DRQ/DMQ envelopes (S4/S5) → state upsert (S3)
  *                 → replay verdict (reject ⇒ source redelivers)
  * }}}
  *
  * Batch-mode and streaming share this body: in streaming, wire
  * [[apply]] into `writeStream.foreachBatch` and a thrown
  * [[ReplayBatchException]] fails the trigger so the checkpoint does not
  * advance — the same at-least-once replay contract as the reference's
  * Lambda callback rejection (`test/kinesis-consumer.test.js:1272-1380`).
  *
  * Input contract (columns): `eventID` string, `shardId` string,
  * `partitionKey` string, `data` base64 string.
  */
object ConsumerPipeline {

  /** Thrown when the batch has incomplete messages and must replay. */
  final class ReplayBatchException(msg: String) extends RuntimeException(msg)

  final case class BatchResult(messages: Long, unusable: Long,
      completed: Long, failed: Long, discarded: Long, blocked: Long,
      replay: Boolean, processAllCompleted: Long = 0,
      processAllFailed: Long = 0, rejected: Long = 0)

  /** Key-space prefix for processAll master-task state rows — they live
    * in the same state table as message states, keyed per batch group
    * (the reference's `batchState.alls` —
    * `test/persisting.test.json:160-165`). */
  val MasterKeyPrefix = "ALL|"

  /** Single-task convenience: one anonymous `processOne` task per
    * message (the common case). See [[multi]] for the full registry. */
  def apply(cfg: ConsumerConfig, runTask: String => Try[Unit],
      statePath: String, deadLetterPath: String,
      throwOnReplay: Boolean = false,
      processAll: Option[(String, Seq[String]) => Try[Unit]] = None)(
      batch: DataFrame, batchId: Long): BatchResult =
    multi(cfg, Seq(TaskDef("processOne", runTask)), statePath,
      deadLetterPath, throwOnReplay, processAll)(batch, batchId)

  /** One full initiate/process/finalise pass driving a REGISTRY of
    * processOne task definitions per message — the reference's
    * `processStreamEvent(event, processOneTaskDefs, processAllTaskDefs)`
    * (`/root/reference/README.md:115-135`). Each task tree node gets its
    * own persisted state row and retry budget; sub-task trees execute
    * depth-first within their parent; a message finalises only when
    * EVERY node of every tree does, so one task over the attempts cap
    * with a sibling still retryable keeps the message incomplete and
    * the batch replaying (`test/kinesis-consumer.test.js:2761-2878`).
    *
    * Prior state is re-matched by the message's business full key — the
    * resolved `id|key|seqNo` identity — with eventID fallback when ids
    * are unconfigured/unresolvable (the reference's `toMessageBFK`
    * matching, `test/persisting.test.js:17-21`): a replay that re-keys
    * eventIDs but redelivers the same payloads still resumes.
    *
    * @param cfg        consumer configuration (sequencing mode, retry cap)
    * @param tasks      processOne task definitions (non-empty registry)
    * @param statePath  batch-state table (S2/S3)
    * @param deadLetterPath DRQ/DMQ envelope table (S4/S5)
    * @param throwOnReplay  streaming mode: throw so the trigger fails and
    *                       the source redelivers; batch callers may
    *                       inspect the result instead
    * @param processAll optional T4 batch-level master task over
    *                   `(shardOrEventID, payloads of the group's usable
    *                   messages)`; executes once per batch group with
    *                   the same resume/replay contract as processOne
    *                   (completed masters are skipped on replay —
    *                   `executeAllProcessAllTasks` in SURVEY §3.3)
    */
  def multi(cfg: ConsumerConfig, tasks: Seq[TaskDef],
      statePath: String, deadLetterPath: String,
      throwOnReplay: Boolean = false,
      processAll: Option[(String, Seq[String]) => Try[Unit]] = None)(
      batch: DataFrame, batchId: Long): BatchResult = {
    require(tasks.nonEmpty, "task registry must not be empty")
    val spark = batch.sparkSession
    import spark.implicits._

    // ----- initiate: decode → identify → sequence -----
    val scid = Batching.streamConsumerId(lit(cfg.streamName),
      lit(cfg.consumerId))
    val soid = Batching.shardOrEventID(cfg, col("shardId"), col("eventID"))
    val recordJson = to_json(struct(col("eventID"), col("shardId"),
      col("partitionKey"), col("data")))
    // decoded feeds identify, the unusable split, markers AND counts —
    // cache it so the decode work runs once per micro-batch, not per
    // downstream action.
    val decoded = Decode.extractJsonMessages(batch, col("data"))
      .withColumn("streamConsumerId", scid)
      .withColumn("shardOrEventID", soid)
      .cache()
    val identified = Identify.idsKeysSeqNos(cfg, decoded, col("message"),
      lit(null).cast("string"), recordJson, col("eventID"),
      lit(null).cast("int"))
    val usable = identified.filter(col("reason_unusable").isNull &&
      col("reason_rejected").isNull)
    // F2 — messages the identify phase rejected (unresolvable keys /
    // seqNos): they skip task execution entirely and are discarded to
    // the DMQ with their REAL reasonRejected during finalise
    // (`/root/reference/kinesis-processing.js:708-724` discarding
    // `batch.rejectedMessages`).
    val rejectedMsgs = identified.filter(col("reason_unusable").isNull &&
      col("reason_rejected").isNotNull)
    // BFK state identity: resolvable ids ⇒ `B|id|key|seqNo|md5(msg)`,
    // else the eventID (toMessageBFK fallback). The md5 tiebreak mirrors
    // the reference's BFK carrying the message md5s alongside id/key/
    // seqNo (`test/persisting.test.json` messageStates): two DISTINCT
    // messages that happen to share business id|key|seqNo must get
    // distinct state rows, while a replay that re-keys eventIDs but
    // redelivers the same payload still matches its prior row. The
    // all-ids-resolved test is a plain non-null conjunction over the
    // id property values (codegen'd — no interpreted `forall` in the
    // per-batch hot path). Unusable records never reach here, so their
    // markers stay keyed by eventID below.
    val idSources = Seq(col("message"), lit(null).cast("string"), recordJson)
    val stateKey =
      if (cfg.idPropertyNames.isEmpty) col("eventID")
      else when(cfg.idPropertyNames
            .map(n => Identify.propertyValue(n, idSources).isNotNull)
            .reduce(_ && _),
          concat_ws("|", lit("B"), col("id"), col("key"), col("seqNo"),
            md5(col("message").cast("binary"))))
        .otherwise(col("eventID"))
    val sequenced = Identify.sequence(cfg, usable, col("shardOrEventID"),
        col("message"), lit(null).cast("string"), recordJson, col("eventID"),
        col("eventID"))
      .withColumn("stateKey", stateKey)
      .cache()
    val chainKeyCol =
      if (cfg.sequencingPerKey) concat_ws("|", col("shardOrEventID"), col("key"))
      else col("shardOrEventID")

    val msgs = sequenced.select(
        chainKeyCol.as("chainKey"), col("stateKey").as("msgId"),
        col("seq_rn").cast("long").as("seqNo"),
        col("message").as("payload"))
      .as[StreamMsg]

    // ----- load prior state + process: resumable ordered execution -----
    val stateSchema = StructType(Seq(
      StructField("chainKey", StringType), StructField("msgId", StringType),
      StructField("task", StringType),
      StructField("state", StringType), StructField("attempts", IntegerType),
      StructField("reason", StringType)))
    // Schema migration: a state table written before the `task` column
    // existed (single-task era) loads `task = null`; coalesce to the
    // implicit single task so `priorTasks.get(path)` still matches and
    // attempts/budgets survive the upgrade. `reason` is nullable, so
    // pre-reason tables need no special casing.
    val loaded = StateStore.load(spark, statePath, stateSchema)
      .withColumn("task", coalesce(col("task"), lit("processOne")))
    // Key-format migration: rows written before the md5 tiebreak carry
    // `B|id|key|seqNo` — the md5-stripped PREFIX of today's keys. Match
    // legacy rows by EQUALITY against this batch's computed legacy keys
    // so in-flight attempts and already-discarded markers survive the
    // upgrade (the redelivered payload recomputes the new key; the
    // prefix is the whole legacy key). Equality is the safe
    // classification: a regex "does it end in the 32-hex md5 suffix"
    // test would misread a legacy key whose trailing property VALUE
    // happens to end in `|` + 32 lowercase hex chars and never migrate
    // it, whereas a current-format key can never EQUAL the md5-stripped
    // prefix of a different key without an md5-level collision. Two
    // current messages sharing a legacy prefix each inherit the one
    // legacy row — exactly the shared-row semantics the old format had.
    // Rows whose message is not in this batch stay on the legacy key
    // and migrate whenever it is next redelivered; the re-keyed rows
    // flow through the upsert below, so migration is one-time per key.
    // The mapping is one row per B|-keyed message of the current
    // micro-batch — always broadcastable — and the join is a plain
    // broadcast-hash equality probe on the msgId column the state load
    // scans anyway. Once a deployment knows all legacy rows are gone it
    // sets `migrateLegacyStateKeys = false` and the join disappears
    // from the plan entirely.
    val prior = resolvePriorState(loaded, sequenced,
      cfg.migrateLegacyStateKeys).as[TaskRun]

    val registry = tasks
    val maxAttempts = cfg.maxNumberOfAttempts
    // `ms.toSeq` materializes one CHAIN at a time — inherent to ordered
    // chain execution (later links see earlier outcomes). Memory is
    // bounded by chain cardinality (messages per shard/key, SURVEY
    // §7.4), never by corpus size: more data means more chains, not
    // longer ones.
    val outcomes = msgs.groupByKey(_.chainKey)(Encoders.STRING)
      .cogroup(prior.groupByKey(_.chainKey)(Encoders.STRING)) {
        (_, ms, ps) =>
          val priorByMsg = ps.toSeq.groupBy(_.msgId)
            .map { case (id, rs) => id -> rs.map(r => r.task -> r).toMap }
          ResumableConsumer.executeChainTasks(priorByMsg, ms.toSeq,
            registry, maxAttempts).iterator
      }.cache()

    // Message-level verdicts over the per-node task states (replay /
    // DMQ decisions happen at the message level), with the first
    // rejected node's reason carried for the DMQ envelope.
    val verdicts = outcomes
      .groupByKey(r => (r.chainKey, r.msgId))(
        Encoders.product[(String, String)])
      .mapGroups { (key, it) =>
        val rs = it.toSeq
        (key._1, key._2,
          ResumableConsumer.messageVerdict(rs.map(_.state)),
          ResumableConsumer.findReasonRejected(rs).orNull)
      }(Encoders.product[(String, String, String, String)])
      .toDF("chainKey", "msgId", "state", "reason")
      .cache()

    // T4 — processAll master task, once per batch group, resumable:
    // a master finalised in prior state is skipped on replay; a failed
    // master forces the batch to replay exactly like a failed chain.
    val masterOutcomes: Seq[TaskRun] = processAll match {
      case None => Nil
      case Some(runAll) =>
        val fn = runAll
        val max = cfg.maxNumberOfAttempts
        val groups = sequenced
          .select(col("shardOrEventID"), col("message"))
          .as[(String, String)]
        val priorMaster = prior
          .filter(_.chainKey.startsWith(MasterKeyPrefix))
        groups.groupByKey(_._1)(Encoders.STRING)
          .cogroup(priorMaster
            .groupByKey(_.chainKey.stripPrefix(MasterKeyPrefix))(
              Encoders.STRING)) { (soid, ms, ps) =>
            val prev = ps.toSeq.headOption
            val attempts = prev.map(_.attempts).getOrElse(0)
            val state = prev.map(_.state)
              .getOrElse(TaskStatus.Unstarted)
            val key = MasterKeyPrefix + soid
            if (TaskStatus.isFinalised(state)) prev.iterator
            else if (attempts >= max)
              Iterator(TaskRun(key, "processAll", "processAll",
                TaskStatus.Discarded, attempts))
            else fn(soid, ms.map(_._2).toSeq) match {
              case scala.util.Success(_) =>
                Iterator(TaskRun(key, "processAll", "processAll",
                  TaskStatus.Completed, attempts + 1))
              case scala.util.Failure(_) =>
                Iterator(TaskRun(key, "processAll", "processAll",
                  TaskStatus.Failed, attempts + 1))
            }
          }.collect().toSeq
    }

    // ----- finalise: dead letters, state upsert, replay verdict -----
    // Dead letters are written ONCE per record/message: the prior state
    // remembers what was already discarded, so a replayed batch does not
    // re-route the same envelope (mirrors the reference's persisted
    // unusableRecordStates/rejectedMessageStates —
    // test/persisting.test.js:339-398).
    val at = date_format(current_timestamp(),
      "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    val priorIds = prior.toDF().select(col("msgId")).distinct()
    val unusableRecs = decoded.filter(col("reason_unusable").isNotNull)
    val newDeadRecords =
      onceOnly(unusableRecs, unusableRecs("eventID"), priorIds)
        .select(lit("DR").as("kind"), DeadLetters.deadRecordEnvelope(
          col("streamConsumerId"), col("shardOrEventID"), recordJson,
          col("reason_unusable"), at).as("envelope"))
    // Identify-rejected messages → DMQ with their REAL reasonRejected,
    // once-only across replays (the state marker below remembers them).
    val newRejectedLetters =
      onceOnly(rejectedMsgs, rejectedMsgs("eventID"), priorIds)
        .select(lit("DM").as("kind"), DeadLetters.deadMessageEnvelope(
          col("streamConsumerId"), col("shardOrEventID"), col("message"),
          col("reason_rejected"), at).as("envelope"))
    // A message is discarded (→ DMQ) only when ALL its task nodes
    // finalised with at least one rejected — never while a sibling
    // task still has retry budget. The envelope's reasonRejected is the
    // first rejected node's recorded failure cause, not a generic
    // literal (reference `batch.findReasonRejected`).
    val priorDiscarded = prior
      .filter(!_.chainKey.startsWith(MasterKeyPrefix))
      .groupByKey(_.msgId)(Encoders.STRING)
      .mapGroups { (id, rs) =>
        (id, ResumableConsumer.messageVerdict(rs.map(_.state).toSeq))
      }.filter(_._2 == TaskStatus.Discarded)
      .map(_._1)(Encoders.STRING).toDF("msgId")
    val newlyDiscarded = verdicts
      .filter(col("state") === TaskStatus.Discarded)
      .select(col("msgId"), col("reason"))
      .join(priorDiscarded, Seq("msgId"), "left_anti")
    val deadMessages = sequenced
      .join(newlyDiscarded, col("stateKey") === col("msgId"))
      .select(lit("DM").as("kind"), DeadLetters.deadMessageEnvelope(
        col("streamConsumerId"), col("shardOrEventID"), col("message"),
        coalesce(col("reason"), lit("Discarded after max attempts")),
        at).as("envelope"))
    val letters = newDeadRecords.unionByName(newRejectedLetters)
      .unionByName(deadMessages)
    if (!letters.isEmpty)
      letters.write.mode("append").parquet(deadLetterPath)

    // Unusable records and identify-rejected messages enter the state
    // table as finalised markers so the DRQ/DMQ writes above stay
    // once-only across replays.
    val deadRecordMarkers = unusableRecs.select(
      col("shardOrEventID").as("chainKey"), col("eventID").as("msgId"),
      lit("unusableRecord").as("task"),
      lit(TaskStatus.Discarded).as("state"), lit(0).as("attempts"),
      col("reason_unusable").as("reason"))
    val rejectedMarkers = rejectedMsgs.select(
      col("shardOrEventID").as("chainKey"), col("eventID").as("msgId"),
      lit("rejectedMessage").as("task"),
      lit(TaskStatus.Rejected).as("state"), lit(0).as("attempts"),
      col("reason_rejected").as("reason"))
    val masterRows = masterOutcomes.toDF()
    StateStore.save(
      StateStore.upsert(prior.toDF(),
        outcomes.toDF().unionByName(deadRecordMarkers)
          .unionByName(rejectedMarkers).unionByName(masterRows),
        Seq("chainKey", "msgId", "task")),
      statePath)

    val byState = verdicts.groupBy("state").count()
      .as[(String, Long)].collect().toMap
    def n(s: String) = byState.getOrElse(s, 0L)
    val masterFailed = masterOutcomes
      .count(s => !TaskStatus.isFinalised(s.state))
    val result = BatchResult(
      messages = verdicts.count(),
      unusable = unusableRecs.count(),
      completed = n(TaskStatus.Completed),
      failed = n(TaskStatus.Failed),
      discarded = n(TaskStatus.Discarded),
      blocked = n(TaskStatus.Unstarted),
      replay = n(TaskStatus.Failed) + n(TaskStatus.Unstarted) +
        masterFailed > 0,
      processAllCompleted = masterOutcomes
        .count(_.state == TaskStatus.Completed),
      processAllFailed = masterFailed,
      rejected = rejectedMsgs.count())
    verdicts.unpersist()
    outcomes.unpersist()
    sequenced.unpersist()
    decoded.unpersist()
    if (result.replay && throwOnReplay)
      throw new ReplayBatchException(
        s"batch $batchId incomplete: ${result.failed} failed, " +
          s"${result.blocked} blocked — replaying")
    result
  }

  /** Once-only guard for DRQ/DMQ writes (S4/S5): rows whose id already
    * appears in prior state are dropped by a LEFT-ANTI equi-join, so a
    * replayed batch cannot re-route an envelope an earlier trigger
    * already wrote (mirrors the reference's persisted
    * unusableRecordStates/rejectedMessageStates —
    * test/persisting.test.js:339-398). Package-visible so
    * PipelineFidelitySpec can pin the plan: a hash/merge ANTI join on
    * the id (AQE/stats pick the side), never a nested loop — at 100 TB
    * the prior-id frame is state-sized and the letters frame is
    * failure-sized, both tiny next to the batch scan. */
  private[graft] def onceOnly(rows: DataFrame, idCol: Column,
      priorIds: DataFrame): DataFrame =
    rows.join(priorIds, idCol === priorIds("msgId"), "left_anti")

  /** Prior-state key resolution (T2 revive): identity when
    * `migrate = false` — the migration join must be ABSENT from the
    * plan, not just inert (pinned by `PipelineFidelitySpec`'s plan
    * assertion) — else the legacy-prefix broadcast probe documented at
    * the call site in [[multi]]. Package-visible so the spec can
    * assert on the plan of exactly the fragment the pipeline runs. */
  private[graft] def resolvePriorState(loaded: DataFrame,
      sequenced: DataFrame, migrate: Boolean): DataFrame =
    if (!migrate) loaded else {
      val legacyMap = sequenced
        .filter(col("stateKey").startsWith("B|"))
        .select(col("stateKey").as("_newKey"),
          regexp_replace(col("stateKey"), "\\|[0-9a-f]{32}$", "")
            .as("_legacyKey"))
        .distinct()
      loaded
        .join(broadcast(legacyMap), loaded("msgId") === col("_legacyKey"),
          "left")
        .withColumn("msgId", coalesce(col("_newKey"), col("msgId")))
        .drop("_newKey", "_legacyKey")
    }
}
