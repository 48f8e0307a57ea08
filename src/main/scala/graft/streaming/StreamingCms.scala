package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.{col, expr, lit, pmod, sum, timestamp_micros, xxhash64}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live per-window frequency sketching — the streaming sibling of
  * [[graft.operators.Sketches]]' Count-Min sketch, pairing with
  * [[StreamingDistinct]] exactly as the batch CMS pairs with the
  * batch HLL: "about how often was each key seen this hour", where
  * exact per-key streaming counts need state proportional to the
  * live key set and a hot-key stream (crawler URLs, user ids, search
  * terms) can make that set unbounded. Each stateful group holds
  * ≤ d×w = 768 exact long counters, and the cells are the SAME
  * md5-deterministic cells as the batch sketch
  * ([[graft.operators.Sketches.cmsCells]]), computed here in compiled
  * JVM code ([[StreamingCms.cell]]) and spec-pinned equal to the SQL
  * derivation on identical input.
  *
  * THROUGHPUT at scale (r16 verdict): the stateful key is
  * `(hourBucket, salt)` — the [[StreamingHotKeys]] discipline — so
  * `salts` groups ingest the live hour in parallel instead of one
  * hour-global task; state is (open hours × salts) × ≤768 longs.
  * Cell counts are sums, so cell-wise ADDITION across the per-salt
  * tables ([[merge]], a ≤ salts×768-row follow-up aggregate, e.g. in
  * `foreachBatch`) reproduces the unsalted sketch EXACTLY —
  * salted-vs-unsalted parity is spec-pinned, and the same law merges
  * hours with batch sketches.
  *
  * Emission discipline is [[StreamingDistinct]]'s: cell increments
  * are commutative, so arrival order inside the watermark horizon is
  * irrelevant; a closed hour (watermark past hour end) emits each
  * group's cell table exactly once — sketch STATE, not estimates, so
  * downstream can merge or point-query any key after the fact — and
  * drops its state. Open hours emit nothing.
  */
object StreamingCms {

  /** A sighting of `key` at event time `tsUs` (epoch µs). */
  case class KeyedEvent(key: String, tsUs: Long)

  private[streaming] case class TimedKey(key: String, tsUs: Long,
      eventTime: java.sql.Timestamp, hourBucket: Long, salt: Long)

  /** One (closed hour, salt group) cell: the per-salt partial count
    * of sketch cell (r, c). */
  case class SaltedCell(hourBucket: Long, salt: Long, r: Int, c: Long,
      cnt: Long)

  /** One closed hour's MERGED sketch: one row per touched (r, c)
    * cell — what [[merge]] folds the per-salt tables into, and the
    * shape batch sketches merge with. */
  case class CellCount(hourBucket: Long, r: Int, c: Long, cnt: Long)

  /** A sighting of counted item `value` under sketch key `key` (e.g.
    * the SOURCE a document came from) — [[keyedCells]]' input; the
    * CMS member of the keyed-streaming family (HLL:
    * [[StreamingDistinct.KeyedSeen]], KMV: [[StreamingKmv.KeyedSeen]]). */
  case class KeyedSeen(key: String, value: String, tsUs: Long)

  private[streaming] case class TimedKeyed(key: String, value: String,
      tsUs: Long, eventTime: java.sql.Timestamp, hourBucket: Long,
      salt: Long)

  /** One (key, closed hour, salt group) cell — [[keyedCells]]'
    * output; [[mergeKeyed]] folds the salt axis away into per-(key,
    * hour) cell tables, the `r, c, cnt` shape
    * [[graft.operators.Sketches.cmsEstimate]] probes. */
  case class KeyedSaltedCell(key: String, hourBucket: Long, salt: Long,
      r: Int, c: Long, cnt: Long)

  private[streaming] case class CmsState(cells: Map[String, Long])

  val HourUs: Long = 3600000000L

  /** d=3 × w=256 — cms_bigram_report's shape, so streamed hours are
    * merge- and probe-compatible with batch sketches at these dims. */
  val D: Int = 3
  val W: Int = 256

  /** EXACTLY the cell derivation of Sketches.cmsCell (md5 of
    * "r:cms:key" → first 15 hex = 60 bits → mod w), in compiled form
    * for the per-row hot path. */
  private[graft] def cell(r: Int, key: String, w: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$r:cms:$key"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars = first 7 bytes + the high nibble of byte 8
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (md(i) & 0xffL); i += 1 }
    h = (h << 4) | ((md(7) & 0xf0L) >> 4)
    h % w
  }

  /** Per-(hour, salt) cell tables, exactly once per group at
    * watermark close. `salts` is the ingest-parallelism knob; the
    * routing salt (xxhash64 — cheap, deterministic) never reaches a
    * result, because addition merges any assignment back exactly. */
  def cells(events: Dataset[KeyedEvent], salts: Int = 16,
      maxDelay: String = "1 hour"): Dataset[SaltedCell] = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    implicit val timedEnc = Encoders.product[TimedKey]
    implicit val stateEnc = Encoders.product[CmsState]
    implicit val outEnc = Encoders.product[SaltedCell]
    events.toDF()
      .withColumn("eventTime", timestamp_micros(col("tsUs")))
      .withWatermark("eventTime", maxDelay)
      .withColumn("hourBucket", expr(s"tsUs div $HourUs"))
      .withColumn("salt", pmod(xxhash64(col("key")), lit(salts.toLong)))
      .as[TimedKey]
      .groupByKey(e => (e.hourBucket, e.salt))(
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout) {
        (hs: (Long, Long), it: Iterator[TimedKey],
            state: GroupState[CmsState]) =>
          val (hour, salt) = hs
          val prior = state.getOption.getOrElse(CmsState(Map.empty))
          val cellsNow = it.foldLeft(prior.cells) { (m, e) =>
            (0 until D).foldLeft(m) { (m2, r) =>
              val k = s"$r:${cell(r, e.key, W)}"
              m2.updated(k, m2.getOrElse(k, 0L) + 1L)
            }
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val hourEndUs = (hour + 1L) * HourUs
          if (wmUs >= hourEndUs) {
            state.remove()
            // deterministic emission order: (r, c) ascending
            cellsNow.toSeq.map { case (k, cnt) =>
              val Array(r, c) = k.split(":")
              SaltedCell(hour, salt, r.toInt, c.toLong, cnt)
            }.sortBy(sc => (sc.r, sc.c)).iterator
          } else {
            state.update(CmsState(cellsNow))
            state.setTimeoutTimestamp(hourEndUs / 1000L)
            Iterator.empty
          }
      }
  }

  /** [[cells]] per sketch KEY — live per-SOURCE frequency sketches
    * (r18 verdict task #3, completing the keyed family next to
    * [[StreamingDistinct.keyedCells]] and [[StreamingKmv.keyedCells]]):
    * a stream of (source, item) sightings becomes, at each hour
    * close, one d×w cell table per (source, salt); [[mergeKeyed]]
    * folds the salts into the per-(source, hour) cell tables
    * [[graft.operators.Sketches.cmsEstimate]] point-queries — live
    * per-source frequency monitoring with the same
    * exactly-once-at-close discipline. State: (keys × salts) × ≤ d×w
    * longs per open hour. */
  def keyedCells(values: Dataset[KeyedSeen], salts: Int = 16,
      maxDelay: String = "1 hour"): Dataset[KeyedSaltedCell] = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    implicit val timedEnc = Encoders.product[TimedKeyed]
    implicit val stateEnc = Encoders.product[CmsState]
    implicit val outEnc = Encoders.product[KeyedSaltedCell]
    values.toDF()
      .withColumn("eventTime", timestamp_micros(col("tsUs")))
      .withWatermark("eventTime", maxDelay)
      .withColumn("hourBucket", expr(s"tsUs div $HourUs"))
      .withColumn("salt", pmod(xxhash64(col("value")), lit(salts.toLong)))
      .as[TimedKeyed]
      .groupByKey(v => (v.key, v.hourBucket, v.salt))(
        Encoders.tuple(Encoders.STRING, Encoders.scalaLong,
          Encoders.scalaLong))
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout) {
        (khs: (String, Long, Long), it: Iterator[TimedKeyed],
            state: GroupState[CmsState]) =>
          val (key, hour, salt) = khs
          val prior = state.getOption.getOrElse(CmsState(Map.empty))
          val cellsNow = it.foldLeft(prior.cells) { (m, e) =>
            (0 until D).foldLeft(m) { (m2, r) =>
              val k = s"$r:${cell(r, e.value, W)}"
              m2.updated(k, m2.getOrElse(k, 0L) + 1L)
            }
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val hourEndUs = (hour + 1L) * HourUs
          if (wmUs >= hourEndUs) {
            state.remove()
            cellsNow.toSeq.map { case (k, cnt) =>
              val Array(r, c) = k.split(":")
              KeyedSaltedCell(key, hour, salt, r.toInt, c.toLong, cnt)
            }.sortBy(sc => (sc.r, sc.c)).iterator
          } else {
            state.update(CmsState(cellsNow))
            state.setTimeoutTimestamp(hourEndUs / 1000L)
            Iterator.empty
          }
      }
  }

  /** Folds [[keyedCells]]' salt axis away: per-(key, hour) cell
    * tables `key, hourBucket, r, c, cnt` (cell-wise addition — the
    * batch merge law; ≤ keys × salts × d×w input rows per hour) —
    * probe with `Sketches.cmsEstimate` per (key, hourBucket). */
  def mergeKeyed(cells: Dataset[KeyedSaltedCell])
      : org.apache.spark.sql.DataFrame =
    cells.toDF()
      .groupBy("key", "hourBucket", "r", "c")
      .agg(sum("cnt").as("cnt"))

  /** Cell-wise addition of per-salt tables → the hour's merged cell
    * table (the batch merge law; ≤ salts × 768 input rows per hour —
    * run in `foreachBatch` or any batch job over the sink). */
  def merge(cells: Dataset[SaltedCell]): Dataset[CellCount] = {
    implicit val outEnc = Encoders.product[CellCount]
    cells.toDF()
      .groupBy("hourBucket", "r", "c").agg(sum("cnt").as("cnt"))
      .select(col("hourBucket"), col("r"), col("c"), col("cnt"))
      .as[CellCount]
  }
}
