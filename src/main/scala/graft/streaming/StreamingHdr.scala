package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.{col, expr, lit, pmod, sum, timestamp_micros, xxhash64}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live per-window QUANTILE sketching — the third streaming sketch
  * twin, completing the trio next to [[StreamingDistinct]] (HLL) and
  * [[StreamingCms]] (Count-Min): "p50/p99 of this hour's values",
  * where an exact streaming histogram needs state proportional to the
  * hour's distinct values. The HDR log-bucket histogram
  * ([[graft.operators.Sketches]] scaladoc) holds ≤ 960 long counters
  * per stateful group for the whole non-negative BIGINT range, and the
  * buckets are the SAME (exponent, 4-mantissa-bit) buckets as the
  * batch sketch, computed here in compiled JVM code
  * ([[StreamingHdr.bucket]]/[[StreamingHdr.bucketLo]] — a
  * leading-zero count instead of the SQL length(bin(v)) probe, pinned
  * value-equal in the spec) so streamed hours merge with batch
  * sketches by cell-wise addition.
  *
  * THROUGHPUT at scale (r16 verdict): the stateful key is
  * `(hourBucket, salt)` — the [[StreamingHotKeys]] discipline — so
  * `salts` groups ingest the live hour in parallel instead of one
  * hour-global task; state is (open hours × salts) × ≤960 longs.
  * Bucket counts are sums, so cell-wise ADDITION across the per-salt
  * tables ([[merge]], a ≤ salts×960-row follow-up aggregate, e.g. in
  * `foreachBatch`) reproduces the unsalted histogram EXACTLY —
  * salted-vs-unsalted parity is spec-pinned.
  *
  * Emission discipline is the house one: bucket increments are
  * commutative, so arrival order inside the watermark horizon is
  * irrelevant; a closed hour emits each group's bucket table exactly
  * once — sketch STATE, not quantiles, so downstream picks any p
  * after the fact (`hdr_value_quantiles`' cumulative read) — and
  * drops its state. Open hours emit nothing.
  */
object StreamingHdr {

  /** A non-negative measurement at event time `tsUs` (epoch µs). */
  case class Measured(vi: Long, tsUs: Long)

  private[streaming] case class TimedVal(vi: Long, tsUs: Long,
      eventTime: java.sql.Timestamp, hourBucket: Long, salt: Long)

  /** One (closed hour, salt group) bucket: the per-salt partial
    * count of histogram bucket `bucket`. */
  case class SaltedBucket(hourBucket: Long, salt: Long, bucket: Long,
      lo: Long, cnt: Long)

  /** One closed hour's MERGED sketch: one row per touched bucket —
    * what [[merge]] folds the per-salt tables into, and the shape
    * batch sketches merge with. */
  case class BucketCount(hourBucket: Long, bucket: Long, lo: Long,
      cnt: Long)

  /** A non-negative measurement under sketch key `key` (e.g. the
    * SOURCE or endpoint it was observed on) — [[keyedCells]]' input;
    * the HDR member of the keyed-streaming family. */
  case class KeyedMeasured(key: String, vi: Long, tsUs: Long)

  private[streaming] case class TimedKeyed(key: String, vi: Long,
      tsUs: Long, eventTime: java.sql.Timestamp, hourBucket: Long,
      salt: Long)

  /** One (key, closed hour, salt group) bucket — [[keyedCells]]'
    * output; [[mergeKeyed]] folds the salt axis away into per-(key,
    * hour) bucket tables, the `bucket, lo, cnt` histogram shape the
    * hdr_value_quantiles cumulative read consumes. */
  case class KeyedSaltedBucket(key: String, hourBucket: Long,
      salt: Long, bucket: Long, lo: Long, cnt: Long)

  private[streaming] case class HdrState(cells: Map[Long, Long])

  val HourUs: Long = 3600000000L

  /** EXACTLY Sketches.hdrBucketSql's bucket index (values < 32 are
    * their own buckets; above, (exponent − 5)·16 + top-5 bits), with
    * numberOfLeadingZeros standing in for the SQL length(bin(v))
    * exponent probe. */
  private[graft] def bucket(vi: Long): Long =
    if (vi < 32L) vi
    else {
      val len = 64 - java.lang.Long.numberOfLeadingZeros(vi)
      (len - 5).toLong * 16L + (vi >>> (len - 5))
    }

  /** EXACTLY Sketches.hdrBucketLoSql's inclusive bucket lower bound. */
  private[graft] def bucketLo(vi: Long): Long =
    if (vi < 32L) vi
    else {
      val len = 64 - java.lang.Long.numberOfLeadingZeros(vi)
      (vi >>> (len - 5)) << (len - 5)
    }

  /** Per-(hour, salt) bucket tables, exactly once per group at
    * watermark close. `salts` is the ingest-parallelism knob; the
    * routing salt (xxhash64 — cheap, deterministic) never reaches a
    * result, because addition merges any assignment back exactly. */
  def cells(values: Dataset[Measured], salts: Int = 16,
      maxDelay: String = "1 hour"): Dataset[SaltedBucket] = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    implicit val timedEnc = Encoders.product[TimedVal]
    implicit val stateEnc = Encoders.product[HdrState]
    implicit val outEnc = Encoders.product[SaltedBucket]
    values.toDF()
      .withColumn("eventTime", timestamp_micros(col("tsUs")))
      .withWatermark("eventTime", maxDelay)
      .withColumn("hourBucket", expr(s"tsUs div $HourUs"))
      .withColumn("salt", pmod(xxhash64(col("vi")), lit(salts.toLong)))
      .as[TimedVal]
      .groupByKey(e => (e.hourBucket, e.salt))(
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout) {
        (hs: (Long, Long), it: Iterator[TimedVal],
            state: GroupState[HdrState]) =>
          val (hour, salt) = hs
          val prior = state.getOption.getOrElse(HdrState(Map.empty))
          val cellsNow = it.foldLeft(prior.cells) { (m, e) =>
            val b = bucket(e.vi)
            m.updated(b, m.getOrElse(b, 0L) + 1L)
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val hourEndUs = (hour + 1L) * HourUs
          if (wmUs >= hourEndUs) {
            state.remove()
            cellsNow.toSeq.sortBy(_._1).map { case (b, cnt) =>
              // lo re-derives from any member value's bucket floor;
              // bucket → lo is closed-form: small buckets are their
              // own value, larger ones are (16 + b%16) << (b/16 - 1)
              val lo = if (b < 32L) b
                else (16L + b % 16L) << (b / 16L - 1L)
              SaltedBucket(hour, salt, b, lo, cnt)
            }.iterator
          } else {
            state.update(HdrState(cellsNow))
            state.setTimeoutTimestamp(hourEndUs / 1000L)
            Iterator.empty
          }
      }
  }

  /** [[cells]] per sketch KEY — live per-SOURCE quantile sketches
    * (r18 verdict task #3, completing the keyed family next to
    * [[StreamingDistinct.keyedCells]], [[StreamingKmv.keyedCells]]
    * and [[StreamingCms.keyedCells]]): a stream of (source, value)
    * measurements becomes, at each hour close, one bucket histogram
    * per (source, salt); [[mergeKeyed]] folds the salts into the
    * per-(source, hour) histograms any percentile read consumes —
    * live per-source latency/size quantiles with the same
    * exactly-once-at-close discipline. State: (keys × salts) × ≤960
    * longs per open hour. */
  def keyedCells(values: Dataset[KeyedMeasured], salts: Int = 16,
      maxDelay: String = "1 hour"): Dataset[KeyedSaltedBucket] = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    implicit val timedEnc = Encoders.product[TimedKeyed]
    implicit val stateEnc = Encoders.product[HdrState]
    implicit val outEnc = Encoders.product[KeyedSaltedBucket]
    values.toDF()
      .withColumn("eventTime", timestamp_micros(col("tsUs")))
      .withWatermark("eventTime", maxDelay)
      .withColumn("hourBucket", expr(s"tsUs div $HourUs"))
      .withColumn("salt", pmod(xxhash64(col("vi")), lit(salts.toLong)))
      .as[TimedKeyed]
      .groupByKey(v => (v.key, v.hourBucket, v.salt))(
        Encoders.tuple(Encoders.STRING, Encoders.scalaLong,
          Encoders.scalaLong))
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout) {
        (khs: (String, Long, Long), it: Iterator[TimedKeyed],
            state: GroupState[HdrState]) =>
          val (key, hour, salt) = khs
          val prior = state.getOption.getOrElse(HdrState(Map.empty))
          val cellsNow = it.foldLeft(prior.cells) { (m, e) =>
            val b = bucket(e.vi)
            m.updated(b, m.getOrElse(b, 0L) + 1L)
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val hourEndUs = (hour + 1L) * HourUs
          if (wmUs >= hourEndUs) {
            state.remove()
            cellsNow.toSeq.sortBy(_._1).map { case (b, cnt) =>
              val lo = if (b < 32L) b
                else (16L + b % 16L) << (b / 16L - 1L)
              KeyedSaltedBucket(key, hour, salt, b, lo, cnt)
            }.iterator
          } else {
            state.update(HdrState(cellsNow))
            state.setTimeoutTimestamp(hourEndUs / 1000L)
            Iterator.empty
          }
      }
  }

  /** Folds [[keyedCells]]' salt axis away: per-(key, hour) bucket
    * tables `key, hourBucket, bucket, lo, cnt` (cell-wise addition —
    * the hdr_merge_shards law; ≤ keys × salts × 960 input rows per
    * hour). */
  def mergeKeyed(cells: Dataset[KeyedSaltedBucket])
      : org.apache.spark.sql.DataFrame =
    cells.toDF()
      .groupBy("key", "hourBucket", "bucket", "lo")
      .agg(sum("cnt").as("cnt"))

  /** Cell-wise addition of per-salt tables → the hour's merged
    * bucket table (≤ salts × 960 input rows per hour — run in
    * `foreachBatch` or any batch job over the sink). `lo` is a pure
    * function of `bucket`, so grouping by both changes nothing. */
  def merge(cells: Dataset[SaltedBucket]): Dataset[BucketCount] = {
    implicit val outEnc = Encoders.product[BucketCount]
    cells.toDF()
      .groupBy("hourBucket", "bucket", "lo")
      .agg(sum("cnt").as("cnt"))
      .select(col("hourBucket"), col("bucket"), col("lo"), col("cnt"))
      .as[BucketCount]
  }
}
