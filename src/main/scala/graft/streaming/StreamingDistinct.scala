package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live per-window DISTINCT counting — the streaming sibling of
  * [[graft.operators.Sketches]]: "how many distinct users/URLs/tokens
  * this hour", the panel exact streaming distinct cannot serve because
  * its state grows with the distinct set itself (every value seen this
  * hour must be remembered). The sketch holds 2^p = 256 registers per
  * open hour — state is (open hours in the horizon) × 256 ints
  * whatever the traffic — and the registers are the SAME
  * md5-deterministic registers as the batch sketch, computed here in
  * compiled JVM code ([[StreamingDistinct.registerAndRho]]) and
  * spec-pinned equal to [[graft.operators.Sketches.hllRegisters]]'s
  * SQL derivation on identical input.
  *
  * Emission discipline is [[StreamingTopK]]'s: register maxes are
  * commutative, so arrival order inside the watermark horizon is
  * irrelevant; a closed hour (watermark past hour end) emits its
  * summary EXACTLY ONCE — v_zero and the integer s_scaled (the full
  * sketch state, so downstream can re-derive or merge) plus the
  * raw-HLL estimate — and drops its state. Open hours emit nothing:
  * no provisional estimate ever shifts under a dashboard.
  */
object StreamingDistinct {

  /** A sighting of `value` at event time `tsUs` (epoch µs). */
  case class SeenValue(value: String, tsUs: Long)

  private[streaming] case class TimedValue(value: String, tsUs: Long,
      eventTime: java.sql.Timestamp, hourBucket: Long)

  /** One closed hour's sketch summary: the integer state (v_zero,
    * s_scaled — merge-able, oracle-able) and the raw-HLL estimate. */
  case class DistinctEstimate(hourBucket: Long, vZero: Long,
      sScaled: Long, estimate: Double)

  private[streaming] case class RegState(m: Map[Int, Int])

  val HourUs: Long = 3600000000L

  private val P = 8
  private val M = 1 << P
  private val WBits = 60 - P
  private val Top = WBits + 1

  /** EXACTLY the register derivation of Sketches.hllRegisters (md5 →
    * first 15 hex = 60 bits → top p register bits, remaining-bit
    * leading-zero rank), in compiled form for the per-row hot path. */
  private[graft] def registerAndRho(value: String): (Int, Int) = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(value.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars = first 7 bytes + the high nibble of byte 8
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (md(i) & 0xffL); i += 1 }
    h = (h << 4) | ((md(7) & 0xf0L) >> 4)
    val reg = (h >>> WBits).toInt
    val w = h & ((1L << WBits) - 1)
    val rho = if (w == 0L) Top
      else Top - (64 - java.lang.Long.numberOfLeadingZeros(w))
    (reg, rho)
  }

  /** alpha_m · m² · 2^(wBits+1) / s_scaled — the same raw-regime
    * formula as Sketches.hllEstimateSql, in JVM doubles (one division
    * by an exact integer; deterministic IEEE). */
  private[graft] def estimate(sScaled: Long): Double =
    0.7213 / (1.0 + 1.079 / M) * (M.toDouble * M) *
      (1L << Top).toDouble / sScaled.toDouble

  def report(values: Dataset[SeenValue],
      maxDelay: String = "1 hour"): Dataset[DistinctEstimate] = {
    implicit val timedEnc = Encoders.product[TimedValue]
    implicit val stateEnc = Encoders.product[RegState]
    implicit val outEnc = Encoders.product[DistinctEstimate]
    values.toDF()
      .withColumn("eventTime", timestamp_micros(col("tsUs")))
      .withWatermark("eventTime", maxDelay)
      .withColumn("hourBucket", expr(s"tsUs div $HourUs"))
      .as[TimedValue]
      .groupByKey(_.hourBucket)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout) {
        (hour: Long, it: Iterator[TimedValue],
            state: GroupState[RegState]) =>
          val prior = state.getOption.getOrElse(RegState(Map.empty))
          val regs = it.foldLeft(prior.m) { (m, v) =>
            val (r, rho) = registerAndRho(v.value)
            if (rho > m.getOrElse(r, 0)) m.updated(r, rho) else m
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val hourEndUs = (hour + 1L) * HourUs
          if (wmUs >= hourEndUs) {
            state.remove()
            val vZero = (M - regs.size).toLong
            val sScaled = vZero * (1L << Top) +
              regs.valuesIterator.map(rho => 1L << (Top - rho)).sum
            Iterator.single(
              DistinctEstimate(hour, vZero, sScaled, estimate(sScaled)))
          } else {
            state.update(RegState(regs))
            state.setTimeoutTimestamp(hourEndUs / 1000L)
            Iterator.empty
          }
      }
  }
}
