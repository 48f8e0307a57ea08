package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distinct-count SKETCHES — the 100 TB path for
  * cardinality reporting, where exact `countDistinct` must shuffle
  * every distinct value and a sketch exchanges a FIXED 2^p registers
  * per group key instead (Flajolet et al. 2007, HyperLogLog; the
  * practical deployment notes are Heule et al. 2013, HLL++).
  *
  * Unlike Spark's own `approx_count_distinct` (whose HLL++ register
  * hashing is an implementation detail no other engine reproduces),
  * these registers derive from md5 — the engine-wide determinism
  * discipline — so the SAME bytes produce the SAME registers in Spark
  * and in the DuckDB oracle, and the gate can hash-compare the sketch
  * itself, not just eyeball the estimate:
  *
  *  - h   = first 15 md5 hex chars as a 60-bit integer (BIGINT-safe
  *          in both engines);
  *  - register = top p bits (h div 2^(60−p));
  *  - rho = leading-zero count of the remaining w = 60−p bits, + 1 =
  *          (w + 1) − length(bin(h mod 2^w)), with the all-zero tail
  *          taking the max value w + 1;
  *  - per (key, register): M = max(rho) — max is idempotent, so the
  *    input needs NO distinct pass, and the aggregate is partial:
  *    the exchange after map-side combine carries at most
  *    keys × 2^p rows whatever the corpus size.
  *
  * The summary folds registers to the integer
  * `s_scaled = Σ_r 2^((w+1) − M_r)` (empty registers contribute
  * 2^(w+1); always ≤ 2^(p+w+1) = 2^61 — BIGINT-exact, summed with
  * shiftleft so no double ever rounds) and `v_zero` (empty-register
  * count). The raw-HLL estimate α_m·m²·2^(w+1)/s_scaled is ONE
  * double division by an exact integer — callers compute it with a
  * shared SQL string per the house double discipline. Small-range
  * (linear-counting) correction is NOT applied: its m·ln(m/V) term
  * would hinge on cross-engine `ln` agreement; callers that need it
  * have `v_zero` in hand, and the report queries choose p so their
  * cardinalities sit in the raw regime (≥ 2.5·m).
  */
object Sketches {

  /** Per-(key, register) max-rho table: `key, register, m`. */
  def hllRegisters(df: DataFrame, keyCol: Column, valueCol: Column,
      p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4, 16], got $p")
    val wBits = 60 - p
    val wMod = 1L << wBits
    df.select(keyCol.as("key"),
        conv(substring(md5(valueCol), 1, 15), 16, 10).cast("long").as("h"))
      .select(col("key"), expr(s"h div $wMod").as("register"),
        expr(s"h % $wMod").as("w"))
      .withColumn("rho", when(col("w") === 0L, lit(wBits + 1))
        .otherwise(lit(wBits + 1) - length(bin(col("w")))))
      .groupBy("key", "register").agg(max("rho").as("m"))
  }

  /** Register table → per-key summary `key, v_zero, s_scaled`. */
  def hllSummary(regs: DataFrame, p: Int): DataFrame = {
    val m = 1L << p
    val wBits = 60 - p
    val top = wBits + 1
    regs.groupBy("key").agg(
        count(lit(1)).as("n_obs"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), " +
          s"CAST($top - m AS INT))")).as("s_obs"))
      .select(col("key"), (lit(m) - col("n_obs")).as("v_zero"),
        ((lit(m) - col("n_obs")) * lit(1L << top) + col("s_obs"))
          .as("s_scaled"))
  }

  /** The raw-HLL estimate as a shared-SQL double expression over a
    * frame carrying `s_scaled` (see object scaladoc): the ONE string
    * both Spark and the DuckDB oracle evaluate. */
  def hllEstimateSql(p: Int): String = {
    val m = 1L << p
    val top = 60 - p + 1
    val alpha = s"0.7213e0 / (1e0 + 1.079e0 / ${m}e0)"
    s"$alpha * ${m.toDouble * m}e0 * ${(1L << top)}e0" +
      " / CAST(s_scaled AS DOUBLE)"
  }
}
