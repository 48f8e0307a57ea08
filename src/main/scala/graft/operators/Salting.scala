package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting: two-phase aggregation for hot keys.
  *
  * A `groupBy(k)` over a skewed key hashes every row of the hot key to
  * ONE reducer. Salting splits each key into `saltBuckets` sub-keys for
  * a parallel partial aggregate, then combines partials in a second
  * (tiny) aggregate. Use for aggregations whose partial form is cheap
  * (sum/count/min/max); plain counts are already map-side combined by
  * Spark, so salting pays off when the partial state is large (e.g.
  * collect-style or high-cardinality intermediate) or when AQE skew
  * handling is unavailable (it only covers joins).
  *
  * The salt is `pmod(hash(id), buckets)` — deterministic, so replays
  * produce identical partials.
  */
object Salting {

  /** Two-phase salted sum/count per key. Phase 1 aggregates
    * `(key, salt)` (parallelism = buckets per hot key); phase 2
    * combines the ≤ buckets partial rows per key. Pass an EXACT-typed
    * `valueCol` (decimal/integer) when cross-engine determinism
    * matters — double sums are combination-order-dependent. */
  def saltedCounts(df: DataFrame, keyCol: Column, valueCol: Column,
      saltFrom: Column, saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(saltFrom), lit(saltBuckets)))
    salted
      .groupBy(keyCol.as("key"), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(valueCol).as("_sum"))
      .groupBy("key")
      .agg(sum("_n").as("n_rows"), sum("_sum").as("sum_value"))
  }
}
