package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-prefiltered anti-join: `left` rows whose `key` does NOT
  * appear in `right`'s key set — EXACT result, Bloom-accelerated.
  *
  * The 100 TB motivation is incremental ingest against a corpus-scale
  * membership set (reference-era daily crawls deduped against
  * billions of already-ingested fingerprints — SURVEY.md §0): the raw
  * key set is tens of GB (32-hex md5 × 10⁹ ≈ 32 GB) so a broadcast
  * join dies at the cap, while a plain shuffled anti-join exchanges
  * the ENTIRE new batch even though the typical batch is mostly
  * genuinely new. A Bloom filter of the same 10⁹ keys at 1% fpp is
  * ~1.2 GB — broadcastable — and Bloom membership has NO false
  * negatives, so `mightContain = false` proves a row is new without
  * any join at all. Only the `mightContain = true` sliver (true
  * duplicates + ~fpp of the new rows) continues to the exact
  * anti-join that removes false positives. The left exchange shrinks
  * from |batch| to |dups| + fpp·|new| while the answer stays
  * bit-identical to the plain anti-join (which is why the same DuckDB
  * oracle checks both variants).
  *
  * Execution shape, measured into this form (sf1 profile in round
  * 10): the filter is built by Catalyst's native
  * [[BloomFilterAggregate]] over `xxhash64(key)` — a codegen'd
  * DataFrame aggregate with executor-side partial filters OR-merged
  * through the normal partial/final path (the first cut used
  * `df.stat.bloomFilter`, whose RDD-path scan cost 3.7 s where this
  * aggregate costs a sub-second scan at the same SF). The driver only
  * deserializes the finished ~n·9.6-bit sketch and re-broadcasts it;
  * the probe is the same codegen'd `xxhash64` plus a long→boolean
  * lookup UDF on the broadcast sketch — a deliberate choice over
  * Spark's plan-embedded `BloomFilterMightContain` literal, which
  * ships the whole sketch inside every task binary (Spark caps its
  * own runtime filters at 8 MB for that reason; a corpus-scale
  * 1.2 GB sketch must ride a broadcast variable instead).
  *
  * The split re-reads `left` twice, but both reads are map-only scans
  * with complementary pushed filters and no exchange — at scale the
  * batch re-scan is noise next to the avoided |batch|-row shuffle.
  * Callers aggregating the output by `key` should apply this BELOW
  * the aggregate (anti-join and grouping commute when the join key is
  * the grouping key) so the aggregate runs once over the union, not
  * once per branch.
  *
  * Hashing note: membership is tested on `xxhash64(key)`, so "false
  * positive" includes 64-bit hash collisions — still scrubbed by the
  * exact anti-join; false negatives remain impossible (same key, same
  * hash).
  *
  * Null semantics match anti-join: a null left key never matches any
  * right key, so null-keyed rows are emitted as "new" (routed down
  * the definite-new branch without consulting the filter; null right
  * keys are dropped before the build).
  */
object BloomAntiJoin {

  /** Serialized Bloom filter of `xxhash64(keyCol)` over `df` — ONE
    * codegen'd aggregate, no RDD conversion, no driver-side scan.
    *
    * Sizing trap: [[BloomFilterAggregate]] silently `Math.min`-clips
    * both its `estimatedNumItems` and `numBits` literals to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` (default
    * 4.19M) / `.maxNumBits` (default ~8 MB) — caps meant for Spark's
    * own plan-embedded runtime filters, not this broadcast-variable
    * path. At this operator's motivating scale (10⁹ keys → ~1.2 GB)
    * the clipped sketch would have effective fpp ≈ 1, the prefilter
    * would pass nearly every row, and the avoided shuffle would
    * silently return (the exact anti-join keeps the ANSWER right, so
    * no oracle catches it). So the caps are raised to cover this
    * build for the duration of the aggregate (restored after), and
    * the deserialized sketch's bit size is checked loudly. */
  private[graft] def buildBloom(df: DataFrame, keyCol: Column,
      expectedItems: Long, fpp: Double): BloomFilter = {
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      bridge.toExpression(xxhash64(keyCol)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val bin = withMinConf(df,
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems" -> expectedItems,
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits" -> numBits) {
      df.filter(keyCol.isNotNull)
        .select(bridge.toColumn(agg)).head.getAs[Array[Byte]](0)
    }
    val bloom = BloomFilter.readFrom(bin)
    require(bloom.bitSize() >= numBits,
      s"Bloom build was clipped: requested $numBits bits for " +
        s"$expectedItems items @ fpp=$fpp but got ${bloom.bitSize()} — " +
        "the runtime.bloomFilter caps did not take effect")
    bloom
  }

  /** Run `f` with each long-valued conf raised to AT LEAST the given
    * floor (never lowered), restoring prior values afterwards. The
    * confs propagate to executor-side `SQLConf.get` via the task's
    * local properties, so the aggregate's lazy `Math.min` sees the
    * raised cap on every partial as well as the final merge. */
  private def withMinConf[T](df: DataFrame, floors: (String, Long)*)(
      f: => T): T = {
    val conf = df.sparkSession.conf
    val saved = floors.map { case (k, _) => k -> conf.getOption(k) }
    floors.foreach { case (k, floor) =>
      val cur = conf.getOption(k).map(_.toLong).getOrElse(Long.MinValue)
      if (cur < floor) conf.set(k, floor)
    }
    try f finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  /** @param left     probe side; all columns pass through unchanged
    * @param key      key column name on `left`
    * @param right    membership side (only its key column is read)
    * @param rightKey key column name on `right`
    * @param expectedItems sizing for the Bloom filter — approximate
    *   distinct-key count of `right`; overestimating wastes memory,
    *   underestimating raises the effective fpp (never correctness)
    * @param fpp      target false-positive probability
    */
  def antiJoin(
      left: DataFrame, key: String,
      right: DataFrame, rightKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    require(expectedItems > 0, s"expectedItems must be > 0: $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1): $fpp")
    val bloom = buildBloom(right, col(rightKey), expectedItems, fpp)
    val bc = left.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((h: java.lang.Long) =>
      h != null && bc.value.mightContainLong(h))
    val probe = mightContain(xxhash64(col(key)))
    val definitelyNew = left.filter(col(key).isNull || !probe)
    val candidates = left.filter(col(key).isNotNull && probe)
      .join(right.select(col(rightKey).as(key)).distinct(),
        Seq(key), "left_anti")
    definitelyNew.unionByName(candidates)
  }
}
