package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * anti-join that removes false positives. The exchange shrinks from
  * |batch| to |dups| + fpp·|new| while the answer stays bit-identical
  * to the plain anti-join (which is why the same DuckDB oracle checks
  * both variants).
  *
  * Execution shape: building the filter is ONE treeAggregate over
  * `right` (executor-side partial Blooms, OR-merged up a tree — no
  * driver-side scan); the split re-reads `left` twice, but both reads
  * are map-only scans with complementary pushed filters and no
  * exchange — at scale the batch re-scan is noise next to the
  * avoided |batch|-row shuffle. This is the same idea Spark's own
  * `InjectRuntimeFilter` applies inside one shuffle join, made
  * explicit so the definitely-new majority BYPASSES the join operator
  * entirely instead of merely pre-filtering its probe side.
  *
  * `mightContain` is a UDF by necessity: `BloomFilter` membership has
  * no `org.apache.spark.sql.functions` equivalent (the built-in
  * runtime-filter expressions are optimizer-internal). The UDF sits
  * on a single string column, is null-safe, and replaces an exchange
  * — the measured-justification bar the repo holds UDFs to.
  *
  * Null semantics match anti-join: a null left key never matches any
  * right key, so null-keyed rows are emitted as "new" (the UDF routes
  * them down the definite-new branch without consulting the filter).
  */
object BloomAntiJoin {

  /** @param left     probe side; all columns pass through unchanged
    * @param key      string key column name on `left`
    * @param right    membership side (only its key column is read)
    * @param rightKey string key column name on `right`
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
    val bloom = right.stat.bloomFilter(rightKey, expectedItems, fpp)
    val bc = left.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((s: String) =>
      if (s == null) false else bc.value.mightContainString(s))
    val definitelyNew = left.filter(!mightContain(col(key)))
    val candidates = left.filter(mightContain(col(key)))
      .join(right.select(col(rightKey).as(key)).distinct(),
        Seq(key), "left_anti")
    definitelyNew.unionByName(candidates)
  }
}
