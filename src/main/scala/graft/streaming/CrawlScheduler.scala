package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The crawl scheduler END-TO-END (r16 verdict task #5) — the three
  * crawl-side operators composed into one streaming pipeline, the
  * reference's pipeline-of-phases shape (initiate → process →
  * finalise, kinesis-consumer.js:197-206):
  *
  *  1. FRONTIER ([[StreamingUrlFrontier]]): each canonical URL admits
  *     once per refresh interval; variant storms suppress in state.
  *  2. ROBOTS GATE ([[gate]]): admitted URLs pass the RFC 9309
  *     most-specific-match verdict against a static rules frame —
  *     the `robots_wildcard` semantics (patterns with `*`/`$`,
  *     specificity = 2·length + allow-bit, no-rule → allow).
  *  3. POLITENESS ([[PolitenessLimiter]]): allowed admits space out
  *     per host — fetch now, defer to the GCRA slot, or drop on
  *     queue overflow.
  *
  * The gate deliberately carries NO streaming aggregation: the rules
  * frame pre-collapses to one array row per domain (batch-side,
  * domains-sized, broadcast into the stream-static join), and the
  * verdict is a per-row `aggregate` lambda over the ≤ rules-per-domain
  * array — so the stream stays a chain of stateful transforms + maps
  * that Spark can run in ONE query, and at scale the gate costs one
  * broadcast join however fast the frontier admits.
  *
  * Scale shape: each phase keeps its own bound — frontier state is
  * the live admit window, gate state is zero, limiter state is one
  * bucket + ≤ maxPending parked rows per host. Watermarks propagate
  * through both stateful operators, so releases stay deterministic
  * under replay (CrawlSchedulerSpec pins the composed admit / gate /
  * fetch / release / drop counts on one scripted schedule).
  */
object CrawlScheduler {

  /** Rules frame columns: domain, pattern (RFC 9309 grammar), allow.
    * Pre-collapses to one row per domain with the LIKE-translated
    * patterns and specificity keys — the broadcastable gate side. */
  def compileRules(rules: DataFrame): DataFrame =
    rules
      .withColumn("lp", expr(
        "CASE WHEN pattern LIKE '%$'" +
          " THEN replace(substring(pattern, 1, length(pattern) - 1)," +
          " '*', '%')" +
          " ELSE replace(pattern, '*', '%') || '%' END"))
      .withColumn("spec", expr(
        "CAST(length(pattern) * 2 + IF(allow, 1, 0) AS BIGINT)"))
      .groupBy("domain")
      .agg(collect_list(struct(col("lp"), col("spec"), col("allow")))
        .as("rules"))

  /** Filters a frame carrying `canonicalUrl` down to robots-allowed
    * rows. `compiled` is [[compileRules]]' output. Works on streams
    * (stream-static left join + per-row lambda, no aggregation) and
    * on batch frames alike. A URL whose domain has no rules is
    * allowed (RFC 9309: no applicable rule → crawl permitted). */
  def gate(admits: DataFrame, compiled: DataFrame): DataFrame =
    admits
      .withColumn("host",
        lower(regexp_extract(col("canonicalUrl"),
          "^https?://([^/:#]+)", 1)))
      .withColumn("domain",
        regexp_replace(col("host"), "^(www|cdn)\\.", ""))
      .withColumn("path",
        regexp_extract(col("canonicalUrl"),
          "^https?://[^/#]+(/[^#]*)", 1))
      .join(broadcast(compiled), Seq("domain"), "left")
      .withColumn("robots_allowed", coalesce(expr(
        "aggregate(filter(rules, r -> path LIKE r.lp)," +
          " named_struct('spec', CAST(-1 AS BIGINT), 'allow', true)," +
          " (acc, r) -> IF(r.spec > acc.spec," +
          " named_struct('spec', r.spec, 'allow', r.allow), acc)" +
          ").allow"), lit(true)))
      .filter(col("robots_allowed"))
      .drop("rules", "robots_allowed", "host", "path")

  /** The composed scheduler: raw sightings in, fetch decisions out.
    * See the object scaladoc for the three phases and their bounds. */
  def schedule(urls: Dataset[StreamingUrlFrontier.SeenUrl],
      rules: DataFrame, ttlUs: Long, gapUs: Long, burst: Int = 1,
      maxPending: Int = 64, maxDelay: String = "10 minutes")
      : Dataset[PolitenessLimiter.FetchDecision] = {
    val compiled = compileRules(rules)
    val admits = StreamingUrlFrontier.frontier(urls, ttlUs, maxDelay)
      .toDF()
      .filter(col("kind") === "admit")
    val allowed = gate(admits, compiled)
    val reqs = allowed
      .select(col("canonicalUrl").as("url"), col("tsUs"))
      .as[PolitenessLimiter.FetchRequest](
        org.apache.spark.sql.Encoders.product[
          PolitenessLimiter.FetchRequest])
    PolitenessLimiter.limit(reqs, gapUs, burst, maxPending, maxDelay,
      inheritWatermark = true)
  }
}
