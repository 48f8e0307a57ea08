package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Governance + warehouse-operations tier: the queries a data-platform
  * team runs AROUND the training pipeline — right-to-be-forgotten
  * sweeps, re-identification (l-diversity) audits, slowly-changing
  * dimension builds, load seasonality, hot-key salting advisories and
  * blocked fuzzy matching. Every query follows the engine's oracle
  * discipline: integer / exact-decimal arithmetic (or ONE shared SQL
  * string when a double expression is unavoidable) so Spark and DuckDB
  * produce hash-identical frames, and every shape is the one a
  * 1000-executor deployment wants — broadcast semi-joins for small
  * driven sets, partial-aggregable rollups, TakeOrdered top-k, and
  * bounded window partitions.
  */
object OpsQueries {

  /** Deterministic stand-in for the GDPR tombstone list: a user is
    * tombstoned iff the first md5 byte of "erase:<id>" is below 0x18
    * (~9%: 14 users at sf0.01, and still ≥1 in the 15-user sf0.001
    * smoke fixture). Production swaps this derived frame for an actual
    * deletion-request table; every downstream shape is unchanged
    * because the sweep only sees a small keyed frame. */
  private def tombstones(e: DataFrame): DataFrame =
    e.select(col("user_id")).distinct()
      .filter(substring(md5(concat(lit("erase:"),
        col("user_id").cast("string"))), 1, 2) < "18")

  val all: Map[String, Q] = Map(

    // Right-to-be-forgotten SWEEP — the purge manifest a deletion job
    // executes and the audit trail it files: for every tombstoned
    // user, how many events, how many distinct types, the time span,
    // and the exact-decimal monetary total being erased. The
    // tombstone list is tiny by nature (deletion requests, not
    // users), so it BROADCASTS into a left-semi join against the
    // event scan — one pass over the fact table, partial-aggregable
    // rollup, no shuffle bigger than the tombstoned slice. At 100 TB
    // the same plan holds: the scan dominates, and the manifest is
    // requests-sized.
    "erasure_sweep" -> { (s, dir) =>
      val e = Tables.events(s, dir)
      e.join(broadcast(tombstones(e)), Seq("user_id"), "left_semi")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_type")).as("n_types"),
          min(expr("ts div 1000")).as("first_us"),
          max(expr("ts div 1000")).as("last_us"),
          decSum(col("value")).as("value_sum"))
        .orderBy("user_id")
    },

    // l-DIVERSITY audit — k-anonymity's sequel (Machanavajjhala et
    // al., ICDE'06): a quasi-identifier group can be large (k-safe)
    // yet still leak if every member shares ONE sensitive value.
    // Quasi-identifiers here are (source, 50-char length bucket); the
    // sensitive attribute is lang. Per group l = distinct sensitive
    // values; the report buckets groups by l — l=1 groups are the
    // leaks. Two cascaded shrinking aggregates, the k_anonymity_report
    // shape with a distinct-count in the middle.
    "l_diversity_report" -> { (s, dir) =>
      val groups = Tables.documents(s, dir)
        .groupBy(col("source"), expr("n_chars div 50").as("len_bucket"))
        .agg(count(lit(1)).as("k"),
          countDistinct(col("lang")).as("l"))
      groups.groupBy("l")
        .agg(count(lit(1)).as("n_groups"), sum("k").as("n_docs"),
          min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("l")
    },

    // SCD TYPE-2 dimension build — the warehouse pattern for "what
    // was this customer's priority WHEN the order shipped":
    // gaps-and-islands over each customer's order history collapses
    // runs of equal priority into validity intervals
    // [valid_from, valid_to) with an open current row. Change
    // detection is one lag window, interval closing one lead window —
    // both over the SAME (custkey | orderdate, orderkey)
    // partitioning, so Catalyst runs them in a single sort. Window
    // partitions are per-customer (bounded by one customer's
    // orders), and the custkey%100 sample filter pushes below the
    // window into the scan — the build itself is all-customer safe.
    "scd2_dimension" -> { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val changes = Tables.orders(s, dir)
        .filter(pmod(col("o_custkey"), lit(100)) === 0)
        .withColumn("prev_pri", lag(col("o_orderpriority"), 1).over(w))
        .filter(col("prev_pri").isNull ||
          col("prev_pri") =!= col("o_orderpriority"))
      changes
        .withColumn("version", row_number().over(w))
        .withColumn("valid_to", lead(col("o_orderdate"), 1).over(w))
        .select(col("o_custkey"), col("version"),
          col("o_orderpriority").as("priority"),
          col("o_orderdate").as("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"))
        .orderBy("o_custkey", "version")
    },

    // TPC-H Q18 shape (large-volume orders): the classic
    // agg-then-join — per-order quantity totals in exact decimal,
    // TakeOrdered top-20 (per-partition heaps, never a global sort),
    // and only THEN the 20-row frame broadcast into orders ⋈
    // customer. Joining before aggregating (the naive plan) would
    // shuffle every lineitem row with its order payload; this plan's
    // joins move 20 rows.
    "q18_big_orders" -> { (s, dir) =>
      val top = Tables.lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(decSum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("sum_qty").desc, col("l_orderkey")).limit(20)
      Tables.orders(s, dir)
        .join(broadcast(top), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.customer(s, dir)),
          col("o_custkey") === col("c_custkey"))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("sum_qty").desc, col("l_orderkey"))))
        .select("rank", "c_name", "l_orderkey", "o_orderdate",
          "o_totalprice", "sum_qty")
        .orderBy("rank")
    },

    // Load SEASONALITY profile — the hour-of-week heatmap behind
    // capacity planning: event volume per (day-of-week, hour-of-day)
    // cell plus its integer-ppm share of total traffic. Day-of-week
    // comes from epoch-day arithmetic ((days + 4) mod 7, anchored on
    // 1970-01-01 = Thursday) rather than either engine's dayofweek()
    // — those disagree on week start, the arithmetic cannot. One
    // partial-aggregable 168-cell rollup plus a broadcast 1-row
    // total.
    "seasonality_profile" -> { (s, dir) =>
      val e = Tables.events(s, dir)
        .select(expr("(ts div 1000 div 86400000000 + 4) % 7").as("dow"),
          expr("(ts div 1000 div 3600000000) % 24").as("hour_of_day"))
      val cells = e.groupBy("dow", "hour_of_day")
        .agg(count(lit(1)).as("n"))
      val total = e.agg(count(lit(1)).as("n_total"))
      cells.crossJoin(broadcast(total))
        .select(col("dow"), col("hour_of_day"), col("n"),
          expr("n * 1000000 div n_total").as("ppm"))
        .orderBy("dow", "hour_of_day")
    },

    // Hot-key SALTING advisor — turns shard_skew_report/hot_keys
    // observations into the action an on-call takes: for every key
    // above 7.5‰ of traffic, the salt fan-out that brings each
    // (key, salt) cell under the 5‰ target, ceiling-divided in exact
    // integers, plus the verified post-salt share. Runs the two-pass
    // Misra-Gries heavy-hitter shape (capacity-bounded exchange at
    // ANY key cardinality) — the advisory arithmetic is free once the
    // exact recount exists.
    "salt_advisor" -> { (s, dir) =>
      graft.operators.HeavyHitters.hotKeys(
          Tables.events(s, dir), col("user_id"), thresholdPpm = 7500L,
          capacity = 1024)
        .select(col("k").as("user_id"), col("n_events"),
          expr("n_events * 1000 div n_total").as("permille"),
          expr("(n_events * 200 + n_total - 1) div n_total")
            .as("salt_factor"),
          expr("n_events * 1000 div " +
            "(((n_events * 200 + n_total - 1) div n_total) * n_total)")
            .as("post_permille"))
        .orderBy(col("n_events").desc, col("user_id").asc)
    },

    // Blocked FUZZY match — entity resolution's workhorse: candidate
    // pairs from cheap blocking keys (first and last word of the
    // name), then exact Levenshtein ≤ 2 verification on the
    // candidates only. The block join is an equi-join on word keys —
    // never all-pairs — and the distinct name set it runs on is the
    // dictionary (tiny vs the fact table), the standard shape when
    // deduplicating catalog/vendor name columns at scale. Both
    // engines implement unit-cost Levenshtein, so the verified
    // distance is engine-exact.
    "fuzzy_name_pairs" -> { (s, dir) =>
      val names = Tables.part(s, dir)
        .select(col("p_name").as("name")).distinct()
      val keyed = names.select(col("name"),
          explode(array(substring_index(col("name"), " ", 1),
            substring_index(col("name"), " ", -1))).as("blk"))
        .distinct()
      keyed.as("x").join(keyed.as("y"),
          col("x.blk") === col("y.blk") && col("x.name") < col("y.name"))
        .select(col("x.name").as("name_a"), col("y.name").as("name_b"))
        .distinct()
        .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
        .filter(col("dist") <= 2)
        .orderBy("name_a", "name_b")
    })

  val oracle: Map[String, String] = Map(

    "erasure_sweep" ->
      """WITH tomb AS (
        |  SELECT DISTINCT user_id FROM events
        |  WHERE substr(md5('erase:' || CAST(user_id AS VARCHAR)), 1, 2)
        |    < '18'
        |)
        |SELECT user_id, COUNT(*) AS n_events,
        |  COUNT(DISTINCT event_type) AS n_types,
        |  MIN(epoch_us(ts)) AS first_us,
        |  MAX(epoch_us(ts)) AS last_us,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |FROM events JOIN tomb USING (user_id)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "l_diversity_report" ->
      """WITH g AS (
        |  SELECT source, n_chars // 50 AS len_bucket, COUNT(*) AS k,
        |    COUNT(DISTINCT lang) AS l
        |  FROM documents GROUP BY 1, 2
        |)
        |SELECT l, COUNT(*) AS n_groups, CAST(SUM(k) AS BIGINT) AS n_docs,
        |  MIN(k) AS min_k, MAX(k) AS max_k
        |FROM g GROUP BY l ORDER BY l""".stripMargin,

    "scd2_dimension" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
        |    LAG(o_orderpriority) OVER w AS prev_pri
        |  FROM orders WHERE o_custkey % 100 = 0
        |  WINDOW w AS (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey)
        |), ch AS (
        |  SELECT * FROM o
        |  WHERE prev_pri IS NULL OR prev_pri <> o_orderpriority
        |), v AS (
        |  SELECT o_custkey, CAST(ROW_NUMBER() OVER w AS INT) AS version,
        |    o_orderpriority AS priority, o_orderdate AS valid_from,
        |    LEAD(o_orderdate) OVER w AS valid_to
        |  FROM ch
        |  WINDOW w AS (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey)
        |)
        |SELECT o_custkey, version, priority, valid_from, valid_to,
        |  valid_to IS NULL AS is_current
        |FROM v ORDER BY o_custkey, version""".stripMargin,

    "q18_big_orders" ->
      """WITH q AS (
        |  SELECT l_orderkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |), t AS (
        |  SELECT * FROM q ORDER BY sum_qty DESC, l_orderkey LIMIT 20
        |)
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY sum_qty DESC, l_orderkey)
        |    AS INT) AS rank,
        |  c_name, l_orderkey, o_orderdate, o_totalprice, sum_qty
        |FROM t JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |ORDER BY rank""".stripMargin,

    "seasonality_profile" ->
      """WITH e AS (
        |  SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
        |    (epoch_us(ts) // 3600000000) % 24 AS hour_of_day
        |  FROM events
        |), c AS (
        |  SELECT dow, hour_of_day, COUNT(*) AS n FROM e GROUP BY 1, 2
        |), t AS (SELECT COUNT(*) AS n_total FROM e)
        |SELECT dow, hour_of_day, n,
        |  CAST(n * 1000000 // t.n_total AS BIGINT) AS ppm
        |FROM c CROSS JOIN t
        |ORDER BY dow, hour_of_day""".stripMargin,

    "salt_advisor" ->
      """WITH tot AS (SELECT COUNT(*) AS n FROM events)
        |SELECT user_id, COUNT(*) AS n_events,
        |  CAST(COUNT(*) * 1000 // t.n AS BIGINT) AS permille,
        |  CAST((COUNT(*) * 200 + t.n - 1) // t.n AS BIGINT)
        |    AS salt_factor,
        |  CAST(COUNT(*) * 1000 //
        |    (((COUNT(*) * 200 + t.n - 1) // t.n) * t.n) AS BIGINT)
        |    AS post_permille
        |FROM events CROSS JOIN tot t
        |GROUP BY user_id, t.n
        |HAVING COUNT(*) * 1000000 >= 7500 * t.n
        |ORDER BY n_events DESC, user_id ASC""".stripMargin,

    "fuzzy_name_pairs" ->
      """WITH n AS (SELECT DISTINCT p_name AS name FROM part),
        |k AS (
        |  SELECT DISTINCT name, unnest([
        |    string_split(name, ' ')[1], string_split(name, ' ')[-1]
        |  ]) AS blk FROM n
        |), p AS (
        |  SELECT DISTINCT x.name AS name_a, y.name AS name_b
        |  FROM k x JOIN k y ON x.blk = y.blk AND x.name < y.name
        |)
        |SELECT name_a, name_b,
        |  CAST(levenshtein(name_a, name_b) AS INT) AS dist
        |FROM p WHERE levenshtein(name_a, name_b) <= 2
        |ORDER BY name_a, name_b""".stripMargin)
}
