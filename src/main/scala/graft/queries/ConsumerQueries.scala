package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Sequencing
import graft.sources.Tables

/** Queries exercising the stream-consumer operator clusters (SURVEY §2)
  * against the driver's test tables, each paired with an ANSI-SQL oracle
  * in [[oracle]]. The `events` table stands in for a decoded micro-batch:
  * `event_id` ≡ arrival order, `user_id` ≡ message key, `ts`+`event_id` ≡
  * the multi-part sequence number, `props` ≡ the raw JSON message payload.
  */
object ConsumerQueries {

  /** Per-shard window: synthetic shard id so the plan scales by
    * partitioning rather than a single global sort (SURVEY §7.4: per-key
    * chains must not repartition(1)). `ts` arrives as an epoch-nano long
    * (nanosAsLong) and is ordered at full nanosecond precision — the
    * DuckDB oracle's TIMESTAMP_NS comparison is also ns-exact, so both
    * sides tie-break identically. */
  private def withShard(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("shard_id",
        concat(lit("S|"), pmod(col("user_id"), lit(4)).cast("string")))

  val all: Map[String, Q] = Map(
    // §2.7 aggregation baseline (TPC-H Q1 flavor) — decimal-exact sums.
    "q1_agg" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          decSum(col("l_quantity")).as("sum_qty"),
          decSum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) *
            (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          decAvg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // D2 decode: JSON payload extraction (schemaless message → columns).
    "decode_json" -> { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("prop_k"),
          col("event_type"), col("value"))
        .orderBy("event_id")
    },

    // D2 decode: Base64 → UTF-8 round trip (the wire decode itself).
    "decode_base64" -> { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          base64(encode(col("props"), "UTF-8")).as("data_b64"),
          decode(unbase64(base64(encode(col("props"), "UTF-8"))), "UTF-8")
            .as("payload"))
        .orderBy("event_id")
    },

    // I1 identify: MD5 digests + pipe-joined id/key strings (§1.1).
    "identify_ids" -> { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          md5(col("props").cast("binary")).as("md5_data"),
          concat_ws("|",
            concat(lit("id1:"), col("event_id")),
            concat(lit("id2:"), col("event_type"))).as("id"),
          concat_ws("|", concat(lit("k1:"), col("user_id"))).as("key"),
          concat_ws("|",
            concat(lit("n1:"), expr("ts div 1000")),
            concat(lit("n2:"), col("event_id"))).as("seqNo"))
        .orderBy("event_id")
    },

    // Q5 sequencing per key: one chain per user, prev/next links,
    // heads marked — the reference's core ordering semantic.
    "seq_per_key" -> { (s, dir) =>
      val e = withShard(Tables.events(s, dir))
      Sequencing.perKey(e, col("shard_id"), Seq(col("user_id")),
          Seq(col("ts")), col("event_id"))
        .select(col("event_id"), col("shard_id"), col("user_id"),
          col("seq_rn"), col("prev_id"), col("next_id"),
          col("is_first_to_process"))
        .orderBy("event_id")
    },

    // Q4 sequencing per shard: total order within a shard.
    "seq_per_shard" -> { (s, dir) =>
      val e = withShard(Tables.events(s, dir))
      Sequencing.perShard(e, col("shard_id"), Seq(col("ts")),
          col("event_id"))
        .select(col("event_id"), col("shard_id"), col("seq_rn"),
          col("prev_id"), col("next_id"))
        .orderBy("event_id")
    })

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS DOUBLE) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "decode_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
        |  event_type, value
        |FROM events ORDER BY event_id""".stripMargin,
    "decode_base64" ->
      """SELECT event_id,
        |  to_base64(encode(props)) AS data_b64,
        |  decode(from_base64(to_base64(encode(props)))) AS payload
        |FROM events ORDER BY event_id""".stripMargin,
    "identify_ids" ->
      """SELECT event_id,
        |  md5(props) AS md5_data,
        |  concat_ws('|', 'id1:' || event_id, 'id2:' || event_type) AS id,
        |  concat_ws('|', 'k1:' || user_id) AS key,
        |  concat_ws('|', 'n1:' || epoch_us(ts), 'n2:' || event_id) AS seqNo
        |FROM events ORDER BY event_id""".stripMargin,
    "seq_per_key" ->
      """SELECT event_id,
        |  'S|' || (user_id % 4) AS shard_id, user_id,
        |  CAST(ROW_NUMBER() OVER w AS INT) AS seq_rn,
        |  LAG(event_id) OVER w AS prev_id,
        |  LEAD(event_id) OVER w AS next_id,
        |  (ROW_NUMBER() OVER w = 1) AS is_first_to_process
        |FROM events
        |WINDOW w AS (PARTITION BY user_id % 4, user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    "seq_per_shard" ->
      """SELECT event_id,
        |  'S|' || (user_id % 4) AS shard_id,
        |  CAST(ROW_NUMBER() OVER w AS INT) AS seq_rn,
        |  LAG(event_id) OVER w AS prev_id,
        |  LEAD(event_id) OVER w AS next_id
        |FROM events
        |WINDOW w AS (PARTITION BY user_id % 4 ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin)
}
