package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal plumbing queries: document text re-encoded as the opaque
  * binary payload (the texts are ASCII, so the byte-level oracle can be
  * derived in SQL), pushed through the REAL decode path —
  * `Dataset[MediaRecord]` → partition-batched `mapPartitions` decode →
  * typed feature rows. Only the codec call inside the stub is fake. */
object MultimodalQueries {

  val all: Map[String, Q] = Map(

    // Batched decode/feature-extraction over binary payloads.
    "multimodal_features" -> { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id").as("id"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            pmod(col("doc_id"), lit(3)).cast("int") + 1).as("media_type"),
          encode(col("text"), "UTF-8").as("payload"))
        .as[Multimodal.MediaRecord]
      Multimodal.decodeFeatures(media, batchSize = 64)
        .toDF()
        .orderBy("id")
    },

    // Frame sampling before decode: 16-byte frames, every 4th kept.
    "multimodal_frames" -> { (s, dir) =>
      val frames = Multimodal.sampleFrames(col("text"), frameBytes = 16,
        stride = 4)
      Tables.documents(s, dir)
        .select(col("doc_id"),
          size(frames).as("n_sampled"),
          md5(element_at(frames, 1).cast("binary")).as("frame0_md5"))
        .orderBy("doc_id")
    })

  val oracle: Map[String, String] = Map(
    "multimodal_features" ->
      """WITH b AS (
        |  SELECT doc_id AS id,
        |    ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1]
        |      AS media_type,
        |    text, length(text) AS n,
        |    list_sum(list_transform(range(1, length(text) + 1),
        |      i -> ascii(substr(text, CAST(i AS INT), 1)))) AS byte_sum
        |  FROM documents
        |)
        |SELECT id, media_type, CAST(n AS INT) AS n_bytes,
        |  ascii(substr(text, 1, 1)) AS first_byte,
        |  ascii(substr(text, CAST(n AS INT), 1)) AS last_byte,
        |  CAST(byte_sum AS BIGINT) AS byte_sum,
        |  CAST(byte_sum AS DOUBLE) / n AS mean_byte
        |FROM b ORDER BY id""".stripMargin,
    "multimodal_frames" ->
      """WITH f AS (
        |  SELECT doc_id, text,
        |    list_filter(range(0, CAST(ceil(length(text) / 16.0) AS INT)),
        |      i -> i % 4 = 0) AS idx
        |  FROM documents
        |)
        |SELECT doc_id, CAST(len(idx) AS INT) AS n_sampled,
        |  md5(substr(text, 1, 16)) AS frame0_md5
        |FROM f ORDER BY doc_id""".stripMargin)
}
