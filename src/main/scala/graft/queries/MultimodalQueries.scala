package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal plumbing queries: deterministic BMP/WAV/PNG containers
  * synthesized per document (dims/rates derived from `doc_id`, audio
  * payload size from the text length — the sandbox ships no media
  * files), pushed through the REAL decode path — `Dataset[MediaRecord]`
  * → partition-batched `mapPartitions` decode → byte-level header
  * parse → typed feature rows. The oracle re-derives the parsed
  * features from the same doc_id/length formulas, so the synth→parse
  * roundtrip is what's actually checked. */
object MultimodalQueries {

  val all: Map[String, Q] = Map(

    // Batched decode/feature-extraction over binary payloads; four
    // REAL container classes (BMP, WAV, PNG, JPEG by doc_id mod 4) so
    // the unknown-container all-null path is pinned against positives
    // from four distinct parsers (LE structs, RIFF chunk walk, BE
    // chunks + CRC, and the JPEG marker-segment walk — SOF0 and SOF2
    // alternating by id so both baseline and progressive frame
    // headers stay under the oracle).
    "multimodal_features" -> { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id").cast("long").as("id"),
          length(col("text")).as("tlen"))
        .as[(Long, Int)]
        .map { case (id, tlen) =>
          if (id % 4 == 0)
            Multimodal.MediaRecord(id, "image",
              Multimodal.makeBmp((id % 16 + 1).toInt, (id % 8 + 1).toInt))
          else if (id % 4 == 1)
            Multimodal.MediaRecord(id, "audio",
              Multimodal.makeWav((8000 + (id / 4 % 4) * 4000).toInt,
                (((id - 1) / 4) % 2 + 1).toInt, tlen))
          else if (id % 4 == 2)
            Multimodal.MediaRecord(id, "image",
              Multimodal.makePng((id % 16 + 1).toInt, (id % 8 + 1).toInt))
          else
            Multimodal.MediaRecord(id, "image",
              Multimodal.makeJpeg((id % 16 + 1).toInt, (id % 8 + 1).toInt,
                progressive = (id / 4) % 2 == 1))
        }
      Multimodal.decodeFeatures(media, batchSize = 64)
        .toDF()
        .orderBy("id")
    },

    // Pixel-level resize: parse dims → nearest-neighbor downsample to
    // half → re-encode → re-parse. The oracle re-derives the resized
    // header facts from the synthesis formulas, so what's checked is
    // the full parse→transform→encode→parse roundtrip; pixel-value
    // correctness is pinned byte-for-byte in MultimodalSpec.
    "multimodal_resize" -> { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id").cast("long").as("id"))
        .as[Long]
        .map { id =>
          Multimodal.MediaRecord(id, "image",
            Multimodal.makeBmp((id % 16 + 1).toInt, (id % 8 + 1).toInt))
        }
      val resized = media.map { r =>
        val f = Multimodal.decode(r)
        Multimodal.MediaRecord(r.id, r.media_type,
          Multimodal.resizeBmp(r.payload,
            math.max(1, f.width.get / 2), math.max(1, f.height.get / 2)))
      }
      Multimodal.decodeFeatures(resized, batchSize = 64)
        .toDF()
        .select("id", "media_type", "n_bytes", "width", "height",
          "channels")
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
      """WITH f AS (
        |  SELECT doc_id AS id, length(text) AS tlen,
        |    CAST(doc_id % 16 + 1 AS INT) AS w,
        |    CAST(doc_id % 8 + 1 AS INT) AS h,
        |    CAST(8000 + (doc_id // 4 % 4) * 4000 AS INT) AS sr,
        |    CAST(((doc_id - 1) // 4) % 2 + 1 AS INT) AS ch
        |  FROM documents
        |)
        |SELECT id,
        |  CASE WHEN id % 4 = 1 THEN 'audio' ELSE 'image' END
        |    AS media_type,
        |  CASE WHEN id % 4 = 0
        |    THEN CAST(54 + ((w * 3 + 3) // 4) * 4 * h AS INT)
        |    WHEN id % 4 = 1
        |    THEN CAST(44 + tlen - tlen % (ch * 2) AS INT)
        |    WHEN id % 4 = 2 THEN 45
        |    ELSE 41
        |  END AS n_bytes,
        |  CASE WHEN id % 4 <> 1 THEN w END AS width,
        |  CASE WHEN id % 4 <> 1 THEN h END AS height,
        |  CASE WHEN id % 4 = 1 THEN ch ELSE 3 END AS channels,
        |  CASE WHEN id % 4 = 1 THEN sr END AS sample_rate,
        |  CASE WHEN id % 4 = 1
        |    THEN CAST(tlen - tlen % (ch * 2) AS DOUBLE) * 1000.0
        |      / (sr * ch * 2)
        |  END AS duration_ms
        |FROM f ORDER BY id""".stripMargin,
    "multimodal_resize" ->
      """WITH f AS (
        |  SELECT doc_id AS id,
        |    CAST(doc_id % 16 + 1 AS INT) AS w,
        |    CAST(doc_id % 8 + 1 AS INT) AS h
        |  FROM documents
        |), r AS (
        |  SELECT id, GREATEST(w // 2, 1) AS rw, GREATEST(h // 2, 1) AS rh
        |  FROM f
        |)
        |SELECT id, 'image' AS media_type,
        |  CAST(54 + ((rw * 3 + 3) // 4) * 4 * rh AS INT) AS n_bytes,
        |  CAST(rw AS INT) AS width, CAST(rh AS INT) AS height,
        |  CAST(3 AS INT) AS channels
        |FROM r ORDER BY id""".stripMargin,
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
