package graft.operators

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, batched decode / feature-extraction
  * over `mapPartitions`, and frame sampling as pure column ops.
  *
  * The DECODE STEP IS A STUB: real pipelines call image/audio codecs
  * (not available in this environment), so [[decodeStub]] derives
  * deterministic features from the raw bytes instead. Everything around
  * it — schemas, the partition-batched execution shape, feature output
  * types — is the real plumbing a codec would drop into.
  *
  * Scale design: decode is per-row CPU work with heavyweight per-batch
  * setup (codec contexts). `mapPartitions` + `grouped(batchSize)` gives
  * the codec one context per batch and keeps peak memory at
  * batch × frame size, independent of partition size. Feature columns
  * come back as fixed-shape primitives, so everything downstream is
  * columnar again.
  */
object Multimodal {

  /** One media row: the payload stays opaque bytes end-to-end. */
  final case class MediaRecord(id: Long, media_type: String,
      payload: Array[Byte])

  /** Fixed-shape decoded features (what a real codec would emit:
    * dimensions, duration, channel stats, …). */
  final case class MediaFeatures(id: Long, media_type: String,
      n_bytes: Int, first_byte: Int, last_byte: Int, byte_sum: Long,
      mean_byte: Double)

  /** STUB decode — deterministic byte statistics standing in for a real
    * image/audio decode. Replace the body with the codec call; the
    * signature and batching contract stay. */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val bytes = r.payload
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xFF; i += 1 }
    MediaFeatures(r.id, r.media_type, bytes.length,
      if (bytes.nonEmpty) bytes(0) & 0xFF else -1,
      if (bytes.nonEmpty) bytes(bytes.length - 1) & 0xFF else -1,
      sum,
      if (bytes.nonEmpty) sum.toDouble / bytes.length else 0.0)
  }

  /** Partition-batched decode: one decoder context per `batchSize`
    * rows. */
  def decodeFeatures(media: Dataset[MediaRecord],
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // real pipeline: open codec context once per batch here
        batch.iterator.map(decodeStub)
      }
    }
  }

  /** Frame sampling as a pure column op: fixed-size frames from the
    * payload, keeping every `stride`-th frame. Runs before decode so
    * only sampled frames ever reach the codec — at 100 TB this is the
    * difference between decoding 3% of bytes and all of them. */
  def sampleFrames(payload: Column, frameBytes: Int, stride: Int): Column = {
    val nFrames = ceil(length(payload) / lit(frameBytes.toDouble)).cast("int")
    val idx = filter(sequence(lit(0), nFrames - 1),
      i => i % stride === 0)
    transform(idx, i =>
      payload.substr(i * frameBytes + 1, lit(frameBytes)))
  }
}
