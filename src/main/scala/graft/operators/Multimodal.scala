package graft.operators

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, batched decode / feature-extraction
  * over `mapPartitions`, and frame sampling as pure column ops.
  *
  * The decode step is a REAL pure-JVM container parse — BMP headers
  * (width / height / channels), PNG signature + IHDR (width / height /
  * color-type channels), JPEG marker-segment walk to SOF0/SOF2
  * (width / height / components), and WAV RIFF chunks (sample rate /
  * channels / duration) — over fixture bytes synthesized by
  * [[makeBmp]]/[[makeWav]]/[[makePng]]/[[makeJpeg]] (this sandbox
  * ships no media files or codec libraries, so the fixtures stand in
  * for upstream media; the parse itself is byte-level and
  * format-faithful). A production deployment swaps the parse body for
  * a full codec (pixel-level JPEG, FLAC, …) — the schemas, the
  * partition-batched execution shape, and the fixed-shape feature
  * output are exactly what that codec drops into.
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

  /** Fixed-shape parsed features. Container-specific fields are null
    * for the other container (width/height: BMP; sample_rate /
    * duration_ms: WAV; channels: both — BMP bits-per-pixel / 8, WAV
    * channel count). An unrecognized container yields all-null parsed
    * fields — the caller's dead-letter decision, not the decoder's. */
  final case class MediaFeatures(id: Long, media_type: String,
      n_bytes: Int, width: Option[Int], height: Option[Int],
      channels: Option[Int], sample_rate: Option[Int],
      duration_ms: Option[Double])

  // ---- little-endian readers (BMP and RIFF are both LE) ----
  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFF).toLong | ((b(o + 1) & 0xFF).toLong << 8) |
      ((b(o + 2) & 0xFF).toLong << 16) | ((b(o + 3) & 0xFF).toLong << 24)
  // ---- big-endian readers (PNG and JPEG are network byte order) ----
  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFF).toLong << 24) | ((b(o + 1) & 0xFF).toLong << 16) |
      ((b(o + 2) & 0xFF).toLong << 8) | (b(o + 3) & 0xFF).toLong

  private val PngSig: Array[Int] =
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  /** PNG color type → samples per pixel (PNG spec §11.2.2): gray 1,
    * RGB 3, palette-indexed 1, gray+alpha 2, RGBA 4; anything else is
    * malformed (null channels, dims still reported). */
  private def pngChannels(colorType: Int): Option[Int] = colorType match {
    case 0 => Some(1); case 2 => Some(3); case 3 => Some(1)
    case 4 => Some(2); case 6 => Some(4); case _ => None
  }

  /** Real header parse: BMP (BITMAPINFOHEADER), PNG (signature +
    * IHDR), JPEG (marker walk to SOF0/SOF2), or WAV (RIFF/WAVE fmt +
    * data chunks). Byte-level and allocation-free — the per-row hot
    * path a 100 TB decode stage actually runs. */
  def decode(r: MediaRecord): MediaFeatures = {
    val b = r.payload
    if (b.length >= 54 && b(0) == 'B'.toByte && b(1) == 'M'.toByte) {
      // BMP: DIB header at 14; width/height at 18/22 (signed, but the
      // fixtures never emit negatives), bits-per-pixel at 28
      val width = u32(b, 18).toInt
      val height = u32(b, 22).toInt
      val bpp = u16(b, 28)
      MediaFeatures(r.id, r.media_type, b.length, Some(width),
        Some(height), Some(bpp / 8), None, None)
    } else if (b.length >= 33 &&
        (0 until 8).forall(i => (b(i) & 0xFF) == PngSig(i)) &&
        b(12) == 'I'.toByte && b(13) == 'H'.toByte &&
        b(14) == 'D'.toByte && b(15) == 'R'.toByte) {
      // PNG: IHDR is mandated first (spec §5.6) — width/height at
      // 16/20 (big-endian), color type at 25
      val width = be32(b, 16).toInt
      val height = be32(b, 20).toInt
      MediaFeatures(r.id, r.media_type, b.length, Some(width),
        Some(height), pngChannels(b(25) & 0xFF), None, None)
    } else if (b.length >= 4 && (b(0) & 0xFF) == 0xFF &&
        (b(1) & 0xFF) == 0xD8) {
      // JPEG: walk marker segments from SOI to the first SOF0
      // (baseline) / SOF2 (progressive) frame header — big-endian
      // precision(1) height(2) width(2) components(1). Standalone
      // markers (TEM, RSTn, SOI, EOI) carry no length; the walk stops
      // at SOS (entropy-coded data follows, headers cannot) or any
      // malformed segment (→ all-null parsed fields, the caller's
      // dead-letter decision as with the other containers)
      var o = 2
      var width = -1; var height = -1; var comps = -1
      var done = false
      while (!done && o + 2 <= b.length) {
        if ((b(o) & 0xFF) != 0xFF) done = true
        else {
          val m = b(o + 1) & 0xFF
          if (m == 0xFF) o += 1 // fill byte before a marker
          else if (m == 0x01 || (m >= 0xD0 && m <= 0xD9)) o += 2
          else if (o + 4 > b.length) done = true
          else {
            val segLen = be16(b, o + 2)
            if (segLen < 2 || o + 2 + segLen > b.length) done = true
            else if ((m == 0xC0 || m == 0xC2) && segLen >= 8) {
              height = be16(b, o + 5); width = be16(b, o + 7)
              comps = b(o + 9) & 0xFF
              done = true
            } else if (m == 0xDA) done = true
            else o += 2 + segLen
          }
        }
      }
      MediaFeatures(r.id, r.media_type, b.length,
        if (width > 0) Some(width) else None,
        if (height > 0) Some(height) else None,
        if (comps > 0) Some(comps) else None, None, None)
    } else if (b.length >= 44 && b(0) == 'R'.toByte && b(1) == 'I'.toByte
        && b(2) == 'F'.toByte && b(3) == 'F'.toByte
        && b(8) == 'W'.toByte && b(9) == 'A'.toByte
        && b(10) == 'V'.toByte && b(11) == 'E'.toByte) {
      // WAV: walk RIFF chunks for fmt (channels, sample rate, bits) and
      // data (payload size) — chunk order is NOT fixed by the spec
      var o = 12
      var channels = 0; var sampleRate = 0; var bits = 0
      var dataSize = -1L
      while (o + 8 <= b.length && (dataSize < 0 || sampleRate == 0)) {
        val size = u32(b, o + 4)
        if (b(o) == 'f'.toByte && b(o + 1) == 'm'.toByte &&
            b(o + 2) == 't'.toByte && b(o + 3) == ' '.toByte) {
          channels = u16(b, o + 10)
          sampleRate = u32(b, o + 12).toInt
          bits = u16(b, o + 22)
        } else if (b(o) == 'd'.toByte && b(o + 1) == 'a'.toByte &&
            b(o + 2) == 't'.toByte && b(o + 3) == 'a'.toByte) {
          dataSize = size
        }
        o += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
      }
      val byteRate = sampleRate.toLong * channels * (bits / 8)
      val durationMs =
        if (dataSize >= 0 && byteRate > 0)
          Some(dataSize * 1000.0 / byteRate)
        else None
      MediaFeatures(r.id, r.media_type, b.length, None, None,
        if (channels > 0) Some(channels) else None,
        if (sampleRate > 0) Some(sampleRate) else None, durationMs)
    } else
      MediaFeatures(r.id, r.media_type, b.length, None, None, None,
        None, None)
  }

  /** Partition-batched decode: one decoder context per `batchSize`
    * rows. */
  def decodeFeatures(media: Dataset[MediaRecord],
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // real pipeline: open codec context once per batch here
        batch.iterator.map(decode)
      }
    }
  }

  /** Synthesize a valid 24bpp BMP (54-byte header + 4-byte-aligned
    * rows) — the sandbox's stand-in for upstream image bytes. Pixels
    * are a deterministic gradient (channel c of pixel (x,y) =
    * `(x*7 + y*31 + c*101) mod 256`) so pixel-reading operators
    * ([[resizeBmp]]) have real content to verify against. The parse
    * path treats the output as opaque. */
  def makeBmp(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, "BMP dims must be positive")
    val rowSize = ((width * 3 + 3) / 4) * 4
    val dataSize = rowSize * height
    val out = new Array[Byte](54 + dataSize)
    def w16(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
    }
    def w32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    w32(2, out.length) // file size
    w32(10, 54)        // pixel-array offset
    w32(14, 40)        // BITMAPINFOHEADER size
    w32(18, width); w32(22, height)
    w16(26, 1)         // planes
    w16(28, 24)        // bits per pixel
    w32(34, dataSize)  // image size
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val o = 54 + y * rowSize + x * 3
        out(o) = ((x * 7 + y * 31) & 0xFF).toByte
        out(o + 1) = ((x * 7 + y * 31 + 101) & 0xFF).toByte
        out(o + 2) = ((x * 7 + y * 31 + 202) & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Nearest-neighbor resize of a 24bpp BMP payload — the pixel-level
    * transform of the multimodal tier (a production deployment swaps
    * the NN kernel for its codec's resampler; the parse → transform →
    * re-encode shape is the real plumbing). Pure byte walk, one output
    * allocation; returns null for payloads that are not 24bpp BMPs
    * (the caller's dead-letter decision, mirroring [[decode]]). */
  def resizeBmp(raw: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    require(targetW > 0 && targetH > 0, "target dims must be positive")
    if (raw == null || raw.length < 54 || raw(0) != 'B'.toByte ||
        raw(1) != 'M'.toByte || u16(raw, 28) != 24) return null
    val w = u32(raw, 18).toInt
    val h = u32(raw, 22).toInt
    val srcOff = u32(raw, 10).toInt
    val srcRow = ((w * 3 + 3) / 4) * 4
    if (w <= 0 || h <= 0 || srcOff + srcRow.toLong * h > raw.length)
      return null
    val out = makeBmp(targetW, targetH)
    val dstRow = ((targetW * 3 + 3) / 4) * 4
    var ty = 0
    while (ty < targetH) {
      val sy = (ty.toLong * h / targetH).toInt
      var tx = 0
      while (tx < targetW) {
        val sx = (tx.toLong * w / targetW).toInt
        val so = srcOff + sy * srcRow + sx * 3
        val to = 54 + ty * dstRow + tx * 3
        out(to) = raw(so); out(to + 1) = raw(so + 1)
        out(to + 2) = raw(so + 2)
        tx += 1
      }
      ty += 1
    }
    out
  }

  /** Synthesize a 24bpp BMP whose pixel content is SEEDED — same
    * container as [[makeBmp]], but channel c of pixel (x, y) is
    * `(x·7 + y·31 + s0 + s1·x + s2·y + c·101) mod 256` with
    * `(s0, s1, s2)` = the seed's three low base-256 digits. The seed
    * enters through per-axis multipliers (not a constant offset —
    * that would shift all pixels equally and leave every GRADIENT
    * comparison, hence every dHash, identical), so distinct seeds
    * below 2²⁴ produce distinct gradients while equal seeds
    * reproduce the image bit-for-bit. Closed-form integer arithmetic
    * throughout, so the DuckDB oracle re-derives any pixel — and
    * anything computed from pixels — exactly. */
  def makeBmpSeeded(width: Int, height: Int, seed: Int): Array[Byte] = {
    require(width > 0 && height > 0, "BMP dims must be positive")
    require(seed >= 0, "seed must be non-negative")
    val out = makeBmp(width, height)
    val rowSize = ((width * 3 + 3) / 4) * 4
    val s0 = seed % 256
    val s1 = (seed / 256) % 256
    val s2 = (seed / 65536) % 256
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val o = 54 + y * rowSize + x * 3
        val v0 = x * 7 + y * 31 + s0 + s1 * x + s2 * y
        out(o) = (v0 & 0xFF).toByte
        out(o + 1) = ((v0 + 101) & 0xFF).toByte
        out(o + 2) = ((v0 + 202) & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** 64-bit dHash (difference hash) of a 24bpp BMP — the standard
    * image near-duplicate fingerprint: downsample to a 9×8 grid
    * (through [[resizeBmp]], the tier's oracle-checked pixel
    * transform), reduce each pixel to an integer gray value (the
    * channel SUM — comparing sums is comparing means, with no
    * division to diverge over), and emit bit `y·8 + x` = 1 iff
    * `gray(x, y) > gray(x+1, y)`: 8 horizontal gradient signs per
    * row × 8 rows. Gradient signs survive global brightness/contrast
    * shifts, which is why dHash (not a byte hash) is the image dedup
    * primitive. The 64-bit signature then rides the SAME 4×16-bit
    * band machinery as text SimHash ([[Dedup.hammingBandPairs]]) for
    * exact Hamming ≤ 3 pair recall.
    *
    * Returns None for payloads that are not valid 24bpp BMPs (the
    * caller's dead-letter decision, mirroring [[decode]]). */
  def dhashBmp(raw: Array[Byte]): Option[Long] = {
    val r = resizeBmp(raw, 9, 8)
    if (r == null) None
    else {
      val rowSize = ((9 * 3 + 3) / 4) * 4
      def gray(x: Int, y: Int): Int = {
        val o = 54 + y * rowSize + x * 3
        (r(o) & 0xFF) + (r(o + 1) & 0xFF) + (r(o + 2) & 0xFF)
      }
      var sig = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (gray(x, y) > gray(x + 1, y)) sig |= 1L << (y * 8 + x)
          x += 1
        }
        y += 1
      }
      Some(sig)
    }
  }

  /** Fixed-point DCT-II basis for [[phashBmp]]:
    * `C(u)(x) = floor(cos(π·(2x+1)·u/64) · 2¹⁴)`, computed once with
    * StrictMath (fdlibm — bit-identical on every JVM) and used as
    * INTEGER constants from then on. The oracle embeds these exact
    * values as SQL literals (generated from this array), so both
    * engines run pure integer matmuls over the same table — the
    * pre-floored-host-literal discipline the NDCG discounts use,
    * applied to a transform basis. */
  private[graft] val DctBasis: Array[Array[Long]] =
    Array.tabulate(8, 32)((u, x) =>
      math.floor(StrictMath.cos(
        math.Pi * (2 * x + 1) * u / 64.0) * 16384.0).toLong)

  /** 64-bit pHash (perceptual DCT hash) of a 24bpp BMP — the
    * robustness step past [[dhashBmp]]: downsample to 32×32 (through
    * [[resizeBmp]], the tier's oracle-checked pixel transform), gray
    * = channel sum (the dHash discipline — no division), then a
    * SEPARABLE integer DCT-II via [[DctBasis]] and the classic
    * median-sign bits over the top-left 8×8 low-frequency block with
    * DC excluded: bit `u·8+v` = 1 iff `D(u,v) > median` of the 63 AC
    * coefficients (lower median = 32nd smallest, exact — no
    * averaging), bit 0 always 0. Low-frequency signs survive
    * re-encode, resize AND mild crops/blurs that flip dHash's
    * per-pixel gradients — the recall trade documented next to
    * SCALE.md's image rows.
    *
    * Overflow audit: gray ≤ 765, |C| ≤ 2¹⁴, so |T| ≤ 765·2¹⁴·32 ≈
    * 4·10⁸ and |D| ≤ 4·10⁸·2¹⁴·32 ≈ 2.1·10¹⁴ — Long-safe with four
    * orders of headroom. Returns None for non-24bpp-BMP payloads. */
  def phashBmp(raw: Array[Byte]): Option[Long] = {
    val r = resizeBmp(raw, 32, 32)
    if (r == null) None
    else {
      val rowSize = ((32 * 3 + 3) / 4) * 4
      def gray(x: Int, y: Int): Long = {
        val o = 54 + y * rowSize + x * 3
        ((r(o) & 0xFF) + (r(o + 1) & 0xFF) + (r(o + 2) & 0xFF)).toLong
      }
      // row pass: T(u)(y) = Σ_x gray(x,y)·C(u)(x)
      val t = Array.ofDim[Long](8, 32)
      var u = 0
      while (u < 8) {
        var y = 0
        while (y < 32) {
          var acc = 0L; var x = 0
          while (x < 32) { acc += gray(x, y) * DctBasis(u)(x); x += 1 }
          t(u)(y) = acc; y += 1
        }
        u += 1
      }
      // column pass: D(u)(v) = Σ_y T(u)(y)·C(v)(y)
      val coeffs = Array.ofDim[Long](8, 8)
      u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          var acc = 0L; var y = 0
          while (y < 32) { acc += t(u)(y) * DctBasis(v)(y); y += 1 }
          coeffs(u)(v) = acc; v += 1
        }
        u += 1
      }
      val ac = new Array[Long](63)
      var i = 0
      u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          if (u != 0 || v != 0) { ac(i) = coeffs(u)(v); i += 1 }
          v += 1
        }
        u += 1
      }
      java.util.Arrays.sort(ac)
      val med = ac(31)
      var sig = 0L
      u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          if ((u != 0 || v != 0) && coeffs(u)(v) > med)
            sig |= 1L << (u * 8 + v)
          v += 1
        }
        u += 1
      }
      Some(sig)
    }
  }

  /** Synthesize a minimal valid PNG: 8-byte signature, IHDR (8-bit
    * RGB, no interlace) with a real CRC-32, and an IEND chunk — 45
    * bytes total. No IDAT: the fixture pins header parsing, and a
    * zero-pixel stream would add nothing the BMP fixtures don't
    * already cover at the pixel level. */
  def makePng(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, "PNG dims must be positive")
    val out = new Array[Byte](8 + 25 + 12)
    PngSig.zipWithIndex.foreach { case (v, i) => out(i) = v.toByte }
    def wbe32(o: Int, v: Long): Unit = {
      out(o) = (v >> 24).toByte; out(o + 1) = (v >> 16).toByte
      out(o + 2) = (v >> 8).toByte; out(o + 3) = v.toByte
    }
    def chunk(o: Int, typ: String, dataLen: Int): Unit = {
      wbe32(o, dataLen.toLong)
      typ.getBytes("US-ASCII").zipWithIndex.foreach { case (c, i) =>
        out(o + 4 + i) = c
      }
      val crc = new java.util.zip.CRC32
      crc.update(out, o + 4, 4 + dataLen)
      wbe32(o + 8 + dataLen, crc.getValue)
    }
    // IHDR data: width, height, bit depth 8, color type 2 (RGB),
    // compression 0, filter 0, interlace 0
    wbe32(16, width.toLong); wbe32(20, height.toLong)
    out(24) = 8; out(25) = 2
    chunk(8, "IHDR", 13)
    chunk(33, "IEND", 0)
    out
  }

  /** Synthesize a minimal valid JPEG: SOI, a JFIF APP0 segment, a
    * SOF0 (baseline) or SOF2 (progressive) frame header with real
    * per-component entries, and EOI — `32 + 3·channels` bytes. No
    * entropy-coded scan: the fixture pins frame-header parsing (the
    * metadata a 100 TB triage pass reads), as with [[makePng]]. */
  def makeJpeg(width: Int, height: Int, channels: Int = 3,
      progressive: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, "JPEG dims must be positive")
    require(channels > 0 && channels <= 255, "channels must be in [1,255]")
    val sofLen = 8 + 3 * channels
    val out = new Array[Byte](20 + 2 + sofLen + 2)
    def wbe16(o: Int, v: Int): Unit = {
      out(o) = (v >> 8).toByte; out(o + 1) = v.toByte
    }
    out(0) = 0xFF.toByte; out(1) = 0xD8.toByte // SOI
    out(2) = 0xFF.toByte; out(3) = 0xE0.toByte // APP0
    wbe16(4, 16)
    "JFIF".getBytes("US-ASCII").zipWithIndex.foreach { case (c, i) =>
      out(6 + i) = c
    }
    out(10) = 0            // NUL terminator
    out(11) = 1; out(12) = 1 // JFIF version 1.1
    out(13) = 0            // density units: none
    wbe16(14, 1); wbe16(16, 1) // aspect ratio 1:1
    out(18) = 0; out(19) = 0   // no thumbnail
    val so = 20
    out(so) = 0xFF.toByte
    out(so + 1) = (if (progressive) 0xC2 else 0xC0).toByte
    wbe16(so + 2, sofLen)
    out(so + 4) = 8 // sample precision
    wbe16(so + 5, height); wbe16(so + 7, width)
    out(so + 9) = channels.toByte
    var c = 0
    while (c < channels) {
      out(so + 10 + 3 * c) = (c + 1).toByte // component id
      out(so + 11 + 3 * c) = 0x11           // 1x1 sampling
      out(so + 12 + 3 * c) = 0              // quant table 0
      c += 1
    }
    out(so + 2 + sofLen) = 0xFF.toByte
    out(so + 2 + sofLen + 1) = 0xD9.toByte // EOI
    out
  }

  /** Synthesize a valid 16-bit PCM WAV (44-byte RIFF header + zero
    * samples); `dataBytes` is truncated to the block-align boundary as
    * any real encoder would. */
  def makeWav(sampleRate: Int, channels: Int, dataBytes: Int): Array[Byte] = {
    require(sampleRate > 0 && channels > 0, "WAV params must be positive")
    val blockAlign = channels * 2
    val dataSize = math.max(0, dataBytes - dataBytes % blockAlign)
    val out = new Array[Byte](44 + dataSize)
    def w16(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
    }
    def w32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    def tag(o: Int, s: String): Unit =
      s.getBytes("US-ASCII").zipWithIndex.foreach { case (c, i) =>
        out(o + i) = c
      }
    tag(0, "RIFF"); w32(4, 36 + dataSize); tag(8, "WAVE")
    tag(12, "fmt "); w32(16, 16)
    w16(20, 1) // PCM
    w16(22, channels); w32(24, sampleRate)
    w32(28, sampleRate * blockAlign) // byte rate
    w16(32, blockAlign); w16(34, 16) // bits per sample
    tag(36, "data"); w32(40, dataSize)
    out
  }

  /** Deterministic pseudo-PCM sample i for `seed` — an integer
    * Knuth/Fibonacci-style multiplicative mix reduced to i16 range.
    * Pure 64-bit integer arithmetic so the DuckDB oracle reproduces
    * every sample in closed form (the audio analog of
    * makeBmpSeeded's pixel formula). */
  def seededSample(seed: Int, i: Int): Int =
    (((seed.toLong * 2654435761L + i.toLong * 2246822519L) % 65536L
      + 65536L) % 65536L - 32768L).toInt

  /** A seeded 16-bit PCM WAV: [[makeWav]]'s valid header + `nSamples`
    * per channel of [[seededSample]] little-endian data. */
  def makeWavSeeded(sampleRate: Int, channels: Int, nSamples: Int,
      seed: Int): Array[Byte] = {
    val out = makeWav(sampleRate, channels, nSamples * channels * 2)
    var i = 0
    val total = nSamples * channels
    while (i < total) {
      val v = seededSample(seed, i)
      out(44 + 2 * i) = v.toByte
      out(44 + 2 * i + 1) = (v >> 8).toByte
      i += 1
    }
    out
  }

  /** Parse a 16-bit PCM WAV's sample stream (all channels
    * interleaved, little-endian i16) — None unless the RIFF/WAVE/fmt
    * header says 16-bit PCM. The byte-level twin of the header-only
    * [[decode]] path: feature queries aggregate SAMPLES, and the
    * oracle checks the aggregate against the generator's closed-form
    * math — so a parse that misreads endianness, sign or the data
    * offset cannot hash-match. */
  def wavSamples(raw: Array[Byte]): Option[Array[Int]] =
    if (raw.length < 44 ||
      !(raw(0) == 'R' && raw(1) == 'I' && raw(2) == 'F' && raw(3) == 'F') ||
      !(raw(8) == 'W' && raw(9) == 'A' && raw(10) == 'V' && raw(11) == 'E') ||
      u16(raw, 20) != 1 || u16(raw, 34) != 16) None
    else {
      val dataSize = math.min(u32(raw, 40), (raw.length - 44).toLong).toInt
      val n = dataSize / 2
      Some(Array.tabulate(n) { i =>
        val u = u16(raw, 44 + 2 * i)
        if (u >= 32768) u - 65536 else u
      })
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
