package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaFeatures, MediaRecord}

/** Pins the real container parse behind the multimodal decode path:
  * BMP header fields (with 4-byte row padding), WAV RIFF chunk
  * walking (out-of-order and odd-sized chunks included), block-align
  * truncation, duration math, and the all-null unknown-container
  * contract. */
class MultimodalSpec extends SparkSpec {

  test("BMP roundtrip: width/height/channels parse back, rows pad to " +
      "4 bytes") {
    // width 5 ⇒ raw row 15 bytes ⇒ padded row 16: the file size proves
    // the parse reads the real container, not the synth inputs
    val bmp = Multimodal.makeBmp(5, 3)
    assert(bmp.length === 54 + 16 * 3)
    val f = Multimodal.decode(MediaRecord(1L, "image", bmp))
    assert(f === MediaFeatures(1L, "image", 54 + 48, Some(5), Some(3),
      Some(3), None, None))
  }

  test("WAV roundtrip: sample rate, channels, block-align truncation, " +
      "duration") {
    // 1001 data bytes at stereo 16-bit truncate to 1000 (block align 4)
    val wav = Multimodal.makeWav(8000, 2, 1001)
    assert(wav.length === 44 + 1000)
    val f = Multimodal.decode(MediaRecord(2L, "audio", wav))
    assert(f.channels === Some(2) && f.sample_rate === Some(8000))
    // 1000 bytes / (8000 Hz * 2 ch * 2 B) = 31.25 ms
    assert(f.duration_ms === Some(1000 * 1000.0 / 32000))
    assert(f.n_bytes === 1044)
  }

  test("WAV chunk walk: an odd-sized LIST chunk before fmt is skipped " +
      "with word alignment") {
    val base = Multimodal.makeWav(16000, 1, 64)
    // splice an odd-sized (3-byte ⇒ 1 pad byte) LIST chunk between the
    // RIFF header and the fmt chunk — legal RIFF, and exactly what
    // real encoders emit (metadata chunks in arbitrary positions)
    val list = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0,
      'x', 'y', 'z', 0)
    val spliced = base.slice(0, 12) ++ list ++ base.drop(12)
    val f = Multimodal.decode(MediaRecord(3L, "audio", spliced))
    assert(f.channels === Some(1) && f.sample_rate === Some(16000))
    assert(f.duration_ms === Some(64 * 1000.0 / 32000))
  }

  test("resizeBmp: nearest-neighbor picks the exact source pixels, " +
      "handles padding, upsizes, and rejects non-BMP input") {
    // 4×4 → 2×2: NN samples source pixels (0,0),(2,0),(0,2),(2,2);
    // makeBmp's gradient (channel c of (x,y) = x*7+y*31+c*101 mod 256)
    // makes every byte predictable
    val resized = Multimodal.resizeBmp(Multimodal.makeBmp(4, 4), 2, 2)
    val f = Multimodal.decode(MediaRecord(1L, "image", resized))
    assert(f.width === Some(2) && f.height === Some(2) &&
      f.channels === Some(3))
    val dstRow = ((2 * 3 + 3) / 4) * 4 // width 2 ⇒ 6 raw ⇒ 8 padded
    for (ty <- 0 until 2; tx <- 0 until 2; c <- 0 until 3) {
      val got = resized(54 + ty * dstRow + tx * 3 + c) & 0xFF
      val expected = (2 * tx * 7 + 2 * ty * 31 + c * 101) & 0xFF
      assert(got === expected, s"pixel ($tx,$ty) channel $c")
    }

    // width 3 source has padded rows (9 raw ⇒ 12); resize must stride
    // by the PADDED row size or row 1+ pixels shear
    val shear = Multimodal.resizeBmp(Multimodal.makeBmp(3, 4), 1, 2)
    // target (0,1) ⇐ source (0,2): channel 0 = 2*31 = 62
    assert((shear(54 + ((1 * 3 + 3) / 4) * 4) & 0xFF) === 62)

    // NN upsizing works too (2×2 → 4×4 repeats each source pixel)
    val up = Multimodal.resizeBmp(Multimodal.makeBmp(2, 2), 4, 4)
    val uf = Multimodal.decode(MediaRecord(2L, "image", up))
    assert(uf.width === Some(4) && uf.height === Some(4))
    val upRow = ((4 * 3 + 3) / 4) * 4
    // target (1,1) ⇐ source (0,0) ⇒ channel 0 value 0
    assert((up(54 + upRow + 3) & 0xFF) === 0)

    // WAV and junk payloads are not resizable images
    assert(Multimodal.resizeBmp(Multimodal.makeWav(8000, 1, 64), 2, 2)
      == null)
    assert(Multimodal.resizeBmp(Array[Byte](1, 2, 3), 2, 2) == null)
  }

  test("unknown container yields all-null parsed fields, never a " +
      "misparse") {
    val junk = Array.tabulate[Byte](100)(i => (i * 7).toByte)
    val f = Multimodal.decode(MediaRecord(4L, "video", junk))
    assert(f === MediaFeatures(4L, "video", 100, None, None, None,
      None, None))
    // too-short payloads (below either header size) are unknown too
    val short = Multimodal.decode(MediaRecord(5L, "image",
      Array[Byte]('B', 'M', 0)))
    assert(short.width === None && short.n_bytes === 3)
  }

  test("PNG roundtrip: signature + IHDR parse back width/height and " +
      "color-type channels; CRC and chunk layout are format-faithful") {
    val png = Multimodal.makePng(640, 480)
    assert(png.length === 45)
    val f = Multimodal.decode(MediaRecord(1L, "image", png))
    assert(f.width === Some(640) && f.height === Some(480) &&
      f.channels === Some(3) && f.sample_rate === None &&
      f.duration_ms === None)
    // the fixture is format-faithful, not just our own dialect: the
    // stored IHDR CRC must equal an independently computed CRC-32
    // over type+data (what any external PNG reader validates first)
    val crc = new java.util.zip.CRC32
    crc.update(png, 12, 17) // IHDR type + data
    val stored = ((png(29) & 0xFFL) << 24) | ((png(30) & 0xFFL) << 16) |
      ((png(31) & 0xFFL) << 8) | (png(32) & 0xFFL)
    assert(crc.getValue === stored, "IHDR CRC-32 mismatch")
    // color-type → channels mapping: grayscale(0)=1, RGBA(6)=4,
    // malformed(7)=None (dims still parse)
    for ((ct, exp) <- Seq(0 -> Some(1), 6 -> Some(4), 7 -> None)) {
      val p2 = png.clone(); p2(25) = ct.toByte
      val f2 = Multimodal.decode(MediaRecord(2L, "image", p2))
      assert(f2.channels === exp && f2.width === Some(640))
    }
    // truncated signature falls through to unknown-container all-null
    val f3 = Multimodal.decode(MediaRecord(3L, "image", png.take(20)))
    assert(f3.width === None && f3.n_bytes === 20)
  }

  test("JPEG marker walk: SOF0 and SOF2 frame headers parse back " +
      "dims/components; headerless and post-SOS payloads stay null") {
    // baseline and progressive differ only in the SOF marker — both
    // must yield identical features
    for (progressive <- Seq(false, true)) {
      val jpg = Multimodal.makeJpeg(640, 480, channels = 3,
        progressive = progressive)
      assert(jpg.length === 32 + 9) // 32 + 3·channels
      val f = Multimodal.decode(MediaRecord(7L, "image", jpg))
      assert(f === MediaFeatures(7L, "image", 41, Some(640), Some(480),
        Some(3), None, None), s"progressive=$progressive")
    }
    // grayscale single-component SOF
    val gray = Multimodal.decode(MediaRecord(8L, "image",
      Multimodal.makeJpeg(12, 34, channels = 1)))
    assert(gray.width === Some(12) && gray.height === Some(34) &&
      gray.channels === Some(1))
    // dims > 255 exercise the big-endian 16-bit reads
    val big = Multimodal.decode(MediaRecord(9L, "image",
      Multimodal.makeJpeg(1920, 1080)))
    assert(big.width === Some(1920) && big.height === Some(1080))
    // SOI + EOI only: a valid JPEG shell with no frame header → nulls
    val shell = Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte)
    val s = Multimodal.decode(MediaRecord(10L, "image", shell))
    assert(s.width.isEmpty && s.height.isEmpty && s.channels.isEmpty)
    assert(s.n_bytes === 4)
    // SOS before any SOF (malformed ordering): the walk must stop at
    // the scan, not read entropy bytes as segments
    val sos = Array(0xFF, 0xD8, 0xFF, 0xDA, 0x00, 0x04, 0x01, 0x00)
      .map(_.toByte)
    val m = Multimodal.decode(MediaRecord(11L, "image", sos))
    assert(m.width.isEmpty && m.channels.isEmpty)
  }

  test("decodeFeatures keeps the partition-batched shape over a " +
      "Dataset of mixed containers") {
    import spark.implicits._
    val media = spark.range(0, 100).map { i =>
      if (i % 2 == 0)
        MediaRecord(i, "image", Multimodal.makeBmp((i % 9 + 1).toInt, 4))
      else MediaRecord(i, "audio", Multimodal.makeWav(8000, 1, 200))
    }
    val out = Multimodal.decodeFeatures(media, batchSize = 8)
      .collect().sortBy(_.id)
    assert(out.length === 100)
    out.foreach { f =>
      if (f.id % 2 == 0)
        assert(f.width === Some((f.id % 9 + 1).toInt) &&
          f.height === Some(4) && f.sample_rate === None)
      else
        assert(f.sample_rate === Some(8000) &&
          f.duration_ms === Some(200 * 1000.0 / 16000) &&
          f.width === None)
    }
  }

  test("dHash: equal seeds reproduce the hash, nearby seeds diverge, " +
      "non-BMP payloads are the caller's dead-letter") {
    def dhashOf(seed: Int): Long = {
      val img = Multimodal.makeBmpSeeded(seed % 16 + 9, seed % 8 + 8, seed)
      Multimodal.dhashBmp(img).get
    }
    // a re-hosted image (same seed) is an exact dup: hamming 0
    assert(dhashOf(12345) === dhashOf(12345))
    // the seed enters through per-axis multipliers, so the gradient
    // (not just the brightness) changes with it — seeds differing in
    // any base-256 digit must not collapse to one hash
    val base = dhashOf(1000)
    assert(Seq(1001, 1000 + 256, 1000 + 65536).map(dhashOf)
      .forall(_ !== base))
    assert(Multimodal.dhashBmp("not a bmp".getBytes("UTF-8")).isEmpty)
  }

  test("WAV sample parse round-trips the seeded-PCM generator " +
      "(endianness/sign/offset) and rejects non-PCM payloads") {
    val wav = Multimodal.makeWavSeeded(16000, 1, 300, 77)
    val parsed = Multimodal.wavSamples(wav).get
    assert(parsed.length === 300)
    assert(parsed.toSeq === (0 until 300).map(
      Multimodal.seededSample(77, _)))
    // full i16 range exercised, including negatives (a u16 misparse
    // would clamp to [0, 65535])
    assert(parsed.exists(_ < 0) && parsed.exists(_ > 0))
    // stereo interleaves channels through the same sample stream
    val stereo = Multimodal.wavSamples(
      Multimodal.makeWavSeeded(8000, 2, 10, 5)).get
    assert(stereo.length === 20)
    assert(Multimodal.wavSamples("RIFFnope".getBytes("UTF-8")).isEmpty)
    // a float-PCM header (format code 3) must be refused, not
    // misread as ints
    val f32 = Multimodal.makeWav(8000, 1, 8)
    f32(20) = 3
    assert(Multimodal.wavSamples(f32).isEmpty)
  }

  test("pHash: deterministic, seed-sensitive, DC bit clear, and the " +
      "63-AC lower-median split bounds the popcount at 31") {
    def phashOf(seed: Int): Long = Multimodal.phashBmp(
      Multimodal.makeBmpSeeded(seed % 16 + 9, seed % 8 + 8, seed)).get
    // same bytes -> same hash; distinct gradients -> distinct hashes
    assert(phashOf(1000) === phashOf(1000))
    val base = phashOf(1000)
    assert(Seq(1001, 1000 + 256, 1000 + 65536).map(phashOf)
      .forall(_ !== base))
    (0 until 50).foreach { s =>
      val sig = phashOf(s)
      assert((sig & 1L) === 0L, s"seed $s set the excluded DC bit")
      // strictly-above-lower-median of 63 values: at most 31 bits
      // (exactly 31 when the AC coefficients are distinct)
      val pop = java.lang.Long.bitCount(sig)
      assert(pop >= 1 && pop <= 31, s"seed $s popcount $pop")
    }
    assert(Multimodal.phashBmp("not a bmp".getBytes("UTF-8")).isEmpty)
    // basis sanity: DC row is the constant 2^14, every AC row sums
    // to ~0 (|Σ| small) — a mis-scaled or mis-phased table would fail
    assert(Multimodal.DctBasis(0).forall(_ === 16384L))
    (1 until 8).foreach { u =>
      assert(math.abs(Multimodal.DctBasis(u).sum) <= 32L,
        s"AC row $u not balanced")
    }
  }
}
