package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.KplDeagg

/** Fuzz roundtrip for the hand-rolled KPL protobuf parser (D5): a
  * spec-faithful test-side ENCODER (aggregation-format.md wire layout:
  * magic, AggregatedRecord body, MD5 trailer) generates seeded random
  * aggregates — multi-byte varints, unicode partition keys, empty and
  * multi-hundred-byte data blobs, unknown fields — and every one must
  * parse back field-for-field. The existing DecodeSpec pins the real
  * reference wire payload; this pins the parser's coverage of the
  * format space beyond that single fixture. */
class KplDeaggFuzzSpec extends AnyFunSuite {

  // ---- minimal protobuf writer (test-side only) ----
  private def varint(v0: Long): Array[Byte] = {
    var v = v0
    val out = Array.newBuilder[Byte]
    while ((v & ~0x7FL) != 0) {
      out += ((v & 0x7F) | 0x80).toByte; v >>>= 7
    }
    out += (v & 0x7F).toByte
    out.result()
  }
  private def tag(field: Int, wire: Int): Array[Byte] =
    varint((field << 3) | wire)
  private def lenDelim(field: Int, bytes: Array[Byte]): Array[Byte] =
    tag(field, 2) ++ varint(bytes.length) ++ bytes
  private def varintField(field: Int, v: Long): Array[Byte] =
    tag(field, 0) ++ varint(v)

  private val Magic = Array[Byte](0xF3.toByte, 0x89.toByte, 0x9A.toByte,
    0xC2.toByte)

  private def encode(pks: Seq[String], ehks: Seq[String],
      recs: Seq[(Int, Option[Int], Array[Byte])],
      junkFields: Boolean = false): Array[Byte] = {
    val body = Array.newBuilder[Byte]
    pks.foreach(s => body ++= lenDelim(1, s.getBytes(UTF_8)))
    ehks.foreach(s => body ++= lenDelim(2, s.getBytes(UTF_8)))
    recs.foreach { case (pkIdx, ehkIdx, data) =>
      val r = varintField(1, pkIdx) ++
        ehkIdx.map(varintField(2, _)).getOrElse(Array.empty[Byte]) ++
        lenDelim(3, data) ++
        // Tag sub-message (field 4) — present in real KPL traffic, the
        // parser must skip it
        (if (junkFields) lenDelim(4, lenDelim(1, "k".getBytes(UTF_8)))
         else Array.empty[Byte])
      body ++= lenDelim(3, r)
    }
    if (junkFields) body ++= varintField(15, 42L) // unknown top-level
    val b = body.result()
    Magic ++ b ++ MessageDigest.getInstance("MD5").digest(b)
  }

  test("seeded random aggregates roundtrip field-for-field (multi-byte " +
      "varints, unicode keys, 0..300-byte blobs, skipped tag fields)") {
    val rnd = new Random(1234)
    def randomKey(): String = {
      val n = 1 + rnd.nextInt(40)
      (0 until n).map(_ => rnd.nextInt(3) match {
        case 0 => ('a' + rnd.nextInt(26)).toChar
        case 1 => ('à' + rnd.nextInt(16)).toChar // 2-byte UTF-8
        case 2 => ('一' + rnd.nextInt(64)).toChar // 3-byte UTF-8
      }).mkString
    }
    (1 to 25).foreach { trial =>
      // >127-entry tables and >127-byte blobs force 2-byte varints
      val pks = Seq.fill(1 + rnd.nextInt(150))(randomKey())
      val ehks = Seq.fill(rnd.nextInt(5))(randomKey())
      val recs = Seq.fill(1 + rnd.nextInt(50)) {
        (rnd.nextInt(pks.length),
          if (ehks.nonEmpty && rnd.nextBoolean()) Some(rnd.nextInt(ehks.length))
          else None,
          Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte))
      }
      val out = KplDeagg.deaggregate(
        encode(pks, ehks, recs, junkFields = trial % 2 == 0))
      assert(out != null && out.length === recs.length, s"trial $trial")
      out.zip(recs).zipWithIndex.foreach {
        case ((got, (pkIdx, ehkIdx, data)), i) =>
          assert(got.error == null, s"trial $trial rec $i: ${got.error}")
          assert(got.partitionKey === pks(pkIdx))
          assert(got.explicitPartitionKey ===
            ehkIdx.map(ehks).orNull)
          assert(got.subSequenceNumber === Some(i))
          assert(got.data === Base64.getEncoder.encodeToString(data))
      }
    }
  }

  test("corruption matrix: checksum flip fails the aggregate, bad table " +
      "index fails only its record, truncation fails safely") {
    val pks = Seq("pk0", "pk1")
    val recs = Seq((0, None, "a".getBytes(UTF_8)),
      (1, None, "b".getBytes(UTF_8)))
    val good = encode(pks, Nil, recs)

    // flip one checksum byte ⇒ single checksum-error outcome
    val badSum = good.clone()
    badSum(badSum.length - 1) = (badSum.last ^ 0x01).toByte
    val sumOut = KplDeagg.deaggregate(badSum)
    assert(sumOut.length === 1 &&
      sumOut.head.error === "Invalid record checksum")

    // out-of-range partition-key index ⇒ that record unusable, sibling
    // survives (reference kpl-deagg-async.js:135-152)
    val idxOut = KplDeagg.deaggregate(
      encode(pks, Nil, Seq((0, None, "a".getBytes(UTF_8)),
        (9, None, "b".getBytes(UTF_8)))))
    assert(idxOut.length === 2)
    assert(idxOut(0).error == null && idxOut(0).partitionKey === "pk0")
    assert(idxOut(1).error != null && idxOut(1).subSequenceNumber === Some(1))

    // truncated mid-record (checksum recomputed so the parse is what
    // fails) ⇒ one failed outcome, no throw
    val bodyLen = good.length - 4 - 16
    val truncBody = java.util.Arrays.copyOfRange(good, 4, 4 + bodyLen - 3)
    val trunc = Magic ++ truncBody ++
      MessageDigest.getInstance("MD5").digest(truncBody)
    val truncOut = KplDeagg.deaggregate(trunc)
    assert(truncOut.length === 1 && truncOut.head.error != null)

    // magic mismatch ⇒ null (passthrough contract)
    assert(KplDeagg.deaggregate("not kpl".getBytes(UTF_8)) == null)
  }
}
