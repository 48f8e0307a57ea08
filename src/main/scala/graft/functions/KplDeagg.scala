package graft.functions

import java.security.MessageDigest
import java.util.Base64

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** D5 — KPL (Kinesis Producer Library) record de-aggregation
  * (SURVEY §2.2; reference `/root/reference/kpl-deagg-async.js:50-186`).
  *
  * Wire format (public spec:
  * github.com/awslabs/amazon-kinesis-producer/blob/master/aggregation-format.md):
  * 4-byte magic `0xF3899AC2`, a protobuf `AggregatedRecord` body, then a
  * 16-byte MD5 checksum of the body. The protobuf schema is small enough
  * that this parses it with a hand-rolled varint reader instead of a
  * protobuf dependency:
  *
  * {{{
  * message AggregatedRecord {
  *   repeated string partition_key_table     = 1;
  *   repeated string explicit_hash_key_table = 2;
  *   repeated Record records                 = 3;
  * }
  * message Record {
  *   required uint64 partition_key_index     = 1;
  *   optional uint64 explicit_hash_key_index = 2;
  *   required bytes  data                    = 3;
  *   repeated Tag    tags                    = 4;
  * }
  * }}}
  *
  * Semantics mirrored from the reference:
  *  - magic mismatch ⇒ NOT KPL ⇒ passthrough as a single user record
  *    without `subSequenceNumber` (`kpl-deagg-async.js:158-184`) —
  *    surfaced here as a null return so the operator can compose the
  *    passthrough from the enclosing record's own columns;
  *  - checksum mismatch ⇒ whole record fails
  *    (`kpl-deagg-async.js:72-97`) — surfaced as one element with
  *    `error` set (the caller routes it to unusable, D3
  *    `kinesis-processing.js:533-570`);
  *  - otherwise one user record per protobuf record, `subSequenceNumber
  *    = i` in order (`kpl-deagg-async.js:106-152`).
  *
  * The UDF is the right tool here (vs a Catalyst expression): the parse
  * is a black-box byte walk with no sub-expression Catalyst could
  * optimize, and per-row allocation is one object array per user record
  * either way.
  */
object KplDeagg {

  val MagicHex = "f3899ac2"
  private val Magic = Array[Byte](0xF3.toByte, 0x89.toByte, 0x9A.toByte,
    0xC2.toByte)

  /** One de-aggregated user record (error non-null ⇒ failed outcome). */
  final case class UserRec(partitionKey: String,
      explicitPartitionKey: String, subSequenceNumber: Option[Int],
      data: String, error: String)

  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var out = 0L
      while (shift < 64) {
        val b = buf(pos); pos += 1
        out |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return out
        shift += 7
      }
      throw new IllegalArgumentException("malformed varint")
    }
    def bytes(): Array[Byte] = {
      val len = varint().toInt
      if (len < 0 || pos + len > end)
        throw new IllegalArgumentException("truncated length-delimited field")
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + len)
      pos += len
      out
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => bytes()
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  private def parseRecord(b: Array[Byte]): (Int, Int, Array[Byte]) = {
    val r = new Reader(b, 0, b.length)
    var pkIdx = -1; var ehkIdx = -1; var data: Array[Byte] = null
    while (r.hasMore) {
      val tag = r.varint(); val field = (tag >> 3).toInt; val wire = tag.toInt & 7
      field match {
        case 1 => pkIdx = r.varint().toInt
        case 2 => ehkIdx = r.varint().toInt
        case 3 => data = r.bytes()
        case _ => r.skip(wire)
      }
    }
    if (pkIdx < 0 || data == null)
      throw new IllegalArgumentException("record missing required fields")
    (pkIdx, ehkIdx, data)
  }

  /** Parse a raw (already base64-decoded) payload. Returns null when the
    * payload is not KPL-aggregated (magic mismatch) — passthrough is the
    * caller's job since it needs the enclosing record's fields. */
  def deaggregate(raw: Array[Byte], verifyChecksum: Boolean = true): Array[UserRec] = {
    if (raw == null || raw.length < 20 ||
      !java.util.Arrays.equals(java.util.Arrays.copyOfRange(raw, 0, 4), Magic))
      return null
    try {
      val body = java.util.Arrays.copyOfRange(raw, 4, raw.length - 16)
      if (verifyChecksum) {
        val expected = java.util.Arrays.copyOfRange(raw, raw.length - 16, raw.length)
        val actual = MessageDigest.getInstance("MD5").digest(body)
        if (!java.util.Arrays.equals(expected, actual))
          return Array(UserRec(null, null, None, null, "Invalid record checksum"))
      }
      val r = new Reader(body, 0, body.length)
      val pkTable = Vector.newBuilder[String]
      val ehkTable = Vector.newBuilder[String]
      val records = Vector.newBuilder[(Int, Int, Array[Byte])]
      while (r.hasMore) {
        val tag = r.varint(); val field = (tag >> 3).toInt; val wire = tag.toInt & 7
        field match {
          case 1 => pkTable += new String(r.bytes(), "UTF-8")
          case 2 => ehkTable += new String(r.bytes(), "UTF-8")
          case 3 => records += parseRecord(r.bytes())
          case _ => r.skip(wire)
        }
      }
      val pks = pkTable.result(); val ehks = ehkTable.result()
      val b64 = Base64.getEncoder
      records.result().zipWithIndex.map { case ((pkIdx, ehkIdx, data), i) =>
        // a bad table index fails ONLY that user record, not the whole
        // aggregate (reference kpl-deagg-async.js:135-152)
        try UserRec(pks(pkIdx),
          if (ehkIdx >= 0 && ehkIdx < ehks.length) ehks(ehkIdx) else null,
          Some(i), b64.encodeToString(data), null)
        catch { case e: Exception =>
          UserRec(null, null, Some(i), null,
            s"user record $i unusable: ${e.getMessage}")
        }
      }.toArray
    } catch { case e: Exception =>
      Array(UserRec(null, null, None, null,
        s"KPL deaggregation failed: ${e.getMessage}"))
    }
  }

  /** Column form: binary payload → array of user-record structs, null for
    * non-KPL payloads. Compose with the passthrough + `explode_outer`
    * in [[graft.operators.Decode.kplUserRecords]] (switch to
    * `posexplode_outer` there if the ordinal ever becomes an output). */
  def deaggCol(raw: Column): Column = {
    val fn = udf((bytes: Array[Byte]) => deaggregate(bytes))
    fn(raw)
  }
}
