package graft

import java.util.Base64

import org.apache.spark.sql.functions._

import graft.functions.KplDeagg
import graft.operators.Decode

/** Decode cluster spec. The KPL aggregate payload is the REAL one from
  * `/root/reference/test/kinesis-processing.test.js:39-77` (a public AWS
  * wire-format sample), with its expected user records.
  */
class DecodeSpec extends SparkSpec {

  val kplData =
    "84mawgokODE2MjJiMGUtNWFlOC00YjUzLWE1ODUtYzZjYjc3ODBlNjgwCiQyNWQ0YzNjMS0z" +
    "MWZlLTQyNGYtOTFmMy04MTI0MWRjYzY1OTASCXVuZGVmaW5lZBoRCAAQABoLeyJhIjoiQUJD" +
    "In0aEQgBEAAaC3siYiI6IkRFRiJ9jU+TcO1bDHHEgOGh8mJlCw=="

  test("KPL deaggregate: real aggregate fans out to 2 user records in order") {
    val out = KplDeagg.deaggregate(Base64.getDecoder.decode(kplData))
    assert(out != null && out.length === 2)
    assert(out(0).partitionKey === "81622b0e-5ae8-4b53-a585-c6cb7780e680")
    assert(out(0).explicitPartitionKey === "undefined")
    assert(out(0).subSequenceNumber === Some(0))
    assert(out(0).data === "eyJhIjoiQUJDIn0=") // {"a":"ABC"}
    assert(out(0).error === null)
    assert(out(1).partitionKey === "25d4c3c1-31fe-424f-91f3-81241dcc6590")
    assert(out(1).subSequenceNumber === Some(1))
    assert(out(1).data === "eyJiIjoiREVGIn0=") // {"b":"DEF"}
  }

  test("KPL deaggregate: non-KPL payload returns null (passthrough marker)") {
    assert(KplDeagg.deaggregate("eyJhIjoiQUJDIn0=".getBytes) === null)
    assert(KplDeagg.deaggregate(
      Base64.getDecoder.decode("eyJhIjoiQUJDIn0=")) === null)
  }

  test("KPL deaggregate: corrupted checksum fails the whole record") {
    val raw = Base64.getDecoder.decode(kplData)
    raw(raw.length - 1) = (raw(raw.length - 1) ^ 0xFF).toByte
    val out = KplDeagg.deaggregate(raw)
    assert(out.length === 1 && out(0).error === "Invalid record checksum")
  }

  test("kplUserRecords operator: aggregate explodes, plain record passes through") {
    import spark.implicits._
    val df = Seq(
      ("agg", kplData, "aggPK"),
      ("plain", "eyJhIjoiQUJDIn0=", "plainPK")
    ).toDF("id", "data", "partitionKey")
    val out = Decode.kplUserRecords(df, col("data"), col("partitionKey"),
      lit(null).cast("string")).cache()
    assert(out.count() === 3)
    val agg = out.filter(col("id") === "agg").orderBy("subSequenceNumber")
      .select("userPartitionKey", "subSequenceNumber", "userData")
      .collect()
    assert(agg.map(_.getInt(1)).toSeq === Seq(0, 1))
    assert(agg(0).getString(2) === "eyJhIjoiQUJDIn0=")
    val plain = out.filter(col("id") === "plain").collect().head
    assert(plain.getAs[String]("userPartitionKey") === "plainPK")
    assert(plain.getAs[Any]("subSequenceNumber") === null)
    assert(plain.getAs[String]("userData") === "eyJhIjoiQUJDIn0=")
  }

  test("kplUserRecords: empty KPL aggregate surfaces as ONE unusable row") {
    import spark.implicits._
    // magic + EMPTY protobuf body + valid MD5-of-empty trailer: structurally
    // valid aggregate, zero user records. The reference silently drops such
    // a record (kpl-deagg-async.js yields nothing); graft diverges on
    // purpose and emits an audit row — pinned here.
    val body = Array.emptyByteArray
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(body)
    val raw = Array[Byte](0xF3.toByte, 0x89.toByte, 0x9A.toByte, 0xC2.toByte) ++ md5
    assert(KplDeagg.deaggregate(raw).length === 0)
    val emptyB64 = Base64.getEncoder.encodeToString(raw)
    val df = Seq(("empty", emptyB64, "pk")).toDF("id", "data", "partitionKey")
    val out = Decode.kplUserRecords(df, col("data"), col("partitionKey"),
      lit(null).cast("string")).cache()
    assert(out.count() === 1)
    val row = out.collect().head
    assert(row.getAs[String]("reason_unusable") ===
      "empty KPL aggregate (no user records)")
    assert(row.getAs[Any]("userData") === null)
    assert(row.getAs[Any]("subSequenceNumber") === null)
    assert(row.getAs[Any]("userPartitionKey") === null)
  }

  test("extractJsonMessages: usable/unusable split (D1 routing)") {
    import spark.implicits._
    val df = Seq(
      ("ok", Base64.getEncoder.encodeToString("{\"a\":1}".getBytes)),
      ("badJson", Base64.getEncoder.encodeToString("{nope".getBytes)),
      ("badB64", "!!!not-base64!!!"),
      ("nullData", null)
    ).toDF("id", "data")
    val out = Decode.extractJsonMessages(df, col("data"))
    val rows = out.select("id", "message", "reason_unusable")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2)))
      .toMap
    assert(rows("ok") === (("{\"a\":1}", null)))
    assert(rows("badJson")._1 === null)
    assert(rows("badJson")._2 === "unparseable JSON message")
    assert(rows("badB64")._2 === "invalid base64 data")
    assert(rows("nullData")._2 === "no data to decode")
  }
}
