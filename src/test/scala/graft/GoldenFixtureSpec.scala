package graft

import org.apache.spark.sql.functions._

import graft.model.ConsumerConfig
import graft.operators.{Batching, Identify}

/** Reproduces the reference's persisted golden-state key strings
  * (`/root/reference/test/persisting.test.json:3-16` and
  * `persisting-unseq.test.json:15`) through this engine's operators —
  * the flat string formats are the persistence contract. */
class GoldenFixtureSpec extends SparkSpec {

  test("batch key strings match the persisted fixture") {
    import spark.implicits._
    val cfg = ConsumerConfig(streamName = "MyStream_DEV",
      consumerId = "my-function:dev")
    assert(cfg.streamConsumerId === "K|MyStream_DEV|my-function:dev")
    val df = Seq("shardId-333333333333").toDF("shardId")
    val soid = df.select(Batching.shardOrEventID(cfg, col("shardId"),
      lit(null)).as("v")).as[String].head()
    assert(soid === "S|shardId-333333333333")
  }

  test("id/key/seqNo pipe strings match the persisted fixture") {
    import spark.implicits._
    // the fixture message: ids (id1:ID1, id2:1001), keys (k1:ABC, k2:10),
    // seqNos (n1:1, n2:100, n3:<21-digit>, n4:<ISO>)
    val msg = """{"id1":"ID1","id2":1001,"k1":"ABC","k2":10,
      |"n1":1,"n2":100,"n3":"10000000000000000000001",
      |"n4":"2017-01-17T23:59:59.001Z"}""".stripMargin.replace("\n", "")
    val df = Seq(msg).toDF("message")
    val sources = Seq(col("message"))
    val out = df.select(
      Identify.pipeString(Seq("id1", "id2"), sources).as("id"),
      Identify.pipeString(Seq("k1", "k2"), sources).as("key"),
      Identify.pipeString(Seq("n1", "n2", "n3", "n4"), sources).as("seqNo"))
      .collect().head
    assert(out.getString(0) === "id1:ID1|id2:1001")
    assert(out.getString(1) === "k1:ABC|k2:10")
    assert(out.getString(2) ===
      "n1:1|n2:100|n3:10000000000000000000001|n4:2017-01-17T23:59:59.001Z")
  }

  test("unsequenced key is the blank ' ' (persisting-unseq fixture)") {
    import spark.implicits._
    val cfg = ConsumerConfig(sequencingRequired = true) // no key props
    val df = Seq("""{"id1":"ID1"}""").toDF("message")
    val out = Identify.idsKeysSeqNos(cfg, df, col("message"),
      lit(null).cast("string"), lit(null).cast("string"),
      lit("1"), lit(null).cast("int"))
    assert(out.select("key").collect().head.getString(0) === " ")
  }
}
