package graft

import org.apache.spark.sql.functions._

import graft.operators.Identify

class IdentifySpec extends SparkSpec {

  test("property lookup honors msg → userRecord → record precedence " +
    "(kinesis-identify.js:170-189)") {
    import spark.implicits._
    val df = Seq((
      """{"a":"fromMsg"}""",
      """{"a":"fromUser","b":"fromUser"}""",
      """{"a":"fromRec","b":"fromRec","c":"fromRec"}"""
    )).toDF("msg", "ur", "rec")
    val sources = Seq(col("msg"), col("ur"), col("rec"))
    val out = df.select(
      Identify.propertyValue("a", sources).as("a"),
      Identify.propertyValue("b", sources).as("b"),
      Identify.propertyValue("c", sources).as("c"),
      Identify.propertyValue("missing", sources).as("m"))
      .collect().head
    assert(out.getString(0) === "fromMsg")
    assert(out.getString(1) === "fromUser")
    assert(out.getString(2) === "fromRec")
    assert(out.get(3) === null)
  }

  test("compound (dotted) names walk nested objects") {
    import spark.implicits._
    val df = Seq("""{"outer":{"inner":{"id":42}}}""").toDF("msg")
    val v = df.select(Identify.propertyValue("outer.inner.id",
      Seq(col("msg"))).as("v")).collect().head.getString(0)
    assert(v === "42")
  }

  test("per-key sequencing with unresolvable keys rejects with the " +
    "reference's reason (kinesis-identify.test.js:208-425 matrix)") {
    import spark.implicits._
    val cfg = graft.model.ConsumerConfig(sequencingPerKey = true,
      keyPropertyNames = Seq("nope"))
    val df = Seq("""{"k":1}""").toDF("message")
    val out = Identify.idsKeysSeqNos(cfg, df, col("message"),
      lit(null).cast("string"), lit(null).cast("string"),
      lit("1"), lit(null).cast("int"))
    assert(out.select("reason_rejected").collect().head.getString(0) ===
      "Sequencing per key, but failed to resolve any keys")
  }
}
