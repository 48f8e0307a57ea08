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

  test("per-key sequencing with an unresolvable key rejects with the " +
    "reference's reason (kinesis-identify.test.js:328-357)") {
    import spark.implicits._
    val cfg = graft.model.ConsumerConfig(sequencingPerKey = true,
      keyPropertyNames = Seq("nope"))
    val df = Seq("""{"k":1}""").toDF("message")
    val out = Identify.idsKeysSeqNos(cfg, df, col("message"),
      lit(null).cast("string"), lit(null).cast("string"),
      lit("1"), lit(null).cast("int"))
    assert(out.select("reason_rejected").collect().head.getString(0) ===
      "Missing property [nope] for keys")
  }

  test("strictness matrix: keys reject only under sequencingPerKey, " +
    "seqNos only under sequencingRequired, ids only under strict " +
    "(kinesis-identify.js:96-131, kinesis-identify.test.js:208-425)") {
    import spark.implicits._
    import graft.model.ConsumerConfig
    // k1 and n1/n2 resolve; k2, n3, id2 are missing
    val df = Seq("""{"id1":"123","k1":"ABC","n1":1,"n2":2}""")
      .toDF("message")
    def reason(cfg: ConsumerConfig): Option[String] =
      Option(Identify.idsKeysSeqNos(cfg, df, col("message"),
        lit(null).cast("string"), lit(null).cast("string"),
        lit("1"), lit(null).cast("int"))
        .select("reason_rejected").collect().head.getString(0))

    // one missing key, sequencingPerKey: singular reference reason
    assert(reason(ConsumerConfig(sequencingPerKey = true,
      keyPropertyNames = Seq("k1", "k2"))) ===
      Some("Missing property [k2] for keys"))
    // both keys missing: plural form (kinesis-identify.test.js:342-356)
    assert(reason(ConsumerConfig(sequencingPerKey = true,
      keyPropertyNames = Seq("kx", "ky"))) ===
      Some("Missing properties [kx, ky] for keys"))
    // missing seqNo property with sequencing required
    assert(reason(ConsumerConfig(
      seqNoPropertyNames = Seq("n1", "n2", "n3"))) ===
      Some("Missing property [n3] for seqNos"))
    // same, sequencing NOT required: warn-only, no rejection
    assert(reason(ConsumerConfig(sequencingRequired = false,
      seqNoPropertyNames = Seq("n1", "n2", "n3"))) === None)
    // missing id property: warn-only by default (reference fixed
    // behavior, kinesis-identify.test.js:376-397)...
    assert(reason(ConsumerConfig(
      idPropertyNames = Seq("id1", "id2"), seqNoPropertyNames = Seq("n1")))
      === None)
    // ...but rejects when strict escalates it
    assert(reason(ConsumerConfig(strict = true,
      idPropertyNames = Seq("id1", "id2"), seqNoPropertyNames = Seq("n1")))
      === Some("Missing property [id2] for ids"))
    // everything resolvable: usable row even under strict
    assert(reason(ConsumerConfig(strict = true,
      idPropertyNames = Seq("id1"), seqNoPropertyNames = Seq("n1", "n2")))
      === None)
  }

  test("KPL sub-seqNo ZERO resolves a single-part seqNo (JS truthiness, " +
    "kinesis-identify.js:121-126; deagg assigns 0 to the first " +
    "user-record)") {
    import spark.implicits._
    val df = Seq(
      ("e0", "100", Some(0)),  // first KPL user-record: subSeqNo 0
      ("e1", "100", Some(1)),
      ("e2", "200", None)      // plain record: no userRecord at all
    ).toDF("eventID", "eventSeqNo", "eventSubSeqNo")
    val out = Identify.idsKeysSeqNos(
        graft.model.ConsumerConfig(sequencingRequired = false), df,
        lit("{}"), lit(null).cast("string"), lit(null).cast("string"),
        col("eventSeqNo"), col("eventSubSeqNo"))
      .select(col("eventID"),
        transform(col("seqNos"), p => p.getField("name")).as("names"),
        col("seqNo"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1), r.getString(2)))
    assert(out(0) === (("e0", Seq("eventSeqNo"), "eventSeqNo:100")))
    assert(out(1) === (("e1", Seq("eventSeqNo", "eventSubSeqNo"),
      "eventSeqNo:100|eventSubSeqNo:1")))
    assert(out(2) === (("e2", Seq("eventSeqNo"), "eventSeqNo:200")))
  }

  test("falsy eventSeqNo gates the WHOLE default seqNo path (JS " +
    "truthiness, kinesis-identify.js:121-126): empty seqNos, rejected " +
    "under required sequencing") {
    import spark.implicits._
    // string column: JS string falsiness — null and "" gate, "0" is
    // TRUTHY (a Kinesis sequenceNumber is a string)
    val strDf = Seq(
      ("e0", Some("100"), Some(1)), // truthy: normal two-part seqNo
      ("e1", None, Some(1)),        // null eventSeqNo
      ("e2", Some("0"), Some(1)),   // string "0": truthy in JS
      ("e3", Some(""), Some(1))     // empty-string: falsy
    ).toDF("eventID", "eventSeqNo", "eventSubSeqNo")
    def run(cfg: graft.model.ConsumerConfig,
        df: org.apache.spark.sql.DataFrame) =
      Identify.idsKeysSeqNos(cfg, df, lit("{}"),
          lit(null).cast("string"), lit(null).cast("string"),
          col("eventSeqNo"), col("eventSubSeqNo"))
        .select(col("eventID"), size(col("seqNos")).as("n"),
          col("seqNo"), col("reason_rejected"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getString(2),
          r.getString(3)))

    val required = run(graft.model.ConsumerConfig(), strDf)
    assert(required(0) === (("e0", 2, "eventSeqNo:100|eventSubSeqNo:1",
      null)))
    assert(required(2) === (("e2", 2, "eventSeqNo:0|eventSubSeqNo:1",
      null)))
    // falsy eventSeqNo ⇒ NO seqNos at all (not an ('eventSeqNo', null)
    // pair), so required sequencing rejects with the reference's reason
    Seq(required(1), required(3)).foreach { case (id, n, flat, reason) =>
      assert(n === 0 && flat === null, id)
      assert(reason ===
        "Sequencing is required, but failed to resolve any seqNos", id)
    }
    // sequencing not required: same empty seqNos, but usable
    val optional = run(graft.model.ConsumerConfig(
      sequencingRequired = false), strDf)
    Seq(optional(1), optional(3)).foreach { case (id, n, _, reason) =>
      assert(n === 0 && reason === null, id)
    }

    // numeric column: JS number falsiness — zero gates
    val numDf = Seq(
      ("e0", Some(100L), Some(1)),
      ("e1", Some(0L), Some(1)),    // numeric 0: falsy
      ("e2", None, Some(1))
    ).toDF("eventID", "eventSeqNo", "eventSubSeqNo")
    val numeric = run(graft.model.ConsumerConfig(), numDf)
    assert(numeric(0) === (("e0", 2, "eventSeqNo:100|eventSubSeqNo:1",
      null)))
    Seq(numeric(1), numeric(2)).foreach { case (id, n, flat, reason) =>
      assert(n === 0 && flat === null, id)
      assert(reason ===
        "Sequencing is required, but failed to resolve any seqNos", id)
    }

    // floating-point column: JS number falsiness includes NaN (`NaN ?`
    // is false) — and Spark's `NaN != 0` is TRUE, so this only holds
    // with an explicit isnan guard in the truthiness gate
    val dblDf = Seq(
      ("e0", Some(100.0), Some(1)),
      ("e1", Some(Double.NaN), Some(1)), // NaN: falsy in JS
      ("e2", Some(0.0), Some(1))         // 0.0: falsy
    ).toDF("eventID", "eventSeqNo", "eventSubSeqNo")
    val dbl = run(graft.model.ConsumerConfig(), dblDf)
    assert(dbl(0) === (("e0", 2, "eventSeqNo:100.0|eventSubSeqNo:1",
      null)))
    Seq(dbl(1), dbl(2)).foreach { case (id, n, flat, reason) =>
      assert(n === 0 && flat === null, id)
      assert(reason ===
        "Sequencing is required, but failed to resolve any seqNos", id)
    }

    // the SUB-seqNo gate is type-aware too: NaN sub is falsy (single-
    // part tuple, message still usable), string "0" sub is truthy
    val subDbl = Seq(
      ("e0", "100", Some(1.0)),
      ("e1", "100", Some(Double.NaN)), // NaN sub ⇒ single-part
      ("e2", "100", Some(0.0))         // 0.0 sub ⇒ single-part
    ).toDF("eventID", "eventSeqNo", "eventSubSeqNo")
    val sd = run(graft.model.ConsumerConfig(), subDbl)
    assert(sd(0) === (("e0", 2, "eventSeqNo:100|eventSubSeqNo:1.0", null)))
    assert(sd(1) === (("e1", 1, "eventSeqNo:100", null)))
    assert(sd(2) === (("e2", 1, "eventSeqNo:100", null)))
    val subStr = Seq(
      ("e0", "100", Some("0")), // string "0": truthy in JS ⇒ two-part
      ("e1", "100", Some("")),  // empty string: falsy ⇒ single-part
      ("e2", "100", None)
    ).toDF("eventID", "eventSeqNo", "eventSubSeqNo")
    val ss = run(graft.model.ConsumerConfig(), subStr)
    assert(ss(0) === (("e0", 2, "eventSeqNo:100|eventSubSeqNo:0", null)))
    assert(ss(1) === (("e1", 1, "eventSeqNo:100", null)))
    assert(ss(2) === (("e2", 1, "eventSeqNo:100", null)))
  }

  test("Q1 heterogeneity fail-fast: mixed seqNo part names with " +
    "sequencing required throw; tolerated when not required " +
    "(sequencing-per-shard.test.js:133-220)") {
    import spark.implicits._
    // unconfigured seqNoPropertyNames ⇒ data-driven default names: a
    // KPL user-record row carries eventSubSeqNo, a plain row doesn't,
    // so the part names disagree at position 1
    val df = Seq(
      ("e1", "s0", """{"v":1}""", "100", Some(7)),
      ("e2", "s0", """{"v":2}""", "200", None)
    ).toDF("eventID", "shard", "message", "eventSeqNo", "eventSubSeqNo")
    def identified(cfg: graft.model.ConsumerConfig) =
      Identify.idsKeysSeqNos(cfg, df, col("message"),
        lit(null).cast("string"), lit(null).cast("string"),
        col("eventSeqNo"), col("eventSubSeqNo"))
    def sequenced(cfg: graft.model.ConsumerConfig) =
      Identify.sequence(cfg, identified(cfg), col("shard"), col("message"),
        lit(null).cast("string"), lit(null).cast("string"),
        col("eventSeqNo"), col("eventID")).collect()

    val required = graft.model.ConsumerConfig()
    val ex = intercept[IllegalStateException] { sequenced(required) }
    assert(ex.getMessage ===
      "NOT all of the messages have the same key at sequence number part[1]")

    // same heterogeneous data, sequencing NOT required: no throw
    val optional = graft.model.ConsumerConfig(sequencingRequired = false)
    assert(sequenced(optional).length === 2)

    // homogeneous data with sequencing required: no throw
    val homog = df.filter(col("eventID") === "e1")
    val out = Identify.sequence(required,
      Identify.idsKeysSeqNos(required, homog, col("message"),
        lit(null).cast("string"), lit(null).cast("string"),
        col("eventSeqNo"), col("eventSubSeqNo")),
      col("shard"), col("message"), lit(null).cast("string"),
      lit(null).cast("string"), col("eventSeqNo"), col("eventID"))
    assert(out.collect().length === 1)
  }

  test("sequence() on a genuine streaming DataFrame builds without the " +
    "eager heterogeneity collect (no AnalysisException at plan time)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, String, String, String)]
    val df = input.toDF()
      .toDF("eventID", "shard", "message", "eventSeqNo")
    val cfg = graft.model.ConsumerConfig()
    val identified = Identify.idsKeysSeqNos(cfg, df, col("message"),
      lit(null).cast("string"), lit(null).cast("string"),
      col("eventSeqNo"), lit(null).cast("int"))
    // before the isStreaming guard this threw AnalysisException here
    // (collect() on a streaming source at plan-construction time)
    val out = Identify.sequence(cfg, identified, col("shard"),
      col("message"), lit(null).cast("string"), lit(null).cast("string"),
      col("eventSeqNo"), col("eventID"))
    assert(out.isStreaming)
  }
}
