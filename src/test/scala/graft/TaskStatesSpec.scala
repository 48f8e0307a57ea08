package graft

import org.apache.spark.sql.functions._

import graft.model.TaskStatus
import graft.operators.{DynamoAttrs, Identify, Sequencing, TaskStates}

/** Coverage for the operator surfaces not exercised by the oracle
  * queries: attempt accounting, event-id projection, identity extract,
  * typed Dynamo attribute accessors, and the normalization order-col
  * helper. */
class TaskStatesSpec extends SparkSpec {

  private def task(name: String, state: String, attempts: Int) = struct(
    lit(name).as("name"), lit(name).as("path"),
    lit("processOne").as("kind"), lit(state).as("state"),
    lit(null).cast("string").as("error"),
    lit(null).cast("string").as("reason"),
    lit(attempts).as("attempts"),
    lit(null).cast("int").as("totalAttempts"),
    lit(null).cast("string").as("began"),
    lit(null).cast("long").as("took"))

  test("beginExecution: open tasks start and count the attempt; " +
    "finalised tasks untouched (test/batch.test.js:380-465)") {
    import spark.implicits._
    val df = Seq(1).toDF("x").withColumn("tasks",
      array(task("open", TaskStatus.Unstarted, 2),
        task("done", TaskStatus.Succeeded, 1)))
    val out = df.select(TaskStates.beginExecution(col("tasks")).as("t"))
      .selectExpr("t[0].state", "t[0].attempts", "t[0].totalAttempts",
        "t[1].state", "t[1].attempts")
      .collect().head
    assert(out.getString(0) === TaskStatus.Started)
    assert(out.getInt(1) === 3)
    assert(out.getInt(2) === 1) // null totalAttempts coalesced to 0, +1
    assert(out.getString(3) === TaskStatus.Succeeded)
    assert(out.getInt(4) === 1) // finalised: no attempt burned
  }

  test("eventIdAndSeqNos projection and useRecordAsMessage identity") {
    import spark.implicits._
    val df = Seq(("ev-1", "seq-9", 3)).toDF("eid", "seq", "sub")
    val proj = df.select(Identify.eventIdAndSeqNos(col("eid"), col("seq"),
      col("sub")).as("e")).select("e.eventID", "e.eventSeqNo",
      "e.eventSubSeqNo").collect().head
    assert((proj.getString(0), proj.getString(1), proj.getInt(2)) ===
      (("ev-1", "seq-9", 3)))

    val rec = graft.operators.Decode.useRecordAsMessage(df,
      struct(col("eid"), col("seq")))
    val r = rec.select("message.eid", "reason_unusable").collect().head
    assert(r.getString(0) === "ev-1" && r.get(1) === null)
  }

  test("DynamoAttrs: image extraction and typed N/B accessors " +
    "(test/samples.js:289-353 shapes)") {
    import spark.implicits._
    val rec =
      """{"Keys":{"id":{"N":"42"}},
        |"NewImage":{"price":{"N":"9.75"},"blob":{"B":"aGk="},
        |"bad":{"N":"not-a-number"}}}""".stripMargin.replace("\n", "")
    val df = Seq(rec).toDF("record")
    val img = DynamoAttrs.image(col("record"), "NewImage")
    val out = df.select(
      DynamoAttrs.attrLong(DynamoAttrs.image(col("record"), "Keys"), "id")
        .as("id"),
      DynamoAttrs.attrNumber(img, "price").as("price"),
      decode(DynamoAttrs.attrBinary(img, "blob"), "UTF-8").as("blob"),
      DynamoAttrs.attrNumber(img, "bad").as("bad"))
      .collect().head
    assert(out.getLong(0) === 42L)
    assert(out.getDouble(1) === 9.75)
    assert(out.getString(2) === "hi")
    assert(out.get(3) === null) // ANSI-guarded: garbage N yields null
  }

  test("orderCols normalizes schemaless string parts for orderBy") {
    import spark.implicits._
    val df = Seq(("b", "20000000000000000000002"), ("a", "3000"))
      .toDF("id", "part")
    val sorted = df.orderBy(Sequencing.orderCols(Seq(col("part"))): _*)
      .select("id").as[String].collect().toSeq
    assert(sorted === Seq("a", "b")) // numeric, not lexicographic
  }
}
