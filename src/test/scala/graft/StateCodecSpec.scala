package graft

import graft.streaming.{ConsumerPipeline, MsgState, StateCodec}

class StateCodecSpec extends SparkSpec {

  test("flat state rows round-trip through the nested item shape") {
    import spark.implicits._
    val flat = Seq(
      MsgState("S|shard-0", "e1", "Completed", 1),
      MsgState("S|shard-0", "e2", "Failed", 2),
      MsgState("S|shard-1", "e3", "Completed", 1),
      MsgState(ConsumerPipeline.MasterKeyPrefix + "S|shard-0",
        "processAll", "Completed", 1)
    ).toDF()
    val items = StateCodec.toItems(flat, "K|events|graft:dev")
    assert(items.count() === 2)
    val s0 = items.filter($"shardOrEventID" === "S|shard-0").collect().head
    assert(s0.getAs[String]("streamConsumerId") === "K|events|graft:dev")
    assert(s0.getSeq[Any](s0.fieldIndex("messageStates")).size === 2)
    assert(s0.getSeq[Any](s0.fieldIndex("batchState")).size === 1)

    val back = StateCodec.toFlat(items).as[MsgState].collect().toSet
    assert(back === flat.as[MsgState].collect().toSet)
  }
}
