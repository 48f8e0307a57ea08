package graft

import org.apache.spark.sql.functions._

import graft.operators.TopK

class TopKSpec extends SparkSpec {

  test("perGroup equals the window form, incl. ties and small groups") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 2000).map { i =>
      (rnd.nextInt(5).toLong, i.toLong,
        math.rint(rnd.nextDouble() * 10) / 10) // coarse scores force ties
    }
    val df = rows.toDF("g", "id", "score").repartition(8)
    val fast = TopK.perGroup(df, "g", "id", "score", 7)
      .select("g", "id", "score", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("score").desc, col("id"))
    val ref = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    assert(fast === ref)
  }

  test("TopKByAgg aggregate function matches the operator's heads") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map { i =>
      (rnd.nextInt(4).toLong, i.toLong, rnd.nextDouble())
    }
    val df = rows.toDF("g", "id", "score").repartition(8)
    val viaAgg = df.groupBy("g")
      .agg(graft.functions.TopKByAgg.topkBy(col("id"), col("score"), 5)
        .as("ids"))
      .select(col("g"), col("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val viaOp = TopK.perGroup(df, "g", "id", "score", 5)
      .orderBy("g", "rank")
      .collect().groupBy(_.getLong(0))
      .map { case (g, rs) => g -> rs.map(_.getLong(1)).toList }
    assert(viaAgg === viaOp)
  }

  test("groups smaller than k return all members") {
    import spark.implicits._
    val df = Seq((1L, 10L, 0.5), (1L, 11L, 0.9)).toDF("g", "id", "score")
    val out = TopK.perGroup(df, "g", "id", "score", 10)
    assert(out.count() === 2)
    assert(out.filter(col("rank") === 1).select("id")
      .collect().head.getLong(0) === 11L)
  }
}
