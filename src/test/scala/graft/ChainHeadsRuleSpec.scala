package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class ChainHeadsRuleSpec extends SparkSpec {

  private def heads = {
    import spark.implicits._
    val df = Seq(
      ("s0", 1L, 30L, "e3"), ("s0", 1L, 10L, "e1"), ("s0", 1L, 20L, "e2"),
      ("s0", 2L, 5L, "e4"), ("s1", 3L, 1L, "e5"), ("s1", 3L, 0L, "e6")
    ).toDF("shard", "user", "seq", "id")
    val w = Window.partitionBy("shard", "user").orderBy("seq", "id")
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
  }

  test("rn==1 over a row_number-only window rewrites to min_by aggregation") {
    val plan = heads.queryExecution.optimizedPlan
    assert(plan.collect { case w: LWindow => w }.isEmpty,
      s"window survived:\n$plan")
    assert(plan.collect { case a: Aggregate => a }.nonEmpty,
      s"no aggregate introduced:\n$plan")
    val got = heads.select("shard", "user", "id", "rn")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getInt(3))).toSet
    assert(got === Set(("s0", 1L, "e1", 1), ("s0", 2L, "e4", 1),
      ("s1", 3L, "e6", 1)))
  }

  test("rule does NOT fire for lag/lead windows or rn <= k") {
    import spark.implicits._
    val df = Seq(("s0", 10L, "e1"), ("s0", 20L, "e2")).toDF("shard", "seq", "id")
    val w = Window.partitionBy("shard").orderBy("seq", "id")
    val withLag = df.withColumn("rn", row_number().over(w))
      .withColumn("prev", lag("id", 1).over(w))
      .filter(col("rn") === 1)
    assert(withLag.queryExecution.optimizedPlan
      .collect { case x: LWindow => x }.nonEmpty)
    assert(withLag.select("id", "prev").collect().head.getString(1) == null)

    val topK = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
    assert(topK.queryExecution.optimizedPlan
      .collect { case x: LWindow => x }.nonEmpty)
    assert(topK.count() === 2)
  }

  test("descending order keeps the window (struct min is ascending-only)") {
    import spark.implicits._
    val df = Seq(("s0", 10L, "e1"), ("s0", 20L, "e2")).toDF("shard", "seq", "id")
    val w = Window.partitionBy("shard").orderBy(col("seq").desc, col("id"))
    val out = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    assert(out.queryExecution.optimizedPlan
      .collect { case x: LWindow => x }.nonEmpty)
    assert(out.select("id").collect().head.getString(0) === "e2")
  }
}
