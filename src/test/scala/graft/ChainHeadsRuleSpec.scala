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

  test("global window (no partitionBy) keeps the window; empty input stays empty") {
    import spark.implicits._
    val df = Seq(("s0", 10L, "e1"), ("s0", 20L, "e2")).toDF("shard", "seq", "id")
    val w = Window.orderBy("seq", "id") // no partitionBy ⇒ global window
    val out = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    assert(out.queryExecution.optimizedPlan
      .collect { case x: LWindow => x }.nonEmpty,
      "rule must decline a global window")
    assert(out.select("id").collect().map(_.getString(0)).toSeq === Seq("e1"))

    // The semantic reason for the guard: a global window over EMPTY input
    // emits zero rows, while the min_by Aggregate with empty grouping
    // would emit one all-null row. RDD-backed input so the optimizer
    // cannot constant-fold the emptiness away before the window runs.
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], df.schema)
    val outEmpty = empty.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    assert(outEmpty.queryExecution.optimizedPlan
      .collect { case x: LWindow => x }.nonEmpty)
    assert(outEmpty.count() === 0,
      "empty input through a global window must yield zero rows")
  }

  test("GraftExtensions.register injects the rule post-hoc, exactly once") {
    GraftExtensions.register(spark)
    GraftExtensions.register(spark) // repeated registration must not stack
    assert(spark.experimental.extraOptimizations
      .count(_.isInstanceOf[graft.plans.ChainHeadsRule]) === 1)
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
