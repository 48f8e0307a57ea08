package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Bucketing: pre-partitioned tables co-locate their join — the big
  * fact⋈fact joins at 100 TB (SURVEY scale notes) avoid both shuffles
  * entirely when both sides are bucketed on the join key. Asserted at
  * the physical-plan level: no Exchange feeds the join. */
class BucketingSpec extends SparkSpec {

  test("both sides bucketed on the join key ⇒ shuffle-free join") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-buckets").toString
    val adaptive = spark.conf.get("spark.sql.adaptive.enabled")
    val broadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.sources.Tables.orders(spark, sf001)
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$tmp/ord").saveAsTable("ord_bucketed")
      graft.sources.Tables.lineitem(spark, sf001)
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$tmp/li").saveAsTable("li_bucketed")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"),
        s"bucketed join still shuffles:\n$physical")
      // correctness parity with the unbucketed join
      val expected = graft.sources.Tables.lineitem(spark, sf001)
        .join(graft.sources.Tables.orders(spark, sf001),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
      spark.conf.set("spark.sql.adaptive.enabled", adaptive)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcast)
    }
  }
}
