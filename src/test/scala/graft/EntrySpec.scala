package graft

import org.apache.spark.sql.functions._

class EntrySpec extends SparkSpec {

  test("entry returns >0 rows with sane chain structure") {
    val df = SparkEntry.entry(spark).cache()
    assert(df.count() > 0)
    // every (shard,user) group is one chain: exactly one head, and the
    // chain length equals the message count
    val bad = df.filter(col("heads") =!= 1 || col("chain_len") =!= col("messages"))
    assert(bad.count() === 0)
  }

  test("every declared query has an oracle or is explicitly exempt") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  test("all queries run on sf0.001 and return rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      assert(n > 0, s"$name returned no rows")
    }
  }
}
