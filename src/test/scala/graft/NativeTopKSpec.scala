package graft

import org.apache.spark.sql.functions._

import graft.operators.TopK

/** Pins the native top-k plan node ([[graft.plans.TopKPerGroupExec]]):
  * result-identical to the declarative window form on multi-partition
  * data, and the physical plan actually shows the partial/final pair
  * around a Catalyst-planned exchange (the whole point — bounded
  * selection BEFORE the shuffle). */
class NativeTopKSpec extends SparkSpec {

  test("native node matches the window form row-for-row") {
    import spark.implicits._
    val df = spark.range(10000).select(
        pmod(col("id"), lit(7)).as("g"), col("id").as("i"),
        pmod(col("id") * 2654435761L, lit(1000003L)).cast("double").as("s"))
      .repartition(8)

    val native = TopK.perGroupNative(df, "g", "i", "s", k = 5)
      .select("g", "i", "s", "rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("s").desc, col("i"))
    val windowed = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("g", "i", "s", "rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))

    assert(native.length === 35) // 7 groups × k=5
    assert(native.toSeq === windowed.toSeq)
  }

  test("property: random data with score ties matches the window form " +
      "across k and partition counts") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 4).foreach { round =>
      val n = 500 + rnd.nextInt(1500)
      val groups = 1 + rnd.nextInt(9)
      val k = 1 + rnd.nextInt(7)
      val parts = 1 + rnd.nextInt(12)
      // coarse scores force ties; the id tiebreak must resolve them
      // identically in the heap and in the window
      val rows = (0 until n).map(i =>
        (rnd.nextInt(groups).toLong, i.toLong, rnd.nextInt(20).toDouble))
      val df = rows.toDF("g", "i", "s").repartition(parts)

      val native = TopK.perGroupNative(df, "g", "i", "s", k)
        .select("g", "i", "s", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy(col("s").desc, col("i"))
      val windowed = df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select("g", "i", "s", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(native === windowed,
        s"round $round: n=$n groups=$groups k=$k parts=$parts")
    }
  }

  test("arbitrary input types: string group key and integer score " +
      "pass through uncast") {
    import spark.implicits._
    val rows = Seq(
      ("alpha", 1L, 30), ("alpha", 2L, 50), ("alpha", 3L, 50),
      ("alpha", 4L, 10), ("beta", 5L, 7), ("beta", 6L, 9))
    val df = rows.toDF("src", "id", "score").repartition(5)

    val got = TopK.perGroupNative(df, "src", "id", "score", k = 2)
    // output schema keeps the INPUT types — no silent long/double cast
    assert(got.schema("src").dataType.typeName === "string")
    assert(got.schema("score").dataType.typeName === "integer")
    val rs = got.select("src", "id", "score", "rank")
      .as[(String, Long, Int, Int)].collect().toSet
    assert(rs === Set(
      ("alpha", 2L, 50, 1), ("alpha", 3L, 50, 2),
      ("beta", 6L, 9, 1), ("beta", 5L, 7, 2)))
  }

  test("physical plan contains partial and final TopKPerGroup around " +
      "an exchange") {
    import spark.implicits._
    val df = spark.range(100).select(
      pmod(col("id"), lit(3)).as("g"), col("id").as("i"),
      col("id").cast("double").as("s")).repartition(4)
    val out = new java.io.ByteArrayOutputStream
    Console.withOut(out) {
      TopK.perGroupNative(df, "g", "i", "s", k = 2).explain()
    }
    val plan = out.toString
    assert(plan.contains("TopKPerGroup(partial=true, k=2)"))
    assert(plan.contains("TopKPerGroup(partial=false, k=2)"))
    assert(plan.toLowerCase.contains("exchange hashpartitioning"))
  }
}
