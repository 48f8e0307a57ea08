package graft

import java.util.Base64

import org.apache.spark.sql.functions._

import graft.functions.{FloatVecDot, KplAgg, KplDeagg}

class FunctionsSpec extends SparkSpec {

  test("FloatVecDot matches a reference double fold and is SQL-callable") {
    import spark.implicits._
    val a = Array(1.5f, -2.0f, 3.25f)
    val b = Array(2.0f, 0.5f, -1.0f)
    val expected = a.zip(b).foldLeft(0.0) { case (s, (x, y)) =>
      s + x.toDouble * y.toDouble
    }
    val df = Seq((a, b)).toDF("a", "b")
    val got = df.select(FloatVecDot(col("a"), col("b"))).as[Double].head()
    assert(got === expected)

    GraftExtensions.register(spark)
    val sqlGot = spark.sql(
      """SELECT float_vec_dot(
        |  array(cast(1.5 as float), cast(-2.0 as float), cast(3.25 as float)),
        |  array(cast(2.0 as float), cast(0.5 as float), cast(-1.0 as float)))
        |""".stripMargin).as[Double].head()
    assert(sqlGot === expected)
  }

  test("DoubleVecDot equals the aggregate(zip_with) fold bit-for-bit " +
      "and is SQL-callable") {
    import spark.implicits._
    import graft.functions.DoubleVecDot
    val rnd = new scala.util.Random(31)
    val rows = (0 until 50).map { i =>
      (Array.fill(64)(rnd.nextDouble() * 4 - 2),
        Array.fill(64)(rnd.nextDouble() * 4 - 2))
    }
    val df = rows.toDF("a", "b")
    // the HOF chain DoubleVecDot replaced in ann_topk_quantized: the
    // kernel must fold in EXACTLY the same order or the oracle drifts
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val both = df.select(DoubleVecDot(col("a"), col("b")).as("k"),
      hof.as("h")).as[(Double, Double)].collect()
    both.foreach { case (k, h) => assert(k === h) }

    GraftExtensions.register(spark)
    val sqlGot = spark.sql(
      "SELECT double_vec_dot(array(1.5d, -2.0d), array(2.0d, 0.5d))")
      .as[Double].head()
    assert(sqlGot === (1.5 * 2.0 + -2.0 * 0.5))
  }

  test("KPL aggregate → deaggregate round-trip preserves order and keys") {
    val records = (0 until 50).map { i =>
      (s"pk-${i % 7}", if (i % 3 == 0) s"ehk-$i" else null,
        s"""{"i":$i}""".getBytes("UTF-8"))
    }
    val blob = KplAgg.aggregate(records)
    val out = KplDeagg.deaggregate(blob)
    assert(out != null && out.length === 50)
    out.zipWithIndex.foreach { case (ur, i) =>
      assert(ur.error === null)
      assert(ur.partitionKey === s"pk-${i % 7}")
      assert(ur.subSequenceNumber === Some(i))
      assert(new String(Base64.getDecoder.decode(ur.data), "UTF-8") ===
        s"""{"i":$i}""")
      if (i % 3 == 0) assert(ur.explicitPartitionKey === s"ehk-$i")
    }
  }

  test("KPL round-trip through the Spark explode operator") {
    import spark.implicits._
    val blob = Base64.getEncoder.encodeToString(
      KplAgg.aggregate((0 until 5).map(i =>
        ("pk", null, s"payload-$i".getBytes("UTF-8")))))
    val df = Seq(("r1", blob, "pk")).toDF("id", "data", "partitionKey")
    val out = graft.operators.Decode.kplUserRecords(df, col("data"),
      col("partitionKey"), lit(null).cast("string"))
    assert(out.count() === 5)
    val subs = out.select("subSequenceNumber").as[Int].collect().sorted
    assert(subs.toSeq === Seq(0, 1, 2, 3, 4))
  }

  test("Bpe.mergePair is greedy leftmost non-overlapping (the oracle's " +
      "wrapped-replace contract)") {
    import graft.functions.Bpe.mergePair
    // overlapping run: leftmost wins, scan resumes after the merge
    assert(mergePair(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(mergePair(Seq("a", "a", "a", "a"), "a", "a") ===
      Seq("aa", "aa"))
    // every disjoint occurrence merges in one round
    assert(mergePair(Seq("a", "b", "a", "b"), "a", "b") ===
      Seq("ab", "ab"))
    // a fresh merge must not cascade within the round
    assert(mergePair(Seq("a", "b", "b"), "a", "b") === Seq("ab", "b"))
    // no occurrence → identity
    assert(mergePair(Seq("x", "y"), "a", "b") === Seq("x", "y"))
  }
}
