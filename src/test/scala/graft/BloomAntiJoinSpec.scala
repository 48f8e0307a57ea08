package graft

import graft.operators.BloomAntiJoin
import org.apache.spark.sql.functions._

/** BloomAntiJoin contract: exact anti-join semantics (the Bloom is an
  * accelerator, never an approximation), null keys routed to "new",
  * and the prefilter actually shrinking the join input — the property
  * the 100 TB argument rests on.
  */
class BloomAntiJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloom anti-join is bit-identical to the plain anti-join " +
      "(false positives scrubbed, no false negatives possible)") {
    val left = (0 until 2000).map(i => (i.toLong, s"k${i % 500}"))
      .toDF("id", "key")
    val right = (0 until 250).map(i => s"k$i").toDF("rk")
    val plain = left.join(right.select($"rk".as("key")).distinct(),
        Seq("key"), "left_anti")
      .select("id").as[Long].collect().sorted
    val bloomed = BloomAntiJoin.antiJoin(left, "key", right, "rk",
        expectedItems = 250)
      .select("id").as[Long].collect().sorted
    assert(bloomed.toSeq === plain.toSeq)
  }

  test("null left keys come out as new (anti-join null semantics)") {
    val left = Seq((1L, "a"), (2L, null.asInstanceOf[String]), (3L, "b"))
      .toDF("id", "key")
    val right = Seq("a").toDF("rk")
    val out = BloomAntiJoin.antiJoin(left, "key", right, "rk",
        expectedItems = 1)
      .select("id").as[Long].collect().sorted
    assert(out.toSeq === Seq(2L, 3L))
  }

  test("prefilter shrinks the join input to dups + ~fpp of new rows") {
    // 10k mostly-new left keys vs 100 members: the candidate branch
    // (rows that reach the exact anti-join) must be close to the 100
    // true dups, not the 10k total — at fpp=1% the expected false
    // positives are ~99, so assert a generous 5x margin rather than
    // a flaky exact bound.
    val left = (0 until 10000).map(i => (i.toLong, s"key$i"))
      .toDF("id", "key")
    val right = (0 until 100).map(i => s"key$i").toDF("rk")
    val bloom = right.stat.bloomFilter("rk", 100, 0.01)
    val bc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((s: String) => bc.value.mightContainString(s))
    val candidates = left.filter(mightContain($"key")).count()
    assert(candidates >= 100, "bloom lost a true member (impossible)")
    assert(candidates < 600,
      s"prefilter passed $candidates of 10000 rows — not selective")
  }

  test("oversized builds are NOT silently clipped to the runtime " +
      "bloom-filter caps") {
    // BloomFilterAggregate Math.min-clips its sizing literals to
    // spark.sql.optimizer.runtime.bloomFilter.maxNumItems (4.19M) /
    // maxNumBits (~8 MB = 67.1M bits). Size a build ABOVE both caps
    // and assert the sketch actually carries the requested bits — the
    // conf raise-and-restore in buildBloom is what makes this pass;
    // without it the sketch comes back capped with effective fpp ~1.
    import graft.operators.BloomAntiJoin
    val requestedBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(10_000_000L, 0.01) // ~95.9M bits > 67.1M cap
    assert(requestedBits > 67108864L, "test premise: above the cap")
    val tiny = Seq("a", "b", "c").toDF("k")
    val bloom = BloomAntiJoin.buildBloom(
      tiny, $"k", expectedItems = 10_000_000L, fpp = 0.01)
    assert(bloom.bitSize() >= requestedBits,
      s"clipped: ${bloom.bitSize()} < $requestedBits")
    // and the session confs were restored after the build
    val restored = spark.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits").toLong
    assert(restored <= 67108864L,
      s"conf not restored: maxNumBits = $restored")
  }

  test("dedup_incremental_bloom matches dedup_incremental on sf0.001") {
    val plain = SparkEntry.queries("dedup_incremental")(spark, sf0001)
      .as[Long].collect().toSeq
    val bloomed = SparkEntry.queries("dedup_incremental_bloom")(
      spark, sf0001).as[Long].collect().toSeq
    assert(plain.nonEmpty)
    assert(bloomed === plain)
  }
}
