package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Sketches
import graft.streaming.{StreamingDistinct, StreamingKmv}
import graft.streaming.StreamingDistinct.SeenValue
import graft.streaming.StreamingKmv.KmvEstimate

/** Pins [[StreamingKmv]], the fourth salted sketch twin: the compiled
  * hash60 bottom-k equals the batch `kmvSketch` SQL derivation on
  * identical values (duplicates and arrival order irrelevant —
  * bottom-k selection is commutative), emission is exactly-once at
  * watermark close with nothing provisional, the estimate matches the
  * shared-SQL formula bit-for-bit, and the salted path merges to
  * EXACTLY the single-group summary. */
class StreamingKmvSpec extends SparkSpec {

  private def corpusValues: Seq[String] =
    (1 to 2000).map(i => s"value-$i-${i * 7919}")

  test("a closed hour's streamed KMV summary equals the batch sketch " +
      "of the same values (scrambled batches, duplicates), emits " +
      "exactly once at watermark close, and the estimate is the " +
      "shared-SQL formula bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = StreamingKmv.HourUs * 800
    val vals = corpusValues
    val (a, rest) = vals.splitAt(700)
    val (b, c) = rest.splitAt(700)
    val input = MemoryStream[SeenValue]
    val q = StreamingKmv.report(input.toDS(), maxDelay = "1 second")
      .writeStream.format("memory").queryName("skmv_out")
      .outputMode("update").start()
    def events(): Seq[KmvEstimate] =
      spark.table("skmv_out").as[KmvEstimate].collect().toSeq
    try {
      input.addData(b.map(v => SeenValue(v, t0 + 1000)): _*)
      q.processAllAvailable()
      input.addData((c ++ b.take(300)).map(v => SeenValue(v, t0 + 2000)): _*)
      q.processAllAvailable()
      input.addData((a ++ c.take(200)).map(v => SeenValue(v, t0 + 3000)): _*)
      q.processAllAvailable()
      assert(events().isEmpty, "open hour emitted a provisional row")
      input.addData(SeenValue("flush-1",
        t0 + StreamingKmv.HourUs + 2000000))
      q.processAllAvailable()
      input.addData(SeenValue("flush-2",
        t0 + StreamingKmv.HourUs + 3000000))
      q.processAllAvailable()
      val closed = events()
      assert(closed.size === 1, s"expected exactly one close: $closed")
      val got = closed.head
      assert(got.hourBucket === 800L)
      // batch twin on identical values (duplicates and all), summary
      // AND estimate via the shared SQL derivations
      val batch = Sketches.kmvSummary(
          Sketches.kmvSketch(
            (b ++ c ++ b.take(300) ++ a ++ c.take(200)).toDF("v"),
            lit("k"), col("v"), StreamingKmv.K), StreamingKmv.K)
        .withColumn("est",
          expr(Sketches.kmvEstimateSql(StreamingKmv.K)))
        .collect().head
      assert(got.nK === batch.getAs[Long]("n_k"))
      assert(got.theta === batch.getAs[Long]("theta"))
      assert(got.estimate === batch.getAs[Double]("est"),
        "streamed estimate is not bit-equal to the shared-SQL formula")
      val exact = vals.distinct.size.toDouble
      assert(math.abs(got.estimate - exact) / exact < 0.25,
        s"estimate ${got.estimate} vs exact $exact")
    } finally q.stop()
  }

  /** The kmv_pair_estimate set algebra over a sketch table `key, h`:
    * (s1, s2, n_match, theta) per pair — exact integers, so streamed
    * and batch derivations compare with plain equality. */
  private def pairEstimates(kv: org.apache.spark.sql.DataFrame)
      : Seq[(String, String, Long, Long)] = {
    val smry = Sketches.kmvSummary(kv, StreamingKmv.K)
    val srcs = smry.select("key").distinct()
    val pairs = srcs.select(col("key").as("s1"))
      .join(srcs.select(col("key").as("s2")), col("s1") < col("s2"))
    val pth = pairs
      .join(smry.select(col("key").as("s1"), col("th_eff").as("t1")),
        "s1")
      .join(smry.select(col("key").as("s2"), col("th_eff").as("t2")),
        "s2")
      .withColumn("theta", least(col("t1"), col("t2")))
      .select("s1", "s2", "theta")
    val common = pairs
      .join(kv.select(col("key").as("s1"), col("h")), "s1")
      .join(kv.select(col("key").as("s2"), col("h")), Seq("s2", "h"))
    val nm = common.join(pth, Seq("s1", "s2"))
      .filter(col("h") < col("theta"))
      .groupBy("s1", "s2").agg(count(lit(1)).as("n_match"))
    pth.join(nm, Seq("s1", "s2"), "left")
      .withColumn("n_match", coalesce(col("n_match"), lit(0L)))
      .collect()
      .map(r => (r.getAs[String]("s1"), r.getAs[String]("s2"),
        r.getAs[Long]("n_match"), r.getAs[Long]("theta")))
      .toSeq.sorted
  }

  test("LIVE cross-source overlap: keyedCells streams per-source " +
      "sketches, mergeKeyed folds the salts at hour close, and the " +
      "pair set algebra over the sink equals the batch derivation on " +
      "identical data — including a zero-overlap pair") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = StreamingKmv.HourUs * 802
    // overlapping value ranges; (src0, src2) deliberately disjoint
    val data = Seq(
      "src0" -> (1 to 400), "src1" -> (200 to 600),
      "src2" -> (500 to 900))
      .flatMap { case (s, r) => r.map(i => (s, s"val-$i-${i * 7919}")) }
    val input = MemoryStream[StreamingKmv.KeyedSeen]
    val q = StreamingKmv.keyedCells(input.toDS(), salts = 4,
        maxDelay = "1 second")
      .writeStream.format("memory").queryName("skmv_keyed")
      .outputMode("update").start()
    try {
      input.addData(data.map { case (s, v) =>
        StreamingKmv.KeyedSeen(s, v, t0 + 1000) }: _*)
      q.processAllAvailable()
      input.addData(StreamingKmv.KeyedSeen("flush", "f1",
        t0 + StreamingKmv.HourUs + 2000000))
      q.processAllAvailable()
      input.addData(StreamingKmv.KeyedSeen("flush", "f2",
        t0 + StreamingKmv.HourUs + 3000000))
      q.processAllAvailable()
      val live = StreamingKmv.mergeKeyed(
          spark.table("skmv_keyed").as[StreamingKmv.KeyedSketchHash]
            .filter(_.hourBucket == 802L))
        .select("key", "h")
      val batch = Sketches.kmvSketch(
        data.toDF("src", "v"), col("src"), col("v"), StreamingKmv.K)
      val liveP = pairEstimates(live)
      val batchP = pairEstimates(batch)
      assert(liveP === batchP,
        s"live pair estimates diverged:\nlive  $liveP\nbatch $batchP")
      val disjoint = liveP.find(p => p._1 == "src0" && p._2 == "src2")
      assert(disjoint.exists(_._3 == 0L),
        s"the disjoint pair should match zero hashes: $disjoint")
      assert(liveP.exists(_._3 > 0L),
        s"no overlapping pair matched any hashes: $liveP")
    } finally q.stop()
  }

  test("salted per-(hour, salt) bottom-k tables merge to EXACTLY the " +
      "single-group summary (bottom-k selection is exact under any " +
      "salt assignment), with every salt group k-bounded and " +
      "exactly-once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = StreamingKmv.HourUs * 801
    val vals = corpusValues.take(1200)
    val saltedIn = MemoryStream[SeenValue]
    val plainIn = MemoryStream[SeenValue]
    val qs = StreamingKmv.cells(saltedIn.toDS(), salts = 8,
        maxDelay = "1 second")
      .writeStream.format("memory").queryName("skmv_cells")
      .outputMode("update").start()
    val qp = StreamingKmv.report(plainIn.toDS(), maxDelay = "1 second")
      .writeStream.format("memory").queryName("skmv_plain")
      .outputMode("update").start()
    try {
      Seq(saltedIn, plainIn).foreach { in =>
        in.addData(vals.map(v => SeenValue(v, t0 + 1000)): _*)
      }
      Seq(qs, qp).foreach(_.processAllAvailable())
      Seq(saltedIn, plainIn).foreach { in =>
        in.addData(SeenValue("flush-1",
          t0 + StreamingKmv.HourUs + 2000000))
      }
      Seq(qs, qp).foreach(_.processAllAvailable())
      Seq(saltedIn, plainIn).foreach { in =>
        in.addData(SeenValue("flush-2",
          t0 + StreamingKmv.HourUs + 3000000))
      }
      Seq(qs, qp).foreach(_.processAllAvailable())

      val cells = spark.table("skmv_cells")
        .as[StreamingKmv.SketchHash].collect()
        .filter(_.hourBucket == 801L)
      assert(cells.nonEmpty, "no sketch rows emitted at hour close")
      assert(cells.map(c => (c.salt, c.h)).distinct.size === cells.size,
        "duplicate (salt, h) rows — a group emitted twice")
      val perSalt = cells.groupBy(_.salt).view.mapValues(_.size)
      assert(perSalt.values.forall(_ <= StreamingKmv.K),
        s"a salt group exceeded k: $perSalt")
      val merged = StreamingKmv.merge(cells.toSeq.toDS()).collect()
      assert(merged.length === 1)
      val plain = spark.table("skmv_plain").as[KmvEstimate].collect()
        .filter(_.hourBucket == 801L)
      assert(plain.length === 1)
      assert(merged.head === plain.head,
        s"salted merge ${merged.head} diverged from the single-group " +
          s"summary ${plain.head}")
    } finally { qs.stop(); qp.stop() }
  }
}
