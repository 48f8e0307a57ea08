package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Sketches
import graft.streaming.{StreamingCms, StreamingDistinct, StreamingHdr, StreamingKmv}

/** §2.8 checkpoint-restart + sink-merge e2e for the four SALTED
  * sketch twins (r17 verdict tasks #4/#6; KMV joined in r18): each `cells()` query runs
  * the documented production deployment — `foreachBatch` sink table,
  * multiple triggers — is stopped MID-HOUR (state only in the
  * checkpoint), restarted from the same checkpoint, and driven past
  * hour close. The pins:
  *
  *  - exactly-once: each (hour, salt, cell) row lands in the sink
  *    table ONCE across the restart (a lost-state restart would
  *    re-emit or under-emit);
  *  - merge-law e2e: `merge()` over the SINK TABLE — not an in-test
  *    frame — reproduces the batch sketch of the full input
  *    bit-exactly (integer state), which chains to `report()`
  *    equality through the batch-parity pins in
  *    StreamingDistinctSpec/StreamingCmsSpec/StreamingHdrSpec/
  *    StreamingKmvSpec;
  *  - nothing provisional: the pre-restart run (open hour) emits
  *    zero rows.
  */
class StreamingSketchRestartSpec extends SparkSpec {

  /** Drives `mk()`'s query over `input` with a checkpoint at `ckpt`:
    * feeds `pre`, stops (mid-hour), restarts, feeds `post`, then the
    * `flushes` one at a time to push the watermark past hour close.
    * Decision rows accumulate in `out` across both incarnations. */
  private def restartRun[I, O](input: MemoryStream[I],
      mk: () => Dataset[O], ckpt: String,
      out: java.util.concurrent.ConcurrentLinkedQueue[O],
      pre: Seq[I], post: Seq[I], flushes: Seq[I]): Unit = {
    def start() = mk().writeStream
      .foreachBatch { (df: Dataset[O], _: Long) =>
        df.collect().foreach(out.add)
      }
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .start()
    val q1 = start()
    try {
      input.addData(pre: _*)
      q1.processAllAvailable()
    } finally { q1.stop(); q1.awaitTermination() }
    assert(out.isEmpty,
      s"open hour emitted provisional rows before the restart: $out")
    val q2 = start()
    try {
      input.addData(post: _*)
      q2.processAllAvailable()
      flushes.foreach { f =>
        input.addData(f)
        q2.processAllAvailable()
      }
    } finally q2.stop()
  }

  private def ckptDir(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft-sketch-restart-$tag").toString

  test("StreamingDistinct.cells survives a mid-hour checkpoint " +
      "restart: per-(hour, salt) register tables emit exactly once " +
      "and merge() over the sink table equals the batch sketch of " +
      "the full input") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingSketchRestartSpec.distinctOut
    distinctOut.clear()
    val hour = 700L
    val t0 = StreamingDistinct.HourUs * hour
    val vals = (1 to 1200).map(i => s"v-$i-${i * 7919}")
    val (pre, post) = vals.splitAt(600)
    val input = MemoryStream[StreamingDistinct.SeenValue]
    restartRun(input,
      () => StreamingDistinct.cells(input.toDS(), salts = 4,
        maxDelay = "1 second"),
      ckptDir("dist"), distinctOut,
      pre.map(v => StreamingDistinct.SeenValue(v, t0 + 1000)),
      // duplicates of pre-restart values: the restored registers
      // must absorb them without moving
      (post ++ pre.take(200))
        .map(v => StreamingDistinct.SeenValue(v, t0 + 2000)),
      Seq(
        StreamingDistinct.SeenValue("flush-1",
          t0 + StreamingDistinct.HourUs + 2000000),
        StreamingDistinct.SeenValue("flush-2",
          t0 + StreamingDistinct.HourUs + 3000000)))
    val cells = distinctOut.asScala.toSeq.filter(_.hourBucket == hour)
    assert(cells.nonEmpty, "no register rows emitted at hour close")
    assert(cells.map(c => (c.salt, c.register)).distinct.size ===
      cells.size,
      s"a (salt, register) row was emitted twice across the restart")
    val merged = StreamingDistinct.merge(cells.toDS()).collect()
    assert(merged.length === 1)
    val batch = Sketches.hllSummary(
        Sketches.hllRegisters(
          (vals ++ pre.take(200)).toDF("v"), lit("k"), col("v"), 8), 8)
      .collect().head
    assert(merged.head.vZero === batch.getAs[Long]("v_zero") &&
        merged.head.sScaled === batch.getAs[Long]("s_scaled"),
      "sink-table merge diverged from the batch sketch after restart")
  }

  test("StreamingCms.cells survives a mid-hour checkpoint restart: " +
      "per-(hour, salt) cell tables emit exactly once and merge() " +
      "over the sink table equals the batch cell table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingSketchRestartSpec.cmsOut
    cmsOut.clear()
    val hour = 701L
    val t0 = StreamingCms.HourUs * hour
    val keys = (1 to 900).map(i => s"k-${i % 300}")
    val (pre, post) = keys.splitAt(450)
    val input = MemoryStream[StreamingCms.KeyedEvent]
    restartRun(input,
      () => StreamingCms.cells(input.toDS(), salts = 4,
        maxDelay = "1 second"),
      ckptDir("cms"), cmsOut,
      pre.map(k => StreamingCms.KeyedEvent(k, t0 + 1000)),
      post.map(k => StreamingCms.KeyedEvent(k, t0 + 2000)),
      Seq(
        StreamingCms.KeyedEvent("flush-1",
          t0 + StreamingCms.HourUs + 2000000),
        StreamingCms.KeyedEvent("flush-2",
          t0 + StreamingCms.HourUs + 3000000)))
    val cells = cmsOut.asScala.toSeq.filter(_.hourBucket == hour)
    assert(cells.nonEmpty, "no cell rows emitted at hour close")
    assert(cells.map(c => (c.salt, c.r, c.c)).distinct.size ===
      cells.size,
      "a (salt, r, c) row was emitted twice across the restart")
    val merged = StreamingCms.merge(cells.toDS())
      .collect().map(c => (c.r, c.c) -> c.cnt).toMap
    val batch = Sketches.cmsCells(keys.toDF("key"), col("key"),
        StreamingCms.D, StreamingCms.W)
      .collect()
      .map(r => (r.getAs[Int]("r"), r.getAs[Long]("c")) ->
        r.getAs[Long]("cnt")).toMap
    assert(merged === batch,
      "sink-table merge diverged from the batch cell table")
  }

  test("StreamingKmv.cells survives a mid-hour checkpoint restart: " +
      "per-(hour, salt) bottom-k tables emit exactly once and " +
      "merge() over the sink table equals the batch sketch summary " +
      "bit-exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingSketchRestartSpec.kmvOut
    kmvOut.clear()
    val hour = 703L
    val t0 = StreamingKmv.HourUs * hour
    val vals = (1 to 1200).map(i => s"v-$i-${i * 7919}")
    val (pre, post) = vals.splitAt(600)
    val input = MemoryStream[StreamingDistinct.SeenValue]
    restartRun(input,
      () => StreamingKmv.cells(input.toDS(), salts = 4,
        maxDelay = "1 second"),
      ckptDir("kmv"), kmvOut,
      pre.map(v => StreamingDistinct.SeenValue(v, t0 + 1000)),
      // duplicates of pre-restart values: the restored bottom-k must
      // absorb them without moving
      (post ++ pre.take(200))
        .map(v => StreamingDistinct.SeenValue(v, t0 + 2000)),
      Seq(
        StreamingDistinct.SeenValue("flush-1",
          t0 + StreamingKmv.HourUs + 2000000),
        StreamingDistinct.SeenValue("flush-2",
          t0 + StreamingKmv.HourUs + 3000000)))
    val cells = kmvOut.asScala.toSeq.filter(_.hourBucket == hour)
    assert(cells.nonEmpty, "no sketch rows emitted at hour close")
    assert(cells.map(c => (c.salt, c.h)).distinct.size === cells.size,
      "a (salt, h) row was emitted twice across the restart")
    val merged = StreamingKmv.merge(cells.toDS()).collect()
    assert(merged.length === 1)
    val batch = Sketches.kmvSummary(
        Sketches.kmvSketch(
          (vals ++ pre.take(200)).toDF("v"), lit("k"), col("v"),
          StreamingKmv.K), StreamingKmv.K)
      .withColumn("est", expr(Sketches.kmvEstimateSql(StreamingKmv.K)))
      .collect().head
    assert(merged.head.nK === batch.getAs[Long]("n_k") &&
        merged.head.theta === batch.getAs[Long]("theta") &&
        merged.head.estimate === batch.getAs[Double]("est"),
      "sink-table merge diverged from the batch sketch after restart")
  }

  test("StreamingKmv.keyedCells survives a mid-hour checkpoint " +
      "restart on ROCKSDB state: per-(source, hour, salt) sketches " +
      "emit exactly once, and the pair set algebra over the sink " +
      "equals the batch derivation — live contamination monitoring " +
      "recovers from a cold stop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingSketchRestartSpec.keyedOut
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      keyedOut.clear()
      val hour = 704L
      val t0 = StreamingKmv.HourUs * hour
      val data = Seq(
        "src0" -> (1 to 400), "src1" -> (200 to 600))
        .flatMap { case (s, r) =>
          r.map(i => (s, s"val-$i-${i * 7919}")) }
      val (pre, post) = data.splitAt(data.size / 2)
      val input = MemoryStream[StreamingKmv.KeyedSeen]
      restartRun(input,
        () => StreamingKmv.keyedCells(input.toDS(), salts = 4,
          maxDelay = "1 second"),
        ckptDir("kmv-keyed"), keyedOut,
        pre.map { case (s, v) =>
          StreamingKmv.KeyedSeen(s, v, t0 + 1000) },
        post.map { case (s, v) =>
          StreamingKmv.KeyedSeen(s, v, t0 + 2000) },
        Seq(
          StreamingKmv.KeyedSeen("flush", "f1",
            t0 + StreamingKmv.HourUs + 2000000),
          StreamingKmv.KeyedSeen("flush", "f2",
            t0 + StreamingKmv.HourUs + 3000000)))
      val cells = keyedOut.asScala.toSeq.filter(_.hourBucket == hour)
      assert(cells.nonEmpty, "no sketch rows emitted at hour close")
      assert(cells.map(c => (c.key, c.salt, c.h)).distinct.size ===
        cells.size,
        "a (key, salt, h) row was emitted twice across the restart")
      // sink-table sketches == batch sketches, per source, bit-exact
      val live = StreamingKmv.mergeKeyed(cells.toDS())
        .select("key", "h")
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .toSeq.sorted
      val batchSketch = Sketches.kmvSketch(
        data.toDF("src", "v"), col("src"), col("v"), StreamingKmv.K)
      val batch = batchSketch
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .toSeq.sorted
      assert(live === batch,
        "per-source sink sketches diverged from batch after restart")
      // ...and the COMPOSED live pipeline (r18 verdict task #6):
      // keyedCells -> sink table -> mergeKeyed -> the
      // kmv_pair_estimate set algebra, across the restart — closed-
      // hour pair ESTIMATES equal the batch derivation (theta,
      // n_match and the shared-string inter_est, all bit-exact
      // because the sketch tables are)
      def pairAlgebra(sketch: org.apache.spark.sql.DataFrame)
          : Seq[(String, String, Long, Long, Double)] = {
        val smry = Sketches.kmvSummary(sketch, StreamingKmv.K)
        val srcs = smry.select("key").distinct()
        val pairs = srcs.select(col("key").as("s1"))
          .join(srcs.select(col("key").as("s2")),
            col("s1") < col("s2"))
        val pth = pairs
          .join(smry.select(col("key").as("s1"),
            col("th_eff").as("t1")), "s1")
          .join(smry.select(col("key").as("s2"),
            col("th_eff").as("t2")), "s2")
          .withColumn("theta", least(col("t1"), col("t2")))
          .select("s1", "s2", "theta")
        val nMatch = pairs
          .join(sketch.select(col("key").as("s1"), col("h")), "s1")
          .join(sketch.select(col("key").as("s2"), col("h")),
            Seq("s2", "h"))
          .join(pth, Seq("s1", "s2"))
          .filter(col("h") < col("theta"))
          .groupBy("s1", "s2").agg(count(lit(1)).as("n_match"))
        pth.join(nMatch, Seq("s1", "s2"), "left")
          .withColumn("n_match", coalesce(col("n_match"), lit(0L)))
          .withColumn("inter_est", expr(Sketches.KmvInterEstSql))
          .collect()
          .map(r => (r.getAs[String]("s1"), r.getAs[String]("s2"),
            r.getAs[Long]("n_match"), r.getAs[Long]("theta"),
            r.getAs[Double]("inter_est")))
          .toSeq.sortBy(t => (t._1, t._2))
      }
      val livePairs = pairAlgebra(
        StreamingKmv.mergeKeyed(cells.toDS()).select("key", "h"))
      val batchPairs = pairAlgebra(batchSketch)
      assert(livePairs === batchPairs,
        s"closed-hour pair estimates diverged from the batch " +
          s"derivation after restart:\nlive  $livePairs\n" +
          s"batch $batchPairs")
      assert(livePairs.exists(_._3 > 0L),
        s"degenerate composition: no pair matched any hashes " +
          s"(src0/src1 ranges overlap by construction): $livePairs")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("StreamingDistinct.keyedCells survives a mid-hour checkpoint " +
      "restart (r19, completing the keyed family 4/4): per-(source, " +
      "hour, salt) register tables emit exactly once and mergeKeyed " +
      "over the sink equals the batch per-source hllRegisters") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingSketchRestartSpec.keyedDistOut
    keyedDistOut.clear()
    val hour = 707L
    val t0 = StreamingDistinct.HourUs * hour
    val data = Seq("src0" -> (1 to 400), "src1" -> (200 to 600))
      .flatMap { case (s, r) => r.map(i => (s, s"val-$i-${i * 7919}")) }
    val (pre, post) = data.splitAt(data.size / 2)
    val input = MemoryStream[StreamingDistinct.KeyedSeen]
    restartRun(input,
      () => StreamingDistinct.keyedCells(input.toDS(), salts = 4,
        maxDelay = "1 second"),
      ckptDir("dist-keyed"), keyedDistOut,
      pre.map { case (s, v) =>
        StreamingDistinct.KeyedSeen(s, v, t0 + 1000) },
      // duplicates of pre-restart values: restored registers must
      // absorb them without moving
      (post ++ pre.take(100)).map { case (s, v) =>
        StreamingDistinct.KeyedSeen(s, v, t0 + 2000) },
      Seq(
        StreamingDistinct.KeyedSeen("flush", "f1",
          t0 + StreamingDistinct.HourUs + 2000000),
        StreamingDistinct.KeyedSeen("flush", "f2",
          t0 + StreamingDistinct.HourUs + 3000000)))
    val cells = keyedDistOut.asScala.toSeq.filter(_.hourBucket == hour)
    assert(cells.nonEmpty, "no register rows emitted at hour close")
    assert(cells.map(c => (c.key, c.salt, c.register)).distinct.size ===
      cells.size,
      "a (key, salt, register) row was emitted twice across the restart")
    val live = StreamingDistinct.mergeKeyed(cells.toDS())
      .collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Int]("register")) ->
        r.getAs[Int]("m")).toMap
    val batch = Sketches.hllRegisters(
        data.toDF("src", "v"), col("src"), col("v"), 8)
      .collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Long]("register").toInt)
        -> r.getAs[Int]("m")).toMap
    assert(live === batch,
      "per-source sink registers diverged from batch after restart")
  }

  test("HLL live-pair e2e (r19 verdict task #3 — the KMV composition " +
      "mirrored, completing live contamination monitoring for both " +
      "estimators): StreamingDistinct.keyedCells -> sink table -> " +
      "mergeKeyed -> the hll_pair_estimate register algebra across a " +
      "restart equals the batch derivation with no double-emitted " +
      "register") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingSketchRestartSpec.hllPairOut
    hllPairOut.clear()
    val hour = 708L
    val t0 = StreamingDistinct.HourUs * hour
    val data = Seq("src0" -> (1 to 400), "src1" -> (200 to 600))
      .flatMap { case (s, r) => r.map(i => (s, s"val-$i-${i * 7919}")) }
    val (pre, post) = data.splitAt(data.size / 2)
    val input = MemoryStream[StreamingDistinct.KeyedSeen]
    restartRun(input,
      () => StreamingDistinct.keyedCells(input.toDS(), salts = 4,
        maxDelay = "1 second"),
      ckptDir("hll-pair"), hllPairOut,
      pre.map { case (s, v) =>
        StreamingDistinct.KeyedSeen(s, v, t0 + 1000) },
      post.map { case (s, v) =>
        StreamingDistinct.KeyedSeen(s, v, t0 + 2000) },
      Seq(
        StreamingDistinct.KeyedSeen("flush", "f1",
          t0 + StreamingDistinct.HourUs + 2000000),
        StreamingDistinct.KeyedSeen("flush", "f2",
          t0 + StreamingDistinct.HourUs + 3000000)))
    val cells = hllPairOut.asScala.toSeq.filter(_.hourBucket == hour)
    assert(cells.nonEmpty, "no register rows emitted at hour close")
    assert(cells.map(c => (c.key, c.salt, c.register)).distinct.size ===
      cells.size,
      "a (key, salt, register) row was emitted twice across the restart")
    // the hll_pair_estimate register algebra (union register-max +
    // the shared-string estimate + inclusion-exclusion), run over
    // EITHER register frame — bit-exact equality holds because the
    // integer register tables are equal
    def pairAlgebra(regs: org.apache.spark.sql.DataFrame)
        : Seq[(String, String, Double, Double, Double, Double)] = {
      val est = Sketches.hllSummary(regs, 8)
        .withColumn("est", expr(Sketches.hllEstimateSql(8)))
        .select("key", "est")
      val srcs = regs.select("key").distinct()
      val pairs = srcs.select(col("key").as("s1"))
        .join(srcs.select(col("key").as("s2")), col("s1") < col("s2"))
      val pu = pairs
        .join(regs.withColumnRenamed("key", "s1"), "s1")
        .select("s1", "s2", "register", "m")
        .unionByName(pairs
          .join(regs.withColumnRenamed("key", "s2"), "s2")
          .select("s1", "s2", "register", "m"))
      Sketches.hllSummaryBy(
          pu.groupBy("s1", "s2", "register").agg(max("m").as("m")),
          Seq("s1", "s2"), 8)
        .withColumn("est_union", expr(Sketches.hllEstimateSql(8)))
        .join(est.select(col("key").as("s1"), col("est").as("est_s1")),
          "s1")
        .join(est.select(col("key").as("s2"), col("est").as("est_s2")),
          "s2")
        .withColumn("inter_est", expr("est_s1 + est_s2 - est_union"))
        .collect()
        .map(r => (r.getAs[String]("s1"), r.getAs[String]("s2"),
          r.getAs[Double]("est_s1"), r.getAs[Double]("est_s2"),
          r.getAs[Double]("est_union"), r.getAs[Double]("inter_est")))
        .toSeq.sortBy(t => (t._1, t._2))
    }
    val livePairs = pairAlgebra(
      StreamingDistinct.mergeKeyed(cells.toDS())
        .select(col("key"),
          col("register").cast("long").as("register"), col("m")))
    val batchPairs = pairAlgebra(
      Sketches.hllRegisters(data.toDF("src", "v"),
        col("src"), col("v"), 8))
    assert(livePairs === batchPairs,
      s"closed-hour HLL pair estimates diverged from the batch " +
        s"derivation after restart:\nlive  $livePairs\n" +
        s"batch $batchPairs")
    assert(livePairs.exists(_._6 > 0d),
      s"degenerate composition: no pair shows positive estimated " +
        s"overlap (src0/src1 ranges overlap by construction): " +
        s"$livePairs")
  }

  test("StreamingCms.keyedCells survives a mid-hour checkpoint " +
      "restart (r19, completing the keyed family): per-(source, hour, " +
      "salt) cell tables emit exactly once and mergeKeyed over the " +
      "sink equals the batch per-source cmsCells") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingSketchRestartSpec.keyedCmsOut
    keyedCmsOut.clear()
    val hour = 705L
    val t0 = StreamingCms.HourUs * hour
    val data = Seq("src0" -> 0, "src1" -> 5).flatMap { case (s, off) =>
      (1 to 600).map(i => (s, s"item-${(i + off) % 211}"))
    }
    val (pre, post) = data.splitAt(data.size / 2)
    val input = MemoryStream[StreamingCms.KeyedSeen]
    restartRun(input,
      () => StreamingCms.keyedCells(input.toDS(), salts = 4,
        maxDelay = "1 second"),
      ckptDir("cms-keyed"), keyedCmsOut,
      pre.map { case (s, v) => StreamingCms.KeyedSeen(s, v, t0 + 1000) },
      post.map { case (s, v) => StreamingCms.KeyedSeen(s, v, t0 + 2000) },
      Seq(
        StreamingCms.KeyedSeen("flush", "f1",
          t0 + StreamingCms.HourUs + 2000000),
        StreamingCms.KeyedSeen("flush", "f2",
          t0 + StreamingCms.HourUs + 3000000)))
    val cells = keyedCmsOut.asScala.toSeq.filter(_.hourBucket == hour)
    assert(cells.nonEmpty, "no cell rows emitted at hour close")
    assert(cells.map(c => (c.key, c.salt, c.r, c.c)).distinct.size ===
      cells.size,
      "a (key, salt, r, c) row was emitted twice across the restart")
    val live = StreamingCms.mergeKeyed(cells.toDS())
      .collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Int]("r"),
        r.getAs[Long]("c")) -> r.getAs[Long]("cnt")).toMap
    val batch = Seq("src0", "src1").flatMap { s =>
      Sketches.cmsCells(
          data.filter(_._1 == s).map(_._2).toDF("key"), col("key"),
          StreamingCms.D, StreamingCms.W)
        .collect()
        .map(r => (s, r.getAs[Int]("r"), r.getAs[Long]("c")) ->
          r.getAs[Long]("cnt"))
    }.toMap
    assert(live === batch,
      "per-source sink cell tables diverged from batch after restart")
  }

  test("StreamingHdr.keyedCells survives a mid-hour checkpoint " +
      "restart (r19, completing the keyed family): per-(source, hour, " +
      "salt) bucket tables emit exactly once and mergeKeyed over the " +
      "sink equals the batch per-source histograms") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingSketchRestartSpec.keyedHdrOut
    keyedHdrOut.clear()
    val hour = 706L
    val t0 = StreamingHdr.HourUs * hour
    val data = Seq("src0" -> 1L, "src1" -> 13L).flatMap {
      case (s, mult) => (1 to 500).map(i =>
        (s, (i.toLong * i * 7919L * mult) % 1000000L))
    }
    val (pre, post) = data.splitAt(data.size / 2)
    val input = MemoryStream[StreamingHdr.KeyedMeasured]
    restartRun(input,
      () => StreamingHdr.keyedCells(input.toDS(), salts = 4,
        maxDelay = "1 second"),
      ckptDir("hdr-keyed"), keyedHdrOut,
      pre.map { case (s, v) =>
        StreamingHdr.KeyedMeasured(s, v, t0 + 1000) },
      post.map { case (s, v) =>
        StreamingHdr.KeyedMeasured(s, v, t0 + 2000) },
      Seq(
        StreamingHdr.KeyedMeasured("flush", 1L,
          t0 + StreamingHdr.HourUs + 2000000),
        StreamingHdr.KeyedMeasured("flush", 2L,
          t0 + StreamingHdr.HourUs + 3000000)))
    val cells = keyedHdrOut.asScala.toSeq.filter(_.hourBucket == hour)
    assert(cells.nonEmpty, "no bucket rows emitted at hour close")
    assert(cells.map(c => (c.key, c.salt, c.bucket)).distinct.size ===
      cells.size,
      "a (key, salt, bucket) row was emitted twice across the restart")
    val live = StreamingHdr.mergeKeyed(cells.toDS())
      .collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Long]("bucket"),
        r.getAs[Long]("lo")) -> r.getAs[Long]("cnt")).toMap
    val batch = Seq("src0", "src1").flatMap { s =>
      data.filter(_._1 == s).map(_._2).toDF("vi")
        .selectExpr(s"${Sketches.hdrBucketSql("vi")} AS bucket",
          s"${Sketches.hdrBucketLoSql("vi")} AS lo")
        .groupBy("bucket", "lo").agg(count(lit(1)).as("cnt"))
        .collect()
        .map(r => (s, r.getAs[Long]("bucket"), r.getAs[Long]("lo")) ->
          r.getAs[Long]("cnt"))
    }.toMap
    assert(live === batch,
      "per-source sink histograms diverged from batch after restart")
  }

  test("StreamingHdr.cells survives a mid-hour checkpoint restart: " +
      "per-(hour, salt) bucket tables emit exactly once and merge() " +
      "over the sink table equals the batch bucket histogram") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingSketchRestartSpec.hdrOut
    hdrOut.clear()
    val hour = 702L
    val t0 = StreamingHdr.HourUs * hour
    val vals = (1 to 1000).map(i => (i.toLong * i * 7919L) % 1000000L)
    val (pre, post) = vals.splitAt(500)
    val input = MemoryStream[StreamingHdr.Measured]
    restartRun(input,
      () => StreamingHdr.cells(input.toDS(), salts = 4,
        maxDelay = "1 second"),
      ckptDir("hdr"), hdrOut,
      pre.map(v => StreamingHdr.Measured(v, t0 + 1000)),
      post.map(v => StreamingHdr.Measured(v, t0 + 2000)),
      Seq(
        StreamingHdr.Measured(1L, t0 + StreamingHdr.HourUs + 2000000),
        StreamingHdr.Measured(2L, t0 + StreamingHdr.HourUs + 3000000)))
    val cells = hdrOut.asScala.toSeq.filter(_.hourBucket == hour)
    assert(cells.nonEmpty, "no bucket rows emitted at hour close")
    assert(cells.map(c => (c.salt, c.bucket)).distinct.size ===
      cells.size,
      "a (salt, bucket) row was emitted twice across the restart")
    val merged = StreamingHdr.merge(cells.toDS())
      .collect().map(b => (b.bucket, b.lo) -> b.cnt).toMap
    val batch = vals.toDF("vi")
      .selectExpr(s"${Sketches.hdrBucketSql("vi")} AS bucket",
        s"${Sketches.hdrBucketLoSql("vi")} AS lo")
      .groupBy("bucket", "lo").agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("lo")) ->
        r.getAs[Long]("cnt")).toMap
    assert(merged === batch,
      "sink-table merge diverged from the batch bucket histogram")
  }
}

object StreamingSketchRestartSpec {
  // sink tables for the restart runs — static so the foreachBatch
  // closures survive serialization AND query restarts
  val distinctOut = new java.util.concurrent.ConcurrentLinkedQueue[
    StreamingDistinct.RegisterCell]()
  val cmsOut = new java.util.concurrent.ConcurrentLinkedQueue[
    StreamingCms.SaltedCell]()
  val kmvOut = new java.util.concurrent.ConcurrentLinkedQueue[
    StreamingKmv.SketchHash]()
  val keyedOut = new java.util.concurrent.ConcurrentLinkedQueue[
    StreamingKmv.KeyedSketchHash]()
  val hdrOut = new java.util.concurrent.ConcurrentLinkedQueue[
    StreamingHdr.SaltedBucket]()
  val keyedCmsOut = new java.util.concurrent.ConcurrentLinkedQueue[
    StreamingCms.KeyedSaltedCell]()
  val keyedHdrOut = new java.util.concurrent.ConcurrentLinkedQueue[
    StreamingHdr.KeyedSaltedBucket]()
  val keyedDistOut = new java.util.concurrent.ConcurrentLinkedQueue[
    StreamingDistinct.KeyedRegisterCell]()
  val hllPairOut = new java.util.concurrent.ConcurrentLinkedQueue[
    StreamingDistinct.KeyedRegisterCell]()
}
