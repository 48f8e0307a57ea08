package graft
/** Headline benchmark: one JSON line of per-query seconds at
  * SPARK_GRAFT_SF_DIR. Each query first runs once on tiny sf0.001 and
  * once on the target directory, so JIT + whole-stage-codegen
  * compilation (including the AQE-replanned final stages, which only
  * materialize at target volume) happen outside the timed run — the
  * timed number measures the engine, not HotSpot. Session comes from
  * GraftSession (same config as Verify, so benched plans are the
  * verified plans).
  *
  * KNOWN MEASUREMENT ARTIFACT (r15, plan-verified): timing via
  * `df.count()` lets the optimizer drop final sorts for every query
  * and — via Spark's duplicate-agnostic OUTER-JOIN elimination —
  * entire subtrees behind a left join to a unique-keyed aggregate.
  * `graft.tools.ElisionAudit` sweeps the registry for the shape: 16
  * of 195 queries lose joins under count() (full list + measured true
  * costs in SCALE.md r15 — worst gaps: dedup_span_trim 0.19 s benched
  * vs 3.8 s full, simhash_calibration 1.0 vs 5.0, containment_
  * survivors 0.33 vs 3.2). The methodology stays count()-based for
  * round-over-round comparability, and since r16 the JSON also
  * carries a "full" column: toRdd-materialized min-of-3 times for
  * exactly the elided set, so a regression inside an elided subtree
  * is visible round-over-round (compare_bench.py diffs both columns).
  * `TimeQuery -full` remains the isolation instrument, and the
  * queries' CORRECTNESS cost is always real (Verify writes parquet). */
object Bench {
  private val warmupDir = "/root/testdata/sf0.001"

  /** Fixed single-thread mixing loop (~0.5 s uncontended): identical
    * work every call, so its wall time is a pure machine-load gauge.
    * One runs before each timed pass and the times ship in the JSON as
    * "calib" — when bench numbers inflate vs steady-state (SCALE.md
    * min-of-3), an inflated calib pins it on sandbox contention, not
    * the engine. */
  private def calibrate(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < 150000000) { x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL; i += 1 }
    if (x == 42L) print("") // keep the loop observable
    (System.nanoTime() - t0) / 1e9
  }

  /** The SAME mixing loop on every core at once (shorter per-thread
    * iteration count; wall time of the whole barrier) — the
    * MULTI-CORE load gauge the r16 snapshot showed the single-thread
    * calib cannot be: a co-tenant process eating N of 32 cores leaves
    * one pinned thread untouched (calib flat) while inflating every
    * 32-way Spark stage by ~32/(32−N). Queries contend like this
    * gauge, not like calibrate(). Ships as "calib_mt";
    * compare_bench.py prefers it for normalization when both
    * snapshots carry it. */
  private def calibrateMt(): Double = {
    val n = Runtime.getRuntime.availableProcessors()
    val t0 = System.nanoTime()
    val threads = (0 until n).map { t =>
      new Thread(() => {
        var x = 0x9E3779B97F4A7C15L + t
        var i = 0
        while (i < 40000000) {
          x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL; i += 1
        }
        if (x == 42L) print("")
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // optional trailing args restrict to named queries (local scale
    // spot-runs); default — the driver's call — benches the full set.
    // Unknown names fail FAST: a typo must not silently shrink the
    // benched set and report a "successful" run of the wrong queries.
    val only = args.toSet
    val valid = SparkEntry.benchQueries.map(_._1).toSet
    val unknown = only.diff(valid)
    require(unknown.isEmpty,
      s"unknown bench queries: ${unknown.toSeq.sorted.mkString(", ")}; " +
        s"valid names: ${valid.toSeq.sorted.mkString(", ")}")
    val spark = GraftSession.local("graft-bench")
    val headline = SparkEntry.benchQueries
      .filter { case (n, _) => only.isEmpty || only(n) }
    Seq(warmupDir, sfDir).foreach { dir =>
      headline.foreach { case (_, fn) =>
        try { fn(spark, dir).count() } catch { case _: Throwable => () }
      }
    }
    // Three timed passes, INTERLEAVED round-robin (q1..qN, q1..qN,
    // q1..qN) with per-query MIN over SUCCESSFUL passes only: the
    // machine shares CPU with driver-side jobs, so a single sample can
    // be contended 2-10×; interleaving separates a query's samples by a
    // full pass (~minutes), decorrelating them from any one contention
    // burst, and the minimum is the steady-state engine cost. A
    // throwing pass is excluded (it must not win the min as a bogus
    // near-zero), and a query with zero successful passes is reported in
    // "failed" and left out of the total instead of corrupting it. The
    // cache is cleared before each pass so operators that persist reused
    // intermediates (dedup joins) pay their cache build inside the
    // measurement. A calibration probe before each pass records machine
    // load at that moment (see calibrate()).
    val calibs = scala.collection.mutable.ArrayBuffer.empty[Double]
    val calibsMt = scala.collection.mutable.ArrayBuffer.empty[Double]
    val passes = (1 to 3).map { _ =>
      spark.catalog.clearCache()
      calibs += calibrate()
      calibsMt += calibrateMt()
      headline.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
        name -> (if (ok) Some((System.nanoTime() - t0) / 1e9) else None)
      }
    }
    val byName = headline.map { case (name, _) =>
      name -> passes.flatMap(_.collect { case (`name`, Some(t)) => t })
    }
    val results = byName.collect { case (n, ts) if ts.nonEmpty => n -> ts.min }
    val failed = byName.collect { case (n, ts) if ts.isEmpty => n }
    // FULL-materialization column (r15 verdict task #2) for exactly
    // the count()-elided shapes: their count()-timed number above
    // measures only the surviving join side, so a regression inside
    // the elided subtree would be invisible round-over-round. Same
    // min-of-3 interleaved methodology, timed via
    // `queryExecution.toRdd.count()` (every output row materializes —
    // TimeQuery -full's truth instrument). The elided set comes from
    // the live ElisionAudit predicate, not a hardcoded list, so a new
    // elided query gets its full row automatically (ElisionPinSpec
    // separately pins the expected set).
    val elidedSet = graft.tools.ElisionAudit.elided(spark, warmupDir)
      .filter(n => only.isEmpty || only(n)).toSet
    val fullTargets = headline.filter { case (n, _) => elidedSet(n) }
    val fullPasses = (1 to 3).map { _ =>
      spark.catalog.clearCache()
      fullTargets.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
          catch { case _: Throwable => false }
        name -> (if (ok) Some((System.nanoTime() - t0) / 1e9) else None)
      }
    }
    val fullByName = fullTargets.map { case (name, _) =>
      name -> fullPasses.flatMap(_.collect { case (`name`, Some(t)) => t })
    }
    val fullResults =
      fullByName.collect { case (n, ts) if ts.nonEmpty => n -> ts.min }
    // An elided query whose toRdd pass starts crashing must be FLAGGED,
    // not silently dropped from the `full` column (r16 ADVICE): the
    // count()-timed number above can stay green while the real
    // materialization is broken, and compare_bench.py would just
    // shrink the shared full set.
    val fullFailed = fullByName.collect { case (n, ts) if ts.isEmpty => n }
    // ... and an INTERMITTENT crasher (some passes fail, some survive)
    // must not hide behind the min of its surviving passes (r17
    // ADVICE): `full_passes` ships the per-query success count out of
    // the 3 attempts, and `flaky` lists any query — timed or full —
    // whose success count is neither 0 (already in failed/full_failed)
    // nor the full 3.
    val fullPassCounts = fullByName.map { case (n, ts) => n -> ts.size }
    val flaky = (byName ++ fullByName)
      .collect { case (n, ts) if ts.nonEmpty && ts.size < 3 => n }
      .distinct
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fullJson = fullResults.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val fullFailedJson =
      fullFailed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val fullPassesJson = fullPassCounts
      .map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val flakyJson = flaky.map("\"" + _ + "\"").mkString("[", ",", "]")
    val calibJson = calibs.map(c => f"$c%.3f").mkString("[", ",", "]")
    val calibMtJson =
      calibsMt.map(c => f"$c%.3f").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"full":$fullJson,"failed":$failedJson,"full_failed":$fullFailedJson,"full_passes":$fullPassesJson,"flaky":$flakyJson,"calib":$calibJson,"calib_mt":$calibMtJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
