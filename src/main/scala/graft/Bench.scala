package graft
/** Headline benchmark: one JSON line of per-query seconds at
  * SPARK_GRAFT_SF_DIR. Each query first runs once on tiny sf0.001 and
  * once on the target directory, so JIT + whole-stage-codegen
  * compilation (including the AQE-replanned final stages, which only
  * materialize at target volume) happen outside the timed run — the
  * timed number measures the engine, not HotSpot. Session comes from
  * GraftSession (same config as Verify, so benched plans are the
  * verified plans). */
object Bench {
  private val warmupDir = "/root/testdata/sf0.001"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-bench")
    // optional trailing args restrict to named queries (local scale
    // spot-runs); default — the driver's call — benches the full set
    val only = args.toSet
    val headline = SparkEntry.benchQueries
      .filter { case (n, _) => only.isEmpty || only(n) }
    Seq(warmupDir, sfDir).foreach { dir =>
      headline.foreach { case (_, fn) =>
        try { fn(spark, dir).count() } catch { case _: Throwable => () }
      }
    }
    // Three timed passes, per-query MIN over SUCCESSFUL passes only: the
    // machine shares CPU with driver-side jobs, so a single pass can be
    // contended 2-10×; the minimum is the steady-state engine cost. A
    // throwing pass is excluded (it must not win the min as a bogus
    // near-zero), and a query with zero successful passes is reported in
    // "failed" and left out of the total instead of corrupting it. The
    // cache is cleared before each pass so operators that persist reused
    // intermediates (dedup joins) pay their cache build inside the
    // measurement.
    val passes = (1 to 3).map { _ =>
      spark.catalog.clearCache()
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
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
