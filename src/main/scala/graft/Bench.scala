package graft
/** Headline benchmark: one JSON line of per-query seconds at
  * SPARK_GRAFT_SF_DIR. Each query is first executed once against the
  * tiny sf0.001 directory so JVM JIT + whole-stage-codegen compilation
  * happen outside the timed run — the timed number measures the engine,
  * not HotSpot warmup. Session comes from GraftSession (same config as
  * Verify, so benched plans are the verified plans). */
object Bench {
  private val warmupDir = "/root/testdata/sf0.001"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-bench")
    val headline = SparkEntry.benchQueries
    headline.foreach { case (_, fn) =>
      try { fn(spark, warmupDir).count() } catch { case _: Throwable => () }
    }
    val results = headline.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
