package graft

/** Registry-wide determinism pin: every registered query must return
  * IDENTICAL rows when the parquet scans are shredded into pathological
  * tiny splits (maxPartitionBytes floored) as under the default layout.
  * This is the end-to-end form of the per-operator layout-independence
  * arguments scattered through the repo — decimal-exact sums, quantized
  * -long training, md5-seeded sampling, per-row kernels: if ANY query
  * silently depended on split count or partition order (a double-sum
  * fold, a first()-wins dedup, an unseeded sample), this catches it at
  * the registry boundary, where a cluster repartition would otherwise
  * surface it as a production-only diff. */
class SplitLayoutSpec extends SparkSpec {

  test("all registered queries return identical results under a " +
      "pathological tiny-split scan layout") {
    val conf = spark.conf
    val keys = Seq("spark.sql.files.maxPartitionBytes",
      "spark.sql.files.openCostInBytes")
    val saved = keys.map(k => k -> conf.getOption(k))
    def runAll(): Map[String, Seq[String]] =
      SparkEntry.queries.map { case (name, fn) =>
        name -> fn(spark, sf0001).collect().map(_.toString).toSeq.sorted
      }
    try {
      val baseline = runAll()
      conf.set("spark.sql.files.maxPartitionBytes", "16384")
      conf.set("spark.sql.files.openCostInBytes", "0")
      val shredded = runAll()
      val diffs = baseline.keys.filter(k => baseline(k) != shredded(k))
      assert(diffs.isEmpty,
        s"layout-dependent queries: ${diffs.mkString(", ")}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
