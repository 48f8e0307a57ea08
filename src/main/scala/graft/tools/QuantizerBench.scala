package graft.tools

import graft.GraftSession
import graft.operators.Similarity
import org.apache.spark.sql.functions.col

/** Times IVF quantizer training on the embeddings table at
  * SPARK_GRAFT_SF_DIR for a list of k values, separating init from the
  * Lloyd rounds and reporting the Spark JOB count each phase ran — the
  * measured form of the k-means|| claim (init = O(initRounds) scans,
  * not O(k)): at k = 512 the old farthest-point init would run 511
  * sequential scan jobs; the oversampled init runs ~2·initRounds + 1
  * regardless of k.
  *
  * usage: QuantizerBench [k ...]   (default: 16 64 256)
  */
object QuantizerBench {
  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(16, 64, 256)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-quantizer-bench")
    val e = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val n = e.count() // warm the scan path once
    val sc = spark.sparkContext
    ks.foreach { k =>
      val jobs0 = sc.statusTracker.getJobIdsForGroup(null).length
      val t0 = System.nanoTime()
      val cents = Similarity.trainCentroids(e, col("embedding"), k,
        iters = 0)
      val tInit = (System.nanoTime() - t0) / 1e9
      val jobsInit = sc.statusTracker.getJobIdsForGroup(null).length - jobs0
      val t1 = System.nanoTime()
      val full = Similarity.trainCentroids(e, col("embedding"), k,
        iters = 5)
      val tFull = (System.nanoTime() - t1) / 1e9
      require(cents.length == k && full.length == k)
      println(f"[quantizer] n=$n k=$k%4d init=$tInit%6.2f s " +
        f"($jobsInit jobs)  init+5 Lloyd=$tFull%6.2f s")
    }
    spark.stop()
  }
}
