package graft.tools

import graft.{GraftSession, SparkEntry}

/** Plan inspection: prints `explain("formatted")` for each headline
  * query (or the ones named in args) at the given SF dir — the review
  * loop for pushdown/pruning/broadcast/codegen checks. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val spark = GraftSession.local("graft-explain")
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.benchQueries.map(_._1)
    names.foreach { n =>
      SparkEntry.queries.get(n).foreach { fn =>
        println(s"\n========== $n ==========")
        fn(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
