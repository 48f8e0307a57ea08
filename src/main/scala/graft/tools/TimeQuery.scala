package graft.tools

import graft.{GraftSession, SparkEntry}

/** Times one registered query for N passes on SPARK_GRAFT_SF_DIR with
  * the engine session — the isolation harness for "Bench says X,
  * elsewhere says Y" discrepancies (no warmups, no other queries, no
  * cache clearing: just the query under the engine config). */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: TimeQuery <query-name> [passes]\n" +
        "registered queries:\n  " +
        SparkEntry.queries.keys.toSeq.sorted.mkString("\n  "))
      sys.exit(2)
    }
    val name = args(0)
    val passes = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val fn = SparkEntry.queries.getOrElse(name, {
      val near = SparkEntry.queries.keys.toSeq
        .filter(k => k.contains(name) || name.contains(k.take(5)))
      System.err.println(s"unknown query '$name'" +
        (if (near.nonEmpty) s" — did you mean: ${near.sorted.mkString(", ")}?"
         else "") + "\nrun with no args to list all registered names")
      sys.exit(2)
      throw new IllegalStateException("unreachable")
    })
    val spark = GraftSession.local("graft-time")
    (1 to passes).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[timequery] $name pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
