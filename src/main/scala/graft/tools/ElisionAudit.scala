package graft.tools

import graft.{GraftSession, SparkEntry}

/** Bench-integrity audit (r15): for every registered query, compare
  * the optimized plan of `df.count()` against the query's own plan and
  * report where the count path ELIDES joins — Spark's
  * duplicate-agnostic outer-join elimination drops subtrees behind a
  * left join to a unique-keyed aggregate, so Bench's count()-based
  * timing measures only the surviving side for those shapes (see
  * Bench's scaladoc; `TimeQuery -full` is the truth instrument).
  * Plan-only — nothing executes beyond what query CONSTRUCTION runs.
  *
  * Usage: `runMain graft.tools.ElisionAudit [sfDir]` (default
  * sf0.001). Prints one line per affected query and a summary.
  */
object ElisionAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.local("graft-elision-audit")
    def joins(s: String): Int = "Join".r.findAllIn(s).length
    var affected = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val fullJ = joins(df.queryExecution.optimizedPlan.toString)
        val countJ = joins(
          df.groupBy().count().queryExecution.optimizedPlan.toString)
        if (countJ < fullJ) {
          affected += 1
          println(s"[elision] $name: $fullJ joins in the query plan, " +
            s"$countJ under count() — Bench under-measures this shape")
        }
      } catch {
        case e: Throwable =>
          println(s"[elision] $name: audit failed: ${e.getMessage}")
      }
    }
    println(s"[elision] ${SparkEntry.queries.size} queries audited, " +
      s"$affected with count()-elided joins")
    spark.stop()
  }
}
