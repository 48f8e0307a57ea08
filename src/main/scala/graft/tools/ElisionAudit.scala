package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Bench-integrity audit (r15): for every registered query, compare
  * the optimized plan of `df.count()` against the query's own plan and
  * report where the count path ELIDES joins — Spark's
  * duplicate-agnostic outer-join elimination drops subtrees behind a
  * left join to a unique-keyed aggregate, so Bench's count()-based
  * timing measures only the surviving side for those shapes (see
  * Bench's scaladoc; `TimeQuery -full` is the truth instrument).
  * Plan-only — nothing executes beyond what query CONSTRUCTION runs
  * (bounded sizing probes: the BPE histogram memo and the
  * cosineDupPairs auto-sizing count, each once per process).
  *
  * The audit is load-bearing twice over (r15 verdict tasks #2/#5):
  * [[graft.Bench]] calls [[elided]] to decide which queries get the
  * extra full-materialization timing column, and `ElisionPinSpec`
  * asserts the set equals the documented list — a NEW query that
  * silently loses joins under count() fails the suite instead of
  * shipping a misleading bench row.
  *
  * Usage: `runMain graft.tools.ElisionAudit [sfDir]` (default
  * sf0.001). Prints one line per affected query and a summary.
  */
object ElisionAudit {

  private def joins(s: String): Int = "Join".r.findAllIn(s).length

  /** (query, joins in the query's own optimized plan, joins under
    * count()) for every registered query; a query whose construction
    * or optimization throws is reported with counts (-1, -1) so
    * callers can't silently skip it. Elision is a RULE-based plan
    * property (outer-join elimination keys on plan shape, not stats),
    * so the set is scale-independent — sf0.001 is the cheap default. */
  def audit(spark: SparkSession, dir: String): Seq[(String, Int, Int)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val fullJ = joins(df.queryExecution.optimizedPlan.toString)
        val countJ = joins(
          df.groupBy().count().queryExecution.optimizedPlan.toString)
        (name, fullJ, countJ)
      } catch { case _: Throwable => (name, -1, -1) }
    }

  /** The queries whose count() plan has FEWER joins than their own
    * plan — the set Bench's count()-timed column under-measures. */
  def elided(spark: SparkSession, dir: String): Seq[String] =
    audit(spark, dir).collect { case (n, f, c) if c < f => n }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.local("graft-elision-audit")
    val rows = audit(spark, dir)
    rows.foreach {
      case (name, -1, -1) =>
        println(s"[elision] $name: audit failed (construction threw)")
      case (name, fullJ, countJ) if countJ < fullJ =>
        println(s"[elision] $name: $fullJ joins in the query plan, " +
          s"$countJ under count() — Bench under-measures this shape")
      case _ => ()
    }
    val affected = rows.count { case (_, f, c) => c < f }
    println(s"[elision] ${rows.size} queries audited, " +
      s"$affected with count()-elided joins")
    spark.stop()
  }
}
