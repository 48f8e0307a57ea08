package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative loops (components, star
  * contraction, BFS, pointer doubling) with a configurable
  * DURABILITY strategy (r22, verdict #5 / carried from the r20
  * verdict):
  *
  *  - default: `localCheckpoint` — executor-memory blocks, fast, the
  *    right local-mode and interactive default, but NOT fault
  *    tolerant: losing an executor loses blocks and the whole
  *    iterative job with them (guide §5).
  *  - `graft.checkpoint.reliable = true` (session conf): reliable
  *    `df.checkpoint()` against the SparkContext checkpoint dir —
  *    survives executor loss, the 100 TB mode for multi-hour
  *    iterative jobs. The dir comes from `sc.setCheckpointDir` or,
  *    if unset, the `graft.checkpoint.dir` session conf; missing
  *    both fails fast with a config message rather than deep inside
  *    the loop.
  *
  * Both strategies truncate lineage identically (the returned frame
  * scans a materialized RDD), so plan growth — the reason every
  * iterative operator here checkpoints per round — is controlled the
  * same way in either mode; `CheckpointsSpec` pins result equality
  * and lineage truncation under the reliable strategy. */
object Checkpoints {

  def truncate(df: DataFrame, eager: Boolean = true): DataFrame = {
    val s = df.sparkSession
    if (s.conf.get("graft.checkpoint.reliable", "false").toBoolean) {
      val sc = s.sparkContext
      if (sc.getCheckpointDir.isEmpty) {
        val dir = s.conf.getOption("graft.checkpoint.dir").getOrElse(
          throw new IllegalStateException(
            "graft.checkpoint.reliable=true needs a checkpoint dir: " +
              "call sparkContext.setCheckpointDir or set " +
              "graft.checkpoint.dir"))
        sc.setCheckpointDir(dir)
      }
      df.checkpoint(eager)
    } else df.localCheckpoint(eager)
  }
}
