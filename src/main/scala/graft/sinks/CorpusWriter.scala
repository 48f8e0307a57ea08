package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partitioned parquet writer for corpus snapshots — the write side
  * of the training-data pipeline (the deduped/filtered corpus goes
  * back to storage in a layout the NEXT job can prune).
  *
  * Layout contract:
  *  - `partitionBy(partitionCol)` → one directory per value, so any
  *    downstream read filtering on it prunes at PLANNING time
  *    (`PartitionFilters` in the scan — directories never listed,
  *    zero I/O for excluded values; `CorpusWriterSpec` pins the
  *    pruned-scan plan and the row-group `PushedFilters` on the
  *    sort column).
  *  - One shuffle hash-partitions rows by `partitionCol` BEFORE the
  *    write, so each output directory receives a bounded file count
  *    (per-partition-value writers across all tasks otherwise
  *    multiply: T tasks × V values small-file explosion — the classic
  *    write-amplification mistake at 100 TB).
  *  - `sortWithinPartitions(sortCols)` makes every parquet file
  *    internally sorted → tight row-group min/max statistics on the
  *    sort key, so range predicates skip row groups on read
  *    (pushdown works WITH the layout, not against random order).
  *  - `maxRecordsPerFile` bounds file size for object-store-friendly
  *    parallelism on re-read.
  *
  * Skew note: one hash partition per value means a single giant
  * partition value (the `en` problem) serializes into one task's
  * writer. For skewed corpora pass `filesPerPartition > 1` — rows
  * salt across that many shuffle partitions per value, trading file
  * count for write parallelism, deterministically (md5 of the sort
  * key, not round-robin, so re-runs produce identical layouts —
  * `CorpusWriterSpec` pins the reproducibility).
  */
object CorpusWriter {

  def writePartitioned(df: DataFrame, path: String,
      partitionCol: String, sortCols: Seq[String],
      maxRecordsPerFile: Long = 1000000L,
      filesPerPartition: Int = 1,
      mode: String = "overwrite"): Unit = {
    require(sortCols.nonEmpty, "sortCols must not be empty")
    require(filesPerPartition >= 1, "filesPerPartition must be >= 1")
    val salt = pmod(
      conv(substring(md5(concat_ws(" ", sortCols.map(col): _*)), 1, 8),
        16, 10).cast("long"),
      lit(filesPerPartition))
    val spread =
      if (filesPerPartition == 1) df.repartition(col(partitionCol))
      else df.repartition(col(partitionCol), salt)
    spread
      .sortWithinPartitions((partitionCol +: sortCols).map(col): _*)
      .write
      .partitionBy(partitionCol)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode(mode)
      .parquet(path)
  }
}
