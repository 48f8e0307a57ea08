package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table readers for the driver-generated test data
  * (`/root/testdata/sf*`). Column pruning and predicate pushdown are left
  * to Catalyst — callers `select`/`filter` and the scan narrows itself.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Engine-wide contract: `events.ts` is an epoch-NANO long. The
    * generator has shipped it as parquet TIMESTAMP(NANOS) (read as a
    * long via `nanosAsLong`) and as TIMESTAMP(MICROS) without UTC
    * adjustment (read as TimestampNTZType); both carry µs-precision
    * values, so `unix_micros * 1000` is exact and every downstream
    * `ts div 1000` keeps meaning "epoch micros" regardless of the
    * physical type on disk. The NTZ→timestamp cast interprets the
    * naive value in the session time zone — pinned to UTC by
    * [[graft.GraftSession]] — which is exactly how the DuckDB oracle's
    * `epoch_us(ts)` reads the same bytes. */
  private def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case TimestampType | TimestampNTZType =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case _ => df
    }
  }

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(apply(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
