package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Synthesizes a larger scale factor from an existing testdata dir by
  * unioning `factor` structurally-independent copies — the scale-growth
  * measurement harness behind `SCALE.md` (the driver only ships
  * sf0.001/0.01/0.1).
  *
  * A naive `factor`× replication would be adversarially WRONG for the
  * dedup family: identical text copies are mutual near-dups, so LSH
  * buckets and component sizes would grow with the copy count instead
  * of the corpus size (quadratic pair blowup that no real 10× corpus
  * has). Each copy is therefore made disjoint where identity matters:
  *
  *  - keys (`doc_id`, `event_id`, `user_id`, TPC-H keys) shift by
  *    `copy × 10⁷` — join fan-outs and chain lengths stay exactly
  *    sf-source-like, there are just `factor`× more of them;
  *  - document text gets a per-copy suffix on EVERY token, so shingle
  *    sets across copies are disjoint (within a copy, pairwise shingle
  *    relations are isomorphic to the source corpus);
  *  - embeddings are rotated + sign-flipped per copy (an orthogonal
  *    transform: within-copy cosines exact, cross-copy vectors
  *    decorrelated);
  *  - `nation`/`region` stay fixed (TPC-H dims that never scale).
  *
  * Usage: `runMain graft.tools.ScaleUp <srcDir> <outDir> [factor=10]`
  */
object ScaleUp {

  /** Per-copy id shift. Queries that recover a base id by
    * `id % CopyShift` (dedup_source_matrix) require this to stay an
    * exact multiple of their CopyShift (1e6) — asserted at the use
    * site, so a future Shift change fails loudly instead of silently
    * misattributing sources. */
  private[graft] val Shift = 10_000_000L

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.local("graft-scaleup")
    try scaleUp(spark, src, out, factor)
    finally spark.stop()
  }

  def scaleUp(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
    def copies(df: DataFrame)(f: (DataFrame, Int) => DataFrame) =
      (0 until factor).map(k => f(df, k)).reduce(_ unionByName _)
    def shift(k: Int, cols: String*)(df: DataFrame): DataFrame =
      cols.foldLeft(df)((d, c) =>
        d.withColumn(c, col(c) + lit(k * Shift)))

    write(copies(read("events")) { (df, k) =>
      shift(k, "event_id", "user_id")(df)
    }, "events")

    write(copies(read("documents")) { (df, k) =>
      val tagged =
        if (k == 0) df
        else df.withColumn("text",
          array_join(transform(split(col("text"), " "),
            w => concat(w, lit(s"x$k"))), " "))
      shift(k, "doc_id")(tagged)
    }, "documents")

    write(copies(read("embeddings")) { (df, k) =>
      val dim = size(col("embedding"))
      val r = lit(k * 7) % dim
      val rotated =
        if (k == 0) df
        else df.withColumn("embedding",
          concat(slice(col("embedding"), r + 1, dim - r),
            slice(col("embedding"), lit(1), r)))
          .withColumn("embedding",
            zip_with(col("embedding"),
              sequence(lit(0), dim - 1),
              (x, i) => when((i + lit(k)) % 3 === 0, -x).otherwise(x)))
      shift(k, "vec_id")(rotated)
    }, "embeddings")

    write(copies(read("lineitem")) { (df, k) =>
      shift(k, "l_orderkey", "l_partkey", "l_suppkey")(df)
    }, "lineitem")
    write(copies(read("orders")) { (df, k) =>
      shift(k, "o_orderkey", "o_custkey")(df)
    }, "orders")
    write(copies(read("customer")) { (df, k) =>
      shift(k, "c_custkey")(df)
    }, "customer")
    write(copies(read("supplier")) { (df, k) =>
      shift(k, "s_suppkey")(df)
    }, "supplier")
    write(copies(read("part")) { (df, k) =>
      shift(k, "p_partkey")(df)
    }, "part")
    write(read("nation"), "nation")
    write(read("region"), "region")
  }
}
