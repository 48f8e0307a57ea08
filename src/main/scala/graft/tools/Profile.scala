package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{Dedup, TextAnalysis}
import graft.sources.Tables

/** Ad-hoc micro-profiling of query variants. */
object Profile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-profile")
    val d = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val docs = d.unionByName(
      d.select((col("doc_id") + 1000000).as("doc_id"), col("text")))

    time("shingle explode count")(
      d.select(explode(array_distinct(TextAnalysis.shingles(col("text"), 3)))).count())
    time("shingle explode count again")(
      d.select(explode(array_distinct(TextAnalysis.shingles(col("text"), 3)))).count())
    time("lshBands count")(
      Dedup.lshBands(docs, col("doc_id"), col("text")).count())
    val bands = Dedup.lshBands(docs, col("doc_id"), col("text"))
    time("bands cache materialize")(bands.cache().count())
    time("join on cached bands")(
      bands.select(col("band"), col("band_key"), col("id").as("id_a"))
        .join(bands.select(col("band"), col("band_key"), col("id").as("id_b")),
          Seq("band", "band_key"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct().count())
    bands.unpersist()
    spark.stop()
  }
}
