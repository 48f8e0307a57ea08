package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.FloatVecDot

/** Similarity search over embedding columns (`array<float>`):
  * brute-force cosine top-k as the exact baseline, an IVF-style
  * cell-probed variant as the scale path, and label-bucketed
  * cosine near-duplicate pairs.
  *
  * Numerics: products and sums run in DOUBLE, accumulated strictly
  * left-to-right ([[FloatVecDot]]), so results are bit-deterministic —
  * independent of partitioning, and reproducible against any engine
  * that folds left-to-right in double (float32 inputs convert exactly).
  *
  * Performance: the dot product is a custom codegen'd Catalyst
  * expression — one fused loop over packed ArrayData — because the
  * equivalent `aggregate(zip_with(...))` higher-order chain evaluates
  * interpreted (measured ~50× slower at 10⁵⁻⁶ pairs). Norms are
  * computed ONCE per row before any join, never per pair.
  *
  * Scale design: queries are broadcast (collect-free plan, one scan of
  * the vector table); top-k uses a per-query window — with Q queries and
  * N vectors the shuffled pair set is Q·N rows, so batch Q accordingly
  * or pre-prune with [[ivfTopK]] which probes only the query's coarse
  * cell (partition pruning on the cell column cuts both scan and pair
  * count by the cell fan-out). Near-dup pairing never goes all-pairs:
  * candidates are restricted to a bucket column (coarse cluster id,
  * LSH band, …).
  */
object Similarity {

  /** Sequential-fold dot product in double (codegen'd). */
  def dot(a: Column, b: Column): Column = FloatVecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** All (vector, query) cosine pairs with pre-hoisted norms — the
    * scoring stage shared by the window-ranked and two-phase
    * ([[TopK.perGroup]]) top-k paths. */
  def scoredPairs(vectors: DataFrame, idCol: Column, vecCol: Column,
      queries: DataFrame, queryIdCol: Column,
      queryVecCol: Column): DataFrame = {
    val vecs = vectors.withColumn("_vnorm", norm(vecCol))
    val qs = queries.withColumn("_qnorm", norm(queryVecCol))
    vecs.crossJoin(broadcast(qs))
      .withColumn("cosine",
        dot(vecCol, queryVecCol) / (col("_vnorm") * col("_qnorm")))
      .drop("_vnorm", "_qnorm")
  }

  /** Exact top-k neighbours per query vector. `queries` must be small
    * enough to broadcast (it is the driver of the Q·N pair count). */
  def bruteForceTopK(vectors: DataFrame, idCol: Column, vecCol: Column,
      queries: DataFrame, queryIdCol: Column, queryVecCol: Column,
      k: Int): DataFrame = {
    val vecs = vectors.withColumn("_vnorm", norm(vecCol))
    val qs = queries.withColumn("_qnorm", norm(queryVecCol))
    val w = Window.partitionBy(queryIdCol)
      .orderBy(col("cosine").desc, idCol)
    vecs.crossJoin(broadcast(qs))
      .withColumn("cosine",
        dot(vecCol, queryVecCol) / (col("_vnorm") * col("_qnorm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .drop("_vnorm", "_qnorm")
  }

  /** IVF-style probed top-k: vectors and queries carry a coarse cell id
    * (cluster/IVF cell); only same-cell vectors are scored. On a
    * cell-partitioned table the scan prunes to the probed cells. */
  def ivfTopK(vectors: DataFrame, idCol: Column, vecCol: Column,
      cellCol: String, queries: DataFrame, queryIdCol: Column,
      queryVecCol: Column, k: Int): DataFrame = {
    val vecs = vectors.withColumn("_vnorm", norm(vecCol))
    val qs = queries.withColumn("_qnorm", norm(queryVecCol))
    val w = Window.partitionBy(queryIdCol)
      .orderBy(col("cosine").desc, idCol)
    vecs.join(broadcast(qs), cellCol)
      .withColumn("cosine",
        dot(vecCol, queryVecCol) / (col("_vnorm") * col("_qnorm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .drop("_vnorm", "_qnorm")
  }

  /** Embedding-cosine near-duplicate pairs within a bucket: one
    * shuffle on the bucket column, pair cost ∝ Σ bucket², never N². */
  def cosineDupPairs(df: DataFrame, idCol: Column, vecCol: Column,
      bucketCol: String, threshold: Double): DataFrame = {
    val withNorm = df.withColumn("_norm", norm(vecCol))
    val a = withNorm.select(col(bucketCol), idCol.as("id_a"),
      vecCol.as("vec_a"), col("_norm").as("_norm_a"))
    val b = withNorm.select(col(bucketCol), idCol.as("id_b"),
      vecCol.as("vec_b"), col("_norm").as("_norm_b"))
    a.join(b, bucketCol)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        dot(col("vec_a"), col("vec_b")) / (col("_norm_a") * col("_norm_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
