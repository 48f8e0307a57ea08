package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Similarity, TextAnalysis}
import graft.sources.Tables

/** Retrieval over the documents corpus — the SEARCH side of a RAG
  * pipeline, complementing the ANN tier: BM25 keyword ranking
  * (Robertson/Sparck Jones probabilistic relevance, the default
  * lexical ranker every retrieval stack ships) and reciprocal-rank
  * fusion of the lexical and embedding rankings (Cormack et al.,
  * SIGIR'09 — the standard hybrid that beats either alone without
  * score calibration, because it only consumes RANKS).
  *
  * Scale shapes: BM25 is the tf-idf family's plan — one explode scan
  * filtered to the query terms (the filter reaches the scan, so the
  * exchange carries query-term postings only), a term-cardinality df
  * aggregate, 1-row broadcast globals, and a global top-k that
  * compiles to TakeOrdered (per-partition heaps, never a full sort).
  * Fusion adds two top-k-sized frames and one join between them.
  */
object RetrievalQueries {

  /** Fixed keyword query, mirrored literally in the oracles. */
  private val QueryTerms = Seq("join", "window", "stream")

  /** bm25_batch's query set — (query id, term) rows, mirrored as a
    * VALUES list in the oracle. */
  private val BatchTerms: Seq[(Int, String)] = Seq(
    0 -> "join", 0 -> "window", 1 -> "stream", 1 -> "shard",
    2 -> "sort", 2 -> "merge", 2 -> "spark")

  /** BM25 term score over columns tf (term freq in doc), df (doc
    * freq), dl (doc length) and the broadcast globals n_docs, avgdl —
    * ONE SQL string evaluated by BOTH engines (identical IEEE tree,
    * hash-exact doubles; e0 literals are DOUBLE in both — see
    * TrainingQueries.knProbSql). k1 = 1.2, b = 0.75 (the universal
    * defaults). The idf factor is the RATIONAL (N − df + 0.5)/(df +
    * 0.5) — BM25's odds ratio WITHOUT the log, the same deliberate
    * deviation tfidf_topk documents: ln() is only 1-ulp-accurate and
    * engine-dependent, where one division is a single correctly-
    * rounded IEEE op. Per-term ordering is identical (log is
    * monotone); across summed terms the compression differs —
    * common-term contributions weigh relatively more than under
    * log-idf — which the fixture vocabulary keeps inconsequential
    * and a production deployment would revisit with a documented
    * epsilon compare. */
  private val bm25TermSql =
    "((CAST(n_docs AS DOUBLE) - df + 0.5e0) / (df + 0.5e0)) * " +
      "((tf * (1.2e0 + 1e0)) / " +
      "(tf + 1.2e0 * (1e0 - 0.75e0 + 0.75e0 * (dl / avgdl))))"

  /** Per-doc BM25 scores for [[QueryTerms]]: postings-only explode →
    * (doc, term) tf → term-cardinality df → broadcast globals → the
    * shared score expression → fixed-order per-term pivot sum.
    * The pivot (one conditional sum per query term, added left to
    * right) exists because a float SUM over a variable-order group
    * would be order-dependent: each conditional sum collapses at most
    * ONE row, so every addition happens in a deterministic order —
    * the same discipline as kn_surprisal's integer buckets, kept in
    * doubles because the term count is a query-side constant. */
  private def bm25Scores(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"),
        TextAnalysis.tokens(lower(col("text"))).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val toks = docs
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(QueryTerms: _*))
    val tf = toks.groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val globals = docs
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
      .withColumn("avgdl", expr("CAST(sum_dl AS DOUBLE) / n_docs"))
    val termCols = QueryTerms.zipWithIndex.map { case (t, i) =>
      coalesce(sum(when(col("term") === t, col("s"))), lit(0.0))
        .as(s"s$i")
    }
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(globals))
      .withColumn("s", expr(bm25TermSql))
      .groupBy("doc_id").agg(termCols.head, termCols.tail: _*)
      .withColumn("score", expr("(s0 + s1) + s2"))
      .select("doc_id", "score")
  }

  /** Exact cosine ranking of the corpus against one query vector
    * (vec_id 0's embedding; vec_id ≡ doc_id in the fixtures) — the
    * exact-baseline dense side for fusion; at 100 TB the same frame
    * comes from the trained-IVF probe path (fusion only consumes
    * ranks, so the ranker is swappable). */
  private def cosineTop(s: SparkSession, dir: String, k: Int): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qvec"))
    e.crossJoin(broadcast(q))
      .withColumn("cosine", Similarity.dot(col("embedding"), col("qvec"))
        / (Similarity.norm(col("embedding")) * Similarity.norm(col("qvec"))))
      .select(col("vec_id").as("doc_id"), col("cosine"))
      .orderBy(col("cosine").desc, col("doc_id")).limit(k)
      .withColumn("cos_rank", row_number().over(
        Window.orderBy(col("cosine").desc, col("doc_id"))))
  }

  val all: Map[String, Q] = Map(

    // BM25 top-10 for the fixed keyword query. TakeOrdered top-k
    // (per-partition bounded heaps; the rank window runs over the 10
    // surviving rows only).
    "bm25_topk" -> { (s, dir) =>
      bm25Scores(s, dir)
        .orderBy(col("score").desc, col("doc_id")).limit(10)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id"))))
        .select("rank", "doc_id", "score")
        .orderBy("rank")
    },

    // BATCH BM25 — the serving shape: several keyword queries scored
    // in ONE postings pass (the query set is a broadcast frame joined
    // on term, not a literal filter — queries are DATA in a retrieval
    // service). Per-term scores floor to integer micro-units BEFORE
    // the per-(query, doc) sum, so the sum is order-independent
    // without the fixed-order pivot bm25_topk uses (which cannot
    // scale to a data-driven term set); the per-query rank ≤ 5 cut
    // rides WindowGroupLimit. Queries with disjoint term sets share
    // every stage — df, globals, the postings explode — which is the
    // amortization a one-query-at-a-time loop forfeits.
    "bm25_batch" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val qt = broadcast(BatchTerms.toDF("qid", "term"))
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"),
          TextAnalysis.tokens(lower(col("text"))).as("toks"))
        .withColumn("dl", size(col("toks")).cast("long"))
      val toks = docs
        .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
        .join(qt, "term")
      val tf = toks.groupBy("qid", "doc_id", "dl", "term")
        .agg(count(lit(1)).as("tf"))
      val dfreq = tf.select("term", "doc_id").distinct()
        .groupBy("term").agg(count(lit(1)).as("df"))
      val globals = docs
        .agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
        .withColumn("avgdl", expr("CAST(sum_dl AS DOUBLE) / n_docs"))
      tf.join(broadcast(dfreq), "term")
        .crossJoin(broadcast(globals))
        .withColumn("s_1e6",
          expr(s"CAST(FLOOR(1e6 * ($bm25TermSql)) AS BIGINT)"))
        .groupBy("qid", "doc_id")
        .agg(sum("s_1e6").as("score_1e6"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid")
            .orderBy(col("score_1e6").desc, col("doc_id"))))
        .filter(col("rank") <= 5)
        .select("qid", "rank", "doc_id", "score_1e6")
        .orderBy("qid", "rank")
    },

    // Reciprocal-rank fusion of the BM25 top-20 and the embedding
    // cosine top-20 (k_rrf = 60, the paper's constant): rrf =
    // Σ 1/(60 + rank) over the lists the doc appears in. Rank-only
    // fusion needs no score calibration between lexical and dense
    // scales — the reason RRF is the production default. A doc
    // missing from one list contributes 0 from it (full-outer join +
    // coalesce, fixed addition order).
    "hybrid_retrieval" -> { (s, dir) =>
      val bm = bm25Scores(s, dir)
        .orderBy(col("score").desc, col("doc_id")).limit(20)
        .withColumn("bm25_rank", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id"))))
        .select("doc_id", "bm25_rank")
      val cos = cosineTop(s, dir, 20).select("doc_id", "cos_rank")
      bm.join(cos, Seq("doc_id"), "full_outer")
        .withColumn("rrf",
          expr("coalesce(1e0 / (60e0 + bm25_rank), 0e0) + " +
            "coalesce(1e0 / (60e0 + cos_rank), 0e0)"))
        .orderBy(col("rrf").desc, col("doc_id")).limit(10)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("rrf").desc, col("doc_id"))))
        .select("rank", "doc_id", "bm25_rank", "cos_rank", "rrf")
        .orderBy("rank")
    })

  private val termList = QueryTerms.map(t => s"'$t'").mkString(", ")

  /** Shared CTE chain computing per-doc BM25 scores — the SQL mirror
    * of [[bm25Scores]], same shared score string, same fixed-order
    * pivot sum. */
  private val bm25Ctes =
    s"""WITH d AS (
      |  SELECT doc_id, ${TrainingQueries.toksExpr} AS toks
      |  FROM documents
      |), dd AS (
      |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM d
      |), tk AS (
      |  SELECT doc_id, dl, unnest(toks) AS term FROM dd
      |), tf AS (
      |  SELECT doc_id, dl, term, COUNT(*) AS tf FROM tk
      |  WHERE term IN ($termList) GROUP BY 1, 2, 3
      |), dfq AS (
      |  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
      |), g AS (
      |  SELECT COUNT(*) AS n_docs,
      |    CAST(SUM(CAST(len(toks) AS BIGINT)) AS BIGINT) AS sum_dl
      |  FROM d
      |), g2 AS (
      |  SELECT n_docs, CAST(sum_dl AS DOUBLE) / n_docs AS avgdl FROM g
      |), sc AS (
      |  SELECT tf.doc_id, tf.term, $bm25TermSql AS s
      |  FROM tf JOIN dfq USING (term) CROSS JOIN g2
      |), pv AS (
      |  SELECT doc_id,
      |    ${QueryTerms.zipWithIndex.map { case (t, i) =>
             s"COALESCE(SUM(CASE WHEN term = '$t' THEN s END), 0e0) AS s$i"
           }.mkString(",\n    ")}
      |  FROM sc GROUP BY doc_id
      |), bmscore AS (
      |  SELECT doc_id, (s0 + s1) + s2 AS score FROM pv
      |)""".stripMargin

  private val bm25TopkSql =
    s"""$bm25Ctes
      |SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
      |    AS INT) AS rank,
      |  doc_id, score
      |FROM bmscore ORDER BY score DESC, doc_id LIMIT 10""".stripMargin

  private val hybridSql = {
    val cos = SimilarityQueries.cosSql("e.embedding", "q.qvec")
    s"""$bm25Ctes, bmtop AS (
      |  SELECT doc_id, CAST(ROW_NUMBER() OVER
      |    (ORDER BY score DESC, doc_id) AS INT) AS bm25_rank
      |  FROM bmscore ORDER BY score DESC, doc_id LIMIT 20
      |), q AS (
      |  SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0
      |), ctop AS (
      |  SELECT doc_id, CAST(ROW_NUMBER() OVER
      |    (ORDER BY cosine DESC, doc_id) AS INT) AS cos_rank
      |  FROM (
      |    SELECT e.vec_id AS doc_id, $cos AS cosine
      |    FROM embeddings e CROSS JOIN q
      |  ) ORDER BY cosine DESC, doc_id LIMIT 20
      |), fused AS (
      |  SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
      |    b.bm25_rank, c.cos_rank,
      |    COALESCE(1e0 / (60e0 + b.bm25_rank), 0e0) +
      |      COALESCE(1e0 / (60e0 + c.cos_rank), 0e0) AS rrf
      |  FROM bmtop b FULL OUTER JOIN ctop c ON b.doc_id = c.doc_id
      |)
      |SELECT CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id)
      |    AS INT) AS rank,
      |  doc_id, bm25_rank, cos_rank, rrf
      |FROM fused ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin
  }

  private val bm25BatchSql = {
    val values = BatchTerms
      .map { case (q, t) => s"($q, '$t')" }.mkString(", ")
    s"""WITH qt(qid, term) AS (VALUES $values),
      |d AS (
      |  SELECT doc_id, ${TrainingQueries.toksExpr} AS toks
      |  FROM documents
      |), dd AS (
      |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM d
      |), tk AS (
      |  SELECT doc_id, dl, unnest(toks) AS term FROM dd
      |), tf AS (
      |  SELECT qt.qid, tk.doc_id, tk.dl, tk.term, COUNT(*) AS tf
      |  FROM tk JOIN qt USING (term) GROUP BY 1, 2, 3, 4
      |), dfq AS (
      |  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term
      |), g AS (
      |  SELECT COUNT(*) AS n_docs,
      |    CAST(SUM(CAST(len(toks) AS BIGINT)) AS BIGINT) AS sum_dl
      |  FROM d
      |), g2 AS (
      |  SELECT n_docs, CAST(sum_dl AS DOUBLE) / n_docs AS avgdl FROM g
      |), sc AS (
      |  SELECT tf.qid, tf.doc_id,
      |    CAST(FLOOR(1e6 * ($bm25TermSql)) AS BIGINT) AS s
      |  FROM tf JOIN dfq USING (term) CROSS JOIN g2
      |), pd AS (
      |  SELECT qid, doc_id, CAST(SUM(s) AS BIGINT) AS score_1e6
      |  FROM sc GROUP BY 1, 2
      |), r AS (
      |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid
      |    ORDER BY score_1e6 DESC, doc_id) AS INT) AS rank
      |  FROM pd
      |)
      |SELECT qid, rank, doc_id, score_1e6 FROM r
      |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "bm25_topk" -> bm25TopkSql,
    "hybrid_retrieval" -> hybridSql,
    "bm25_batch" -> bm25BatchSql)
}
