package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language identification and document
  * fingerprinting over a `documents(text)` table.
  *
  * Design for 100 TB: every function here is a pure, codegen'd column
  * expression over one row — no UDFs, no shuffles, no state. A corpus
  * scan computing all of these stays a single WholeStageCodegen pass
  * over the parquet scan with full column pruning.
  */
object TextAnalysis {

  /** Whitespace tokenization (the baseline token counter). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: letter runs, single digits, and isolated
    * punctuation — the shape of byte-pair pretokenizers (a cheap proxy
    * for LLM token budgeting at corpus scale). */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))

  val DefaultStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "is", "to", "in")

  def stopwordCount(text: Column,
      stopwords: Seq[String] = DefaultStopwords): Column =
    size(filter(tokens(lower(text)), t => t.isin(stopwords: _*)))

  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,;:!?'\"()\\[\\]-]", ""))

  /** Characters excluding whitespace — numerator of mean word length. */
  def letterCount(text: Column): Column =
    length(regexp_replace(text, "\\s+", ""))

  /** Quality facets as exact counts plus single-division ratios (ratio
    * = one IEEE division ⇒ bit-stable across engines). Heuristics in the
    * spirit of corpus quality filters (length, stopword density,
    * punctuation density, word shape). */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val tc = tokenCount(text)
    Seq(
      "n_tokens" -> tc,
      "n_tokens_bpeish" -> bpeishTokenCount(text),
      "n_stopwords" -> stopwordCount(text),
      "n_punct" -> punctCount(text),
      "stopword_ratio" -> stopwordCount(text) / tc,
      "punct_ratio" -> punctCount(text) / length(text),
      "mean_word_len" -> letterCount(text) / tc)
  }

  /** Language-marker lexicons (distinctive high-frequency function
    * words; CJK detected by script range). Heuristic n-gram/lexicon
    * language ID — the standard cheap pass before a model-based
    * identifier. */
  val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|is|was|for)\\b",
    "de" -> "\\b(der|die|und|das|ist|nicht)\\b",
    "es" -> "\\b(el|los|las|una|es|y)\\b",
    "fr" -> "\\b(le|la|les|et|est|dans)\\b")

  val CjkPattern = "[\\x{4e00}-\\x{9fff}]"

  /** Predicted language: highest marker-hit count wins, ties broken by
    * lexicon order, no hits ⇒ 'und'. Deterministic by construction. */
  def langId(text: Column): Column = {
    val lowered = lower(text)
    val scores = LangMarkers.map { case (l, pat) =>
      l -> regexp_count(lowered, lit(pat))
    } :+ ("zh" -> regexp_count(text, lit(CjkPattern)))
    val maxScore = greatest(scores.map(_._2): _*)
    scores.foldLeft(when(maxScore === 0, lit("und"))) {
      case (acc, (l, s)) => acc.when(s === maxScore, lit(l))
    }
  }

  /** Canonical-text fingerprint: md5 of lowercased,
    * whitespace-collapsed, punctuation-stripped text — the exact-dedup
    * key that survives formatting noise. The normalization runs
    * through [[graft.functions.FingerprintNorm]] (single fused byte
    * pass for ASCII, exact legacy chain otherwise — byte-identical,
    * spec-pinned, ~5× cheaper than the two-regex chain it encodes). */
  def fingerprint(text: Column): Column =
    md5(graft.functions.FingerprintNorm(text).cast("binary"))

  /** The original two-regex normalization chain — retained as the
    * semantic REFERENCE that `FingerprintNormSpec` pins the fused
    * kernel against (not used by queries). */
  private[graft] def fingerprintLegacyNorm(text: Column): Column =
    regexp_replace(
      trim(regexp_replace(lower(text), "[^a-z0-9\\s]", "")),
      "\\s+", " ")

  /** Bag-of-words fingerprint: md5 over the sorted distinct token set —
    * invariant to word order and repetition (catches shuffled
    * near-dups). */
  def bagFingerprint(text: Column): Column =
    md5(concat_ws(" ",
      array_sort(array_distinct(tokens(lower(text))))).cast("binary"))

  /** PII scrub patterns, ordered: URLs first (they may embed emails /
    * digit runs), then emails, then dotted IPv4, then +-prefixed phone
    * numbers. Restricted to the regex subset with identical semantics
    * in Java regex (Spark codegen) and RE2 (the DuckDB oracle): no
    * lookaround, no backrefs, ASCII classes and word boundaries only —
    * so one pattern list drives both engines. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("url", "https?://[^\\s]+", "<URL>"),
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
      "<IP>"),
    ("phone", "\\+[0-9]{7,15}", "<PHONE>"))

  /** PII redaction: replace every match of each pattern (in
    * [[PiiPatterns]] order) with its placeholder token — the standard
    * scrub pass before a corpus ships to training. A chain of
    * codegen'd `regexp_replace` calls: per-row, shuffle-free, one scan
    * pass at any corpus size. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (_, pat, tok)) =>
      regexp_replace(c, pat, tok)
    }

  /** Word n-gram shingles (the unit of Jaccard/MinHash dedup). */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(lower(text))
    val idx = sequence(lit(0), size(toks) - n)
    when(size(toks) >= n,
      transform(idx, i => array_join(slice(toks, i + 1, lit(n)), " ")))
      .otherwise(array(array_join(toks, " ")))
  }
}
