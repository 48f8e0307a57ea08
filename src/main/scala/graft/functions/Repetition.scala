package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Output of [[Repetition.stats]]: exact integer counts; callers derive
  * ratios with single divisions so they stay bit-stable across engines. */
final case class RepetitionStats(
    n_tokens: Int, top_tok_count: Int, dup_tok_count: Int,
    n_bigrams: Int, top_bigram_count: Int, dup_bigram_count: Int)

/** Repetition-quality counters in the spirit of the Gopher/MassiveText
  * filters (Rae et al. 2021, §A1.1): heavily repeated tokens and
  * duplicated n-grams are the strongest cheap signals of boilerplate,
  * spam and generation loops, applied per document before training.
  *
  * Token-level analogs implemented here, per doc:
  *   - `top_tok_count`: occurrences of the most frequent token,
  *   - `dup_tok_count`: total occurrences of tokens appearing ≥ 2×,
  *   - the same two over word bigrams.
  *
  * Design for 100 TB: a pure per-row compiled kernel — one hash-map
  * count pass per document, O(tokens) time and O(distinct) space, no
  * shuffle, no state; the corpus scan stays one pass. The
  * Column-HOF alternative (`transform`+`filter` per distinct token) is
  * O(tokens × distinct) per row — quadratic on long documents — and
  * evaluates interpreted (same measured ~10× lambda-dispatch penalty
  * that motivated [[TextShingles]]); an explode + groupBy(doc, token)
  * formulation is linear but pays a corpus-sized exchange for what is
  * a row-local computation.
  *
  * Tokenization matches [[graft.operators.TextAnalysis.tokens]]
  * (`trim.toLowerCase.split("\\s+")`) so the DuckDB oracle mirrors it
  * with `string_split_regex(trim(lower(text)), '\s+')`.
  */
object Repetition {

  private[graft] def compute(text: String): RepetitionStats = {
    val toks = text.trim.toLowerCase.split("\\s+")
    def count(n: Int, at: Int => String): (Int, Int, Int) = {
      val m = new java.util.HashMap[String, Int]()
      var i = 0
      while (i < n) { m.merge(at(i), 1, Integer.sum _); i += 1 }
      var top = 0
      var dup = 0
      val it = m.values().iterator()
      while (it.hasNext) {
        val c = it.next()
        if (c > top) top = c
        if (c >= 2) dup += c
      }
      (n, top, dup)
    }
    val (nt, topT, dupT) = count(toks.length, toks(_))
    val (nb, topB, dupB) =
      count(math.max(toks.length - 1, 0), i => toks(i) + " " + toks(i + 1))
    RepetitionStats(nt, topT, dupT, nb, topB, dupB)
  }

  private val statsUdf =
    udf((text: String) => if (text == null) null else compute(text))

  /** Struct column of the six counters (null for null text). */
  def stats(text: Column): Column = statsUdf(text)
}
