package graft.functions

/** The BPE merge-application kernel: greedy LEFTMOST non-overlapping
  * replacement of the adjacent symbol pair `(a, b)` by the merged
  * symbol `a + b` — the inner loop of byte-pair-encoding tokenizer
  * training (Sennrich et al., ACL'16 "Neural Machine Translation of
  * Rare Words with Subword Units"). After a merge at position i the
  * scan resumes at i + 2, so a run like `[a, a, a]` under pair (a, a)
  * yields `[aa, a]` — exactly the semantics of a left-to-right
  * `replace` over a separator-wrapped rendering, which is what the
  * DuckDB oracle uses (each engine implements the same greedy pass in
  * its native idiom; the chained-CTE oracle proves they agree).
  *
  * A merged symbol can never cascade WITHIN a round: it equals
  * `a + b`, which is strictly longer than `a`, so it cannot itself
  * match the left side of the same pair. Tight compiled loop — this
  * runs once per word per round over the whole corpus.
  */
object Bpe {

  def mergePair(syms: Seq[String], a: String, b: String): Seq[String] = {
    val n = syms.length
    val out = new scala.collection.mutable.ArrayBuffer[String](n)
    var i = 0
    while (i < n) {
      if (i + 1 < n && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }
}
