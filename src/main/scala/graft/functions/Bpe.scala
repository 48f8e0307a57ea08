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

  /** Unsigned UTF-8 byte order — Spark compares strings as UTF8String
    * bytes and DuckDB collates VARCHAR in binary UTF-8, so the
    * histogram trainer's tie-break must use the SAME order, not Java's
    * UTF-16 code-unit compareTo (they differ for supplementary-plane
    * characters). */
  private[functions] def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** Sequential BPE training over a WORD-HISTOGRAM — the way real
    * tokenizer trainers run the Sennrich loop (pair counts over the
    * corpus equal Σ_wordType count · pairs-in-word because merges
    * never cross word boundaries): per round, count adjacent pairs
    * weighted by word-type frequency, pick the (count desc, pair asc
    * in UTF-8 byte order) best — the EXACT selection rule of the
    * distributed per-round loop and the DuckDB oracle replay — record
    * it, and apply [[mergePair]] to the types that contain it.
    *
    * This collapses the 50-job driver-paced corpus walk to ONE Spark
    * aggregation (the histogram) + an in-memory replay: the histogram
    * is word-TYPE-bounded (Heaps' law), not corpus-bounded, which is
    * the same documented driver-bounded-training trade as the ANN
    * tier's sampled k-means. Corpora whose type table outgrows the
    * driver keep the distributed per-round loop (semantically
    * identical — BpeVocabSpec pins table equality).
    *
    * @param hist    (word, occurrence count) per distinct word;
    *                callers pre-filter words shorter than 2 chars
    * @param nRounds merge budget
    * @return (round, "a b", selection-time count) per round, the
    *         bpeLearnedMerges contract */
  def trainOnHistogram(hist: Seq[(String, Long)],
      nRounds: Int): Seq[(Int, String, Long)] = {
    // Split by CODE POINT, not UTF-16 code unit: the distributed path
    // this must equal (bpeInitialWords) splits with Spark `substring`
    // (code points), and the DuckDB oracle likewise — a char-wise split
    // would turn supplementary-plane characters into lone surrogates
    // (which UTF-8-encode as '?'), silently diverging all three.
    var types: Array[(Seq[String], Long)] = hist.iterator.map {
      case (w, n) =>
        val syms = w.codePoints().toArray
          .map(cp => new String(Character.toChars(cp))).toSeq
        (syms, n)
    }.toArray
    val merges = Seq.newBuilder[(Int, String, Long)]
    for (r <- 1 to nRounds) {
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      types.foreach { case (syms, n) =>
        var i = 0
        while (i + 1 < syms.length) {
          val key = syms(i) + " " + syms(i + 1)
          counts.update(key, counts.getOrElse(key, 0L) + n)
          i += 1
        }
      }
      require(counts.nonEmpty,
        s"corpus fully merged after ${r - 1} rounds; cannot run $nRounds")
      var (bestPair, bestN) = ("", Long.MinValue)
      counts.foreach { case (p, n) =>
        if (n > bestN || (n == bestN && utf8Lt(p, bestPair))) {
          bestPair = p; bestN = n
        }
      }
      merges += ((r, bestPair, bestN))
      if (r < nRounds) {
        val Array(a, b) = bestPair.split(" ", 2)
        types = types.map { case (syms, n) =>
          var i = 0
          var touches = false
          while (!touches && i + 1 < syms.length) {
            touches = syms(i) == a && syms(i + 1) == b
            i += 1
          }
          if (touches) (mergePair(syms, a, b), n) else (syms, n)
        }
      }
    }
    merges.result()
  }
}
