package graft

import org.apache.spark.sql.functions._

import graft.functions.TextShingles
import graft.operators.{Sketches, TextAnalysis}
import graft.sources.Tables

/** Pins the r21 compiled shingle-hash kernels against the expression
  * chain they replace on the sketch family's corpus-scan hot path:
  * [[TextShingles.shingleHash60]] / [[TextShingles.shingleWithHash60]]
  * must be ROW-FOR-ROW identical to
  * `explode(TextAnalysis.shingles(text, 3))` followed by
  * `conv(substring(md5(sh), 1, 15), 16, 10)` — including the edge
  * regimes the corpus never exercises (null text, sub-shingle texts,
  * whitespace runs), so the swap can never drift a sketch row. */
class ShingleHashKernelSpec extends SparkSpec {

  private def edgeDf = {
    import spark.implicits._
    edgeTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
  }

  private val edgeTexts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c",                       // exactly one shingle
    "one two",                     // sub-shingle: single joined shingle
    "single",                      // one token
    "",                            // empty string
    "   ",                         // whitespace only
    "UPPER Case MiXeD tokens here",
    "dup dup dup dup dup",         // repeated shingles (duplicates kept)
    "tabs\tand\nnewlines   spaced tokens",
    null.asInstanceOf[String])

  private def legacyPairs(df: org.apache.spark.sql.DataFrame) =
    df.select(col("id"),
        explode(TextAnalysis.shingles(col("text"), 3)).as("sh"))
      .select(col("id"), col("sh"),
        conv(substring(md5(col("sh")), 1, 15), 16, 10).cast("long")
          .as("h"))

  test("shingleWithHash60 is row-for-row identical to the " +
      "shingles-HOF + md5/substring/conv chain on edge-case texts") {
    val df = edgeDf
    val legacy = legacyPairs(df)
    val kernel = df.select(col("id"),
        explode(TextShingles.shingleWithHash60(3)(col("text"))).as("p"))
      .select(col("id"), col("p.sh").as("sh"), col("p.h").as("h"))
    assert(legacy.exceptAll(kernel).isEmpty &&
        kernel.exceptAll(legacy).isEmpty,
      "kernel (sh, h) stream diverged from the expression chain")
    // same MULTISET size too (exceptAll checks both directions, but a
    // null-vs-empty explode slip would shrink both sides equally)
    assert(legacy.count() === kernel.count())
  }

  test("shingleHash60 matches the hash column of the chain (with " +
      "duplicates, in order) on edge-case texts and real corpus docs") {
    val edge = edgeDf
    val corpus = Tables.documents(spark, sf0001)
      .select(col("doc_id").as("id"), col("text"))
    Seq(edge, corpus).foreach { df =>
      val legacy = legacyPairs(df).select("id", "h")
      val kernel = df.select(col("id"),
        explode(TextShingles.shingleHash60(3)(col("text"))).as("h"))
      assert(legacy.exceptAll(kernel).isEmpty &&
          kernel.exceptAll(legacy).isEmpty,
        "kernel hash stream diverged from the expression chain")
    }
  }

  test("sketch aggregates are identical through the kernel path: " +
      "registers and bottom-k from shingleHash60 equal the legacy " +
      "hllRegisters/kmvSketch over the HOF shingle stream") {
    val d = Tables.documents(spark, sf0001)
    val sh = d.select(col("source"),
      explode(TextAnalysis.shingles(col("text"), 3)).as("sh"))
    val hs = d.select(col("source").as("key"),
      explode(TextShingles.shingleHash60(3)(col("text"))).as("h"))
    val regsLegacy = Sketches.hllRegisters(sh, col("source"), col("sh"), 8)
    val regsKernel = Sketches.hllRegistersFromHash(hs, 8)
    assert(regsLegacy.exceptAll(regsKernel).isEmpty &&
      regsKernel.exceptAll(regsLegacy).isEmpty)
    val kmvLegacy = Sketches.kmvSketch(sh, col("source"), col("sh"), 64)
    val kmvKernel = Sketches.kmvSketchFromHash(hs, 64)
    assert(kmvLegacy.exceptAll(kmvKernel).isEmpty &&
      kmvKernel.exceptAll(kmvLegacy).isEmpty)
  }

  test("bigrams / bigramPairs match the transform/element_at HOF " +
      "chain they replace, including the size(toks) >= 2 guard") {
    val df = edgeDf
    val hofStr = df
      .select(col("id"), TextAnalysis.tokens(lower(col("text"))).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("id"), explode(expr(
        "transform(sequence(1, size(toks) - 1)," +
          " i -> concat(element_at(toks, i), ' '," +
          " element_at(toks, i + 1)))")).as("bigram"))
    val kernelStr = df.select(col("id"),
      explode(TextShingles.bigrams(col("text"))).as("bigram"))
    assert(hofStr.exceptAll(kernelStr).isEmpty &&
      kernelStr.exceptAll(hofStr).isEmpty)
    val hofPair = df
      .select(col("id"), TextAnalysis.tokens(lower(col("text"))).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("id"), explode(expr(
        "transform(sequence(1, size(toks) - 1)," +
          " i -> struct(element_at(toks, i) AS w1," +
          " element_at(toks, i + 1) AS w2))")).as("bg"))
      .select(col("id"), col("bg.w1"), col("bg.w2"))
    val kernelPair = df.select(col("id"),
        explode(TextShingles.bigramPairs(col("text"))).as("bg"))
      .select(col("id"), col("bg.w1"), col("bg.w2"))
    assert(hofPair.exceptAll(kernelPair).isEmpty &&
      kernelPair.exceptAll(hofPair).isEmpty)
  }

  test("spanGramMd5 matches the md5(array_join(slice)) HOF chain " +
      "with positions, on edge cases and real corpus docs") {
    val corpus = Tables.documents(spark, sf0001)
      .select(col("doc_id").as("id"), col("text"))
    Seq(edgeDf, corpus).foreach { df =>
      val base = df.select(col("id"),
        TextAnalysis.tokens(lower(col("text"))).as("toks"))
      val hof = base.filter(size(col("toks")) >= 8)
        .select(col("id"), posexplode(expr(
          "transform(sequence(1, size(toks) - 7)," +
            " i -> md5(array_join(slice(toks, i, 8), ' ')))")))
      val kernel = base.filter(size(col("toks")) >= 8)
        .select(col("id"),
          posexplode(TextShingles.spanGramMd5(8)(col("toks"))))
      assert(hof.exceptAll(kernel).isEmpty &&
        kernel.exceptAll(hof).isEmpty)
    }
  }

  test("minhashSig's numeric window minima reproduce the hex-window " +
      "string formulation (independent reference) on corpus docs") {
    import spark.implicits._
    // reference: the pre-r21 string formulation — substring windows of
    // one md5 hex per distinct shingle, string minima per family
    def ref(text: String, numHashes: Int, shingleN: Int): Seq[String] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val mins = Array.fill(numHashes)("￿")
      val seen = scala.collection.mutable.Set[String]()
      TextShingles.shingleArray(text, shingleN).foreach { s =>
        if (seen.add(s)) {
          val hex = md.digest(s.getBytes("UTF-8"))
            .map(b => f"$b%02x").mkString
          (0 until numHashes).foreach { i =>
            val w = hex.substring(4 * i, math.min(4 * i + 8, 32))
            if (w < mins(i)) mins(i) = w
          }
        }
      }
      mins.toSeq
    }
    val rows = Tables.documents(spark, sf0001)
      .select(col("text")).limit(50).as[String].collect() ++
      edgeTexts.filter(_ != null)
    rows.foreach { t =>
      val got = Seq(t).toDF("text")
        .select(TextShingles.minhashSig(8, 3)(col("text")))
        .as[Seq[String]].collect().head
      assert(got === ref(t, 8, 3), s"minhash diverged on: $t")
    }
  }

  test("winnowedWordFingerprints' unsigned numeric minima reproduce " +
      "the 16-hex-char string formulation (independent reference)") {
    import spark.implicits._
    def ref(text: String, shingleN: Int, w: Int): Seq[String] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val toks = text.trim.toLowerCase.split("\\s+")
      if (toks.length < shingleN) Seq.empty
      else {
        val hs = (0 to toks.length - shingleN).map { i =>
          val sh = (i until i + shingleN).map(toks).mkString(" ")
          md.digest(sh.getBytes("UTF-8"))
            .map(b => f"$b%02x").mkString.substring(0, 16)
        }
        val mins =
          if (hs.length <= w) Seq(hs.min)
          else (0 to hs.length - w).map(i => hs.slice(i, i + w).min)
        mins.distinct.sorted
      }
    }
    val rows = Tables.documents(spark, sf0001)
      .select(col("text")).limit(50).as[String].collect() ++
      edgeTexts.filter(_ != null)
    rows.foreach { t =>
      val got = Seq(t).toDF("text")
        .select(TextShingles.winnowedWordFingerprints(3, 8)(col("text")))
        .as[Seq[String]].collect().head
      assert(got === ref(t, 3, 8), s"winnow diverged on: $t")
    }
  }

  test("register aggregation is dedup-invariant: registers and " +
      "bottom-k over the DISTINCT (source, sh, h) frame equal the " +
      "raw-stream sketches (the pair_overlap shared-scan argument)") {
    val d = Tables.documents(spark, sf0001)
    val raw = d.select(col("source"),
        explode(TextShingles.shingleWithHash60(3)(col("text"))).as("p"))
      .select(col("source"), col("p.sh").as("sh"), col("p.h").as("h"))
    val dsh = raw.distinct()
    def keyed(f: org.apache.spark.sql.DataFrame) =
      f.select(col("source").as("key"), col("h"))
    val regsRaw = Sketches.hllRegistersFromHash(keyed(raw), 8)
    val regsDist = Sketches.hllRegistersFromHash(keyed(dsh), 8)
    assert(regsRaw.exceptAll(regsDist).isEmpty &&
      regsDist.exceptAll(regsRaw).isEmpty)
    val kmvRaw = Sketches.kmvSketchFromHash(keyed(raw), 64)
    val kmvDist = Sketches.kmvSketchFromHash(keyed(dsh), 64)
    assert(kmvRaw.exceptAll(kmvDist).isEmpty &&
      kmvDist.exceptAll(kmvRaw).isEmpty)
  }
}
