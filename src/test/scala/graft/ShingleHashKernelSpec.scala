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
