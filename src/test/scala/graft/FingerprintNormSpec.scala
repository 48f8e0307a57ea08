package graft

import org.apache.spark.sql.functions._

import graft.functions.FingerprintNorm
import graft.operators.TextAnalysis

/** Pins the fused fingerprint normalizer byte-identical to the legacy
  * two-regex chain it replaces — on the real corpus, on adversarial
  * ASCII whitespace/punctuation layouts (the trim-before-collapse edge
  * cases), on random ASCII, and on the Unicode cases the fallback path
  * must inherit (Kelvin sign, dotted İ, multi-byte removal).
  */
class FingerprintNormSpec extends SparkSpec {
  import spark.implicits._

  private def both(texts: Seq[String]): Seq[(String, String, String)] = {
    texts.toDF("t")
      .select(col("t"), FingerprintNorm(col("t")).as("fast"),
        TextAnalysis.fingerprintLegacyNorm(col("t")).as("legacy"))
      .as[(String, String, String)].collect().toSeq
  }

  test("fused normalizer equals the legacy chain on adversarial ASCII " +
      "layouts (trim-before-collapse, removal-before-collapse)") {
    val cases = Seq(
      "", " ", "  ", "\t", " \t ", "\t\t", "a", " a", "\ta", " \ta",
      "\t a", "a ", "a\t", "a \t", "a. ", "a .", "a .\t", ". a", ".a",
      "a.b", "a . b", "a  b", "a\t\tb", "a-b_c", "A B", "MiXeD CaSe 42",
      "..!!..", "  . .  ", "\n\na\n\n", "xy", "a\f\rb",
      "trailing space ", " leading space", "0123456789",
      "tabs\tand\nnewlines\randvt\fand ff")
    for ((t, fast, legacy) <- both(cases)) {
      assert(fast === legacy,
        s"mismatch on ${t.map(c => f"\\u${c.toInt}%04x").mkString}: " +
          s"fast=[$fast] legacy=[$legacy]")
    }
  }

  test("fused normalizer equals the legacy chain on Unicode edges via " +
      "the fallback path") {
    val cases = Seq(
      "KELVIN",          // Kelvin sign lowers to ASCII k
      "İstanbul",        // dotted capital I expands to i + U+0307
      "café au lait",    // é removed after lowering
      "Über  straße", // Ü→ü removed; ß removed
      "emoji 😀 here", // surrogate pair removed
      " nbsp is not java ws ", // NBSP is NOT \s — removed
      "mixed K ascii TAIL", "ＦＵＬＬＷＩＤＴＨ１２３")
    for ((t, fast, legacy) <- both(cases)) {
      assert(fast === legacy, s"mismatch on [$t]: [$fast] vs [$legacy]")
    }
  }

  test("fused normalizer equals the legacy chain on random ASCII " +
      "strings (property sweep)") {
    val rnd = new scala.util.Random(42)
    val alphabet =
      "abcXYZ019 \t\n\f\r.,;:!?'\"-_()[]{}@#$%^&*+=/<>~`|\\"
    val cases = (1 to 300).map { _ =>
      val len = rnd.nextInt(40)
      (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    for ((t, fast, legacy) <- both(cases)) {
      assert(fast === legacy,
        s"mismatch on ${t.map(c => f"\\u${c.toInt}%04x").mkString}: " +
          s"[$fast] vs [$legacy]")
    }
  }

  test("fingerprint over the fused normalizer matches legacy md5 on " +
      "the sf0.001 corpus") {
    val d = graft.sources.Tables.documents(spark, sf0001)
    val n = d.select(TextAnalysis.fingerprint(col("text")).as("f"),
        md5(TextAnalysis.fingerprintLegacyNorm(col("text"))
          .cast("binary")).as("l"))
      .filter(col("f") =!= col("l")).count()
    assert(n === 0L)
  }

  test("null input stays null") {
    val r = Seq((1, null.asInstanceOf[String]), (2, "x"))
      .toDF("i", "t")
      .select(FingerprintNorm(col("t")).as("f")).as[Option[String]]
      .collect().toSet
    assert(r === Set(None, Some("x")))
  }
}
