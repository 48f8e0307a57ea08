package graft

import graft.functions.{Repetition, RepetitionStats}

/** Pins the [[Repetition]] kernel against hand-computed counts,
  * including the tokenizer-parity edge cases (empty text tokenizes to
  * one empty token, exactly like `split(trim(text), "\\s+")` and the
  * oracle's `string_split_regex`) and case folding. */
class RepetitionSpec extends SparkSpec {

  test("hand-computed token and bigram repetition counts") {
    // tokens: the,cat,and,the,dog,and,the,cat → the×3, cat×2, and×2,
    // dog×1 → top 3, dup 3+2+2=7
    // bigrams: "the cat"×2, "cat and", "and the"×2, "the dog",
    // "dog and" → n=7, top 2, dup 4
    assert(Repetition.compute("The cat and the dog AND the cat") ===
      RepetitionStats(8, 3, 7, 7, 2, 4))
  }

  test("no repetition yields top 1 / dup 0") {
    assert(Repetition.compute("a b c") === RepetitionStats(3, 1, 0, 2, 1, 0))
  }

  test("single token has zero bigrams; empty text is one empty token") {
    assert(Repetition.compute("word") === RepetitionStats(1, 1, 0, 0, 0, 0))
    // "" .split("\\s+") → [""] — same single-empty-token convention the
    // rest of the text tier (and the DuckDB oracle) uses
    assert(Repetition.compute("") === RepetitionStats(1, 1, 0, 0, 0, 0))
    assert(Repetition.compute("  ") === RepetitionStats(1, 1, 0, 0, 0, 0))
  }

  test("degenerate full-repetition document") {
    // spam×5: top=dup=5; bigrams "spam spam"×4: top=dup=4
    assert(Repetition.compute("spam spam spam spam spam") ===
      RepetitionStats(5, 5, 5, 4, 4, 4))
  }

  test("null text maps to a null struct through the Column wrapper") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val out = Seq(Option("a a"), None).toDF("text")
      .select(Repetition.stats(col("text")).as("r"))
      .select("r.n_tokens").as[Option[Int]].collect().toSeq
    assert(out === Seq(Some(2), None))
  }
}
