package graft

import org.apache.spark.sql.functions.col

import graft.functions.Nfc

/** Pins the [[Nfc]] kernel: decomposed sequences compose to their
  * precomposed codepoints, already-NFC text is unchanged, nulls pass
  * through. (Literals use uXXXX unicode escapes so the source file
  * itself cannot be silently re-normalized by tooling.) */
class NfcSpec extends SparkSpec {

  import spark.implicits._

  private def norm(s: String): String =
    Seq(s).toDF("t").select(Nfc.nfc(col("t")).as("n")).as[String].head()

  test("decomposed combining sequences compose under NFC") {
    assert(norm("cafe\u0301") === "caf\u00e9")
    assert(norm("A\u030Angstro\u0308m") === "\u00c5ngstr\u00f6m")
  }

  test("already-composed text and ASCII pass through unchanged") {
    assert(norm("caf\u00e9") === "caf\u00e9")
    assert(norm("plain ascii") === "plain ascii")
  }

  test("null maps to null") {
    val out = Seq(Option("a"), None).toDF("t")
      .select(Nfc.nfc(col("t")).as("n")).as[Option[String]].collect().toSeq
    assert(out === Seq(Some("a"), None))
  }
}
