package graft

import org.apache.spark.sql.functions.col

import graft.operators.TextAnalysis

/** Pins [[TextAnalysis.redactPii]]: every pattern class replaces, the
  * order shields URL-embedded emails from double-redaction, and clean
  * text passes through untouched. */
class RedactSpec extends SparkSpec {

  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("text")
      .select(TextAnalysis.redactPii(col("text")).as("r"))
      .as[String].head()

  test("each pattern class redacts with its own token") {
    assert(redact("mail a.b+c@ex-ample.co.uk now") === "mail <EMAIL> now")
    assert(redact("see https://x.io/p?q=1#f end") === "see <URL> end")
    assert(redact("host 192.168.001.1 up") === "host <IP> up")
    assert(redact("call +4915512345678 today") === "call <PHONE> today")
  }

  test("URL wins over the email and digits inside it") {
    // the whole URL (including the embedded @ and dotted digits) is one
    // non-whitespace run → a single <URL>, no nested <EMAIL>/<IP>
    assert(redact("https://u@ex.com/10.0.0.1 x") === "<URL> x")
  }

  test("clean text is unchanged and multiple hits all redact") {
    val clean = "no personal data here, just words."
    assert(redact(clean) === clean)
    assert(redact("a@b.io c@d.io") === "<EMAIL> <EMAIL>")
  }
}
