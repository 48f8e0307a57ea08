package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Unicode NFC normalization — the canonical-composition pass a
  * multilingual corpus needs before fingerprinting or dedup (the same
  * text arrives composed from one crawler and decomposed from another;
  * unnormalized, every such doc pair hash-misses and survives dedup).
  *
  * Implementation: `java.text.Normalizer` (pure JVM, Unicode-standard
  * NFC) behind one compiled UDF call per row — Spark has no built-in
  * normalization expression, so a UDF is the only per-row form; it is
  * shuffle-free and scan-local like the other text kernels. The DuckDB
  * oracle's `nfc_normalize` (utf8proc) implements the same standard —
  * probed byte-identical on accents, ligatures, Hangul and
  * fullwidth/combining cases before this shipped. */
object Nfc {

  private val nfcUdf = udf((s: String) =>
    if (s == null) null
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))

  def nfc(text: Column): Column = nfcUdf(text)
}
