package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass fingerprint normalizer — byte-identical to the chain
  * `regexp_replace(trim(regexp_replace(lower(text), "[^a-z0-9\\s]",
  * "")), "\\s+", " ")` that every content fingerprint in the dedup
  * family hashes (`TextAnalysis.fingerprint`), measured ~5× cheaper.
  *
  * Why it exists: the round-10 sf1 profile showed the FIRST
  * regexp_replace alone costs more than a full corpus scan (3.3 s vs
  * 0.8 s at sf1) — java.util.regex walks every char through the
  * pattern automaton twice (two replaces) plus a lowercase pass, and
  * the fingerprint underlies dedup_exact / incremental / survivors /
  * the corpus pipeline, so this one chain was the single hottest
  * kernel in the engine. ASCII text (the overwhelming case for
  * already-lang-filtered corpora) takes one fused byte loop with no
  * allocation beyond the output buffer; any non-ASCII byte falls back
  * to the EXACT original operator sequence (same `UTF8String`
  * lowercase/trim, same compiled patterns), so Unicode semantics —
  * Kelvin-sign K lowering into ASCII 'k', İ expanding to i+combining
  * dot, multi-byte removal — are inherited rather than re-implemented.
  * `FingerprintNormSpec` pins fast==legacy on the corpus, adversarial
  * whitespace/punctuation layouts, and the Unicode edge cases.
  *
  * The subtle semantics the fast path must honor (and the reason the
  * chain is NOT just "keep alnum, collapse ws"): removal happens
  * BEFORE whitespace collapse, so `"a . b"` yields one space; and
  * `trim` strips only 0x20 BEFORE collapse, so a leading/trailing
  * whitespace run survives as a single space iff it contains a
  * non-space whitespace char (`"\ta"` → `" a"` but `" a"` → `"a"`).
  */
case class FingerprintNorm(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${other.simpleString}")
    }

  override def dataType: DataType = StringType

  override def prettyName: String = "fingerprint_norm"

  override protected def nullSafeEval(input: Any): Any =
    FingerprintNorm.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.FingerprintNorm.normalize($c)")

  override protected def withNewChildInternal(
      newChild: Expression): FingerprintNorm = copy(child = newChild)
}

object FingerprintNorm {

  def apply(c: Column): Column =
    bridge.toColumn(FingerprintNorm(bridge.toExpression(c)))

  private val NonKept =
    java.util.regex.Pattern.compile("[^a-z0-9\\s]")
  private val WsRun = java.util.regex.Pattern.compile("\\s+")

  /** Static entry used by both interpreted eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if (s.getByte(i) < 0) ascii = false
      i += 1
    }
    if (ascii) fastAscii(s) else slow(s)
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' ||
      b == '\r'

  private def fastAscii(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    val out = new Array[Byte](n + 1)
    var o = 0
    var pendingWs = false
    var runHasNonSpace = false
    var i = 0
    while (i < n) {
      var b = s.getByte(i)
      if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        // interior runs always collapse to one space; a LEADING run
        // survives trim only if it held a non-space whitespace char
        if (pendingWs && (o > 0 || runHasNonSpace)) { out(o) = ' '; o += 1 }
        out(o) = b; o += 1
        pendingWs = false; runHasNonSpace = false
      } else if (isWs(b)) {
        pendingWs = true
        if (b != ' ') runHasNonSpace = true
      } // else: removed before collapse — does NOT break the ws run
      i += 1
    }
    // trailing (or all-whitespace) run: same trim-then-collapse rule
    if (pendingWs && runHasNonSpace) { out(o) = ' '; o += 1 }
    UTF8String.fromBytes(out, 0, o)
  }

  /** Non-ASCII fallback: the ORIGINAL operator sequence, verbatim —
    * `Lower` is `UTF8String.toLowerCase`, `RegExpReplace` is a
    * compiled-pattern replaceAll, `StringTrim` is `UTF8String.trim`. */
  private def slow(s: UTF8String): UTF8String = {
    val lowered = s.toLowerCase
    val removed =
      UTF8String.fromString(NonKept.matcher(lowered.toString).replaceAll(""))
    val trimmed = removed.trim()
    UTF8String.fromString(WsRun.matcher(trimmed.toString).replaceAll(" "))
  }
}
