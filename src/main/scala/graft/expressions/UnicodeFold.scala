package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode accent folding — canonical
  * decomposition (NFD), removal of every combining mark (categories
  * Mn, Mc, Me — the utf8proc STRIPMARK set, probed to match DuckDB's
  * `strip_accents` on canonical text so the fold is hash-oracle-able),
  * then NFC recomposition so unaffected sequences round-trip to their
  * composed forms. `Café naïve → Cafe naive`; characters whose
  * diacritic is NOT a combining mark (Ł, Đ, ø, Æ) are left alone by
  * BOTH engines — this is accent STRIPPING, not transliteration.
  *
  * With `nfkc = true` a compatibility pass (NFKC) runs FIRST: ligature
  * and width/presentation forms collapse to their compatibility
  * equivalents (ﬁ → fi, ① → 1, full-width Ａ → A) before the accent
  * strip — the full normalization a multilingual LM-data pipeline
  * runs ahead of language ID and LM scoring (the accent removal CCNet
  * — Wenzek et al. 2020 §4.2 — applies before perplexity bucketing).
  * GENERAL NFKC is outside the oracled subset (DuckDB exposes no NFKC
  * transform) — spec-tested instead; the TABLE-EXPRESSIBLE subset
  * (full-width ASCII, common ligatures, enclosed/super/sub digits,
  * and the fold-before-strip ordering) IS oracled by q204 against an
  * explicit literal mapping both engines state identically.
  *
  * Fast path: pure-ASCII input (the overwhelmingly common case in a
  * Latin-dominated corpus — checked with one byte scan on the RAW
  * UTF8String bytes, no decode) returns the input object untouched;
  * normalization allocates only for rows that need it.
  *
  * Codegen emits a single static call to [[UnicodeFold.compute]] so
  * the surrounding stage stays in whole-stage codegen.
  */
case class UnicodeFold(child: Expression, nfkc: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.sql}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_fold"

  override def nullSafeEval(input: Any): Any =
    UnicodeFold.compute(input.asInstanceOf[UTF8String], nfkc)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.UnicodeFold$$.MODULE$$.compute($c, $nfkc);")

  override protected def withNewChildInternal(newChild: Expression): UnicodeFold =
    copy(child = newChild)
}

object UnicodeFold {

  def compute(s: UTF8String, nfkc: Boolean): UTF8String = {
    // ASCII fast path on the raw bytes: no UTF-16 decode, no Normalizer
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var i = 0L
    var ascii = true
    while (ascii && i < n) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) < 0)
        ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    val compat =
      if (nfkc) Normalizer.normalize(str, Normalizer.Form.NFKC) else str
    val nfd = Normalizer.normalize(compat, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var j = 0
    while (j < nfd.length) {
      val cp = nfd.codePointAt(j)
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK &&
          t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK)
        sb.appendCodePoint(cp)
      j += Character.charCount(cp)
    }
    UTF8String.fromString(
      Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }
}
