package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode script census of a text payload —
  * `graft_script_census(text)` returns 10 fixed slots
  * `[n_cp, latin, digit, space, punct, cjk, cyrillic, arabic, bad,
  * other]` counted in ONE codepoint pass. The script-mix signal behind
  * standard corpus filters: mojibake and encoding damage show up in the
  * `bad` slot (U+FFFD replacement chars, C0/C1 controls,
  * noncharacters — unambiguous damage markers that healthy text in ANY
  * script never carries), script spam (e.g. Cyrillic lookalike
  * injection in Latin text) as an off-dominant share, and the census
  * keys language routing when `lang` metadata is missing or untrusted.
  * `other` holds healthy-but-uncovered scripts (Greek, Hebrew, Thai,
  * Devanagari, emoji, …) — deliberately SEPARATE from `bad`, so a gate
  * can drop damage without destroying whole languages.
  *
  * Classification is RANGE-BASED and deliberately simple, so the oracle
  * SQL can state the identical integer comparisons (the cross-engine
  * codepoint agreement of `ascii`/`substr` on non-BMP text is pinned by
  * MultibytePhashSpec): latin = ASCII letters + Latin-1/Extended
  * letters (0xC0–0x24F — includes × and ÷, an accepted approximation);
  * cjk = kana + CJK unified (+ext A) + hangul + compat ideographs;
  * space = the ASCII whitespace class + NBSP; punct = ASCII punctuation;
  * everything else (Greek, Devanagari, emoji, astral symbols, …) counts
  * as `other`. A census heuristic, not a Unicode property database —
  * the decision it feeds is "route / flag / drop", not rendering.
  *
  * Why an expression: a `transform(sequence(1, length(text)), i ->
  * ascii(substr(text, i, 1)))` chain is O(len²) per doc on multibyte
  * text (substr addresses codepoints by scanning from the front) and
  * allocates a position array per row; the kernel walks the UTF-8
  * bytes of the `UTF8String` once, decoding codepoints in place — no
  * per-row `java.lang.String` copy of the document. Null text → null
  * row (UnaryExpression null intolerance); empty text → all-zero
  * slots. */
case class ScriptCensus(child: Expression) extends UnaryExpression {

  /** DELIBERATE LIE for plan safety, the [[MinHashTokens]] idiom: the
    * function is a pure count of its input, but consumers read the 9
    * class slots + the total via element_at — alias inlining would
    * otherwise re-run the whole codepoint walk once per slot
    * reference. Flagged nondeterministic so the optimizer materializes
    * ONE attribute. */
  override lazy val deterministic: Boolean = false

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_script_census expects string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    ScriptCensus.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ScriptCensus.compute($c);")

  override protected def withNewChildInternal(c: Expression): ScriptCensus = copy(child = c)

  override def prettyName: String = "graft_script_census"
}

object ScriptCensus {

  /** Slot order of the returned array (n_cp first, then the classes in
    * the dominant-tiebreak priority order the consumers use). */
  val SlotNames: Seq[String] = Seq("n_cp", "latin", "digit", "space",
    "punct", "cjk", "cyrillic", "arabic", "bad", "other")

  /** One codepoint → class slot index (1-based into the output array;
    * slot 0 is the total). Shared by the kernel and the spec's driver
    * recompute; the oracle SQL states the same ranges literally.
    * `bad` (8) = U+FFFD replacement char, C0 controls outside the
    * whitespace class, DEL + C1 controls, and the noncharacters
    * U+FDD0–U+FDEF and U+FFFE/U+FFFF — codepoints healthy text never
    * carries regardless of script. (The 32 astral plane-tail
    * noncharacters U+nFFFE/U+nFFFF land in `other`; a census
    * approximation, same class as the Latin × ÷ one.) */
  def slotOf(cp: Int): Int = {
    if ((cp >= 0x41 && cp <= 0x5A) || (cp >= 0x61 && cp <= 0x7A) ||
        (cp >= 0xC0 && cp <= 0x24F)) 1 // latin
    else if (cp >= 0x30 && cp <= 0x39) 2 // digit
    else if ((cp >= 0x09 && cp <= 0x0D) || cp == 0x20 || cp == 0xA0) 3 // space
    else if ((cp >= 0x21 && cp <= 0x2F) || (cp >= 0x3A && cp <= 0x40) ||
        (cp >= 0x5B && cp <= 0x60) || (cp >= 0x7B && cp <= 0x7E)) 4 // punct
    else if ((cp >= 0x3040 && cp <= 0x30FF) || (cp >= 0x3400 && cp <= 0x4DBF) ||
        (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0xAC00 && cp <= 0xD7AF) ||
        (cp >= 0xF900 && cp <= 0xFAFF)) 5 // cjk
    else if (cp >= 0x400 && cp <= 0x4FF) 6 // cyrillic
    else if ((cp >= 0x600 && cp <= 0x6FF) || (cp >= 0x750 && cp <= 0x77F)) 7 // arabic
    else if ((cp >= 0x00 && cp <= 0x08) || (cp >= 0x0E && cp <= 0x1F) ||
        (cp >= 0x7F && cp <= 0x9F) || (cp >= 0xFDD0 && cp <= 0xFDEF) ||
        cp == 0xFFFD || cp == 0xFFFE || cp == 0xFFFF) 8 // bad: damage markers
    else 9 // other: healthy-but-uncovered scripts
  }

  @inline private def isCont(b: Byte): Boolean = (b & 0xC0) == 0x80

  /** One pass over the UTF-8 bytes, decoding codepoints in place —
    * equivalent to `new String(bytes, UTF_8).codePoints()` (the
    * previous form) without materializing a doc-sized String per row.
    * Well-formedness per RFC 3629: continuation-byte ranges reject
    * overlong forms (0xE0/0xF0 tightened low bounds), surrogates
    * (0xED high bound) and > U+10FFFF (0xF4 high bound) at the FIRST
    * continuation byte. A malformed sequence counts ONE U+FFFD (→ the
    * `bad` slot, exactly where damage belongs) and resumes after its
    * maximal valid prefix — the Unicode "maximal subpart" convention
    * the JDK decoder also follows, so driver-recompute parity via
    * String.codePoints holds even on damaged fixtures. */
  def compute(text: UTF8String): GenericArrayData = {
    val slots = new Array[Long](10)
    val n = text.numBytes()
    var i = 0
    while (i < n) {
      val b0 = text.getByte(i) & 0xff
      var cp = 0xFFFD
      var len = 1
      if (b0 < 0x80) cp = b0
      else if (b0 >= 0xC2 && b0 <= 0xDF) {
        if (i + 1 < n && isCont(text.getByte(i + 1))) {
          cp = ((b0 & 0x1F) << 6) | (text.getByte(i + 1) & 0x3F)
          len = 2
        }
      } else if (b0 >= 0xE0 && b0 <= 0xEF) {
        val lo1 = if (b0 == 0xE0) 0xA0 else 0x80
        val hi1 = if (b0 == 0xED) 0x9F else 0xBF
        if (i + 1 < n && {
          val b1 = text.getByte(i + 1) & 0xff; b1 >= lo1 && b1 <= hi1
        }) {
          if (i + 2 < n && isCont(text.getByte(i + 2))) {
            cp = ((b0 & 0x0F) << 12) | ((text.getByte(i + 1) & 0x3F) << 6) |
              (text.getByte(i + 2) & 0x3F)
            len = 3
          } else len = 2
        }
      } else if (b0 >= 0xF0 && b0 <= 0xF4) {
        val lo1 = if (b0 == 0xF0) 0x90 else 0x80
        val hi1 = if (b0 == 0xF4) 0x8F else 0xBF
        if (i + 1 < n && {
          val b1 = text.getByte(i + 1) & 0xff; b1 >= lo1 && b1 <= hi1
        }) {
          if (i + 2 < n && isCont(text.getByte(i + 2))) {
            if (i + 3 < n && isCont(text.getByte(i + 3))) {
              cp = ((b0 & 0x07) << 18) | ((text.getByte(i + 1) & 0x3F) << 12) |
                ((text.getByte(i + 2) & 0x3F) << 6) | (text.getByte(i + 3) & 0x3F)
              len = 4
            } else len = 3
          } else len = 2
        }
      }
      slots(0) += 1
      slots(slotOf(cp)) += 1
      i += len
    }
    new GenericArrayData(slots.map(Long.box): Array[Any])
  }
}
