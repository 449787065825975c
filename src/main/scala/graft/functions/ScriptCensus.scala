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
  * allocates a position array per row; the kernel walks the decoded
  * codepoint stream once. Null text → null row (UnaryExpression null
  * intolerance); empty text → all-zero slots. */
case class ScriptCensus(child: Expression) extends UnaryExpression {

  /** DELIBERATE LIE for plan safety, the [[MinHashTokens]] idiom: the
    * function is a pure count of its input, but consumers read all 9
    * slots via element_at — alias inlining would otherwise re-run the
    * whole codepoint walk once per slot reference. Flagged
    * nondeterministic so the optimizer materializes ONE attribute. */
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
    * whitespace class, DEL + C1 controls, and the BMP noncharacters —
    * codepoints healthy text never carries regardless of script. */
  def classOf(cp: Int): Int = {
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
        (cp >= 0x7F && cp <= 0x9F) || cp == 0xFFFD ||
        cp == 0xFFFE || cp == 0xFFFF) 8 // bad: damage markers
    else 9 // other: healthy-but-uncovered scripts
  }

  def compute(text: UTF8String): GenericArrayData = {
    val slots = new Array[Long](10)
    val it = text.toString.codePoints().iterator()
    while (it.hasNext) {
      val cp = it.nextInt()
      slots(0) += 1
      slots(classOf(cp)) += 1
    }
    new GenericArrayData(slots.map(Long.box): Array[Any])
  }
}
