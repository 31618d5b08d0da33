package graft.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass character-class statistics of a string — the codegen'd
  * replacement for the stack of `regexp_replace(text, klass, '')` + `length`
  * passes in text-quality scoring (one codepoint walk instead of ~5 regex
  * scans per row; same class definitions as the Java regexes they replace):
  *
  *   - letters: `\p{L}` (Character.isLetter — categories Lu,Ll,Lt,Lm,Lo)
  *   - digits: `[0-9]`
  *   - symbols: `[^\p{L}\p{N}\s]` (\p{N} = Nd,Nl,No; \s = ASCII
  *     [ \t\n\x0B\f\r], Java regex's default non-UNICODE \s)
  *   - upper: the raw ranges `[A-ZА-ЯÀ-Þ]` (codepoint ranges, so U+00D7 ×
  *     inside À-Þ counts — exactly like the character class it replaces)
  *   - letter_runs / other_runs: maximal runs of letters and of
  *     non-letter-non-space codepoints — the token pieces produced by
  *     splitting on letter↔other boundaries plus whitespace.
  */
object TextAnalysis {

  val schema: StructType = StructType(Seq(
    StructField("letters", IntegerType, nullable = false),
    StructField("digits", IntegerType, nullable = false),
    StructField("symbols", IntegerType, nullable = false),
    StructField("upper", IntegerType, nullable = false),
    StructField("letter_runs", IntegerType, nullable = false),
    StructField("other_runs", IntegerType, nullable = false)))

  private def isAsciiSpace(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0b || cp == '\f' || cp == '\r'

  private def isUnicodeNumber(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
      t == Character.OTHER_NUMBER
  }

  /** The single pass. Called from generated code (static forwarder). */
  def charClassCounts(s: UTF8String): InternalRow = {
    val str = s.toString
    var i = 0
    var letters = 0
    var digits = 0
    var symbols = 0
    var upper = 0
    var letterRuns = 0
    var otherRuns = 0
    // 0 = boundary/space, 1 = in letter run, 2 = in other run
    var state = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val letter = Character.isLetter(cp)
      if (letter) letters += 1
      if (cp >= '0' && cp <= '9') digits += 1
      if (!letter && !isUnicodeNumber(cp) && !isAsciiSpace(cp)) symbols += 1
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 0x00c0 && cp <= 0x00de) ||
        (cp >= 0x0410 && cp <= 0x042f)) upper += 1
      if (letter) {
        if (state != 1) { letterRuns += 1; state = 1 }
      } else if (isAsciiSpace(cp)) {
        state = 0
      } else {
        if (state != 2) { otherRuns += 1; state = 2 }
      }
      i += Character.charCount(cp)
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](letters, digits, symbols, upper, letterRuns, otherRuns))
  }
}

/** Codegen'd single-pass char-class counter (see TextAnalysis). */
case class CharClassCounts(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_class_counts expects a string column, got ${other.catalogString}")
  }
  override def dataType: DataType = TextAnalysis.schema

  override protected def nullSafeEval(input: Any): Any =
    TextAnalysis.charClassCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sql.TextAnalysis.charClassCounts($c)")

  override protected def withNewChildInternal(newChild: Expression): CharClassCounts =
    copy(child = newChild)

  override def prettyName: String = "char_class_counts"
}
