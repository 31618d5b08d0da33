package graft

import graft.functions._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proves the single-pass `char_class_counts` expression computes exactly
  * what the regexp_replace/split stack it replaced computed, over
  * adversarial unicode inputs (accents, Cyrillic, the U+00D7 edge inside
  * the A-grave..Thorn range, surrogate-pair emoji, exotic numerals, mixed
  * whitespace).
  */
class TextAnalysisSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private val pool: Array[String] = Array(
    "a", "Z", "é", "ß", "Ж", "я", "×", "÷", "Ø", "þ",
    "0", "9", "٣", "Ⅻ", "½", // arabic-indic digit, roman numeral (Nl), fraction (No)
    ".", ",", "!", "#", "$", "-", "_", "\"",
    " ", "\t", "\n", "\r", "\u000B", "\f", // vertical tab: Java \s member, NOT in RE2 \s
    "😀", // emoji (surrogate pair, category So)
    "中", "日", "ع", "ह")

  private def randomStrings(n: Int, seed: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val len = rnd.nextInt(40)
      (0 until len).map(_ => pool(rnd.nextInt(pool.length))).mkString
    } :+ "" :+ "   " :+ "a1b, c  d!" :+ "Hello, WÖRLD ×42 😀😀"
  }

  test("char_class_counts == the regexp stack it replaces, on adversarial unicode") {
    val df = randomStrings(600, 42).toDF("t")
    val cc = char_class_counts($"t")
    val bad = df.select(
      $"t",
      cc.getField("letters").as("l_new"),
      length(regexp_replace($"t", "[^\\p{L}]", "")).as("l_old"),
      cc.getField("digits").as("d_new"),
      length(regexp_replace($"t", "[^0-9]", "")).as("d_old"),
      cc.getField("symbols").as("s_new"),
      length(regexp_replace($"t", "[\\p{L}\\p{N}\\s]", "")).as("s_old"),
      cc.getField("upper").as("u_new"),
      length(regexp_replace($"t", "[^A-ZА-ЯÀ-Þ]", "")).as("u_old"),
      (cc.getField("letter_runs") + cc.getField("other_runs")).as("runs_new"),
      size(filter(
        split($"t", "(?<=[\\p{L}])(?=[^\\p{L}\\s])|(?<=[^\\p{L}\\s])(?=[\\p{L}])|\\s+"),
        w => length(w) > 0)).as("runs_old"))
      .filter($"l_new" =!= $"l_old" || $"d_new" =!= $"d_old" ||
        $"s_new" =!= $"s_old" || $"u_new" =!= $"u_old" || $"runs_new" =!= $"runs_old")
      .collect()
    assert(bad.isEmpty, s"divergent rows:\n${bad.take(5).mkString("\n")}")
  }

  test("tokenCountBpeish equals its pre-single-pass formulation") {
    val df = randomStrings(300, 7).toDF("t")
    val old = size(filter(
      split($"t", "(?<=[\\p{L}])(?=[^\\p{L}\\s])|(?<=[^\\p{L}\\s])(?=[\\p{L}])|\\s+"),
      w => length(w) > 0)) +
      (length(regexp_replace($"t", "[^\\p{L}]", "")).cast("int") / lit(8)).cast("int")
    val bad = df.select($"t",
      graft.ops.TextOps.tokenCountBpeish($"t").as("n"), old.as("o"))
      .filter($"n" =!= $"o").collect()
    assert(bad.isEmpty, s"divergent: ${bad.take(5).mkString(";")}")
  }

  test("expression stays codegen-friendly (no CodegenFallback)") {
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[graft.sql.CharClassCounts]))
  }
}
