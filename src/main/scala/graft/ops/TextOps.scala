package graft.ops

import graft.functions._

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines — language ID, quality scoring,
  * token counting, fingerprinting. Everything is built from codegen'd Spark
  * built-ins (plus the wyhash fingerprint), per-row and shuffle-free, so it
  * composes into scans without breaking whole-stage codegen.
  */
object TextOps {

  /** Per-language stopword profiles for the n-gram/stopword language-ID
    * heuristic. Small on purpose: the discriminative high-frequency function
    * words of each language.
    */
  val stopwordProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
      "with", "are", "this", "have", "from"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "nicht", "mit", "ein",
      "eine", "auf", "für", "dem", "den", "sich"),
    "fr" -> Seq("le", "la", "les", "et", "des", "est", "dans", "que", "une", "pour",
      "qui", "sur", "pas", "avec", "sont"),
    "es" -> Seq("el", "la", "los", "las", "de", "que", "y", "en", "un", "una",
      "por", "con", "para", "del", "se"),
    "it" -> Seq("il", "la", "di", "che", "e", "un", "una", "per", "con", "del",
      "non", "sono", "nel", "alla", "gli"),
    "pt" -> Seq("o", "a", "os", "as", "de", "que", "e", "do", "da", "em", "um",
      "uma", "para", "com", "não"),
    "nl" -> Seq("de", "het", "een", "van", "en", "in", "is", "dat", "op", "te",
      "zijn", "voor", "met", "niet", "aan"),
    "ru" -> Seq("и", "в", "не", "на", "что", "с", "это", "как", "по", "но",
      "из", "его", "к", "за", "от"),
    "id" -> Seq("yang", "dan", "di", "itu", "dengan", "ini", "untuk", "dari",
      "dalam", "tidak", "akan", "pada", "juga", "ke", "bisa"),
    "tr" -> Seq("bir", "ve", "bu", "için", "ile", "de", "da", "ne", "gibi",
      "daha", "çok", "en", "ama", "olarak", "sonra"))

  private def wordsOf(text: Column): Column =
    filter(split(lower(text), "[^\\p{L}\\p{N}]+"), w => length(w) > 0)

  /** Language-ID: stopword-profile scoring — the language whose stopword set
    * overlaps the document's words the most; "und" (undetermined) when no
    * profile matches at all.
    */
  def langId(text: Column): Column = {
    val words = wordsOf(text)
    val scored = stopwordProfiles.toSeq.map { case (lang, stops) =>
      struct(
        size(array_intersect(words, typedLit(stops))).as("score"),
        lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Quality features as a struct: char length, word count, mean word length,
    * alpha ratio, digit ratio, punct-ish ratio, uppercase ratio, stopword
    * ratio (against the english profile), unique-word ratio.
    *
    * Character-class ratios come from the single-pass `char_class_counts`
    * expression (one codepoint walk) instead of four separate
    * regexp_replace+length scans per row; the class definitions are
    * identical (TextAnalysis scaladoc), and codegen subexpression
    * elimination shares the one pass across the four fields.
    */
  def qualityFeatures(text: Column): Column = {
    val words = wordsOf(text)
    val cc = char_class_counts(text)
    val nChars = length(text).cast("double")
    val nWords = size(words).cast("double")
    struct(
      length(text).as("n_chars"),
      size(words).as("n_words"),
      when(nWords > 0, nChars / nWords).otherwise(lit(0.0)).as("mean_word_len"),
      (cc.getField("letters").cast("double") /
        greatest(nChars, lit(1.0))).as("alpha_ratio"),
      (cc.getField("digits").cast("double") /
        greatest(nChars, lit(1.0))).as("digit_ratio"),
      (cc.getField("symbols").cast("double") /
        greatest(nChars, lit(1.0))).as("punct_ratio"),
      (cc.getField("upper").cast("double") /
        greatest(nChars, lit(1.0))).as("upper_ratio"),
      (size(array_intersect(words, typedLit(stopwordProfiles("en")))).cast("double") /
        greatest(nWords, lit(1.0))).as("en_stopword_ratio"),
      (size(array_distinct(words)).cast("double") /
        greatest(nWords, lit(1.0))).as("unique_word_ratio"))
  }

  /** Composite quality score in [0,1]: penalizes very short docs, low alpha
    * ratio, heavy digits/punctuation, and boilerplate repetition.
    */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text)
    val lengthScore = least(f.getField("n_words").cast("double") / 20.0, lit(1.0))
    val alphaScore = f.getField("alpha_ratio")
    val digitPenalty = lit(1.0) - least(f.getField("digit_ratio") * 4.0, lit(1.0))
    val punctPenalty = lit(1.0) - least(f.getField("punct_ratio") * 4.0, lit(1.0))
    val diversity = f.getField("unique_word_ratio")
    round((lengthScore * 0.25 + alphaScore * 0.25 + digitPenalty * 0.15 +
      punctPenalty * 0.15 + diversity * 0.20), 4)
  }

  /** Whitespace token count (fast proxy). */
  def tokenCountWhitespace(text: Column): Column =
    size(filter(split(text, "\\s+"), w => length(w) > 0))

  /** BPE-ish subword token count: word-piece runs + digits + non-space
    * punctuation, the usual ~chars/4 pre-tokenizer approximation. Computed
    * from the single-pass counter: the lookaround split this replaces
    * produced exactly the maximal letter-runs plus maximal
    * non-letter-non-space runs.
    */
  def tokenCountBpeish(text: Column): Column = {
    val cc = char_class_counts(text)
    cc.getField("letter_runs") + cc.getField("other_runs") +
      (cc.getField("letters") / lit(8)).cast("int")
  }

  /** 64-bit content fingerprint of whitespace-normalized lowercase text —
    * stable under formatting-only changes (the rolling-hash document
    * fingerprint use-case).
    */
  def docFingerprint(text: Column): Column =
    wyhash64(regexp_replace(trim(lower(text)), "\\s+", " "))
}
