package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.PortableSql

/** Text-analysis operators for a training-data pipeline (north-star set,
  * BASELINE.json): token counting, language ID, quality scoring, document
  * fingerprinting. All pure `Column` expressions — codegen-friendly, no
  * UDFs, no shuffles beyond whatever aggregation the caller adds.
  *
  * At 100 TB these run as a single narrow projection over the corpus scan;
  * the only wide operation downstream is whatever groupBy the caller
  * attaches.
  */
object TextAnalysis {

  /** Whitespace-collapsed, trimmed, lowercased canonical text form. */
  def normalizeText(c: Column): Column =
    lower(regexp_replace(trim(c), "\\s+", " "))

  /** Whitespace tokenization. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count: alpha runs, digit runs, and isolated symbols
    * each count as one token (regex kept backslash-free for oracle parity
    * — see [[graft.functions.PortableSql]]).
    */
  val BpeishPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def bpeishCount(c: Column): Column = regexp_count(lower(c), lit(BpeishPattern))

  /** Deterministic document fingerprint: md5 of the normalized text.
    * (Content-hash dedup key — `md5` agrees across engines; SURVEY §7
    * step 8.)
    */
  def fingerprint(c: Column): Column =
    md5(normalizeText(c).cast("binary"))

  /** Occurrences of a constant substring (portable replace-length trick).
    * Literal `replace`, not regexp_replace — langId runs 12 of these per
    * document and the regex engine costs ~3× the literal scan (the
    * DuckDB oracle uses the same literal replace).
    */
  def countOccurrences(c: Column, needle: String): Column =
    ((length(c) - length(call_function("replace", c, lit(needle), lit("")))) / needle.length)
      .cast("int")

  /** Language markers: tiny per-language stopword lists. Scores are padded
    * substring occurrence counts; prediction is the argmax with a fixed
    * priority order (deterministic tie-break).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " a ", " of "),
    "es" -> Seq(" el ", " la ", " que "),
    "de" -> Seq(" der ", " und ", " die "),
    "fr" -> Seq(" le ", " et ", " les "))

  /** Space-padded form of an ALREADY-normalized column, so markers match
    * at string boundaries too.
    */
  def padNorm(norm: Column): Column = concat(lit(" "), norm, lit(" "))

  private def padded(c: Column): Column = padNorm(normalizeText(c))

  /** Marker score for one language from a pre-padded normalized column.
    * Hoist `padNorm(normalizeText(text))` into a projection ONCE and feed
    * it here: inlining the normalization into every marker count (12+
    * regex passes/doc) generates a codegen method past the 8 KB JIT limit
    * ("Generated method too long to be JIT compiled") and re-scans the
    * string a dozen times.
    */
  def langScoreFromPadded(pad: Column, lang: String): Column =
    LangMarkers.toMap.apply(lang)
      .map(m => countOccurrences(pad, m))
      .reduce(_ + _)

  /** Per-language marker score (self-contained form; prefer
    * [[langScoreFromPadded]] over a hoisted column in multi-score plans).
    */
  def langScore(c: Column, lang: String): Column =
    langScoreFromPadded(padded(c), lang)

  /** Language ID from already-projected per-language score columns —
    * the scores are referenced ~2× each here, so they must be attributes,
    * not inlined expression trees.
    */
  def langIdFromScores(scores: Seq[(String, Column)]): Column = {
    val maxScore = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(maxScore > 0 && s === maxScore, lit(l)).otherwise(acc)
    } // foldRight: earlier entries take precedence on ties
  }

  /** N-gram-heuristic language ID: highest marker score wins, ties resolve
    * in [[LangMarkers]] order; all-zero scores -> "und".
    */
  def langId(c: Column): Column =
    langIdFromScores(LangMarkers.map { case (l, _) => l -> langScore(c, l) })

  /** Heuristic quality score in [0,1]: rewards length (saturating at 100
    * tokens) and alphabetic density, penalizes symbol density. Formula is
    * fixed-order double arithmetic (oracle-portable).
    */
  def qualityScore(c: Column): Column = {
    val nTok = tokenCount(c).cast("double")
    val nChr = length(c).cast("double")
    val alpha = length(regexp_replace(c, "[^a-zA-Z]", "")).cast("double")
    val symbols = length(regexp_replace(c, "[a-zA-Z0-9 ]", "")).cast("double")
    round(
      least(nTok / 100.0, lit(1.0)) * 0.4
        + (alpha / nChr) * 0.4
        + (lit(1.0) - least(symbols * 5.0 / nChr, lit(1.0))) * 0.2,
      6)
  }
}
