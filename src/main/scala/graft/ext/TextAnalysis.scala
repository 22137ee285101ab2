package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (north-star extension; not present in the reference — SURVEY.md §7.1
  * module `ext`). All pure `functions._` / higher-order-function column
  * expressions: codegen-friendly, no UDFs, fully distributed.
  */
object TextAnalysis {

  /** Whitespace tokenization as an array column. */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** Token count (whitespace tokens). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-token count: alternating letter-runs / digit-runs /
    * single punctuation, the usual pre-tokenizer regex shape. */
  def subTokenCount(text: Column): Column =
    size(filter(split(text, "(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
      t => length(t) > 0))

  private val StopWords = Seq("the", "a", "an", "of", "and", "to", "in", "is")

  /** Stopword count over whitespace tokens (tiny fixed English list). */
  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isin(StopWords.map(lit(_)): _*)))

  /** Quality-score features: length, word count, mean word length,
    * punctuation count, stopword ratio, plus a deterministic composite
    * `quality_score` in [0,1]. Columns appended to `df`.
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_chars_q", length(t))
      .withColumn("n_words", tokenCount(t))
      .withColumn("n_punct", size(filter(split(t, ""), c => c.isin(".", ",", "!", "?", ";"))))
      .withColumn("n_stop", stopwordCount(t))
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_words"))
      .withColumn(
        "quality_score",
        least(col("n_words"), lit(200)).cast("double") / lit(400.0)
          + col("stop_ratio") / lit(2.0))
  }

  /** Marker-token language scores: per language, the count of
    * high-frequency marker tokens present. `langId` picks the argmax with a
    * deterministic alphabetical tie-break (n-gram-free heuristic language
    * ID; real corpora would extend the marker lists).
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "und", "nicht"),
    "en" -> Seq("the", "and", "of", "data"),
    "es" -> Seq("el", "la", "los", "que"),
    "fr" -> Seq("le", "les", "des", "une"),
    "zh" -> Seq("的", "是", "了", "在"))

  def langScores(text: Column): Seq[(String, Column)] =
    LangMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      lang -> size(filter(tokens(text), t => t.isin(markers.map(lit(_)): _*)))
    }

  def langId(text: Column): Column = {
    val scores = langScores(text)
    // argmax with alphabetical tie-break: fold keeps the earlier language
    // unless a strictly greater score appears.
    scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bestLang, bestScore), (lang, score)) =>
        (when(score > bestScore, lit(lang)).otherwise(bestLang),
         greatest(score, bestScore))
    }._1
  }

  /** Document fingerprint: order-sensitive polynomial rolling hash over the
    * token stream, computed inside one `aggregate` higher-order function —
    * whole-stage-codegen friendly, no shuffle, no UDF.
    *
    * Token hash = first 14 hex digits of md5 (56 bits, portable across
    * engines); rolling combine = (acc·31 + h) mod 10^17 (modulus keeps the
    * product inside signed-64 range on engines where overflow is an error).
    */
  def fingerprint(text: Column): Column =
    aggregate(
      tokens(text),
      lit(0L),
      (acc, t) =>
        pmod(
          acc * lit(31L) + conv(substring(md5(t), 1, 14), 16, 10).cast("long"),
          lit(100000000000000000L)))
}
