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

  /** Stopword count over whitespace tokens (tiny fixed English list).
    * Native one-pass kernel — the `size(filter(...isin...))` HOF form runs
    * its lambda interpreted per token (see [[graft.functions.CountInSet]]). */
  def stopwordCount(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.CountInSet(
        org.apache.spark.sql.GraftColumnBridge.expression(tokens(text)),
        StopWords))

  /** Quality-score features: length, word count, punctuation count,
    * stopword ratio, plus a deterministic composite `quality_score` in
    * [0,1]. Columns appended to `df`. The token array is materialized once
    * per row and every feature reads it — one regex pass, not one per
    * feature.
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("__toks", tokens(t))
      .withColumn("n_chars_q", length(t))
      .withColumn("n_words", size(col("__toks")))
      .withColumn("n_punct", regexp_count(t, lit("[.,!?;]")))
      .withColumn("n_stop",
        size(filter(col("__toks"), w => w.isin(StopWords.map(lit(_)): _*))))
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_words"))
      .withColumn(
        "quality_score",
        least(col("n_words"), lit(200)).cast("double") / lit(400.0)
          + col("stop_ratio") / lit(2.0))
      .drop("__toks")
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

  def langScores(toks: Column): Seq[(String, Column)] =
    LangMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      // native kernel: one codegen'd pass per language instead of an
      // interpreted HOF lambda per token ([[graft.functions.CountInSet]])
      lang -> org.apache.spark.sql.GraftColumnBridge.column(
        graft.functions.CountInSet(
          org.apache.spark.sql.GraftColumnBridge.expression(toks), markers))
    }

  /** Appends `outCol` with the predicted language: argmax of the marker
    * scores, alphabetical tie-break. Tokenizes once, materializes each
    * score as a column (so codegen evaluates each filter once per row
    * instead of re-deriving it inside every CASE branch).
    */
  def langId(df: DataFrame, textCol: String, outCol: String = "predicted"): DataFrame = {
    val withScores = langScores(col("__toks")).foldLeft(
      df.withColumn("__toks", tokens(col(textCol)))) {
      case (d, (lang, score)) => d.withColumn(s"__s_$lang", score)
    }
    val langs = LangMarkers.keys.toSeq.sorted
    val predicted = langs.tail.foldLeft(
      (lit(langs.head), col(s"__s_${langs.head}"))) {
      case ((bestLang, bestScore), lang) =>
        (when(col(s"__s_$lang") > bestScore, lit(lang)).otherwise(bestLang),
         greatest(col(s"__s_$lang"), bestScore))
    }._1
    withScores
      .withColumn(outCol, predicted)
      .drop("__toks" +: langs.map(l => s"__s_$l"): _*)
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
