package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII-redaction gate for training-data curation (north-star extension;
  * not present in the reference): emails, phone numbers, national-id and
  * IP-shaped tokens are replaced by typed placeholders before text enters
  * a training corpus, with per-rule match counts kept for curation
  * dashboards and drop-rate audits.
  *
  * Scale posture: the whole gate is MAP-ONLY — chained, codegen'd
  * `regexp_replace`/`regexp_count` column expressions, no UDF, no shuffle,
  * no driver participation; the corpus streams through the scan pipeline
  * once. RedactionSpec pins the no-Exchange plan. At 100 TB this is the
  * only acceptable shape: any pairing or aggregation in a PII pass would
  * dominate the pipeline cost for what is a per-row rewrite.
  *
  * Patterns are written in the Java/RE2 COMMON SUBSET (no lookaround, no
  * backreferences) so the same pattern string runs identically in Spark,
  * in the DuckDB oracle (`text_redact`), and in RE2-based engines a
  * downstream team might audit with.
  */
object Redaction {

  /** One redaction rule: `name` keys the count column (`n_<name>`),
    * `pattern` is a Java/RE2-portable regex, `placeholder` the replacement
    * token. */
  final case class RedactionRule(name: String, pattern: String, placeholder: String)

  val Email: RedactionRule = RedactionRule(
    "email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")

  /** International-prefix phone shape `+<cc>-ddd-ddd-dddd`. Kept
    * deliberately format-anchored: a greedy "any digit runs" phone pattern
    * false-positives on ids, versions and numeric data far more than it
    * catches real phones. */
  val Phone: RedactionRule = RedactionRule(
    "phone", "\\+\\d{1,2}-\\d{3}-\\d{3}-\\d{4}", "<PHONE>")

  /** US-SSN-shaped `ddd-dd-dddd` national id. */
  val NationalId: RedactionRule = RedactionRule(
    "id", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<ID>")

  val Ipv4: RedactionRule = RedactionRule(
    "ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")

  /** Order matters: rules apply sequentially, so a more specific pattern
    * should run before a broader one that could consume part of its match
    * (e.g. a greedy digit-run rule, if a caller adds one, must come after
    * the anchored phone/id shapes). The defaults are mutually disjoint —
    * ordering among them is cosmetic — but the sequential contract is what
    * callers extending the list rely on. */
  val DefaultRules: Seq[RedactionRule] = Seq(Email, Phone, NationalId, Ipv4)

  /** The redacted text: `rules` applied in order as chained global
    * `regexp_replace` — one codegen'd pass shape, usable anywhere a
    * Column fits. */
  def redactText(text: Column, rules: Seq[RedactionRule] = DefaultRules): Column =
    rules.foldLeft(text)((c, r) => regexp_replace(c, r.pattern, r.placeholder))

  /** Appends `outCol` (redacted text) and, when `counts`, one
    * `n_<rule>` column per rule counting that rule's matches in the
    * ORIGINAL text (overlapping patterns are counted by every rule that
    * matches — counts are per-rule audit signals, not a partition of the
    * matches). Map-only; the input column is kept so callers can diff. */
  def redact(
      df: DataFrame,
      textCol: String,
      rules: Seq[RedactionRule] = DefaultRules,
      outCol: String = "redacted",
      counts: Boolean = true): DataFrame = {
    require(rules.nonEmpty, "redact needs at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      "redaction rule names must be unique (they key the count columns)")
    // withColumn silently REPLACES an existing column of the same name —
    // on a corpus already carrying e.g. an n_email audit column that would
    // corrupt caller data, so collide loudly instead.
    val appended = outCol +: (if (counts) rules.map(r => s"n_${r.name}") else Seq.empty)
    val clashes = appended.filter(df.columns.contains)
    require(clashes.isEmpty,
      s"redact would overwrite existing column(s) ${clashes.mkString(", ")} — " +
        "rename them or pass a different outCol/rule names")
    val withText = df.withColumn(outCol, redactText(col(textCol), rules))
    if (!counts) withText
    else rules.foldLeft(withText)((d, r) =>
      d.withColumn(s"n_${r.name}", regexp_count(col(textCol), lit(r.pattern))))
  }
}
