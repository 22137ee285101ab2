package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-phase hierarchical aggregation: rollup / cube / grouping sets
  * computed as ONE finest-grain aggregate over the corpus followed by the
  * multi-level operator over the tiny aggregated frame.
  *
  * Spark's native `rollup`/`cube`/`GROUPING SETS` plan an `Expand` that
  * duplicates every INPUT row once per grouping set, so the dominant
  * aggregation pass runs N× at corpus scale (a 100 TB cube over 4 sets
  * hash-aggregates 400 TB of expanded rows). Here the Expand runs over
  * the finest-grain aggregate instead — rows bounded by the grouping-key
  * cardinality, not the corpus — and one pipeline covers both phases with
  * no checkpoint, no union, no driver logic.
  *
  * Only valid for re-aggregable partials: `sum`/`min`/`max`, `count` as
  * a phase-1 count re-summed in phase 2, `avg` derived from sum+count in
  * phase 2. NOT valid for `count(DISTINCT …)`, percentiles, or sketches —
  * those need the raw rows per level (use the native operators).
  * `grouping_id()` in the phase-2 aggregate reflects the phase-2 sets and
  * therefore matches the native operator's output, null grouping keys
  * included.
  *
  * `partials` must alias every column `finals` reads.
  */
object Reagg {

  def rollup(
      df: DataFrame, keys: Seq[String],
      partials: Seq[Column], finals: Seq[Column]): DataFrame =
    base(df, keys, partials)
      .rollup(keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)

  def cube(
      df: DataFrame, keys: Seq[String],
      partials: Seq[Column], finals: Seq[Column]): DataFrame =
    base(df, keys, partials)
      .cube(keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)

  /** `sets` are the grouping sets over `keys` (subset lists, e.g.
    * `Seq(Seq("a","b"), Seq("a"), Nil)`). Phase 1 still groups by ALL
    * `keys` — every set must be a subset of `keys`. */
  def groupingSets(
      df: DataFrame, keys: Seq[String], sets: Seq[Seq[String]],
      partials: Seq[Column], finals: Seq[Column]): DataFrame = {
    require(sets.forall(_.forall(keys.contains)),
      s"every grouping set must draw from $keys")
    base(df, keys, partials)
      .groupingSets(sets.map(_.map(col)), keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }

  private def base(
      df: DataFrame, keys: Seq[String], partials: Seq[Column]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(partials.head, partials.tail: _*)
}
