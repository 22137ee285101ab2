package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join — the third member of the temporal-join family
  * ([[AsOfJoin]]: point→latest-point; band join: point-distance; here:
  * interval×interval overlap). Spark has no native interval join: the
  * declarative form `l.start < r.end AND r.start < l.end` plans a
  * broadcast-nested-loop / cartesian product, which is quadratic in every
  * equi-key group and a non-starter at corpus scale.
  *
  * Plan (the standard granule-bucketing decomposition): each interval
  * explodes to the fixed-width GRANULES it covers (`sequence` — bounded
  * by interval span / `granuleWidth`), the two sides equi-join on
  * (keys, granule) — an ordinary shuffle-hash/sort-merge join — and a
  * pair is KEPT only at the granule containing `greatest(l.start,
  * r.start)`: two overlapping intervals both cover that granule (overlap
  * means `max(start) < min(end)`), and it is unique per pair, so every
  * overlapping pair survives exactly once with NO distinct/dedup
  * exchange. Non-overlapping co-granule pairs fail the residual
  * predicate.
  *
  * Contracts: intervals are HALF-OPEN `[start, end)` over a numeric axis
  * (epoch days/seconds — cast timestamps upstream); touching intervals
  * (`a.end == b.start`) do NOT overlap; empty/inverted intervals
  * (`end <= start`) and null endpoints never match (filtered, the SQL
  * convention for null predicates). Pick `granuleWidth` near the TYPICAL
  * interval length: per-interval fan-out is `span/width + 1` rows
  * (⌈typical/width⌉ ≈ 1-2), and each (key, granule) bucket joins
  * hash-locally. Skewed hot granules salt upstream like any hot join
  * key.
  */
object IntervalJoin {

  /** @param keyCols  equi-key columns present on BOTH sides (may be empty
    *                 for a pure temporal join — then granules alone
    *                 partition the work)
    * @param rightPrefix every right column is emitted as
    *                 `rightPrefix + name` (keys excluded — carried once)
    */
  def overlapJoin(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String],
      lStart: String, lEnd: String,
      rStart: String, rEnd: String,
      granuleWidth: Long,
      rightPrefix: String = "r_"): DataFrame = {
    require(granuleWidth >= 1, s"granuleWidth must be >= 1, got $granuleWidth")
    Seq("__g", "__gmin", "__gmax").foreach(c =>
      require(!left.columns.contains(c) && !right.columns.contains(c),
        s"input column '$c' collides with overlapJoin internals"))
    // prefixed right columns must not shadow a left column (a left frame
    // already holding e.g. "r_start" would emit ambiguous duplicates)
    right.columns.filterNot(c => keyCols.contains(c)).foreach { c =>
      require(!left.columns.contains(s"$rightPrefix$c"),
        s"left column '$rightPrefix$c' collides with the prefixed right " +
          s"column for '$c' — pick a different rightPrefix")
    }
    def granulated(df: DataFrame, s: String, e: String): DataFrame =
      df.filter(col(s).isNotNull && col(e).isNotNull && col(e) > col(s))
        .withColumn("__gmin", floor(col(s) / granuleWidth))
        .withColumn("__gmax", floor((col(e) - 1) / granuleWidth))
        .withColumn("__g", explode(sequence(col("__gmin"), col("__gmax"))))
        .drop("__gmin", "__gmax")
    val l = granulated(left, lStart, lEnd)
    val rg = granulated(right, rStart, rEnd)
    val r = rg.columns.foldLeft(rg) { (d, c) =>
      if (keyCols.contains(c) || c == "__g") d
      else d.withColumnRenamed(c, s"$rightPrefix$c")
    }
    val rs = col(s"$rightPrefix$rStart")
    val re = col(s"$rightPrefix$rEnd")
    l.join(r.hint("shuffle_hash"), keyCols :+ "__g")
      // overlap residual + the keep-once granule: both sides cover the
      // granule of the later start, and only there does the pair emit
      .filter(col(lStart) < re && rs < col(lEnd)
        && col("__g") === floor(greatest(col(lStart), rs) / granuleWidth))
      .drop("__g")
  }
}
