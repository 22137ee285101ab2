package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the canonical time-series operator Spark's
  * built-in surface lacks (builder-prompt custom-operator case (a):
  * compose existing ops, no Catalyst extension needed).
  *
  * Semantics: for every left row, attach the single right row with the same
  * key and the greatest `rightTs ≤ leftTs` (ties at equal timestamps match,
  * like DuckDB/QuestDB/kdb asof). Left rows with no preceding right row get
  * nulls (left-outer flavor).
  *
  * Implementation is the sort-based union trick: tag both inputs, union,
  * and carry the last non-null right payload forward inside one
  * `Window.partitionBy(key).orderBy(ts, tag)` pass — ONE shuffle on the
  * key, no range or theta join, no per-row probing. Scales like any
  * windowed aggregation; skew on the key is the only hazard (salt the key
  * upstream if one entity dominates).
  */
object AsOfJoin {

  /** @param left     probe side
    * @param right    reference side (its payload columns are attached)
    * @param keyCols  equi-join key
    * @param leftTs   event-time column on `left`
    * @param rightTs  event-time column on `right`
    * @param payload  columns of `right` to attach (prefixed `asof_`);
    *                 the matched right row is carried atomically as a whole:
    *                 the latest right row wins even when some of its payload
    *                 fields are null, and those nulls are preserved (never
    *                 back-filled from an earlier right row)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String]): DataFrame =
    asOfDirectional(left, right, keyCols, leftTs, rightTs, payload,
      forward = false, toleranceSeconds = None)

  /** Forward as-of: attach the EARLIEST right row with `rightTs ≥ leftTs`
    * (pandas `merge_asof(direction="forward")`). Same single-shuffle union
    * trick, iterated in descending time order. */
  def asOfForward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String]): DataFrame =
    asOfDirectional(left, right, keyCols, leftTs, rightTs, payload,
      forward = true, toleranceSeconds = None)

  /** Backward as-of with a match-window bound: a match older than
    * `toleranceSeconds` is nulled out (pandas `merge_asof(tolerance=...)`).
    * The tolerance is a post-carry filter, so the plan is unchanged — one
    * shuffle, no range join. */
  def asOfTolerance(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      toleranceSeconds: Long): DataFrame =
    asOfDirectional(left, right, keyCols, leftTs, rightTs, payload,
      forward = false, toleranceSeconds = Some(toleranceSeconds))

  private def asOfDirectional(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      forward: Boolean,
      toleranceSeconds: Option[Long]): DataFrame = {
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__is_left", lit(1))
    // a right row without a timestamp can never legitimately match —
    // unfiltered it would sort to one end of the window and act as a
    // spurious fallback match (pandas/DuckDB asof both ignore null keys)
    val r = payload.foldLeft(
      right.filter(col(rightTs).isNotNull)
        .select((keyCols :+ rightTs).map(col) ++ payload.map(col): _*)
        .withColumn("__ts", col(rightTs))
        .drop(rightTs) // may share a name with a left column
        .withColumn("__is_left", lit(0))) { (d, c) =>
      d.withColumnRenamed(c, s"__p_$c")
    }
    // align schemas for the union: left gets null payload slots, right gets
    // null left-only columns
    val leftCols = l.columns.toSet
    val rightCols = r.columns.toSet
    val lAligned = rightCols.diff(leftCols).foldLeft(l)((d, c) =>
      d.withColumn(c, lit(null).cast(r.schema(c).dataType)))
    val rAligned = leftCols.diff(rightCols).foldLeft(r)((d, c) =>
      d.withColumn(c, lit(null).cast(l.schema(c).dataType)))
    val unioned = lAligned.unionByName(rAligned.select(lAligned.columns.toIndexedSeq.map(col): _*))

    // right rows sort BEFORE left rows at equal ts, so equal-timestamp
    // matches are included (`>=` backward / `<=` forward semantics);
    // forward just iterates in descending time order — same single shuffle
    val order =
      if (forward) Seq(col("__ts").desc, col("__is_left"))
      else Seq(col("__ts").asc, col("__is_left"))
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry ONE struct, not per-column lasts: a right row with a null
    // payload field must still win as a whole (per-column ignoreNulls
    // would stitch fields from different right rows together). The
    // matched timestamp rides along for the tolerance bound.
    val rowStruct = when(col("__is_left") === 0,
      struct((payload.map(c => col(s"__p_$c").as(c)) :+
        col("__ts").as("__mts")): _*))
    val carried = unioned
      // a left row without a timestamp has no as-of position — null match
      // (the window would otherwise hand it whatever sorted before it)
      .withColumn("__match",
        when(col("__ts").isNotNull,
          last(rowStruct, ignoreNulls = true).over(w)))
    val bounded = toleranceSeconds match {
      case Some(tol) =>
        // null out matches outside the window. TIMESTAMP_NTZ bounds via
        // DIRECT subtraction — `SubtractTimestamps` on NTZ is exact
        // zone-free wall-clock micros — compared against an exact
        // day-time-interval literal (no unit truncation). The session
        // timezone never touches the NTZ values: the pre-round-8 NTZ→LTZ
        // →double hop skewed diffs by the offset change across a DST
        // transition, and the seemingly-cleaner timestamp_diff() is
        // wrong differently — it implicitly CASTS its NTZ inputs through
        // the session zone, renormalizing wall-clock times that fall in
        // a spring-forward gap (02:02 under America/New_York reads as
        // 03:02; caught by the NTZ differential fuzzer). TIMESTAMP (LTZ)
        // keeps the double-cast INSTANT difference — physical elapsed
        // seconds, the pandas/DuckDB asof semantics for absolute
        // timestamps (its native subtraction would be LOCAL-difference,
        // which double-counts DST shifts for instants); numeric time
        // columns keep the plain double diff.
        val tsType = unioned.schema("__ts").dataType
        import org.apache.spark.sql.types.TimestampNTZType
        val (earlier, later) =
          if (forward) (col("__ts"), col("__match")("__mts"))
          else (col("__match")("__mts"), col("__ts"))
        val inWindow = tsType match {
          case _: TimestampNTZType =>
            later - earlier <= make_dt_interval(
              lit(0), lit(0), lit(0), lit(tol.toDouble))
          case _ => later.cast("double") - earlier.cast("double") <= tol
        }
        carried.withColumn("__match", when(inWindow, col("__match")))
      case None => carried
    }
    payload.foldLeft(bounded) { (d, c) =>
        d.withColumn(s"asof_$c", col("__match")(c))
      }
      .filter(col("__is_left") === 1)
      .drop((Seq("__ts", "__is_left", "__match") ++ payload.map(c => s"__p_$c")): _*)
  }
}
