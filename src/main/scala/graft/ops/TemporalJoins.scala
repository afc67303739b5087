package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins, expressed as single-shuffle
  * declarative plans (no range cross joins, no per-row subqueries).
  */
object TemporalJoins {

  /** Backward AS-OF join: for every left row, the LATEST right row with
    * `right.ts <= left.ts` (or strictly `<` with `strict = true`) within the
    * same key — the classic enrich-events-with-most-recent-state operator
    * (DuckDB/kdb ASOF JOIN; Pandas merge_asof).
    *
    * Implementation is the union + running-last trick: both sides union into
    * one frame ordered by (key, ts, side) — right rows sort BEFORE left rows
    * at equal ts for `<=` semantics (after, for strict) — and the right
    * row's values propagate forward as ONE struct with
    * `last(..., ignoreNulls)` over the running window (a whole-row carry, so
    * a null inside a right row never falls back per-column to an older row).
    * ONE shuffle, keyed by `keyCol`: windows parallelize across keys and a
    * key's rows stream through sorted with O(1) state — the scale shape a
    * naive range join cannot reach without exploding candidates.
    *
    * Right rows must be UNIQUE on (key, ts): at a duplicate, which row wins
    * is an engine pick — dedup upstream when it matters. Null keys follow
    * SQL join equality (null never matches null): null-key left rows are
    * unmatched (dropped under "inner", null-valued under "left") and
    * null-key right rows match nothing.
    *
    * @param valueCols right columns to carry onto matched left rows
    * @param joinType  "inner" (default, drop left rows with no prior right
    *                  row — DuckDB ASOF semantics) or "left" (keep them with
    *                  null values)
    * @return all left columns + valueCols + `asof_ts` (the matched right ts)
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      keyCol: String, leftTsCol: String, rightTsCol: String,
      valueCols: Seq[String],
      strict: Boolean = false,
      joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"joinType must be 'inner' or 'left', got '$joinType'")
    val leftCols = left.columns.toSeq
    val clash    = valueCols.filter(leftCols.contains)
    require(clash.isEmpty,
      s"asofJoin value columns collide with left columns: ${clash.mkString(", ")} — alias them on the right side first")
    // TIMESTAMP ts columns compare at MICROSECOND precision (a cast to long
    // truncates to whole seconds, which can order a sub-second-later right
    // row BEFORE the left event and invert the backward semantics); numeric
    // ts columns pass through as-is. asof_ts comes back in the same unit.
    def tsLong(df: DataFrame, c: String): Column = df.schema(c).dataType match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => unix_micros(col(c).cast("timestamp"))
      case org.apache.spark.sql.types.DateType => unix_micros(col(c).cast("timestamp"))
      case _ => col(c).cast("long")
    }
    val rightSide = if (strict) 2 else 0 // left rows sort as 1
    val l = left.select(
      col(keyCol).as("__k"), tsLong(left, leftTsCol).as("__ts"),
      lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__l"))
    val lStructT = l.schema("__l").dataType
    // SQL join semantics on null keys: an equality predicate never matches
    // null = null, so null-key right rows are dropped here and null-key left
    // rows fall through UNMATCHED (inner drops them, left keeps them with
    // null values) — without the filter Window.partitionBy would group the
    // nulls together and "match" them, diverging from DuckDB's ASOF JOIN.
    val r = right.where(col(keyCol).isNotNull).select(
      col(keyCol).as("__k"), tsLong(right, rightTsCol).as("__ts"),
      lit(rightSide).as("__side"),
      struct((tsLong(right, rightTsCol).as("__rts") +:
        valueCols.map(col)): _*).as("__v"))
    val rStructT = r.schema("__v").dataType
    val unioned = l.withColumn("__v", lit(null).cast(rStructT))
      .unionByName(r.withColumn("__l", lit(null).cast(lStructT)))
    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__m", last(col("__v"), ignoreNulls = true).over(w))
    val matchedLeft = carried.where(col("__side") === 1)
    val kept = if (joinType == "inner") matchedLeft.where(col("__m").isNotNull)
               else matchedLeft
    kept.select(
      leftCols.map(c => col(s"__l.$c").as(c)) ++
        valueCols.map(c => col(s"__m.$c").as(c)) :+
        col("__m.__rts").as("asof_ts"): _*)
  }
}
