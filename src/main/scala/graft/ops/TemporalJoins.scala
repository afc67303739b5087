package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins, expressed as single-shuffle
  * declarative plans (no range cross joins, no per-row subqueries).
  */
object TemporalJoins {

  /** The union frame both as-of variants run the running-last trick over:
    * (__k, __ts, __side, __l, __v) with left rows as side 1 carrying their
    * full row struct in __l, right rows as side 0 (2 for strict) carrying
    * (asof ts + value columns) in __v, and null-key right rows dropped (SQL
    * join equality: null never matches null). */
  private def unionFrame(
      left: DataFrame, right: DataFrame,
      keyCol: String, leftTsCol: String, rightTsCol: String,
      valueCols: Seq[String], strict: Boolean, joinType: String): DataFrame = {
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
    l.withColumn("__v", lit(null).cast(rStructT))
      .unionByName(r.withColumn("__l", lit(null).cast(lStructT)))
  }

  /** Project the carried match column `__m` back to the output shape. */
  private def finish(carried: DataFrame, leftCols: Seq[String],
                     valueCols: Seq[String], joinType: String): DataFrame = {
    val matchedLeft = carried.where(col("__side") === 1)
    val kept = if (joinType == "inner") matchedLeft.where(col("__m").isNotNull)
               else matchedLeft
    kept.select(
      leftCols.map(c => col(s"__l.$c").as(c)) ++
        valueCols.map(c => col(s"__m.$c").as(c)) :+
        col("__m.__rts").as("asof_ts"): _*)
  }

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
    * SKEW: the window serializes each KEY into one task — with a hot key
    * (one instrument/user holding a large share of all rows) use
    * [[asofJoinSharded]], which windows on (key, time-shard) and carries
    * shard boundaries in a second tiny pass.
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
    val leftCols = left.columns.toSeq
    val unioned = unionFrame(left, right, keyCol, leftTsCol, rightTsCol,
      valueCols, strict, joinType)
    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__m", last(col("__v"), ignoreNulls = true).over(w))
    finish(carried, leftCols, valueCols, joinType)
  }

  /** HOT-KEY [[asofJoin]]: identical output, but the running-last window is
    * keyed on (key, time-shard) so a skewed key's timeline parallelizes
    * across shards instead of serializing into one task (the same two-phase
    * sharded-prefix shape as `TextOps.packSequencesSharded`; CLAUDE.md's
    * few-group-window gotcha).
    *
    * Phase 1 computes the shard-LOCAL running last over (key, shard) — rows
    * of one shard never see earlier shards. Phase 2 reduces each (key,
    * shard) to its final right-row boundary (one max_by aggregate — tiny:
    * one row per key x occupied shard), runs the same running-last trick
    * over that boundary table ordered by shard (a per-key window over a few
    * dozen rows, never the corpus), and joins the strictly-earlier-shard
    * carry back on (key, shard). A left row's match is then
    * coalesce(shard-local carry, previous-shard boundary carry).
    *
    * Sharding is by fixed time bucket `floor(ts / shardWidth)` — exact
    * integer floor-division (no eager min/max job, deterministic, and an
    * earlier shard implies strictly earlier ts, so the strict/tie semantics
    * stay entirely within one shard and match [[asofJoin]] bit-for-bit;
    * spec-pinned on planted one-hot-key corpora). Pick `shardWidth` so a
    * hot key's densest bucket fits a task: e.g. one day in micros for a
    * years-long feed. Costs one extra exchange of the union frame (the
    * (key, shard) join) vs the unsharded plan — use it when skew, not
    * row count, is the problem.
    *
    * @param shardWidth time-bucket width in the ts column's units AFTER
    *                   conversion (timestamps/dates compare in MICROSECONDS;
    *                   numeric ts pass through as-is)
    */
  def asofJoinSharded(
      left: DataFrame, right: DataFrame,
      keyCol: String, leftTsCol: String, rightTsCol: String,
      valueCols: Seq[String],
      shardWidth: Long,
      strict: Boolean = false,
      joinType: String = "inner"): DataFrame = {
    require(shardWidth > 0, s"shardWidth must be positive, got $shardWidth")
    val leftCols = left.columns.toSeq
    // exact floor division: `/` on longs is DOUBLE division (CLAUDE.md) and
    // micros-scale ts values sit near the 2^53 exactness edge — subtracting
    // pmod first makes the quotient integral, hence exact
    def shardOf(ts: Column): Column =
      ((ts - pmod(ts, lit(shardWidth))) / lit(shardWidth)).cast("long")
    val unioned = unionFrame(left, right, keyCol, leftTsCol, rightTsCol,
        valueCols, strict, joinType)
      .withColumn("__shard", shardOf(col("__ts")))
    // phase 1: shard-local running last — parallel across (key, shard)
    val wLocal = Window.partitionBy(col("__k"), col("__shard"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = unioned.withColumn("__m_local",
      last(col("__v"), ignoreNulls = true).over(wLocal))
    // phase 2a: each (key, shard)'s FINAL right row — right rows are unique
    // on (key, ts) by contract, so max_by on ts is the shard's last carry
    val boundaries = unioned.where(col("__side") =!= 1)
      .groupBy(col("__k"), col("__shard"))
      .agg(max_by(col("__v"), col("__ts")).as("__b"))
    // phase 2b: for every (key, shard) PRESENT in the frame, the last
    // boundary among strictly earlier shards: occupied-shard rows (side 0)
    // sort BEFORE their own shard's boundary row (side 1), so the running
    // last at an occupied-shard row sees only shards < its own. This table
    // is one row per key x occupied shard — the window is tiny by
    // construction, never the corpus.
    val vType  = unioned.schema("__v").dataType
    val shards = unioned.select(col("__k"), col("__shard")).distinct()
      .withColumn("__bside", lit(0)).withColumn("__b", lit(null).cast(vType))
    val wCarry = Window.partitionBy(col("__k"))
      .orderBy(col("__shard"), col("__bside"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = shards.unionByName(
        boundaries.withColumn("__bside", lit(1)))
      .withColumn("__prev", last(col("__b"), ignoreNulls = true).over(wCarry))
      .where(col("__bside") === 0)
      .select(col("__k"), col("__shard"), col("__prev"))
    // phase 3: a left row's match = its shard-local carry, else the carry
    // entering its shard
    val carried = local.join(prev, Seq("__k", "__shard"), "left")
      .withColumn("__m", coalesce(col("__m_local"), col("__prev")))
    finish(carried, leftCols, valueCols, joinType)
  }
}
