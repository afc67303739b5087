package graft.geo.join

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.geo.sql.GeoFunctions._
import graft.geo.index.HexCell

/** The engine's spatial join surface (SURVEY.md §2.9, BASELINE.json:6,14).
  *
  * Everything is declarative DataFrame plans: cells are int64 equi-join keys
  * so Catalyst picks hash/broadcast/SMJ physical joins, AQE re-plans at
  * runtime, and parquet min-max pruning works on the cell columns. No RDDs,
  * no driver-side row loops (the kNN driver loop iterates ROUNDS — a handful
  * — not rows).
  */
object SpatialJoins {

  /** Point-in-polygon join.
    *
    * Plan shape (SURVEY.md §2.9 "point-in-polygon join"): cover each polygon
    * with hex cells of its bbox (sound superset, antimeridian-aware) →
    * explode → equi-join against `hex_cell(point)` → refine with the exact
    * `st_contains`. A point maps to exactly ONE cell and a polygon's cover
    * cells are distinct, so no post-join dedup is needed.
    *
    * @param points      DataFrame with double columns `lngCol`, `latCol`
    * @param polys       DataFrame with a packed geometry column `geomCol`
    * @param res         hex resolution of the cell grid (pick ~polygon size;
    *                    see [[resForBoxDeg]]). NEGATIVE = choose
    *                    automatically from the polygon side itself
    *                    ([[resForPolys]] — the default; callers stop
    *                    hand-tuning the grid to their polygon size)
    * @param broadcastPolys hint when the polygon side is small (the common
    *                    case: dimension-table-like polygon sets)
    * @param saltBuckets > 1 enables hot-cell salting: points in cells whose
    *                    count exceeds `hotCellThreshold` get a deterministic
    *                    salt in [0, saltBuckets); the polygon side is
    *                    replicated across salts for those cells only.
    */
  def pipJoin(
      points: DataFrame,
      lngCol: String,
      latCol: String,
      polys: DataFrame,
      geomCol: String,
      res: Int = -1,
      broadcastPolys: Boolean = true,
      saltBuckets: Int = 1,
      hotCellThreshold: Long = 2000000L): DataFrame = {

    val res0 = if (res >= 0) res else resForPolys(polys, geomCol)
    val polyCells0 = polys.withColumn("__cell", explode(hex_cover(col(geomCol), lit(res0))))
    val ptCells0   = points.withColumn("__cell", hex_cell(col(lngCol), col(latCol), lit(res0)))

    val (ptCells, polyCells) =
      if (saltBuckets <= 1) (ptCells0.withColumn("__salt", lit(0)),
                             polyCells0.withColumn("__salt", lit(0)))
      else {
        // pre-pass cell-count sketch → hot set (BASELINE.json:6 "salting hot
        // H3 cells detected from a pre-pass cell-count sketch")
        val hot = ptCells0.groupBy("__cell").count()
          .where(col("count") > hotCellThreshold)
          .select(col("__cell").as("__hot_cell"))
        val pts = ptCells0
          .join(broadcast(hot), ptCells0("__cell") === hot("__hot_cell"), "left")
          .withColumn("__salt",
            when(col("__hot_cell").isNotNull,
              pmod(hash(col(lngCol), col(latCol)), lit(saltBuckets))).otherwise(lit(0)))
          .drop("__hot_cell")
        // replicate polygon cover rows across all salts for hot cells only
        // (generator must be top-level: explode a conditional array)
        val pls = polyCells0
          .join(broadcast(hot), polyCells0("__cell") === hot("__hot_cell"), "left")
          .withColumn("__salt", explode(
            when(col("__hot_cell").isNotNull, sequence(lit(0), lit(saltBuckets - 1)))
              .otherwise(array(lit(0)))))
          .drop("__hot_cell")
        (pts, pls)
      }

    val rhs    = if (broadcastPolys) broadcast(polyCells) else polyCells
    val joined = ptCells.join(rhs, Seq("__cell", "__salt"))
      .where(st_contains(col(geomCol), col(lngCol), col(latCol)))
      .drop("__cell", "__salt")
    joined
  }

  /** Multi-level PIP join for MIXED-size polygon sets: polygon covers carry
    * interior cells at coarse levels and boundary cells refined to
    * `maxLevel` (O(perimeter) cover size even for continent-scale
    * geometries), points explode their ancestor cell per level
    * (maxLevel-minLevel+1 rows, a narrow map). Cover cells are disjoint and
    * a point has one ancestor per level, so each (point, polygon) pair
    * matches at most once — no dedup needed. Same refine step as
    * [[pipJoin]].
    */
  def pipJoinMultiLevel(
      points: DataFrame,
      lngCol: String,
      latCol: String,
      polys: DataFrame,
      geomCol: String,
      minLevel: Int = 4,
      maxLevel: Int = 12,
      broadcastPolys: Boolean = true): DataFrame = {
    val polyCells = polys.withColumn("__cell",
      explode(s2_cover_multi(col(geomCol), lit(minLevel), lit(maxLevel))))
    val ptCells = points.withColumn("__cell",
      explode(s2_ancestors(col(lngCol), col(latCol), lit(minLevel), lit(maxLevel))))
    val rhs = if (broadcastPolys) broadcast(polyCells) else polyCells
    ptCells.join(rhs, Seq("__cell"))
      .where(st_contains(col(geomCol), col(lngCol), col(latCol)))
      .drop("__cell")
  }

  /** Intersects join (beyond the reference's surface) for every pair (a, b)
    * whose geometries share any point — any dimension pair: polygons,
    * lines, points and their multis (the refinement kernel is the general
    * [[graft.geo.algo.GeoAlgo.intersectsGeoms]]; covers come from per-ring
    * wrapped boxes, which lines and point sets have too).
    *
    * Candidates: both sides take normalized multi-level covers. Quadtree
    * cell ranges are nested-or-disjoint, so two covers overlap iff some cell
    * of one CONTAINS some cell of the other — i.e. they share a key when the
    * finer cell is lifted to its ancestors:
    * `(A.cells ⋈ B.cells∪ancestors) ∪ (A.cells∪ancestors ⋈ B.cells)`,
    * two plain equi-joins, deduped on (aId, bId). Covers are O(perimeter) at
    * `maxLevel`; ancestor lifting adds × (levels). Refinement is the exact
    * planar [[graft.geo.algo.GeoAlgo.intersectsGeoms]] kernel
    * (`st_intersects`).
    *
    * @return one row per intersecting pair: aId, bId columns only.
    */
  def intersectsJoin(
      aDf: DataFrame, aId: String, aGeom: String,
      bDf: DataFrame, bId: String, bGeom: String,
      minLevel: Int = 4,
      maxLevel: Int = 10,
      broadcastB: Boolean = true): DataFrame = {
    // one cover pass per side: posexplode of the ancestor lift tags the
    // cover cell itself with __pos = 0 (s2_cell_ancestors emits the cell
    // first); containment then needs ONE equi-join with the condition that
    // at least one side is a plain cover cell — (A.plain x B.lifted) and
    // (A.lifted x B.plain) in a single pass, no duplicate cover computation
    def keys(df: DataFrame, id: String, geom: String, pos: String): DataFrame =
      df.select(col(id), col(geom))
        .withColumn("__c0", explode(s2_cover_multi(col(geom), lit(minLevel), lit(maxLevel))))
        .select(col(id), posexplode(s2_cell_ancestors(col("__c0"), lit(minLevel))).as(Seq(pos, "__cell")))
    val aK = keys(aDf, aId, aGeom, "__pa")
    val bK = keys(bDf, bId, bGeom, "__pb")
    val rhsK = if (broadcastB) broadcast(bK) else bK
    val cand = aK.join(rhsK, Seq("__cell"))
      .where(col("__pa") === 0 || col("__pb") === 0)
      .select(col(aId), col(bId))
      .dropDuplicates(aId, bId)
    // internal aliases: both sides may use the same geometry column name
    val aG = aDf.select(col(aId), col(aGeom).as("__ga"))
    val bG = bDf.select(col(bId), col(bGeom).as("__gb"))
    cand
      .join(aG, Seq(aId))
      .join(if (broadcastB) broadcast(bG) else bG, Seq(bId))
      .where(st_intersects(col("__ga"), col("__gb")))
      .select(col(aId), col(bId))
  }

  /** Hex resolution whose cell size is about half the given box span
    * (degrees) — 2-8 cover cells per polygon, the sweet spot between join
    * fan-out and cell selectivity. */
  def resForBoxDeg(spanDeg: Double): Int = {
    var r = 0
    while (r < HexCell.MaxRes && HexCell.sizeDeg(r) > spanDeg / 2.0) r += 1
    r
  }

  /** [[pipJoin]]'s automatic `res`: [[resForBoxDeg]] of the MEDIAN bbox span
    * over a bounded polygon sample. The sample is `limit(sampleN)` on the
    * polygon side — ONE tiny dim-side job whose cost is independent of
    * scale (polygons are the dimension-table side of a PIP join by
    * construction; the POINT side never runs a job here). The median keeps
    * one continent in a set of city districts from coarsening every cover;
    * an antimeridian-crossing polygon's naive full-span bbox only coarsens
    * its own vote. */
  def resForPolys(polys: DataFrame, geomCol: String, sampleN: Int = 256): Int = {
    val bb = st_bbox(col(geomCol))
    val spans = polys.select(greatest(
        element_at(bb, 3) - element_at(bb, 1),
        element_at(bb, 4) - element_at(bb, 2)).as("__span"))
      .where(col("__span").isNotNull)
      .limit(sampleN).collect().map(_.getDouble(0)).sorted
    if (spans.isEmpty) 4 // nothing to measure: a mid-scale grid
    else resForBoxDeg(math.max(1e-9, spans(spans.length / 2)))
  }

  /** kNN join: for each query row the k nearest point rows by haversine.
    *
    * H3-style k-ring expansion with haversine refinement (BASELINE.json:6):
    * round i joins the so-far-unsatisfied queries' k-rings against the
    * indexed points, takes per-query top-k with a window, and keeps the
    * queries whose k-th distance is below the sound lower bound of
    * everything outside the explored ring
    * ([[HexCell.ringLowerBoundMetres]]). Queries still unsatisfied past
    * `maxRadius` fall back to a brute-force pass (correct, rare — empty
    * regions only).
    *
    * Ring seeding (round 6): each query's FIRST radius comes from the
    * plan-time density target — d ≈ 2·√(k·A/(π·N)) with N from Catalyst
    * statistics (zero jobs, the [[knnJoinS2]] discipline) — inverted
    * through the ring bound at the query's own latitude, so round 1 rings
    * are already big enough to certify and the old fixed-schedule early
    * rounds (provably insufficient for most densities) never run. The
    * estimate only needs the order of magnitude: a wrong N costs one extra
    * ×`growth` round, never correctness (the done test always uses the
    * actually-explored radius).
    *
    * Routing (round 4 + 6): the planar hex grid distorts toward the poles
    * — beyond `polarCutoff` AND wherever the ring bound cannot reach the
    * density target even at `maxRadius` (the cos(maxLat) collapse starts
    * biting ~60° for coarse grids), the query routes through
    * [[knnJoinS2]], whose metric caps certify at any latitude — no query
    * ever takes an unindexed path for being high-latitude. Null/NaN
    * latitudes stay planar and surface through the brute tail. Set
    * `polarCutoff >= 90` to disable routing (pre-round-4 behavior).
    *
    * @param queries DataFrame with (qidCol, qLng, qLat)
    * @param points  DataFrame with (idCol, pLng, pLat); extra cols carried
    * @param initialRadius floor for the seeded first radius (≤ 0 → 2)
    * @return qid, point columns, `dist_m`, `rank` (1..k)
    */
  def knnJoin(
      queries: DataFrame,
      qidCol: String, qLng: String, qLat: String,
      points: DataFrame,
      pLng: String, pLat: String,
      k: Int,
      res: Int,
      maxRadius: Int = 64,
      initialRadius: Int = 4,
      growth: Int = 4,
      polarCutoff: Double = 85.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // growth = 1 would make maxRounds divide by log(1) = 0 (Infinity → the
    // Int.MaxValue round cap) AND a seeded __r below maxRadius would never
    // grow, so an uncertifiable query keeps `remaining` non-empty and the
    // driver loop spins until the cap; growth <= 0 is nonsense outright
    require(growth >= 2, s"knnJoin growth must be >= 2, got $growth")
    require(maxRadius >= 1, s"knnJoin maxRadius must be >= 1, got $maxRadius")

    val pts   = points.withColumn("__pcell", hex_cell(col(pLng), col(pLat), lit(res)))
    val szDeg = HexCell.sizeDeg(res)

    // plan-time density target (metres): ~2x the expected k-NN distance on
    // a uniform sphere; order-of-magnitude is all that matters
    val nEst    = planTimeRowEstimate(points)
    val dTarget = 2.0 * math.sqrt(k * 5.1e14 / (math.Pi * nEst.toDouble))

    // smallest schedule radius whose ring bound can reach dTarget at this
    // query's latitude (inverts ringLowerBound, ignoring the bound's own
    // maxLat inflation — underestimates escalate one extra round)
    val floorR = math.max(2, if (initialRadius > 0) initialRadius else 2)
    val latOk  = col(qLat).isNotNull && !isnan(col(qLat).cast("double"))
    val cosLat = cos(radians(least(lit(85.0), abs(col(qLat)))))
    val rNeed  = ceil((lit(dTarget) / (lit(111194.9) * cosLat * szDeg) + 1.0) / 0.866)
    val r0col  = when(latOk,
      least(lit(maxRadius), greatest(lit(floorR), rNeed)).cast("int"))
      .otherwise(lit(maxRadius)) // null/NaN: inert rings, surfaces via tail
    // planar-certifiable: the bound at maxRadius can reach the target
    val planarCond = (abs(col(qLat)) <= polarCutoff &&
      ringLowerBoundCol(col(qLat), res, lit(maxRadius)) >= dTarget) || !latOk

    val polarQs = if (polarCutoff >= 90.0) queries.limit(0)
                  else queries.where(!coalesce(planarCond, lit(false)))
    var remaining = (if (polarCutoff >= 90.0) queries
                     else queries.where(coalesce(planarCond, lit(false))))
      .withColumn("__r", r0col)
    var resultOpt: Option[DataFrame] = None
    var tailOpt: Option[DataFrame]   = None
    // per-query radii: every query starts at its seeded radius and grows
    // ×growth until certified or past maxRadius (then: brute tail). The
    // round cap is a safety net — radii saturate at maxRadius in
    // log_growth(maxRadius) rounds.
    val maxRounds = math.max(1,
      math.ceil(math.log(maxRadius.toDouble) / math.log(growth.toDouble)).toInt + 1)
    var round = 0
    // ONE job per round (round 7): `remCount` is computed by the same count
    // action that materializes the round's LAZY localCheckpoints (ranked is
    // a dependency of remaining, so one count covers both), replacing the
    // old eager-checkpoint + eager-checkpoint + isEmpty triple.
    var remCount = remaining.count()
    while (round < maxRounds && remCount > 0) {
      // seam-aware probing: the planar hex grid does not wrap at ±180, so a
      // query within ring-reach of the antimeridian also probes its ±360°
      // translates — neighbors across the seam live in those frames' cells.
      val reach = (col("__r") + 2) * szDeg
      // all probe cells of one query live on its own row, so de-duplicating
      // the ±360° seam frames is a narrow array_distinct — the previous
      // explode + dropDuplicates(qid, cell) paid a full exchange per round
      val shifts = when(abs(col(qLng)) > lit(180.0) - reach,
        array(lit(0.0), lit(360.0), lit(-360.0))).otherwise(array(lit(0.0)))
      val cand = remaining
        .withColumn("__cell", explode(array_distinct(flatten(transform(shifts,
          sh => hex_kring(hex_cell(col(qLng) + sh, col(qLat), lit(res)), col("__r")))))))
        .join(pts, col("__cell") === col("__pcell"))
        .withColumn("dist_m", haversine(col(qLng), col(qLat), col(pLng), col(pLat)))
      val w      = Window.partitionBy(col(qidCol)).orderBy(col("dist_m"), col(pLng), col(pLat))
      // localCheckpoint: each round's plan would otherwise EMBED every prior
      // round's plan (remaining -> anti-join -> perQ -> remaining ...) and
      // Catalyst analysis time grows exponentially with rounds — measured as
      // 260s for 6 rounds over 25 queries. Truncating lineage per round
      // makes the loop O(rounds) in both planning and execution.
      val ranked = cand.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
        .localCheckpoint(eager = false) // materialized by remaining.count below
      // a query is DONE when it has k hits and the k-th is provably nearer
      // than anything outside ITS explored ring
      val withBound = ranked.withColumn("__lb",
        ringLowerBoundCol(col(qLat), res, col("__r")))
      val perQ = withBound.groupBy(qidCol)
        .agg(count(lit(1)).as("__n"), max("dist_m").as("__kth"), first("__lb").as("__lb"))
        .withColumn("__done", col("__n") === k && col("__kth") <= col("__lb"))
      val doneQ = perQ.where(col("__done")).select(col(qidCol))
      val done  = ranked.join(doneQ, Seq(qidCol), "left_semi")
        .drop("__cell", "__pcell", "__lb", "__r")
      resultOpt = Some(resultOpt.map(_.unionByName(done)).getOrElse(done))
      val notDone = remaining.join(doneQ, Seq(qidCol), "left_anti")
      // saturated-but-uncertified queries leave the loop for the brute tail
      // instead of burning identical full-radius rounds
      val toTail = notDone.where(col("__r") >= maxRadius || col("__r").isNull).drop("__r")
      tailOpt = Some(tailOpt.map(_.unionByName(toTail)).getOrElse(toTail))
      remaining = notDone.where(col("__r") < maxRadius)
        .withColumn("__r", least(lit(maxRadius), col("__r") * growth))
        .localCheckpoint(eager = false)
      remCount = remaining.count() // materializes ranked + remaining, one job
      round += 1
    }
    // brute-force fallback for stragglers (provably correct; hits only when
    // the neighborhood is emptier than maxRadius rings)
    val tailQs = (tailOpt, Some(remaining.drop("__r")).filterNot(_ => remCount == 0)) match {
      case (Some(a), Some(b)) => Some(a.unionByName(b))
      case (a, b)             => a.orElse(b)
    }
    val tail = tailQs.filterNot(_.isEmpty).map { qs =>
      val w = Window.partitionBy(col(qidCol)).orderBy(col("dist_m"), col(pLng), col(pLat))
      qs.crossJoin(points)
        .withColumn("dist_m", haversine(col(qLng), col(qLat), col(pLng), col(pLat)))
        .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
    }
    val res0 = (resultOpt, tail) match {
      case (Some(a), Some(b)) => a.unionByName(b, allowMissingColumns = true)
      case (Some(a), None)    => a
      case (None, Some(b))    => b
      case (None, None)       => queries.limit(0).crossJoin(points.limit(0))
        .withColumn("dist_m", lit(0.0)).withColumn("rank", lit(1))
    }
    // no eager polarQs.isEmpty here: knnJoinS2's own loop exits on its first
    // (single) emptiness check, so the zero-route case costs one limit(1)
    // scan either way and the code path stays uniform
    if (polarCutoff >= 90.0) res0
    else res0.unionByName(
      knnJoinS2(polarQs, qidCol, qLng, qLat, points, pLng, pLat, k),
      allowMissingColumns = true)
  }

  /** kNN join on S2 cells — the pole-safe variant. The planar hex grid of
    * [[knnJoin]] distorts near the poles (its ring bound collapses and polar
    * queries fall through to the brute-force tail); S2's cube faces have no
    * singularity there, so this join stays cell-pruned at any latitude.
    *
    * Per round, each query covers a METRIC cap (radius r, growing 4x/round)
    * with a sound lat/lng box:
    *   Δφ = r / R  (great-circle distance ≥ R·|Δφ_rad|)
    *   Δλ = 2·asin(min(1, r / (2·R·cos φmax)))  with φmax = max |lat| in the
    *        band — from haversine ≥ 2R·cos φmax·sin(|Δλ|/2) — so every point
    *        within r lies inside the box; full-longitude when the band
    *        touches a pole or Δλ ≥ 180°.
    * The box is covered multi-level (`s2_cover_box`, normalized disjoint) and
    * equi-joined against the points' level ancestors, so each (q, p) pair
    * appears at most once. A query is DONE when it holds k hits with the
    * k-th distance ≤ r: nothing outside the cap can be nearer. Stragglers
    * (neighborhood emptier than the last radius) take the brute-force tail.
    *
    * @return qid, point columns, `dist_m`, `rank` (1..k)
    */
  /** Persist a polygon set's JOIN INDEX — cover cells + packed geometries —
    * so repeated point batches join against static boundaries (admin areas,
    * tile schemes) without re-parsing or re-covering the polygons each run:
    * the third persisted prepare-once artifact next to the dedup signature
    * catalog and the IVF inverted file. Layout: `path/cells` = one row per
    * (cover cell, polygon) with the packed geometry struct inline;
    * `path/params` = the hex resolution. */
  def writeCoverIndex(polys: DataFrame, idCol: String, geomCol: String,
                      path: String, res: Int): Unit = {
    val spark = polys.sparkSession
    import spark.implicits._
    // params and cells are independent writes — overlap them (guide §2.6)
    graft.Par.run(
      () => Seq(res).toDF("res").coalesce(1)
        .write.mode("overwrite").parquet(s"$path/params"),
      () => polys.select(col(idCol), col(geomCol).as("__geom"),
          explode(hex_cover(col(geomCol), lit(res))).as("__cell"))
        .write.mode("overwrite").parquet(s"$path/cells"))
  }

  /** PIP join of a point batch against a persisted [[writeCoverIndex]]:
    * identical output to [[pipJoin]] (each polygon's cover cells are
    * distinct, so a point matches a polygon on at most one cell — no dup
    * pairs), but the polygon side is a plain parquet scan of precomputed
    * cells + geometries (broadcast by default): zero parse, zero cover
    * computation per batch. */
  def pipJoinWithIndex(points: DataFrame, lngCol: String, latCol: String,
                       path: String, broadcastIndex: Boolean = true): DataFrame = {
    val spark = points.sparkSession
    val res = spark.read.parquet(s"$path/params").head.getAs[Int]("res")
    val idx0 = spark.read.parquet(s"$path/cells")
    val idx  = if (broadcastIndex) broadcast(idx0) else idx0
    points.withColumn("__cell", hex_cell(col(lngCol), col(latCol), lit(res)))
      .join(idx, Seq("__cell"))
      .where(st_contains(col("__geom"), col(lngCol), col(latCol)))
      .drop("__cell", "__geom")
  }

  /** Sound lat/lng box (w, s, e, n) covering the metric cap of radius
    * `radiusM` metres around (qLng, qLat) — the shared soundness-critical
    * geometry of [[knnJoinS2]] and [[distanceJoin]]: the box is drawn a hair
    * wide (1e-9) so haversine float error can never exclude a true boundary
    * point, Δλ comes from the haversine lower bound at the band's max
    * latitude, and caps peaking above |lat| 89.99° (where the clamped cos is
    * no longer a sound under-estimate) take the full-longitude band. */
  private def capBox(qLng: Column, qLat: Column, radiusM: Double)
      : (Column, Column, Column, Column) = {
    val R      = 6371008.8 // metres; matches GeoAlgo.haversine
    val rBox   = radiusM * (1.0 + 1e-9)
    val dPhi   = lit(rBox / R * (180.0 / math.Pi))
    val sBound = greatest(lit(-90.0), qLat - dPhi)
    val nBound = least(lit(90.0), qLat + dPhi)
    val phiMax = greatest(abs(sBound), abs(nBound))
    val dLng   = degrees(lit(2.0) * asin(least(lit(1.0),
      lit(rBox) / (lit(2.0 * R) * cos(radians(least(lit(89.99), phiMax)))))))
    val polar  = (phiMax >= 89.99) || (dLng >= 180.0)
    val w0 = when(polar, lit(-180.0)).otherwise(qLng - dLng)
    val e0 = when(polar, lit(180.0)).otherwise(qLng + dLng)
    (w0, sBound, e0, nBound)
  }

  /** WITHIN-DISTANCE join (distance join): every (query, point) pair within
    * `maxDistM` metres — the set-returning sibling of [[knnJoinS2]], using
    * the same metric-cap S2 box covers (pole-safe: caps peaking above
    * |lat| 89.99° take the full-longitude band; seam-safe: w > e boxes wrap
    * through ±180), but with NO radius loop or window — the radius is given,
    * so the plan is one cover explode, one cell equi-join and an exact
    * haversine refine. Covers are normalized DISJOINT and the point side
    * explodes its ancestor chain, so every true pair matches on exactly one
    * cell — no post-join dedup, no pair ever verified twice. Scale shape:
    * both sides shuffle once on the int64 cell key (or the smaller side
    * broadcasts under AQE); candidate fan-in per query is the cap's point
    * count.
    *
    * @return all query columns + all point columns + `dist_m` (<= maxDistM)
    */
  def distanceJoin(
      queries: DataFrame, qLng: String, qLat: String,
      points: DataFrame, pLng: String, pLat: String,
      maxDistM: Double,
      minLevel: Int = 4,
      maxLevel: Int = 10): DataFrame = {
    require(maxDistM > 0, s"maxDistM must be positive, got $maxDistM")
    val pts = points.withColumn("__pcell",
      explode(s2_ancestors(col(pLng), col(pLat), lit(minLevel), lit(maxLevel))))
    val (w0, sBound, e0, nBound) = capBox(col(qLng), col(qLat), maxDistM)
    queries
      .withColumn("__cell", explode(s2_cover_box(w0, sBound, e0, nBound,
        lit(minLevel), lit(maxLevel))))
      .join(pts, col("__cell") === col("__pcell"))
      .withColumn("dist_m", haversine(col(qLng), col(qLat), col(pLng), col(pLat)))
      .where(col("dist_m") <= maxDistM)
      .drop("__cell", "__pcell")
  }

  def knnJoinS2(
      queries: DataFrame,
      qidCol: String, qLng: String, qLat: String,
      points: DataFrame,
      pLng: String, pLat: String,
      k: Int,
      minLevel: Int = 4,
      maxLevel: Int = 10,
      initialRadiusM: Double = -1.0,
      maxRounds: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    // auto initial radius (<= 0): size the first cap so most queries certify
    // in round 1 — r0 = 2 sqrt(k A / (pi N)) with N from the PLAN-TIME row
    // estimate (zero jobs: no eager scan of the points input, which at 100 TB
    // would be a full-table pass before the job even starts). Only the order
    // of magnitude matters: r0 enters as 1/sqrt(N) and the cap grows 4x per
    // round, so a 16x row-count error costs exactly one extra round; the
    // clamp bounds the damage from a degenerate estimate. Pass an explicit
    // initialRadiusM when the true density is known.
    val r0 =
      if (initialRadiusM > 0) initialRadiusM
      else {
        val n = planTimeRowEstimate(points)
        math.min(2.0e6, math.max(50.0, 2.0 * math.sqrt(k * 5.1e14 / (math.Pi * n))))
      }

    val pts = points.withColumn("__pcell",
      explode(s2_ancestors(col(pLng), col(pLat), lit(minLevel), lit(maxLevel))))

    var remaining = queries
    var resultOpt: Option[DataFrame] = None
    var radiusM   = r0
    var round     = 0
    // one job per round, as in [[knnJoin]]: count doubles as the
    // materializing action for the round's lazy localCheckpoints
    var remCount  = remaining.count()
    while (round < maxRounds && remCount > 0) {
      // capBox > r > rDone: the box is a hair wide and the done test a hair
      // strict, so float rounding can never exclude a true neighbor the
      // done test would have trusted (box may wrap <-180: s2_cover_box
      // normalizes)
      val (w0, sBound, e0, nBound) = capBox(col(qLng), col(qLat), radiusM)
      val cand = remaining
        .withColumn("__cell", explode(s2_cover_box(w0, sBound, e0, nBound,
          lit(minLevel), lit(maxLevel))))
        .join(pts, col("__cell") === col("__pcell"))
        .withColumn("dist_m", haversine(col(qLng), col(qLat), col(pLng), col(pLat)))
      val w = Window.partitionBy(col(qidCol)).orderBy(col("dist_m"), col(pLng), col(pLat))
      // per-round localCheckpoint: same exponential-analysis guard as knnJoin
      val ranked = cand.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
        .localCheckpoint(eager = false)
      val perQ = ranked.groupBy(qidCol)
        .agg(count(lit(1)).as("__n"), max("dist_m").as("__kth"))
        .withColumn("__done", col("__n") === k && col("__kth") <= radiusM * (1.0 - 1e-9))
      val doneQ = perQ.where(col("__done")).select(col(qidCol))
      val done  = ranked.join(doneQ, Seq(qidCol), "left_semi").drop("__cell", "__pcell")
      resultOpt = Some(resultOpt.map(_.unionByName(done)).getOrElse(done))
      remaining = remaining.join(doneQ, Seq(qidCol), "left_anti")
        .localCheckpoint(eager = false)
      remCount = remaining.count() // materializes ranked + remaining
      radiusM *= 4
      round += 1
    }
    val tail =
      if (remCount == 0) None
      else {
        val w = Window.partitionBy(col(qidCol)).orderBy(col("dist_m"), col(pLng), col(pLat))
        Some(remaining.crossJoin(points)
          .withColumn("dist_m", haversine(col(qLng), col(qLat), col(pLng), col(pLat)))
          .withColumn("rank", row_number().over(w)).where(col("rank") <= k))
      }
    (resultOpt, tail) match {
      case (Some(a), Some(b)) => a.unionByName(b, allowMissingColumns = true)
      case (Some(a), None)    => a
      case (None, Some(b))    => b
      case (None, None)       => queries.limit(0).crossJoin(points.limit(0))
        .withColumn("dist_m", lit(0.0)).withColumn("rank", lit(1))
    }
  }

  /** Row-count estimate from Catalyst plan statistics — launches ZERO Spark
    * jobs. Uses the optimizer's rowCount when the catalog/CBO provides one,
    * else sizeInBytes divided by the schema's default row width (file-size
    * based for parquet scans: compression skews it, but [[knnJoinS2]] only
    * needs the order of magnitude). */
  private[graft] def planTimeRowEstimate(df: DataFrame): Long = {
    val stats = df.queryExecution.optimizedPlan.stats
    stats.rowCount.map(_.toLong).filter(_ > 0).getOrElse {
      val width = math.max(8, df.schema.fields.map(_.dataType.defaultSize).sum)
      math.max(1L, (stats.sizeInBytes / width).min(BigInt(Long.MaxValue)).toLong)
    }
  }

  /** Sound per-row lower bound (metres) on distances outside ring `radius`
    * — Column form of [[HexCell.ringLowerBoundMetres]]; `radius` may be a
    * per-query column (the seeded-schedule loop). */
  private def ringLowerBoundCol(lat: Column, res: Int, radius: Column): Column = {
    val sz        = HexCell.sizeDeg(res)
    val planarDeg = greatest(lit(0.0),
      (radius.cast("double") * math.sqrt(3.0) / 2.0 - 1.0) * sz)
    val maxLat    = least(lit(89.9), abs(lat) + (planarDeg + lit(sz)))
    planarDeg * lit(111194.9) * cos(radians(maxLat))
  }

  /** Raster→vector tile assignment (BASELINE.json:14): attach the packed ZXY
    * tile key plus z/x/y columns; callers repartition/partitionBy on them
    * for tile-local downstream work.
    */
  def assignTiles(df: DataFrame, lngCol: String, latCol: String, z: Int): DataFrame =
    df.withColumn("tile_key", tile_key(col(lngCol), col(latCol), lit(z)))
      .withColumn("tile_z", tile_z(col("tile_key")))
      .withColumn("tile_x", tile_x(col("tile_key")))
      .withColumn("tile_y", tile_y(col("tile_key")))

  /** Write tile-bucketed output: repartitioned by tile key (co-locates each
    * tile, avoids the million-directory explosion of partitionBy at high z)
    * and sorted within partitions so readers stream tiles contiguously.
    */
  def writeTiled(df: DataFrame, path: String, buckets: Int): Unit =
    df.repartition(buckets, col("tile_key"))
      .sortWithinPartitions("tile_key")
      .write.mode("overwrite").parquet(path)

  /** Tile a GEOMETRY layer at zoom z with EXACT per-tile geometry — the
    * construction twin of [[assignTiles]] (which buckets points): each row
    * explodes to the z-tiles its bbox covers and carries `tile_geom`, the
    * geometry CLIPPED to that tile's bounds (`st_clip_box`), so a
    * [[writeTiled]] sink ships exact per-tile pieces the way every real
    * tile pipeline does. Bbox covers are sound supersets; tiles whose clip
    * is empty drop on the `isNotNull` filter. Adjacent tiles share
    * bit-identical boundary doubles ([[graft.geo.algo.GeoAlgo.tileBounds]]),
    * so the pieces partition the geometry exactly along tile seams
    * (ClipSpec pins the area sum). Entirely narrow — no shuffle until the
    * caller's write. An antimeridian-crossing geometry covers via its naive
    * full-span bbox (sound, not minimal) and its pieces land on both sides
    * with normalized longitudes. */
  def tilePolygons(df: DataFrame, geomCol: String, z: Int): DataFrame = {
    val tb = tile_bounds(col("tile_key"))
    val clip = st_clip_box(col(geomCol),
      element_at(tb, 1), element_at(tb, 2), element_at(tb, 3), element_at(tb, 4))
    // null-clip rows drop INSIDE the generator (explode of a filtered
    // 0/1-element array): a plain `.where(isNotNull)` gets pushed below the
    // projection by Catalyst and re-evaluates the clip twice per row
    df.withColumn("tile_key", explode(tile_cover(col(geomCol), lit(z))))
      .withColumn("tile_geom",
        explode(filter(array(clip), g => g.isNotNull)))
  }
}
