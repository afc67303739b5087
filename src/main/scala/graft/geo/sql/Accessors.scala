package graft.geo.sql

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.geo.model.GeoModel.GType

/** The reference's optics algebra (SURVEY.md §2.2,
  * /root/reference/src/geojson/optics.ml + geojson.ml:518-622) re-expressed
  * as Column combinators:
  *
  *  - Lens (total focus)      → `getField` / `withField` (Catalyst
  *                              UpdateFields) — composition is just chaining
  *  - Prism (partial match)   → `when(tag === k, view)` returning null on a
  *                              non-match, exactly Prism.get = None
  *  - Optional (lens∘prism)   → chained getField + when; null-propagating
  *
  * All of these stay inside Catalyst (no UDFs), so pruning/codegen see
  * through them.
  */
object Accessors {

  // ---- top-level lenses (geojson.ml:524-529)
  def kind(top: Column): Column = top.getField("kind")
  def bbox(top: Column): Column = top.getField("bbox")

  // ---- 3-way union prisms (geojson.ml:531-549): null on non-match
  def feature(top: Column): Column =
    when(top.getField("kind") === 1, top.getField("feature"))
  def featureCollection(top: Column): Column =
    when(top.getField("kind") === 2, top.getField("features"))
  def geometry(top: Column): Column =
    when(top.getField("kind") === 0, top.getField("geometry"))

  // ---- Feature lenses (geojson.ml:551-571)
  def featureProperties(f: Column): Column = f.getField("properties")
  def featureGeometry(f: Column): Column   = f.getField("geometry")
  def featureForeignMembers(f: Column): Column = f.getField("fm")
  /** id as a string (string ids verbatim, numeric ids via %.16g-style cast) */
  def featureId(f: Column): Column =
    coalesce(f.getField("id_s"), f.getField("id_n").cast("string"))
  /** geometry_exn (geojson.ml:567-570): raises on None — here an
    * assert-backed projection. */
  def featureGeometryExn(f: Column): Column =
    when(f.getField("geometry").isNull,
      raise_error(lit("feature has no geometry"))).otherwise(f.getField("geometry"))

  // ---- per-constructor geometry prisms (geojson.ml:580-622): the coords
  // view when the tag matches, null otherwise
  private def prism(g: Column, t: Int): Column =
    when(g.getField("gtype") === t, g)

  def asPoint(g: Column): Column           = prism(g, GType.Point)
  def asMultiPoint(g: Column): Column      = prism(g, GType.MultiPoint)
  def asLineString(g: Column): Column      = prism(g, GType.LineString)
  def asMultiLineString(g: Column): Column = prism(g, GType.MultiLineString)
  def asPolygon(g: Column): Column         = prism(g, GType.Polygon)
  def asMultiPolygon(g: Column): Column    = prism(g, GType.MultiPolygon)
  def asGeometryCollection(g: Column): Column = prism(g, GType.Collection)

  // ---- Position accessors (geojson.ml:45-64); 1-indexed element_at
  /** lng of a Point geometry (null for other types). */
  def pointLng(g: Column): Column =
    when(g.getField("gtype") === GType.Point, element_at(g.getField("coords"), 1))
  def pointLat(g: Column): Column =
    when(g.getField("gtype") === GType.Point, element_at(g.getField("coords"), 2))
  /** altitude: None when the position is 2-D (geojson.ml:47). */
  def pointAltitude(g: Column): Column =
    when(g.getField("gtype") === GType.Point && size(g.getField("coords")) > 2,
      element_at(g.getField("coords"), 3))

  /** n-th position of the geometry (0-based, across all rings) as
    * array<double> — Lens.nth / Optional composition. */
  def positionAt(g: Column, n: Int): Column = {
    val po = g.getField("pos_offsets")
    slice(g.getField("coords"), element_at(po, n + 1) + 1,
      element_at(po, n + 2) - element_at(po, n + 1))
  }

  /** number of positions */
  def numPositions(g: Column): Column = size(g.getField("pos_offsets")) - 1

  // ---- Polygon ring lenses (geojson.ml:182-187)
  /** exterior ring as array of positions (array<array<double>>) */
  def exteriorRing(g: Column): Column = ringAt(g, 0)

  /** ring r (0-based) as array<array<double>> of positions */
  def ringAt(g: Column, r: Int): Column = ringView(g, lit(r))

  private def ringView(g: Column, r: Column): Column = {
    val ro    = g.getField("ring_offsets")
    val start = element_at(ro, r + 1)
    val end   = element_at(ro, r + 2)
    // end > start guard: Spark's sequence(start, stop) DESCENDS when
    // start > stop, so a degenerate empty ring (equal consecutive offsets)
    // would yield a bogus 2-element reversed range — empty array instead.
    // Null offsets (null geometry / out-of-range ring index) keep the lens
    // null-in-null-out: without the explicit branch the `when` condition is
    // null and `.otherwise` would turn null into a bogus empty array.
    when(start.isNull || end.isNull, lit(null).cast("array<array<double>>"))
      .when(end > start, transform(sequence(start, end - 1), i => posView(g, i)))
      .otherwise(array().cast("array<array<double>>"))
  }

  /** number of rings (interior ring count = numRings - 1 for polygons) */
  def numRings(g: Column): Column = size(g.getField("ring_offsets")) - 1

  // ---- multi-geometry part lenses (geojson.ml MultiPoint/MultiLineString/
  // MultiPolygon accessors): parts index RINGS via part_offsets
  /** number of parts (1 for single geometries) */
  def numParts(g: Column): Column = size(g.getField("part_offsets")) - 1

  /** part p (0-based) as its rings — array of array<array<double>> */
  def partAt(g: Column, p: Int): Column = {
    val po    = g.getField("part_offsets")
    val start = element_at(po, p + 1)
    val end   = element_at(po, p + 2)
    // same descending-sequence guard as ringView for empty parts
    when(end > start, transform(sequence(start, end - 1), r => ringView(g, r)))
      .otherwise(array().cast("array<array<array<double>>>"))
  }

  private def posView(g: Column, i: Column): Column = {
    val po = g.getField("pos_offsets")
    slice(g.getField("coords"), element_at(po, i + 1) + 1,
      element_at(po, i + 2) - element_at(po, i + 1))
  }

  // ---- setters (Lens.set): withField-based updates
  /** set (replace) the feature's properties JSON text */
  def setProperties(top: Column, newProps: Column): Column =
    top.withField("feature.properties", newProps)
  /** set the feature's geometry struct */
  def setGeometry(top: Column, newGeom: Column): Column =
    top.withField("feature.geometry", newGeom)
  /** set the top-level bbox */
  def setBBox(top: Column, newBBox: Column): Column =
    top.withField("bbox", newBBox)

  // ---- deep setters (Prism.set / Optional update composition,
  // optics.ml:53-160): pure Column math over the packed layout, so they stay
  // inside Catalyst. Prism.set semantics throughout: NO-OP (the original
  // geometry) when the focus does not exist — never null, never an error.

  /** Prism-guarded update (Prism.set, optics.ml:61-67): apply `f` only when
    * the geometry's constructor tag matches `gtype`; identity otherwise. */
  def prismSet(g: Column, gtype: Int, f: Column => Column): Column =
    when(g.getField("gtype") === gtype, f(g)).otherwise(g)

  /** Set the n-th position (0-based, across all rings) to `pos`
    * (array<double>, length 2 or 3 — dimension changes are handled by
    * shifting the packed offsets). Optional.set composed from Lens.nth:
    * no-op when n is out of range. */
  def setPositionAt(g: Column, n: Int, pos: Column): Column = {
    val po     = g.getField("pos_offsets")
    val coords = g.getField("coords")
    val start  = element_at(po, n + 1) // coord index where position n begins
    val end    = element_at(po, n + 2)
    val delta  = size(pos) - (end - start)
    val newCoords = concat(slice(coords, lit(1), start), pos,
      slice(coords, end + 1, size(coords) - end))
    val newPo = transform(po, (x, i) => when(i > n, x + delta).otherwise(x))
    when(lit(n) >= 0 && lit(n) < size(po) - 1,
      g.withField("coords", newCoords).withField("pos_offsets", newPo))
      .otherwise(g)
  }

  /** Set ring r (0-based) to `ring` (array<array<double>> of positions; the
    * position count and dimensions may change — both offset arrays are
    * rebuilt). No-op when r is out of range. */
  def setRingAt(g: Column, r: Int, ring: Column): Column = {
    val po     = g.getField("pos_offsets")
    val ro     = g.getField("ring_offsets")
    val coords = g.getField("coords")
    val pStart = element_at(ro, r + 1) // first position index of ring r
    val pEnd   = element_at(ro, r + 2) // one past its last position
    val cStart = element_at(po, pStart + 1)
    val cEnd   = element_at(po, pEnd + 1)
    val flat   = flatten(ring)
    val cDelta = size(flat) - (cEnd - cStart)
    val pDelta = size(ring) - (pEnd - pStart)
    val newCoords = concat(slice(coords, lit(1), cStart), flat,
      slice(coords, cEnd + 1, size(coords) - cEnd))
    // position offsets: untouched prefix (entries 0..pStart, the last of
    // which is cStart), the new ring's running coordinate sums, then the
    // suffix shifted by the coordinate-count change
    val ringCum = aggregate(ring, array(cStart),
      (acc, p) => concat(acc, array(element_at(acc, -1) + size(p))))
    val newPo = concat(
      slice(po, lit(1), pStart + 1),
      slice(ringCum, lit(2), size(ringCum) - 1),
      transform(slice(po, pEnd + 2, size(po) - pEnd - 1), _ + cDelta))
    // ring offsets after r shift by the position-count change; part offsets
    // index rings, whose count is unchanged
    val newRo = transform(ro, (x, i) => when(i > r, x + pDelta).otherwise(x))
    when(lit(r) >= 0 && lit(r) < size(ro) - 1,
      g.withField("coords", newCoords)
        .withField("pos_offsets", newPo)
        .withField("ring_offsets", newRo))
      .otherwise(g)
  }
}
