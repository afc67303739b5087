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
  def ringAt(g: Column, r: Int): Column = {
    val ro    = g.getField("ring_offsets")
    val start = element_at(ro, r + 1)
    val end   = element_at(ro, r + 2)
    transform(sequence(start, end - 1), i => posView(g, i))
  }

  /** number of rings (interior ring count = numRings - 1 for polygons) */
  def numRings(g: Column): Column = size(g.getField("ring_offsets")) - 1

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
}
