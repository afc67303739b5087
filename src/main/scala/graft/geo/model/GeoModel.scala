package graft.geo.model

import graft.geo.json._

/** GeoJSON ADT mirroring the reference data model
  * (`/root/reference/src/geojson/geojson.ml:239-473`, RFC 7946).
  *
  * - A position is a raw double array (lng, lat[, altitude]) — geojson.ml:43.
  * - A geometry is a shape plus its foreign members — geojson.ml:248.
  * - GeometryCollection is recursive — geojson.ml:246.
  * - Only the TOP-level object carries a bbox (geojson.ml:473); nested
  *   geometries drop theirs on round-trip (keys_in_use includes "bbox",
  *   geojson.ml:33, but the value is never stored).
  */
object GeoModel {

  type Position = Array[Double] // lng = (0), lat = (1), altitude = (2) if length > 2

  object Position {
    def apply(lng: Double, lat: Double): Position = Array(lng, lat)
    def apply(lng: Double, lat: Double, alt: Double): Position = Array(lng, lat, alt)
    def lng(p: Position): Double = p(0)
    def lat(p: Position): Double = p(1)
    def altitude(p: Position): Option[Double] = if (p.length > 2) Some(p(2)) else None
    def equal(a: Position, b: Position): Boolean =
      a.length == b.length && a.indices.forall(i => java.lang.Double.compare(a(i), b(i)) == 0)
  }

  sealed trait Shape
  final case class Point(p: Position) extends Shape
  final case class MultiPoint(ps: Vector[Position]) extends Shape
  /** Parse enforces >= 2 positions (geojson.ml:133-139). */
  final case class LineString(ps: Vector[Position]) extends Shape
  final case class MultiLineString(lines: Vector[Vector[Position]]) extends Shape
  /** rings(0) = exterior, rest = holes (geojson.ml:183-187); closedness NOT
    * validated (geojson_intf.ml:165-167). */
  final case class Polygon(rings: Vector[Vector[Position]]) extends Shape
  final case class MultiPolygon(polys: Vector[Vector[Vector[Position]]]) extends Shape
  final case class GeometryCollection(children: Vector[Geometry]) extends Shape

  /** geometry * foreign members, geojson.ml:248 */
  final case class Geometry(shape: Shape, foreignMembers: Vector[(String, JValue)] = Vector.empty)

  sealed trait FeatureId
  final case class StringId(s: String) extends FeatureId
  final case class NumId(d: Double) extends FeatureId

  /** geojson.ml:314-320. `properties = Some(JNull)` means the member was
    * present with value null; None means absent — both faithful round-trip. */
  final case class Feature(
      geometry: Option[Geometry],
      properties: Option[JValue],
      foreignMembers: Vector[(String, JValue)] = Vector.empty,
      id: Option[FeatureId] = None)

  final case class FeatureCollection(
      features: Vector[Feature],
      foreignMembers: Vector[(String, JValue)] = Vector.empty)

  sealed trait Body
  final case class GFeature(f: Feature) extends Body
  final case class GCollection(fc: FeatureCollection) extends Body
  final case class GGeometry(g: Geometry) extends Body

  /** Top-level object, geojson.ml:468-473. */
  final case class GeoJson(body: Body, bbox: Option[Array[Double]] = None)

  /** Numeric type tags for the packed Spark struct (SURVEY.md §1.4). */
  object GType {
    val Point             = 1
    val MultiPoint        = 2
    val LineString        = 3
    val MultiLineString   = 4
    val Polygon           = 5
    val MultiPolygon      = 6
    val Collection        = 7
    def of(s: Shape): Int = s match {
      case _: Point              => Point
      case _: MultiPoint         => MultiPoint
      case _: LineString         => LineString
      case _: MultiLineString    => MultiLineString
      case _: Polygon            => Polygon
      case _: MultiPolygon       => MultiPolygon
      case _: GeometryCollection => Collection
    }
    def ofName(s: String): Int = s match {
      case "Point"           => Point
      case "MultiPoint"      => MultiPoint
      case "LineString"      => LineString
      case "MultiLineString" => MultiLineString
      case "Polygon"         => Polygon
      case "MultiPolygon"    => MultiPolygon
      case _                 => Collection
    }
    def name(t: Int): String = t match {
      case Point           => "Point"
      case MultiPoint      => "MultiPoint"
      case LineString      => "LineString"
      case MultiLineString => "MultiLineString"
      case Polygon         => "Polygon"
      case MultiPolygon    => "MultiPolygon"
      case Collection      => "GeometryCollection"
      case other           => s"Unknown($other)"
    }
  }
}
