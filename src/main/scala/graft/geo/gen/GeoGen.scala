package graft.geo.gen

import graft.geo.json.{JNum, JObj, JValue}
import graft.geo.model.GeoModel._

/** Skeleton-driven random GeoJSON generation — the engine twin of the
  * reference's `Random` module (`/root/reference/src/geojson/geojson.ml:625-678`):
  * a skeleton (`R*`) names the document shape and per-geometry arities, a
  * caller-supplied float source fills in positions, polygons are closed by
  * copying point 0 over the last point (geojson.ml:671-675).
  *
  * Two surfaces:
  *  - [[random]] — the model-level mirror (used by RoundTripPropertySpec);
  *  - [[docFor]] — the deterministic (id, seed) variant behind the
  *    `random_geojson` Column expression, generating over `spark.range`-style
  *    id columns. The skeleton rotation is `id % 7` so an oracle can predict
  *    the document kind in plain SQL; coordinates come from splitmix64 and
  *    land on the 2-decimal grid, and the text is rendered through
  *    [[graft.geo.json.GeoJsonCodec.render]] so it is already in canonical
  *    %.16g form (round-trip is byte-stable).
  */
object GeoGen {

  // skeleton ADT (geojson.ml:626-634)
  sealed trait RGeometry
  case object RPoint                                extends RGeometry
  final case class RMultiPoint(n: Int)              extends RGeometry
  final case class RLineString(n: Int)              extends RGeometry
  final case class RMultiLineString(n: Int, m: Int) extends RGeometry
  final case class RPolygon(n: Int)                 extends RGeometry
  final case class RMultiPolygon(n: Int, m: Int)    extends RGeometry
  final case class RCollection(gs: List[RGeometry]) extends RGeometry

  final case class RFeature(properties: Option[JValue], geometry: RGeometry)
  sealed trait RDoc
  final case class RFC(fs: List[RFeature]) extends RDoc
  final case class RF(f: RFeature)         extends RDoc
  final case class RG(g: RGeometry)        extends RDoc

  /** geojson.ml:638-676 — skeleton + float source → document. */
  def random(doc: RDoc, f: () => Double): GeoJson = {
    def point(): Position = Array(f(), f())
    def polygon(n: Int): Vector[Vector[Position]] = {
      val pts = Array.fill(n)(point())
      pts(n - 1) = pts(0) // close the ring (geojson.ml:673-674)
      Vector(pts.toVector)
    }
    def geom(g: RGeometry): Geometry = g match {
      case RPoint                 => Geometry(Point(point()))
      case RMultiPoint(n)         => Geometry(MultiPoint(Vector.fill(n)(point())))
      case RLineString(n)         => Geometry(LineString(Vector.fill(n)(point())))
      case RMultiLineString(n, m) => Geometry(MultiLineString(Vector.fill(n)(Vector.fill(m)(point()))))
      case RPolygon(n)            => Geometry(Polygon(polygon(n)))
      case RMultiPolygon(n, m)    => Geometry(MultiPolygon(Vector.fill(n)(polygon(m))))
      case RCollection(gs)        => Geometry(GeometryCollection(gs.toVector.map(geom)))
    }
    def feature(rf: RFeature): Feature =
      Feature(Some(geom(rf.geometry)), rf.properties)
    doc match {
      case RFC(fs) => GeoJson(GCollection(FeatureCollection(fs.toVector.map(feature))))
      case RF(rf)  => GeoJson(GFeature(feature(rf)))
      case RG(g)   => GeoJson(GGeometry(geom(g)))
    }
  }

  /** splitmix64 step (public-domain PRNG, Steele et al.). */
  def splitmix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** The default skeleton rotation: kind = id % 7 (SQL-predictable). */
  def skeletonFor(id: Long): RDoc = ((id % 7) + 7) % 7 match {
    case 0 => RG(RPoint)
    case 1 => RG(RLineString(4))
    case 2 => RG(RPolygon(5))
    case 3 => RG(RMultiPoint(3))
    case 4 => RG(RMultiPolygon(2, 4))
    case 5 => RF(RFeature(Some(JObj(Vector("gen" -> JNum((id % 100).toDouble)))), RPoint))
    case _ => RFC(List(
      RFeature(None, RLineString(3)),
      RFeature(Some(JObj(Vector("gen" -> JNum((id % 100).toDouble)))), RPolygon(4))))
  }

  /** Deterministic document for (id, seed): world-range lng/lat-ish floats
    * on the 2-decimal grid from a splitmix64 stream. */
  def docFor(id: Long, seed: Long): GeoJson = {
    var state = splitmix(seed ^ splitmix(id))
    val f = () => {
      state = splitmix(state)
      // subtract on the integer side: n/100.0 is a single correctly-rounded
      // division, identical to parsing the 2-decimal literal (a trailing
      // "- 180.0" would drift off-grid and break byte-stable round-trips)
      ((state >>> 11) % 36000L - 18000L) / 100.0
    }
    random(skeletonFor(id), f)
  }
}
