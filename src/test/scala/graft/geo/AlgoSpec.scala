package graft.geo

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

import graft.geo.algo.GeoAlgo
import graft.geo.json.{GeoJsonCodec, JValue}
import graft.geo.model.GeoModel._
import graft.geo.sql.{GeoStruct, GeomAccess}

/** PIP / haversine / tiling kernels, oracled against JTS
  * (jts-core is present in /opt/spark/jars as a TEST oracle only —
  * SURVEY.md §5) and closed-form expectations.
  */
class AlgoSpec extends AnyFunSuite {

  val rng = new Random(7)

  def packedGeom(json: String) = {
    val g = JValue.parse(json).flatMap(GeoJsonCodec.geometryOfJson)
      .fold(e => fail(e), identity)
    GeoStruct.packGeometry(g)
  }

  test("haversine: known distances") {
    // Paris (2.3522, 48.8566) to London (-0.1276, 51.5072) ≈ 344 km
    val d = GeoAlgo.haversine(2.3522, 48.8566, -0.1276, 51.5072)
    assert(math.abs(d - 343900) < 1500, s"got $d")
    assert(GeoAlgo.haversine(10, 20, 10, 20) == 0.0)
    // one degree of latitude ≈ 111.19 km
    assert(math.abs(GeoAlgo.haversine(0, 0, 0, 1) - 111195) < 10)
  }

  test("PIP matches JTS on the polygon fixture corpus + random points") {
    import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
    val gf = new GeometryFactory()

    // fixture polygon.json: unit square-ish [100..101]x[0..1]
    val poly = packedGeom(
      """{"type":"Polygon","coordinates":[[[100.0,0.0],[101.0,0.0],[101.0,1.0],[100.0,1.0],[100.0,0.0]]]}""")
    val shell = gf.createLinearRing(Array(
      new Coordinate(100, 0), new Coordinate(101, 0), new Coordinate(101, 1),
      new Coordinate(100, 1), new Coordinate(100, 0)))
    val jts = gf.createPolygon(shell)
    for (_ <- 1 to 5000) {
      val x = 99.5 + rng.nextDouble() * 2
      val y = -0.5 + rng.nextDouble() * 2
      val expected = jts.contains(gf.createPoint(new Coordinate(x, y)))
      assert(GeomAccess.contains(poly, x, y) == expected, s"($x,$y)")
    }
  }

  test("PIP with hole matches JTS (multi_polygon fixture shape)") {
    import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
    val gf = new GeometryFactory()
    val poly = packedGeom(
      """{"type":"Polygon","coordinates":[
        [[100.0,0.0],[101.0,0.0],[101.0,1.0],[100.0,1.0],[100.0,0.0]],
        [[100.2,0.2],[100.8,0.2],[100.8,0.8],[100.2,0.8],[100.2,0.2]]]}""".replaceAll("\\s", ""))
    val shell = gf.createLinearRing(Array(
      new Coordinate(100, 0), new Coordinate(101, 0), new Coordinate(101, 1),
      new Coordinate(100, 1), new Coordinate(100, 0)))
    val hole = gf.createLinearRing(Array(
      new Coordinate(100.2, 0.2), new Coordinate(100.8, 0.2), new Coordinate(100.8, 0.8),
      new Coordinate(100.2, 0.8), new Coordinate(100.2, 0.2)))
    val jts = gf.createPolygon(shell, Array(hole))
    for (_ <- 1 to 5000) {
      val x = 99.9 + rng.nextDouble() * 1.3
      val y = -0.1 + rng.nextDouble() * 1.3
      val expected = jts.contains(gf.createPoint(new Coordinate(x, y)))
      assert(GeomAccess.contains(poly, x, y) == expected, s"($x,$y)")
    }
  }

  test("PIP multipolygon: containment in either part") {
    val mp = packedGeom(
      """{"type":"MultiPolygon","coordinates":[
        [[[0.0,0.0],[1.0,0.0],[1.0,1.0],[0.0,1.0],[0.0,0.0]]],
        [[[10.0,10.0],[11.0,10.0],[11.0,11.0],[10.0,11.0],[10.0,10.0]]]]}""".replaceAll("\\s", ""))
    assert(GeomAccess.contains(mp, 0.5, 0.5))
    assert(GeomAccess.contains(mp, 10.5, 10.5))
    assert(!GeomAccess.contains(mp, 5.0, 5.0))
  }

  test("PIP antimeridian-crossing ring (winding-number fallback)") {
    // square straddling ±180: lng from 170 to -170 (through 180), lat 40..50
    val poly = packedGeom(
      """{"type":"Polygon","coordinates":[[[170.0,40.0],[-170.0,40.0],[-170.0,50.0],[170.0,50.0],[170.0,40.0]]]}""")
    assert(GeomAccess.contains(poly, 179.0, 45.0), "east side of the seam")
    assert(GeomAccess.contains(poly, -179.0, 45.0), "west side of the seam")
    assert(GeomAccess.contains(poly, 180.0, 45.0) || GeomAccess.contains(poly, -180.0, 45.0))
    assert(!GeomAccess.contains(poly, 0.0, 45.0), "opposite side of the world")
    assert(!GeomAccess.contains(poly, 179.0, 55.0), "north of it")
    assert(!GeomAccess.contains(poly, 160.0, 45.0), "west of it")
    assert(!GeomAccess.contains(poly, -160.0, 45.0), "east of it")
  }

  test("non-areal geometry types are never 'contains'") {
    val ls = packedGeom("""{"type":"LineString","coordinates":[[0.0,0.0],[10.0,10.0]]}""")
    assert(!GeomAccess.contains(ls, 5.0, 5.0))
    val pt = packedGeom("""{"type":"Point","coordinates":[5.0,5.0]}""")
    assert(!GeomAccess.contains(pt, 5.0, 5.0))
  }

  test("wrapped bbox: antimeridian ring splits into two boxes") {
    val poly = packedGeom(
      """{"type":"Polygon","coordinates":[[[170.0,40.0],[-170.0,40.0],[-170.0,50.0],[170.0,50.0],[170.0,40.0]]]}""")
    val boxes = GeomAccess.wrappedBoxes(poly)
    assert(boxes.length == 2)
    val west = boxes.find(_(0) == 170.0).get
    assert(west sameElements Array(170.0, 40.0, 180.0, 50.0))
    val east = boxes.find(_(0) == -180.0).get
    assert(east sameElements Array(-180.0, 40.0, -170.0, 50.0))
  }

  test("ZXY tiles: closed-form cases") {
    // (0,0) at z=1 → tile (1,1) (x: east half, y: south half)
    assert(GeoAlgo.tileXY(0.0, 0.0, 1) == ((1L, 1L)))
    assert(GeoAlgo.tileXY(-180.0, 85.05, 1) == ((0L, 0L)))
    // z=10 example: lng -168.75 is exactly tile x=32
    assert(GeoAlgo.tileXY(-168.75, 0.0, 10)._1 == 32L)
    val key = GeoAlgo.packTile(10, 32, 511)
    assert(GeoAlgo.tileZ(key) == 10 && GeoAlgo.tileX(key) == 32 && GeoAlgo.tileY(key) == 511)
  }
}
