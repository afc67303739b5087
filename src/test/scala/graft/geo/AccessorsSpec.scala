package graft.geo

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.geo.sql.Accessors._
import graft.geo.sql.GeoFunctions._

/** Optics-equivalent accessors (SURVEY.md §2.2): prisms return null on
  * non-match (Prism.get = None), lenses get/set, compositions propagate
  * nulls — checked against the reference fixtures.
  */
class AccessorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  def fixture(name: String): String = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  test("union prisms: feature/geometry/featureCollection match or null") {
    val df = Seq(fixture("point.json"), fixture("feature.json"), fixture("featurecollection.json"))
      .toDF("raw").select(from_geojson($"raw").as("t"))
    val r = df.select(
      geometry($"t").isNotNull, feature($"t").isNotNull, featureCollection($"t").isNotNull)
      .collect()
    assert(r(0).getBoolean(0) && !r(0).getBoolean(1) && !r(0).getBoolean(2))
    assert(!r(1).getBoolean(0) && r(1).getBoolean(1) && !r(1).getBoolean(2))
    assert(!r(2).getBoolean(0) && !r(2).getBoolean(1) && r(2).getBoolean(2))
  }

  test("per-constructor prisms + point position accessors") {
    val df = Seq(fixture("point.json")).toDF("raw")
      .select(geometry(from_geojson($"raw")).as("g"))
    val r = df.select(
      asPoint($"g").isNotNull, asPolygon($"g").isNotNull,
      pointLng($"g"), pointLat($"g"), pointAltitude($"g")).collect()(0)
    assert(r.getBoolean(0) && !r.getBoolean(1))
    assert(r.getDouble(2) == 125.6 && r.getDouble(3) == 10.1)
    assert(r.isNullAt(4)) // 2-D: altitude = None (geojson.ml:47)
  }

  test("polygon ring lenses: exterior ring and ring count") {
    val df = Seq(fixture("multi_polygon.json")).toDF("raw")
      .select(geometry(from_geojson($"raw")).as("g"))
    val r = df.select(numRings($"g"), numPositions($"g"), exteriorRing($"g")).collect()(0)
    assert(r.getInt(0) == 3)  // 2 exteriors + 1 hole across both parts
    assert(r.getInt(1) == 15) // 5 + 5 + 5 positions
    val ring0 = r.getSeq[scala.collection.Seq[Double]](2)
    assert(ring0.length == 5 && ring0.head.toSeq == Seq(102.0, 2.0))
  }

  test("lens set: withField updates round-trip through to_geojson") {
    val df = Seq(fixture("feature.json")).toDF("raw").select(from_geojson($"raw").as("t"))
    val updated = df.select(to_geojson(
      setProperties($"t", lit("""{"name":"Renamed"}"""))).as("out"))
      .as[String].collect()(0)
    assert(updated.contains(""""properties":{"name":"Renamed"}"""))
    assert(updated.contains(""""title":"Some Islands"""")) // fm preserved
  }

  test("feature id lens handles string and numeric ids") {
    val df = Seq(
      """{"type":"Feature","id":"abc"}""",
      """{"type":"Feature","id":42}""",
      """{"type":"Feature"}""").toDF("raw")
      .select(feature(from_geojson($"raw")).as("f"))
    val ids = df.select(featureId($"f")).collect().map(r => Option(r.getString(0)))
    assert(ids(0).contains("abc") && ids(1).contains("42.0") && ids(2).isEmpty)
  }
}
