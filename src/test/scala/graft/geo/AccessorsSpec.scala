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

  test("ring lens is null-in-null-out: a null geometry yields null, not an empty array") {
    // the descending-sequence guard must not turn a null offset into a
    // bogus EMPTY array — a null geometry keeps lens semantics: null in,
    // null out
    val df = Seq(Some(fixture("polygon.json")), None).toDF("raw")
      .select(from_geojson_geom($"raw").as("g"))
    val rows = df.select(ringAt($"g", 0).as("r0")).collect()
    assert(rows(0).getSeq[Any](0).nonEmpty)   // real ring on the real geometry
    assert(rows(1).isNullAt(0), "null geometry must propagate null")
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

  test("deep setters: set-get identity over the whole geometry corpus") {
    // Optional.set (get x) == x, for every position index of every fixture
    // geometry (2-D and 3-D) — byte-compared through to_geojson_geom
    val names = Seq("point.json", "linestring.json", "multipoint.json",
      "multilinestring.json", "polygon.json", "multi_polygon.json", "geo_with_bbox.json")
    for (n <- names) {
      val df = Seq(fixture(n)).toDF("raw").select(from_geojson_geom($"raw").as("g"))
      val nPos = df.select(numPositions($"g")).collect()(0).getInt(0)
      for (i <- 0 until nPos) {
        val r = df.select(to_geojson_geom($"g").as("orig"),
          to_geojson_geom(setPositionAt($"g", i, positionAt($"g", i))).as("back")).collect()(0)
        assert(r.getString(0) == r.getString(1), s"$n pos $i")
      }
      val nR = df.select(numRings($"g")).collect()(0).getInt(0)
      for (r0 <- 0 until nR) {
        val r = df.select(to_geojson_geom($"g").as("orig"),
          to_geojson_geom(setRingAt($"g", r0, ringAt($"g", r0))).as("back")).collect()(0)
        assert(r.getString(0) == r.getString(1), s"$n ring $r0")
      }
    }
  }

  test("part lenses: numParts and partAt decompose a MultiPolygon") {
    val df = Seq(fixture("multi_polygon.json")).toDF("raw")
      .select(geometry(from_geojson($"raw")).as("g"))
    val r = df.select(numParts($"g"), partAt($"g", 0), partAt($"g", 1),
      ringAt($"g", 0), ringAt($"g", 1), ringAt($"g", 2)).collect()(0)
    assert(r.getInt(0) == 2)
    val p0 = r.getSeq[scala.collection.Seq[scala.collection.Seq[Double]]](1)
    val p1 = r.getSeq[scala.collection.Seq[scala.collection.Seq[Double]]](2)
    // part 0 = its single exterior ring; part 1 = exterior + hole
    assert(p0.length == 1 && p1.length == 2)
    assert(p0(0) == r.getSeq(3))
    assert(p1(0) == r.getSeq(4) && p1(1) == r.getSeq(5))
    // a single geometry has one part equal to all of its rings
    val pt = Seq(fixture("polygon.json")).toDF("raw")
      .select(geometry(from_geojson($"raw")).as("g"))
      .select(numParts($"g"), partAt($"g", 0), exteriorRing($"g")).collect()(0)
    assert(pt.getInt(0) == 1)
    assert(pt.getSeq[scala.collection.Seq[scala.collection.Seq[Double]]](1).head == pt.getSeq(2))
  }

  test("part lenses: degenerate empty part yields an empty array, not a bogus range") {
    // equal consecutive part_offsets: Spark's sequence() DESCENDS when
    // start > stop, so without the guard partAt returned a 2-element
    // reversed ring list for an empty part
    val df = Seq("""{"type":"MultiPolygon","coordinates":[[],[[[102.0,2.0],[103.0,2.0],[103.0,3.0],[102.0,2.0]]]]}""")
      .toDF("raw").select(from_geojson_geom($"raw").as("g"))
    val r = df.select(numParts($"g"), partAt($"g", 0), partAt($"g", 1)).collect()(0)
    assert(r.getInt(0) == 2)
    assert(r.getSeq[Any](1).isEmpty, "empty part must be an empty ring list")
    assert(r.getSeq[Any](2).length == 1)
  }

  test("st_parts (ST_Dump): Multi* decompose into members that re-render exactly") {
    import graft.geo.sql.GeoFunctions.{st_parts, to_geojson_geom}
    def partsOf(name: String): Seq[String] =
      Seq(fixture(name)).toDF("raw")
        .select(posexplode(st_parts(from_geojson_geom($"raw"))))
        .select(to_geojson_geom($"col"))
        .as[String].collect().toSeq
    // MultiPolygon fixture: two polygons, the second keeps its hole
    val mp = partsOf("multi_polygon.json")
    assert(mp.length == 2)
    assert(mp.forall(_.startsWith("""{"type":"Polygon"""")))
    assert(mp(1).count(_ == '[') > mp(0).count(_ == '['), "part 1 carries the hole rings")
    // MultiLineString -> LineStrings; MultiPoint -> Points
    val mls = partsOf("multilinestring.json")
    assert(mls.nonEmpty && mls.forall(_.startsWith("""{"type":"LineString"""")))
    val mpt = partsOf("multipoint.json")
    assert(mpt.nonEmpty && mpt.forall(_.startsWith("""{"type":"Point"""")))
    // single geometry -> [self], byte-identical through the round trip
    val single = partsOf("point.json")
    val self = Seq(fixture("point.json")).toDF("raw")
      .select(to_geojson_geom(from_geojson_geom($"raw"))).as[String].head()
    assert(single == Seq(self))
    // parts concatenated re-assemble the original member count
    val counts = Seq(fixture("multi_polygon.json")).toDF("raw")
      .select(size(st_parts(from_geojson_geom($"raw"))), numParts(from_geojson_geom($"raw")))
      .as[(Int, Int)].head()
    assert(counts._1 == counts._2)
  }

  test("deep setters: set-get identity over 100 generated random geometries") {
    // the generator rotates Point/LineString/Polygon/MultiPoint/MultiPolygon
    // (ids with kind % 7 in 0..4 are bare geometries)
    val geomIds = (0L until 140L).filter(id => id % 7 <= 4)
    val texts = geomIds.map(id =>
      graft.geo.json.GeoJsonCodec.render(graft.geo.gen.GeoGen.docFor(id, 3L)))
    val df = texts.toDF("raw").select(from_geojson_geom($"raw").as("g"))
      .withColumn("orig", to_geojson_geom($"g"))
    // every geometry: position 0 and last position set to themselves == id;
    // same for ring 0 and last ring
    val checked = df.select($"orig",
      to_geojson_geom(setPositionAt($"g", 0, positionAt($"g", 0))).as("p0"),
      numPositions($"g").as("np"), numRings($"g").as("nr")).collect()
    checked.foreach { r => assert(r.getString(0) == r.getString(1), "pos 0 id") }
    // last-index laws need per-row n: group rows by (np, nr) and apply
    checked.map(r => (r.getInt(2), r.getInt(3))).distinct.foreach { case (np, nr) =>
      val sub = df.where(numPositions($"g") === np && numRings($"g") === nr)
      val rows = sub.select($"orig",
        to_geojson_geom(setPositionAt($"g", np - 1, positionAt($"g", np - 1))).as("pl"),
        to_geojson_geom(setRingAt($"g", nr - 1, ringAt($"g", nr - 1))).as("rl")).collect()
      rows.foreach { r =>
        assert(r.getString(0) == r.getString(1), s"last pos id (np=$np)")
        assert(r.getString(0) == r.getString(2), s"last ring id (nr=$nr)")
      }
    }
  }

  test("deep setters: position update hits only its target, handles 2D->3D") {
    val df = Seq(fixture("polygon.json")).toDF("raw")
      .select(from_geojson_geom($"raw").as("g"))
    val updated = df.select(
      setPositionAt($"g", 2, typedLit(Seq(7.5, 8.5))).as("u"),
      setPositionAt($"g", 1, typedLit(Seq(1.0, 2.0, 3.0))).as("u3"))
    val r = updated.select(
      positionAt($"u", 2), positionAt($"u", 0), numPositions($"u"),
      positionAt($"u3", 1), positionAt($"u3", 2), numPositions($"u3")).collect()(0)
    assert(r.getSeq[Double](0).toSeq == Seq(7.5, 8.5))
    assert(r.getSeq[Double](1).toSeq ==
      df.select(positionAt($"g", 0)).collect()(0).getSeq[Double](0).toSeq)
    // dimension change: position 1 becomes 3-D, neighbors keep their values
    assert(r.getSeq[Double](3).toSeq == Seq(1.0, 2.0, 3.0))
    assert(r.getSeq[Double](4).toSeq ==
      df.select(positionAt($"g", 2)).collect()(0).getSeq[Double](0).toSeq)
    assert(r.getInt(2) == r.getInt(5))
    // out of range: identity (Optional.set on a missing focus)
    val id = df.select(to_geojson_geom($"g").as("a"),
      to_geojson_geom(setPositionAt($"g", 99, typedLit(Seq(0.0, 0.0)))).as("b")).collect()(0)
    assert(id.getString(0) == id.getString(1))
  }

  test("deep setters: ring replacement with different position count") {
    val df = Seq(fixture("multi_polygon.json")).toDF("raw")
      .select(from_geojson_geom($"raw").as("g"))
    val newRing = typedLit(Seq(Seq(0.0, 0.0), Seq(4.0, 0.0), Seq(4.0, 4.0), Seq(0.0, 0.0)))
    val u = df.select($"g", setRingAt($"g", 1, newRing).as("u"))
    val r = u.select(
      ringAt($"u", 1), numRings($"u"), numPositions($"g"), numPositions($"u"),
      ringAt($"u", 0), ringAt($"u", 2), ringAt($"g", 0), ringAt($"g", 2)).collect()(0)
    assert(r.getSeq[scala.collection.Seq[Double]](0).map(_.toSeq).toSeq
      == Seq(Seq(0.0, 0.0), Seq(4.0, 0.0), Seq(4.0, 4.0), Seq(0.0, 0.0)))
    assert(r.getInt(1) == 3)                  // ring count unchanged
    assert(r.getInt(3) == r.getInt(2) - 1)    // 5-position ring became 4
    // neighbors untouched
    assert(r.getSeq[scala.collection.Seq[Double]](4).map(_.toSeq) ==
      r.getSeq[scala.collection.Seq[Double]](6).map(_.toSeq))
    assert(r.getSeq[scala.collection.Seq[Double]](5).map(_.toSeq) ==
      r.getSeq[scala.collection.Seq[Double]](7).map(_.toSeq))
    // serialized form still parses (offsets stayed consistent)
    val txt = u.select(to_geojson_geom($"u")).as[String].collect()(0)
    assert(Seq(txt).toDF("t").select(from_geojson_geom($"t").isNotNull).collect()(0).getBoolean(0))
  }

  test("prism-guarded set: applies on constructor match, identity otherwise") {
    import graft.geo.model.GeoModel.GType
    val df = Seq(fixture("point.json"), fixture("polygon.json")).toDF("raw")
      .select($"raw", from_geojson_geom($"raw").as("g"))
    val out = df.select(
      st_geometry_type($"g").as("t"),
      to_geojson_geom($"g").as("orig"),
      to_geojson_geom(prismSet($"g", GType.Point,
        setPositionAt(_, 0, typedLit(Seq(0.5, 0.5))))).as("set")).collect()
    out.foreach { r =>
      if (r.getString(0) == "Point")
        assert(r.getString(2) == """{"type":"Point","coordinates":[0.5,0.5]}""")
      else assert(r.getString(2) == r.getString(1)) // Prism.set: no-op on mismatch
    }
  }

  test("geometry_exn raises on a geometry-less feature, projects otherwise") {
    val withG = """{"type":"Feature","geometry":{"type":"Point","coordinates":[1.0,2.0]}}"""
    val noG   = """{"type":"Feature","properties":{"n":1}}"""
    val ok = Seq(withG).toDF("raw")
      .select(featureGeometryExn(feature(from_geojson($"raw"))).getField("gtype"))
      .collect()(0)
    assert(!ok.isNullAt(0))
    val ex = intercept[Exception] {
      Seq(noG).toDF("raw")
        .select(featureGeometryExn(feature(from_geojson($"raw"))).getField("gtype"))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("feature has no geometry")), messages(ex).toString)
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
