package graft.geo

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.json._
import graft.geo.model.GeoModel._

/** Golden round-trip tests recast from the reference suite
  * (`/root/reference/test/geojson/test.ml`): for every fixture,
  * `toJson(ofJson(j))` must equal `j` as a JSON value (not string equality),
  * plus the hard-coded coordinate/property assertions.
  */
class GeoJsonCodecSpec extends AnyFunSuite {

  def fixture(name: String): String = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    require(in != null, s"missing fixture $name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  def roundTrip(name: String): GeoJson = {
    val raw    = fixture(name)
    val jv     = JValue.parseUnsafe(raw)
    val parsed = GeoJsonCodec.ofJson(jv).fold(e => fail(s"$name: $e"), identity)
    val back   = GeoJsonCodec.toJson(parsed)
    assert(JValue.eq(jv, back), s"$name round-trip mismatch:\n  in:  ${jv.render}\n  out: ${back.render}")
    // and the string form re-parses to the same value
    val reparsed = JValue.parseUnsafe(back.render)
    assert(JValue.eq(jv, reparsed), s"$name render/re-parse mismatch")
    parsed
  }

  test("point.json: coordinates and round-trip (test.ml:118-133)") {
    val g = roundTrip("point.json")
    g.body match {
      case GGeometry(Geometry(Point(p), _)) =>
        assert(Position.lng(p) == 125.6 && Position.lat(p) == 10.1)
        assert(Position.altitude(p).isEmpty)
      case other => fail(s"expected Point, got $other")
    }
  }

  test("multipoint.json round-trip (test.ml:94-116)") {
    val g = roundTrip("multipoint.json")
    g.body match {
      case GGeometry(Geometry(MultiPoint(ps), _)) => assert(ps.nonEmpty)
      case other                                  => fail(s"expected MultiPoint, got $other")
    }
  }

  test("linestring.json round-trip + minimum arity (test.ml:135-157, geojson.ml:133-139)") {
    val g = roundTrip("linestring.json")
    g.body match {
      case GGeometry(Geometry(LineString(ps), _)) => assert(ps.length >= 2)
      case other                                  => fail(s"expected LineString, got $other")
    }
    // arity check: a 1-point linestring is rejected with the reference message
    val bad = GeoJsonCodec.parse("""{"type":"LineString","coordinates":[[1.0,2.0]]}""")
    assert(bad == Left("LineStrings should have two or more points"))
  }

  test("multilinestring.json (antimeridian) round-trip (test.ml:65-92)") {
    val g = roundTrip("multilinestring.json")
    g.body match {
      case GGeometry(Geometry(MultiLineString(ls), _)) =>
        assert(ls.length == 2)
        assert(Position.lng(ls(0)(1)) == 180.0 && Position.lng(ls(1)(0)) == -180.0)
      case other => fail(s"expected MultiLineString, got $other")
    }
  }

  test("polygon.json round-trip, exterior ring access (test.ml:159-190)") {
    val g = roundTrip("polygon.json")
    g.body match {
      case GGeometry(Geometry(Polygon(rings), _)) =>
        assert(rings.length == 1)
        assert(Position.equal(rings(0).head, rings(0).last)) // closed
      case other => fail(s"expected Polygon, got $other")
    }
  }

  test("multi_polygon.json round-trip incl. hole (test.ml:192-245)") {
    val g = roundTrip("multi_polygon.json")
    g.body match {
      case GGeometry(Geometry(MultiPolygon(ps), _)) =>
        assert(ps.length == 2)
        assert(ps(1).length == 2) // exterior + 1 interior ring
      case other => fail(s"expected MultiPolygon, got $other")
    }
  }

  test("geo_with_bbox.json: bbox preserved (test.ml:350-365)") {
    val g = roundTrip("geo_with_bbox.json")
    assert(g.bbox.map(_.toSeq) == Some(Seq(100.0, 0.0, 101.0, 1.0)))
  }

  test("feature.json: properties + foreign member preserved (test.ml:247-288)") {
    val g = roundTrip("feature.json")
    g.body match {
      case GFeature(f) =>
        assert(f.properties.contains(JObj(Vector("name" -> JStr("Dinagat Islands")))))
        assert(f.foreignMembers == Vector("title" -> JStr("Some Islands")))
        f.geometry.map(_.shape) match {
          case Some(MultiPoint(ps)) => assert(ps.length == 2)
          case other                => fail(s"expected MultiPoint geometry, got $other")
        }
      case other => fail(s"expected Feature, got $other")
    }
  }

  test("featurecollection.json: features + properties (test.ml:290-348)") {
    val g = roundTrip("featurecollection.json")
    g.body match {
      case GCollection(fc) =>
        assert(fc.features.length == 2)
        val p1 = JValue.parseUnsafe(fixture("prop1.json"))
        val p2 = JValue.parseUnsafe(fixture("prop2.json"))
        assert(JValue.eq(fc.features(0).properties.get, p1))
        assert(JValue.eq(fc.features(1).properties.get, p2))
      case other => fail(s"expected FeatureCollection, got $other")
    }
  }

  test("3d_featurecollection.json: altitude (test.ml:367-433)") {
    val g = roundTrip("3d_featurecollection.json")
    g.body match {
      case GCollection(fc) =>
        val ps = fc.features(0).geometry.get.shape.asInstanceOf[MultiPoint].ps
        assert(ps.forall(_.length == 3))
        assert(Position.altitude(ps(0)).isDefined)
      case other => fail(s"expected FeatureCollection, got $other")
    }
  }

  test("simple.geojson (18,699-byte real-world FC) round-trips") {
    val g = roundTrip("simple.geojson")
    g.body match {
      case GCollection(fc) =>
        assert(fc.features.length == 1)
        val poly = fc.features(0).geometry.get.shape.asInstanceOf[Polygon]
        assert(poly.rings(0).length == 987)
        assert(JValue.eq(fc.features(0).properties.get,
          JObj(Vector("code" -> JStr("09001"), "nom" -> JStr("Foix")))))
      case other => fail(s"expected FeatureCollection, got $other")
    }
  }

  test("error messages match the reference") {
    assert(GeoJsonCodec.parse("{}") ==
      Left("A Geojson text should contain one object with a member `type`."))
    assert(GeoJsonCodec.parse("""{"type":"Wibble","coordinates":[]}""") ==
      Left("Unknown type of geometry Wibble"))
    assert(GeoJsonCodec.parse("""{"type":"GeometryCollection"}""") ==
      Left("A geometry collection should have a member called geometries"))
    assert(GeoJsonCodec.featureOfJson(JValue.parseUnsafe("""{"type":"Point"}""")) ==
      Left("A Geojson feature requires the type `Feature`. Found type, but it was Point"))
    assert(GeoJsonCodec.parse("""{"type":"Feature","id":[1]}""") ==
      Left("Identifier is not a string or number"))
  }

  test("bbox parse failure is silent (geojson.ml:480-483)") {
    val g = GeoJsonCodec.parse("""{"type":"Point","coordinates":[1.0,2.0],"bbox":"junk"}""")
    assert(g.isRight && g.toOption.get.bbox.isEmpty)
  }

  test("numbers are doubles; %.16g formatting matches C printf") {
    assert(JValue.formatG16(45.0) == "45")
    assert(JValue.formatG16(125.6) == "125.6")
    assert(JValue.formatG16(0.0) == "0")
    assert(JValue.formatG16(-0.5) == "-0.5")
    assert(JValue.formatG16(1e20) == "1e+20")
    assert(JValue.formatG16(1.0 / 3.0) == "0.3333333333333333")
  }

  test("formatG16 matches C %.16g on pinned goldens (incl. subnormals, powers of ten)") {
    // (raw double bits, C printf "%.16g" output) — generated with glibc
    // printf semantics (round the EXACT binary expansion to 16 significant
    // digits, ties-to-even, strip trailing zeros). Java's String.format
    // diverges on many of these (it rounds the shortest repr instead), which
    // is why these are pinned as bits→bytes goldens.
    val goldens: Seq[(Long, String)] = Seq(
      (0L, "0"),
      (-9223372036854775808L, "-0"),
      (1L, "4.940656458412465e-324"),
      (-9223372036854775807L, "-4.940656458412465e-324"),
      (3L, "1.48219693752374e-323"),
      (4950912855330343670L, "9.999999999999999e+22"), // the 1e23 double
      (-4272459181524432138L, "-9.999999999999999e+22"),
      (2024022533073106L, "9.999999999999999e-309"),   // the 1e-308 double
      (4503599627370496L, "2.225073858507201e-308"),   // MIN_NORMAL
      (4846369599423283200L, "1e+16"),
      (4591870180066957722L, "0.1"),
      (4599075939470750515L, "0.3"),
      (6103021453049119613L, "1e+100"),
      (-6112511492357225168L, "-1e-100"),
      (4638387860618067575L, "123.456"),
      (4708598829584429875L, "6371008.8"),
      (4599676419421066581L, "0.3333333333333333"),
      (4936209963552724370L, "1e+22"),
      (4277919505920253670L, "1e-22"),
      (4859383997932765184L, "7.205759403792794e+16"), // 2^56
      (2053695854357871005L, "2.095121832385084e-171"),
      (-4767551708636701999L, "-8.095896314512539e-11"),
      (4517457392071889495L, "1.027147186531985e-06"),
      (2574020394472462046L, "1.330540658375276e-136"),
      (1890702223848595625L, "2.74162775016167e-182"),
      (-4783835782282728083L, "-6.457680489997276e-12"),
      (-8386507121505214128L, "-9.936982866895821e-253"),
      (-4449218834499770593L, "-147741606739.8056"),
      (-4362763256166880669L, "-9.165411812000722e+16"),
      (4879548657232103939L, "1.70338826681018e+18"),
      (78313164820976L, "3.86918443551475e-310"),
      (744515597706649L, "3.678395796198172e-309"),
      (183130382509121L, "9.047843070752339e-310"),
      (400000484126216L, "1.976264975266302e-309"))
    goldens.foreach { case (bits, expected) =>
      val d = java.lang.Double.longBitsToDouble(bits)
      assert(JValue.formatG16(d) == expected, s"mismatch for $d (bits=$bits)")
    }
    // C printf non-finite spellings (programmatic models only; must not throw)
    assert(JValue.formatG16(Double.NaN) == "nan")
    assert(JValue.formatG16(Double.PositiveInfinity) == "inf")
    assert(JValue.formatG16(Double.NegativeInfinity) == "-inf")
  }

  test("formatG16 fast path agrees with exact-expansion rounding (differential)") {
    val rng = new scala.util.Random(11)
    // independent reimplementation of C %.16g: exact binary expansion via
    // BigDecimal, HALF_EVEN to 16 significant digits, %g notation rules
    def exact(d: Double): String = {
      val neg = java.lang.Double.doubleToRawLongBits(d) < 0
      if (d == 0.0) return if (neg) "-0" else "0"
      val bd = new java.math.BigDecimal(Math.abs(d))
        .round(new java.math.MathContext(16, java.math.RoundingMode.HALF_EVEN))
      var digits = bd.unscaledValue.toString
      val e = digits.length - 1 - bd.scale
      digits = digits.reverse.dropWhile(_ == '0').reverse
      if (digits.isEmpty) digits = "0"
      val mant = if (digits.length == 1) digits else digits.head + "." + digits.tail
      val s =
        if (e < -4 || e >= 16) mant + "e" + (if (e < 0) "-" else "+") + f"${Math.abs(e)}%02d"
        else if (e >= 0) {
          if (digits.length <= e + 1) digits + "0" * (e + 1 - digits.length)
          else digits.substring(0, e + 1) + "." + digits.substring(e + 1)
        } else "0." + "0" * (-e - 1) + digits
      if (neg) "-" + s else s
    }
    val samples = Seq(0.0, -0.0, 0.07, 125.6, 1e20, -1e-7, 33.87, 1.0 / 3.0,
      6371008.8, 1e16, 9.999999999999999e15, 123456.789, 1e-4, 9.99e-5) ++
      (1 to 20000).map(_ => (rng.nextInt(36000001) - 18000000) / 100000.0) ++
      (1 to 5000).map(_ => rng.nextDouble() * math.pow(10, rng.nextInt(30) - 15)) ++
      (1 to 3000).map(_ => java.lang.Double.longBitsToDouble(rng.nextLong())) ++
      (1 to 1000).map(_ => java.lang.Double.longBitsToDouble(rng.nextLong() >>> 14)) // subnormal-ish
    samples.filterNot(d => d.isNaN || d.isInfinite).foreach { d =>
      assert(JValue.formatG16(d) == exact(d), s"mismatch for $d (bits=${java.lang.Double.doubleToLongBits(d)})")
    }
  }

  test("pretty printer: 2-space indent with the reference encoder's layout") {
    // jsone.ml:751-767 (w_indent = nest*2), 839-900: one member/value per
    // line, `"name": ` separator, closers at the outer indent, `{}`/`[]`
    // stay inline (last_start short-circuit)
    val src = """{"type":"Feature","properties":{},"geometry":{"type":"Point","coordinates":[1.5,42.75]}}"""
    val g   = GeoJsonCodec.parse(src).toOption.get
    val expected =
      """{
        |  "type": "Feature",
        |  "geometry": {
        |    "type": "Point",
        |    "coordinates": [
        |      1.5,
        |      42.75
        |    ]
        |  },
        |  "properties": {}
        |}""".stripMargin
    assert(GeoJsonCodec.renderPretty(g) == expected)
    // pretty output re-parses to the same value
    assert(JValue.eq(
      GeoJsonCodec.toJson(GeoJsonCodec.parse(GeoJsonCodec.renderPretty(g)).toOption.get),
      GeoJsonCodec.toJson(g)))
  }

  test("id can be string or number and round-trips") {
    val s = GeoJsonCodec.parse("""{"type":"Feature","id":"abc"}""").toOption.get
    assert(s.body.asInstanceOf[GFeature].f.id.contains(StringId("abc")))
    val n = GeoJsonCodec.parse("""{"type":"Feature","id":7}""").toOption.get
    assert(n.body.asInstanceOf[GFeature].f.id.contains(NumId(7.0)))
    assert(GeoJsonCodec.render(n).contains("\"id\":7"))
  }

  test("GeometryCollection round-trips (incl. nesting)") {
    val src =
      """{"type":"GeometryCollection","geometries":[
        |{"type":"Point","coordinates":[1.5,2.5]},
        |{"type":"GeometryCollection","geometries":[{"type":"Point","coordinates":[3.0,4.0]}]}]}"""
        .stripMargin.replace("\n", "")
    val jv = JValue.parseUnsafe(src)
    val g  = GeoJsonCodec.ofJson(jv).toOption.get
    assert(JValue.eq(GeoJsonCodec.toJson(g), jv))
  }
}
