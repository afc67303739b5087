package graft.geo

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.geo.json.{GeoJsonCodec, JValue, JObj, JStr, JNum}
import graft.geo.model.GeoModel._
import graft.geo.sql.GeoStruct

/** Property-based round-trip mirroring the reference's Random.random test
  * (/root/reference/test/geojson/test.ml:440-456, geojson.ml:625-678): build
  * structurally-valid random GeoJSON from a shape skeleton, assert
  * `ofJson(toJson(g)) == g`, and additionally that the packed Spark struct
  * is lossless (`unpack(pack(g)) == g`). Driven directly by ScalaCheck Gens
  * with fixed seeds (deterministic, no extra test deps).
  */
class RoundTripPropertySpec extends AnyFunSuite {

  // coordinate grid like the fixtures: 2-decimal values round-trip exactly
  // under the reference's %.16g float formatting (jsone.ml:818)
  val coordGen: Gen[Double] = Gen.chooseNum(-17999, 17999).map(_ / 100.0)

  val posGen: Gen[Position] = for {
    lng <- coordGen; lat <- coordGen
    alt <- Gen.option(coordGen)
  } yield alt.map(a => Position(lng, lat, a)).getOrElse(Position(lng, lat))

  def positionsGen(min: Int): Gen[Vector[Position]] =
    Gen.chooseNum(min, min + 5).flatMap(n => Gen.listOfN(n, posGen).map(_.toVector))

  // reference polygons are auto-closed: points(i-1) <- points(0)
  val ringGen: Gen[Vector[Position]] =
    positionsGen(4).map(ps => ps.init :+ ps.head)

  val shapeGen: Gen[Shape] = {
    val point   = posGen.map(Point(_))
    val mpoint  = positionsGen(1).map(MultiPoint(_))
    val lstring = positionsGen(2).map(LineString(_))
    val mls     = Gen.listOfN(2, positionsGen(2)).map(ls => MultiLineString(ls.toVector))
    val poly    = Gen.chooseNum(1, 2).flatMap(n => Gen.listOfN(n, ringGen).map(rs => Polygon(rs.toVector)))
    val mpoly   = Gen.listOfN(2, Gen.listOfN(1, ringGen).map(_.toVector)).map(ps => MultiPolygon(ps.toVector))
    val leaf    = Gen.oneOf(point, mpoint, lstring, mls, poly, mpoly)
    val coll    = Gen.listOfN(2, leaf).map(ss => GeometryCollection(ss.map(Geometry(_)).toVector))
    Gen.frequency(6 -> leaf, 1 -> coll)
  }

  val propsGen: Gen[JValue] = for {
    name <- Gen.alphaNumStr.map(_.take(8))
    n    <- coordGen
  } yield JObj(Vector("name" -> JStr(name), "x" -> JNum(n)))

  val idGen: Gen[FeatureId] = Gen.oneOf(
    Gen.alphaNumStr.map(s => StringId(s.take(6))),
    Gen.chooseNum(0, 10000).map(n => NumId(n.toDouble)))

  val featureGen: Gen[Feature] = for {
    shape <- Gen.option(shapeGen)
    props <- Gen.option(propsGen)
    id    <- Gen.option(idGen)
  } yield Feature(shape.map(Geometry(_)), props, Vector.empty, id)

  val geoJsonGen: Gen[GeoJson] = for {
    body <- Gen.oneOf(
      shapeGen.map(s => GGeometry(Geometry(s))),
      featureGen.map(GFeature(_)),
      Gen.listOfN(3, featureGen).map(fs => GCollection(FeatureCollection(fs.toVector))))
    bbox <- Gen.option(Gen.listOfN(4, coordGen).map(_.toArray))
  } yield GeoJson(body, bbox)

  def geoEq(a: GeoJson, b: GeoJson): Boolean =
    JValue.eq(GeoJsonCodec.toJson(a), GeoJsonCodec.toJson(b))

  def samples(n: Int): Seq[GeoJson] = {
    val params = Gen.Parameters.default.withSize(20)
    (1 to n).flatMap(i => geoJsonGen.apply(params, Seed(i.toLong)))
  }

  test("ofJson(toJson(g)) == g for 500 random structurally-valid documents") {
    val gs = samples(500)
    assert(gs.length >= 450)
    gs.foreach { g =>
      val rendered = GeoJsonCodec.render(g)
      val back     = GeoJsonCodec.parse(rendered)
      assert(back.isRight, s"failed to re-parse: ${back.left.getOrElse("")}\n$rendered")
      assert(geoEq(back.toOption.get, g), s"value mismatch:\n$rendered")
    }
  }

  test("unpackTop(packTop(g)) == g — the Spark struct is lossless") {
    samples(500).foreach { g =>
      val back = GeoStruct.unpackTop(GeoStruct.packTop(g))
      assert(geoEq(back, g), GeoJsonCodec.render(g))
    }
  }

  test("direct render == JValue-tree render, byte-for-byte (500 random docs)") {
    samples(500).foreach { g =>
      assert(GeoJsonCodec.render(g) == GeoJsonCodec.toJson(g).render,
        s"direct writer diverged: ${GeoJsonCodec.toJson(g).render}")
    }
  }

  test("engine Random generator (GeoGen): canonical text, byte-stable round-trip") {
    import graft.geo.gen.GeoGen
    (0L until 1000L).foreach { id =>
      val g        = GeoGen.docFor(id, seed = 42L)
      val rendered = GeoJsonCodec.render(g)
      val back     = GeoJsonCodec.parse(rendered)
      assert(back.isRight, s"id=$id failed to parse: $rendered")
      assert(geoEq(back.toOption.get, g), s"id=$id value mismatch: $rendered")
      // generated text is already canonical ⇒ serialize∘parse is identity
      assert(GeoJsonCodec.render(back.toOption.get) == rendered, s"id=$id not byte-stable")
      // skeleton rotation is id % 7 (the SQL-predictable contract of q34)
      val expected = (id % 7) match {
        case 0 => "Point"; case 1 => "LineString"; case 2 => "Polygon"
        case 3 => "MultiPoint"; case 4 => "MultiPolygon"; case 5 => "Feature"
        case _ => "FeatureCollection"
      }
      val kind = back.toOption.get.body match {
        case GGeometry(geo) => GType.name(GType.of(geo.shape))
        case GFeature(_)    => "Feature"
        case GCollection(_) => "FeatureCollection"
      }
      assert(kind == expected, s"id=$id kind $kind != $expected")
      // skeleton arities respected: closed polygon rings etc.
      back.toOption.get.body match {
        case GGeometry(Geometry(Polygon(rings), _)) =>
          assert(rings.head.length == 5 && (rings.head.head sameElements rings.head.last))
        case _ =>
      }
    }
    // model-level skeleton mirror: reference signature random ~f skeleton
    import GeoGen._
    var x = 1.0
    val g2 = random(RFC(List(RFeature(None, RMultiLineString(2, 3)))), () => { x += 0.25; x })
    val fc = g2.body.asInstanceOf[GCollection].fc
    assert(fc.features.head.geometry.get.shape.asInstanceOf[MultiLineString].lines.map(_.length) == Vector(3, 3))
  }
}
