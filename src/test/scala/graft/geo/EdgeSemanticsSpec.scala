package graft.geo

import org.scalatest.funsuite.AnyFunSuite

import graft.geo.json._
import graft.geo.model.GeoModel._

/** Pins the corner semantics — both the reference-faithful ones and the
  * DOCUMENTED divergences (SURVEY.md §8) — so a future change that silently
  * alters them fails loudly.
  */
class EdgeSemanticsSpec extends AnyFunSuite {

  test("duplicate foreign-member keys are preserved in order (assoc-list semantics)") {
    val src = """{"type":"Point","coordinates":[1.5,2.5],"a":1,"a":2}"""
    val g   = GeoJsonCodec.parse(src).toOption.get
    val fm  = g.body.asInstanceOf[GGeometry].g.foreignMembers
    assert(fm == Vector("a" -> JNum(1), "a" -> JNum(2)))
    assert(GeoJsonCodec.render(g) == """{"type":"Point","coordinates":[1.5,2.5],"a":1,"a":2}""")
  }

  test("leading BOM is a parse error (reference: initial BOM errors at the JSON layer)") {
    val r = GeoJsonCodec.parse("﻿{\"type\":\"Point\",\"coordinates\":[1.0,2.0]}")
    assert(r.isLeft)
  }

  test("a geometry member with value null is an error, not absent (geojson.ml:369-373)") {
    // the reference only treats geometry as None when the MEMBER is missing;
    // a present null flows into Geometry.base_of_json which fails on `type`
    val r = GeoJsonCodec.parse("""{"type":"Feature","geometry":null}""")
    assert(r == Left("A Geojson text should contain one object with a member `type`."))
  }

  test("properties: null is preserved as present-null, distinct from absent") {
    val withNull = GeoJsonCodec.parse("""{"type":"Feature","properties":null}""").toOption.get
    val without  = GeoJsonCodec.parse("""{"type":"Feature"}""").toOption.get
    assert(withNull.body.asInstanceOf[GFeature].f.properties.contains(JNull))
    assert(without.body.asInstanceOf[GFeature].f.properties.isEmpty)
    assert(GeoJsonCodec.render(withNull) == """{"type":"Feature","properties":null}""")
    assert(GeoJsonCodec.render(without) == """{"type":"Feature"}""")
  }

  test("nested geometry bbox is dropped on round-trip (reference keys_in_use behavior)") {
    // geometry-level keys_in_use includes "bbox" but the value is never
    // stored (geojson.ml:33-39) — the reference silently drops it; we mirror
    val src = """{"type":"Feature","geometry":{"type":"Point","coordinates":[1.0,2.0],"bbox":[1.0,2.0,1.0,2.0]}}"""
    val out = GeoJsonCodec.render(GeoJsonCodec.parse(src).toOption.get)
    assert(out == """{"type":"Feature","geometry":{"type":"Point","coordinates":[1,2]}}""")
  }

  test("top-level bbox of every kind round-trips in position (before foreign members)") {
    val src = """{"type":"Point","coordinates":[1.0,2.0],"bbox":[0.5,1.5,1.5,2.5],"note":"x"}"""
    val out = GeoJsonCodec.render(GeoJsonCodec.parse(src).toOption.get)
    assert(out == """{"type":"Point","coordinates":[1,2],"bbox":[0.5,1.5,1.5,2.5],"note":"x"}""")
  }

  test("positions of arbitrary arity parse and round-trip (reference: any float array)") {
    val src = """{"type":"Point","coordinates":[1.5,2.5,3.5,4.5,5.5]}"""
    val g   = GeoJsonCodec.parse(src).toOption.get
    val p   = g.body.asInstanceOf[GGeometry].g.shape.asInstanceOf[Point].p
    assert(p.length == 5)
    assert(GeoJsonCodec.render(g) == src)
    // and the packed struct keeps ragged positions exact
    val back = graft.geo.sql.GeoStruct.unpackGeometry(
      graft.geo.sql.GeoStruct.packGeometry(g.body.asInstanceOf[GGeometry].g))
    assert(back.shape.asInstanceOf[Point].p.toSeq == Seq(1.5, 2.5, 3.5, 4.5, 5.5))
  }

  test("string escapes: mandatory quote/backslash/newline, control chars as \\u00XX") {
    val g = GeoJson(GFeature(Feature(None, Some(JObj(Vector(
      "s" -> JStr("a\"b\\c\nd\tef")))), Vector.empty, None)), None)
    val out = GeoJsonCodec.render(g)
    val expected = "a\\\"b\\\\c\\nd" + "\\" + "u0009ef"
    assert(out.contains(expected), out)
    // re-parse restores the exact string
    val back = GeoJsonCodec.parse(out).toOption.get
    val s2 = back.body.asInstanceOf[GFeature].f.properties.get
      .asInstanceOf[JObj].get("s").get.asInstanceOf[JStr].s
    assert(s2 == "a\"b\\c\nd\tef")
  }

  test("non-object top level and bad types fail with reference messages") {
    assert(GeoJsonCodec.parse("[1,2]").isLeft)
    assert(GeoJsonCodec.parse(""""point"""").isLeft)
    // non-string `type` surfaces the vendored backend's get_string message
    // (ezjsone.ml:196-198 via geojsone.ml:44-49 catch_err)
    assert(GeoJsonCodec.parse("""{"type":42}""") == Left("Ezjsone.get_string"))
    // geojson.ml:78 — verbatim, NO " whilst parsing <type>" suffix
    assert(GeoJsonCodec.parse("""{"type":"Point"}""") ==
      Left("JSON should have a key-value for `coordinates'"))
  }

  test("deeply nested GeometryCollections round-trip (recursion escape hatch)") {
    def nest(depth: Int): String =
      if (depth == 0) """{"type":"Point","coordinates":[1.5,2.5]}"""
      else s"""{"type":"GeometryCollection","geometries":[${nest(depth - 1)}]}"""
    val src = nest(12)
    val g   = GeoJsonCodec.parse(src).toOption.get
    assert(GeoJsonCodec.render(g) == src)
    // and through the packed struct (children-as-text escape hatch)
    val back = graft.geo.sql.GeoStruct.unpackTop(graft.geo.sql.GeoStruct.packTop(g))
    assert(GeoJsonCodec.render(back) == src)
  }
}
