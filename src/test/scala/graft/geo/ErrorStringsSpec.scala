package graft.geo

import org.scalatest.funsuite.AnyFunSuite

import graft.geo.json.{GeoJsonCodec, JValue}

/** Byte-equality pins for EVERY reference error string (CLAUDE.md invariant:
  * "error messages are verbatim reference strings — tests pin them").
  *
  * Sources (all `/root/reference`):
  *  - geojson.ml:70-83   parse_by_type — note the missing-`type` message is
  *    `"JSON should" ^ "have …"` with NO space, and the missing-
  *    `coordinates` message has NO type suffix;
  *  - geojson.ml:133-139 LineString arity;
  *  - geojson.ml:274-286 GeometryCollection + unknown type + missing type;
  *  - geojson.ml:335-343 id_of_json;
  *  - geojson.ml:370-390 Feature type errors;
  *  - geojson.ml:435-455 FeatureCollection errors;
  *  - ezjsone.ml:196-229 get_string/get_float/get_list backend messages
  *    (surfaced verbatim through geojsone.ml:44-49 catch_err).
  */
class ErrorStringsSpec extends AnyFunSuite {

  private def err(text: String): String =
    GeoJsonCodec.parse(text).swap.getOrElse(fail(s"expected parse error for $text"))

  test("top-level missing / non-object type (geojson.ml:283-286,509)") {
    assert(err("""{"notype":1}""") ==
      "A Geojson text should contain one object with a member `type`.")
    assert(err("""[1,2]""") ==
      "A Geojson text should contain one object with a member `type`.")
    assert(err(""""point"""") ==
      "A Geojson text should contain one object with a member `type`.")
  }

  test("non-string type → backend get_string (ezjsone.ml:196-198)") {
    assert(err("""{"type":42}""") == "Ezjsone.get_string")
    assert(err("""{"type":["Feature"]}""") == "Ezjsone.get_string")
  }

  test("missing coordinates — suffix-less (geojson.ml:78)") {
    assert(err("""{"type":"Point"}""") ==
      "JSON should have a key-value for `coordinates'")
    assert(err("""{"type":"MultiPolygon"}""") ==
      "JSON should have a key-value for `coordinates'")
  }

  test("missing type in parse_by_type — the shouldhave quirk (geojson.ml:74-76)") {
    // reachable only via the direct per-type parse (the public per-module
    // base_of_json of the reference): the object has no `type` at all
    val j = JValue.parseUnsafe("""{"coordinates":[1,2]}""")
    assert(GeoJsonCodec.geometryOfJsonAs(j, "Point") ==
      Left("JSON shouldhave a key-value for `type' whilst parsing Point"))
  }

  test("type re-check mismatch (geojson.ml:80-83)") {
    val j = JValue.parseUnsafe("""{"type":"Polygon","coordinates":[1.0,2.0]}""")
    assert(GeoJsonCodec.geometryOfJsonAs(j, "Point") ==
      Left("Expected type of `Point' but got Polygon"))
  }

  test("LineString arity (geojson.ml:138) — and Polygon rings exempt (geojson.ml:192-199)") {
    assert(err("""{"type":"LineString","coordinates":[[1.0,2.0]]}""") ==
      "LineStrings should have two or more points")
    // MultiLineString reuses LineString.parse_coords → same check
    assert(err("""{"type":"MultiLineString","coordinates":[[[1.0,2.0]]]}""") ==
      "LineStrings should have two or more points")
    // Polygon.parse_coords parses raw nested float arrays with NO arity
    // check — a 1-position "ring" is accepted, as in the reference
    assert(GeoJsonCodec.parse("""{"type":"Polygon","coordinates":[[[1.0,2.0]]]}""").isRight)
    assert(GeoJsonCodec.parse("""{"type":"MultiPolygon","coordinates":[[[[1.0,2.0]]]]}""").isRight)
  }

  test("GeometryCollection member errors (geojson.ml:274-281)") {
    assert(err("""{"type":"GeometryCollection"}""") ==
      "A geometry collection should have a member called geometries")
    assert(err("""{"type":"GeometryCollection","geometries":42}""") ==
      "Ezjsone.get_list")
    assert(err("""{"type":"Wibble","coordinates":[]}""") ==
      "Unknown type of geometry Wibble")
  }

  test("coordinate leaf errors → backend messages (ezjsone.ml:220-229)") {
    assert(err("""{"type":"Point","coordinates":42}""") == "Ezjsone.get_list")
    assert(err("""{"type":"Point","coordinates":[1.0,"x"]}""") == "Ezjsone.get_float")
    assert(err("""{"type":"MultiPoint","coordinates":[42]}""") == "Ezjsone.get_list")
    assert(err("""{"type":"Polygon","coordinates":[42]}""") == "Ezjsone.get_list")
  }

  test("feature errors (geojson.ml:342,376-385)") {
    val notFeature = JValue.parseUnsafe("""{"type":"Egg"}""")
    assert(GeoJsonCodec.featureOfJson(notFeature) ==
      Left("A Geojson feature requires the type `Feature`. Found type, but it was Egg"))
    assert(GeoJsonCodec.featureOfJson(JValue.parseUnsafe("""{"x":1}""")) ==
      Left("A Geojson feature requires the type `Feature`. No type was found."))
    assert(err("""{"type":"Feature","id":true}""") ==
      "Identifier is not a string or number")
  }

  test("feature collection errors (geojson.ml:439-455)") {
    val notFc = JValue.parseUnsafe("""{"type":"Egg"}""")
    assert(GeoJsonCodec.collectionOfJson(notFc) ==
      Left("A Geojson feature collection requires the type `FeatureCollection`. Found type, but it was Egg"))
    assert(GeoJsonCodec.collectionOfJson(JValue.parseUnsafe("""{"x":1}""")) ==
      Left("A Geojson feature collection requires the type `FeatureCollection`. No type was found."))
    assert(err("""{"type":"FeatureCollection"}""") ==
      "A feature collection should have a member called `features`.")
    assert(err("""{"type":"FeatureCollection","features":42}""") ==
      "Ezjsone.get_list")
  }
}
