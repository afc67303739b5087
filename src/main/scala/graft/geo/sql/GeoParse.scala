package graft.geo.sql

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData

import graft.geo.model.GeoModel.GType

/** Single-pass Jackson → packed-geometry-row parser for the join hot path.
  *
  * `from_geojson_geom` is the top per-row kernel of every spatial join at
  * scale; the general path (Jackson → JValue tree → model ADT → packed row)
  * allocates three intermediate representations. This parser streams tokens
  * straight into the flat coords/offset arrays of [[GeoStruct.geometryType]].
  *
  * It handles exactly the PLAIN shape — `{"type": <basic type>,
  * "coordinates": <numbers nested to the type's depth>}` in that key order,
  * nothing else — and returns [[GeoParse.Fallback]] for everything it does
  * not recognize (other key orders, bbox, foreign members,
  * GeometryCollection, arity violations, malformed input), which the caller
  * routes through the general [[graft.geo.json.GeoJsonCodec]] path. The
  * fast path therefore cannot change semantics: it only accepts documents
  * both paths parse identically (byte-equality asserted differentially in
  * GeoParseSpec).
  */
object GeoParse {

  /** Sentinel: not recognized by the fast path — use the general codec. */
  val Fallback: AnyRef = new Object

  private val factory = new JsonFactory()

  /** Array nesting depth of "coordinates" per geometry type. */
  private def depthOf(typ: String): Int = typ match {
    case "Point"           => 1
    case "MultiPoint"      => 2
    case "LineString"      => 2
    case "MultiLineString" => 3
    case "Polygon"         => 3
    case "MultiPolygon"    => 4
    case _                 => -1
  }

  def parseGeometryFast(text: String): AnyRef = {
    try {
      val p = factory.createParser(text)
      try {
        if (p.nextToken() != JsonToken.START_OBJECT) return Fallback
        if (p.nextToken() != JsonToken.FIELD_NAME || p.currentName() != "type") return Fallback
        if (p.nextToken() != JsonToken.VALUE_STRING) return Fallback
        val typ = p.getText
        val n   = depthOf(typ)
        if (n < 0) return Fallback
        if (p.nextToken() != JsonToken.FIELD_NAME || p.currentName() != "coordinates") return Fallback

        var coords  = new Array[Double](16); var ci = 0
        var posOff  = new Array[Int](8);     var pi = 0
        var ringOff = new Array[Int](4);     var ri = 0
        var partOff = new Array[Int](2);     var fi = 0
        @inline def growD(): Unit = { coords = java.util.Arrays.copyOf(coords, coords.length * 2) }
        @inline def pushPos(): Unit = {
          if (pi == posOff.length) posOff = java.util.Arrays.copyOf(posOff, pi * 2)
          posOff(pi) = ci; pi += 1
        }
        @inline def pushRing(): Unit = {
          if (ri == ringOff.length) ringOff = java.util.Arrays.copyOf(ringOff, ri * 2)
          ringOff(ri) = pi; ri += 1
        }
        @inline def pushPart(): Unit = {
          if (fi == partOff.length) partOff = java.util.Arrays.copyOf(partOff, fi * 2)
          partOff(fi) = ri; fi += 1
        }
        // implicit outer containers for the shallow types (pack layout is
        // always parts -> rings -> positions, like GeoStruct.packGeometry)
        if (n <= 3) pushPart()
        if (n <= 2) pushRing()
        if (n == 1) pushPos()

        val checkLine = typ == "LineString" || typ == "MultiLineString"
        var depth = 0
        var done  = false
        while (!done) {
          p.nextToken() match {
            case JsonToken.START_ARRAY =>
              depth += 1
              if (depth > n) return Fallback
              // entering a container at its level
              if (n >= 4 && depth == n - 2) pushPart()
              if (n >= 3 && depth == n - 1) pushRing()
              if (n >= 2 && depth == n) pushPos()
            case JsonToken.END_ARRAY =>
              if (depth == n - 1 && checkLine) {
                // a line just closed: the reference's >= 2 positions check
                // (geojson.ml:133-139) — violations go to the slow path for
                // the exact error (-> null in PERMISSIVE mode)
                if (pi - ringOff(ri - 1) < 2) return Fallback
              }
              depth -= 1
              if (depth == 0) done = true
            case t if t == JsonToken.VALUE_NUMBER_INT || t == JsonToken.VALUE_NUMBER_FLOAT =>
              if (depth != n) return Fallback
              if (ci == coords.length) growD()
              coords(ci) = p.getDoubleValue; ci += 1
            case _ => return Fallback // strings/null/objects inside, or missing array
          }
        }
        if (p.nextToken() != JsonToken.END_OBJECT) return Fallback // bbox/fm -> slow
        if (p.nextToken() != null) return Fallback                 // trailing content

        // close the offset arrays (final sentinel entries)
        if (pi == posOff.length) posOff = java.util.Arrays.copyOf(posOff, pi + 1)
        posOff(pi) = ci
        if (ri == ringOff.length) ringOff = java.util.Arrays.copyOf(ringOff, ri + 1)
        ringOff(ri) = pi
        if (fi == partOff.length) partOff = java.util.Arrays.copyOf(partOff, fi + 1)
        partOff(fi) = ri

        val out = new GenericInternalRow(7)
        out.update(0, GType.ofName(typ).toByte)
        out.update(1, new GenericArrayData(java.util.Arrays.copyOf(coords, ci)))
        out.update(2, new GenericArrayData(java.util.Arrays.copyOf(posOff, pi + 1)))
        out.update(3, new GenericArrayData(java.util.Arrays.copyOf(ringOff, ri + 1)))
        out.update(4, new GenericArrayData(java.util.Arrays.copyOf(partOff, fi + 1)))
        out.update(6, new GenericArrayData(Array.empty[Any])) // no foreign members
        out
      } finally p.close()
    } catch { case _: Exception => Fallback }
  }
}
