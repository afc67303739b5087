package graft.geo

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.InternalRow

import graft.geo.json.{GeoJsonCodec, JValue}
import graft.geo.sql.{GeoParse, GeoStruct}

/** Differential proof that the single-pass fast parser either produces a
  * packed row BYTE-IDENTICAL (via re-render) to the general codec path, or
  * falls back — never a third behavior. */
class GeoParseSpec extends AnyFunSuite {

  private def slowRow(text: String): Option[InternalRow] =
    JValue.parse(text).flatMap(GeoJsonCodec.geometryOfJson)
      .toOption.map(GeoStruct.packGeometry)

  private def renderRow(r: InternalRow): String =
    GeoJsonCodec.geometryToJson(GeoStruct.unpackGeometry(r)).render

  private def check(text: String): Unit = {
    val fast = GeoParse.parseGeometryFast(text)
    val slow = slowRow(text)
    if (fast ne GeoParse.Fallback) {
      assert(slow.isDefined, s"fast accepted what slow rejects: $text")
      assert(renderRow(fast.asInstanceOf[InternalRow]) == renderRow(slow.get),
        s"fast/slow row mismatch for: $text")
    } // Fallback always safe: caller re-runs the slow path
  }

  test("fast path matches the codec on plain documents of every type") {
    val plains = Seq(
      """{"type":"Point","coordinates":[125.6,10.1]}""",
      """{"type":"Point","coordinates":[1,2,3]}""",
      """{"type":"Point","coordinates":[]}""",
      """{"type":"MultiPoint","coordinates":[[1.5,2.5],[3,4,5]]}""",
      """{"type":"MultiPoint","coordinates":[]}""",
      """{"type":"LineString","coordinates":[[0,0],[1,1],[2,2]]}""",
      """{"type":"MultiLineString","coordinates":[[[0,0],[1,1]],[[2,2],[3,3],[4,4]]]}""",
      """{"type":"MultiLineString","coordinates":[]}""",
      """{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,4],[0,0]]]}""",
      """{"type":"Polygon","coordinates":[[[0,0],[9,0],[9,9],[0,9],[0,0]],[[3,3],[6,3],[6,6],[3,6],[3,3]]]}""",
      """{"type":"Polygon","coordinates":[[[1.0,2.0]]]}""", // 1-pos ring: legal (no arity check)
      """{"type":"Polygon","coordinates":[]}""",
      """{"type":"MultiPolygon","coordinates":[[[[0,0],[4,0],[4,4],[0,0]]],[[[9,9],[12,9],[12,12],[9,9]]]]}""",
      """{"type":"MultiPolygon","coordinates":[]}""")
    plains.foreach { t =>
      assert(GeoParse.parseGeometryFast(t) ne GeoParse.Fallback, s"expected fast accept: $t")
      check(t)
    }
  }

  test("fast path falls back on everything unusual (and slow handles it)") {
    val oddballs = Seq(
      """{"coordinates":[1,2],"type":"Point"}""",                      // reordered keys
      """{"type":"Point","coordinates":[1,2],"bbox":[0,0,2,2]}""",     // bbox (dropped by slow)
      """{"type":"Point","coordinates":[1,2],"title":"x"}""",          // foreign member
      """{"type":"GeometryCollection","geometries":[{"type":"Point","coordinates":[1,2]}]}""",
      """{"type":"LineString","coordinates":[[1,2]]}""",               // arity violation -> error
      """{"type":"MultiLineString","coordinates":[[[1,2]]]}""",        // inner arity violation
      """{"type":"Point","coordinates":[1,"x"]}""",                    // bad float -> error
      """{"type":"Point","coordinates":42}""",                         // not an array
      """{"type":"Point"}""",                                          // no coordinates
      """{"type":"Wibble","coordinates":[]}""",                        // unknown type
      """{"type":"Point","coordinates":[[1,2]]}""",                    // too deep
      """{"type":"MultiPoint","coordinates":[1,2]}""",                 // too shallow
      """{"type":"Point","coordinates":[1,2]} garbage""",              // trailing content
      """not json at all""")
    oddballs.foreach { t =>
      assert(GeoParse.parseGeometryFast(t) eq GeoParse.Fallback, s"expected fallback: $t")
    }
  }

  private def checkTop(text: String): Unit = {
    val fast = GeoParse.parseTopFast(text)
    val slow = GeoJsonCodec.parse(text).toOption.map(GeoStruct.packTop)
    if (fast ne GeoParse.Fallback) {
      assert(slow.isDefined, s"top fast accepted what slow rejects: $text")
      val a = graft.geo.sql.GeoRuntime.toGeoJson(fast.asInstanceOf[InternalRow]).toString
      val b = graft.geo.sql.GeoRuntime.toGeoJson(slow.get).toString
      assert(a == b, s"top fast/slow mismatch for: $text\nfast=$a\nslow=$b")
      // struct-level null/empty parity where render can't see it
      val fr = fast.asInstanceOf[InternalRow]; val sr = slow.get
      (0 until 6).foreach(i => assert(fr.isNullAt(i) == sr.isNullAt(i), s"field $i nullness: $text"))
    }
  }

  test("top fast path: plain geometry and Feature documents match the codec") {
    val accepted = Seq(
      """{"type":"Point","coordinates":[1.5,2.5]}""",
      """{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,0]]]}""",
      """{"type":"Feature"}""",
      """{"type":"Feature","properties":{"name":"Foix","n":7}}""",
      """{"type":"Feature","properties":null}""",
      """{"type":"Feature","geometry":{"type":"Point","coordinates":[1,2]},"properties":{"a":[1,2.5,"x"]}}""",
      """{"type":"Feature","properties":{"a":1},"geometry":{"type":"LineString","coordinates":[[0,0],[1,1]]}}""",
      """{"type":"Feature","id":"abc","geometry":{"type":"Point","coordinates":[1,2]}}""",
      """{"type":"Feature","id":42.5}""",
      """{"type":"Feature","bbox":[0,0,4,4],"geometry":{"type":"Point","coordinates":[1,2]}}""",
      """{"type":"Feature","bbox":[]}""")
    accepted.foreach { t =>
      assert(GeoParse.parseTopFast(t) ne GeoParse.Fallback, s"expected top fast accept: $t")
      checkTop(t)
    }
  }

  test("top fast path falls back on FC / foreign members / dup keys / error shapes") {
    val oddballs = Seq(
      """{"type":"FeatureCollection","features":[]}""",
      """{"type":"Feature","title":"x"}""",                         // foreign member
      """{"type":"Feature","geometry":null}""",                      // null geometry = error
      """{"type":"Feature","geometry":{"type":"Point","coordinates":[1,2]},"geometry":{"type":"Point","coordinates":[3,4]}}""",
      """{"type":"Feature","id":true}""",                            // bad id = error
      """{"type":"Feature","bbox":"x"}""",                           // silent-None bbox
      """{"type":"Feature","bbox":[1,"x"]}""",                       // silent-None bbox
      """{"properties":{},"type":"Feature"}""",                      // type not first
      """{"type":"Point","coordinates":[1,2],"bbox":[0,0,2,2]}""",   // top bbox on geometry doc
      """{"type":"Feature","properties":{}} tail""")
    oddballs.foreach { t =>
      assert(GeoParse.parseTopFast(t) eq GeoParse.Fallback, s"expected top fallback: $t")
    }
  }

  test("top differential: generated docs of all 7 skeleton kinds") {
    import graft.geo.gen.GeoGen
    var fastCount = 0
    (0L until 2000L).foreach { id =>
      val text = GeoJsonCodec.render(GeoGen.docFor(id, 11L))
      if (GeoParse.parseTopFast(text) ne GeoParse.Fallback) fastCount += 1
      checkTop(text)
    }
    assert(fastCount > 1200, s"fast path should take geometry+feature kinds, took $fastCount")
  }

  test("differential: 2000 generated geometry docs agree byte-for-byte") {
    import graft.geo.gen.GeoGen
    var fastCount = 0
    (0L until 2000L).foreach { id =>
      GeoGen.docFor(id, 7L).body match {
        case graft.geo.model.GeoModel.GGeometry(g) =>
          val text = GeoJsonCodec.geometryToJson(g).render
          val fast = GeoParse.parseGeometryFast(text)
          if (fast ne GeoParse.Fallback) {
            fastCount += 1
            assert(renderRow(fast.asInstanceOf[InternalRow]) == text, s"id=$id")
          } else assert(slowRow(text).isDefined, s"id=$id slow must still accept")
        case _ => // feature/fc skeletons not applicable
      }
    }
    assert(fastCount > 1000, s"fast path should take the plain majority, took $fastCount")
  }
}
