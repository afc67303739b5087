package graft.tools
import graft.geo.json.{GeoJsonCodec, JValue}
import graft.geo.sql.GeoStruct
object StageProbe {
  def main(args: Array[String]): Unit = {
    val polyJson = {
      val ring = (0 until 200).map(i => s"[${100 + i % 7}.$i,${i % 80}.5]").mkString("[", ",", "]")
      s"""{"type":"Polygon","coordinates":[$ring]}"""
    }
    val factory = new com.fasterxml.jackson.core.JsonFactory()
    MicroBench.time("jackson_token_scan", 100000) { id =>
      val p = factory.createParser(polyJson)
      var n = 0L
      while (p.nextToken() != null) { n += 1 }
      p.close(); n + id
    }
    MicroBench.time("jackson_token_scan_withdouble", 100000) { id =>
      val p = factory.createParser(polyJson)
      var n = 0L
      while (p.nextToken() != null) {
        if (p.currentToken().isNumeric) n += p.getDoubleValue.toLong
      }
      p.close(); n + id
    }
    MicroBench.time("jvalue_parse", 100000)(id => JValue.parse(polyJson).toOption.get.hashCode.toLong + id)
    val jv = JValue.parseUnsafe(polyJson)
    MicroBench.time("ofJson", 100000)(id => GeoJsonCodec.geometryOfJson(jv).toOption.get.shape.hashCode.toLong + id)
    val geom = GeoJsonCodec.geometryOfJson(jv).toOption.get
    MicroBench.time("packGeometry", 100000)(id => GeoStruct.packGeometry(geom).numFields.toLong + id)
    val packed = GeoStruct.packGeometry(geom)
    MicroBench.time("unpackGeometry", 100000)(id => GeoStruct.unpackGeometry(packed).shape.hashCode.toLong + id)
    MicroBench.time("geometryToJson", 100000)(id => GeoJsonCodec.geometryToJson(geom).hashCode.toLong + id)
    val json2 = GeoJsonCodec.geometryToJson(geom)
    MicroBench.time("render_text", 50000)(id => json2.render.length.toLong + id)
    MicroBench.time("formatG16_grid", 2000000)(id => JValue.formatG16((id % 36000 - 18000) / 100.0).length.toLong)
    MicroBench.time("formatG16_random", 500000)(id => JValue.formatG16(java.lang.Double.longBitsToDouble(id * 0x9E3779B97F4A7C15L) match { case d if d.isNaN || d.isInfinite => 1.0; case d => d }).length.toLong)
  }
}
// appended micro entries for the fast parse path
object FastParseProbe {
  def main(args: Array[String]): Unit = {
    val pointJson = """{"type":"Point","coordinates":[125.6,10.1]}"""
    val polyJson = {
      val ring = (0 until 200).map(i => s"[${100 + i % 7}.$i,${i % 80}.5]").mkString("[", ",", "]")
      s"""{"type":"Polygon","coordinates":[$ring]}"""
    }
    MicroBench.time("fastparse_point", 1000000)(id =>
      graft.geo.sql.GeoParse.parseGeometryFast(pointJson)
        .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow].numFields.toLong + id)
    MicroBench.time("fastparse_poly200", 100000)(id =>
      graft.geo.sql.GeoParse.parseGeometryFast(polyJson)
        .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow].numFields.toLong + id)
    MicroBench.time("slowparse_poly200", 50000)(id =>
      graft.geo.json.JValue.parse(polyJson).flatMap(graft.geo.json.GeoJsonCodec.geometryOfJson)
        .toOption.map(graft.geo.sql.GeoStruct.packGeometry).get.numFields.toLong + id)
  }
}
