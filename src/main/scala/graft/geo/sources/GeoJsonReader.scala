package graft.geo.sources

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** The geojsone capability recast for Spark (SURVEY.md §2.6): split a
  * FeatureCollection document "too big for memory" into one row per feature
  * WITHOUT materializing the document — a Jackson streaming parser walks the
  * byte stream and emits each element of the top-level "features" array as
  * its own JSON text, in constant memory per task (the direct analogue of
  * the reference's lexeme-driven `decode_single_object`,
  * /root/reference/src/geojsone/geojsone.ml:68-116).
  *
  * Files are distributed across tasks (one task per file via binaryFiles);
  * a single gigantic file is one task but still constant-memory, exactly
  * like the single-fiber reference.
  */
object GeoJsonReader {

  /** One JSON text per feature of every FeatureCollection file under `path`. */
  def featureTexts(spark: SparkSession, path: String): Dataset[String] = {
    import spark.implicits._
    spark.sparkContext
      .binaryFiles(path)
      .flatMap { case (_, pds) => splitFeatures(pds.open()) }
      .toDS()
  }

  /** Features parsed to the packed feature struct (GeoStruct.featureType). */
  def features(spark: SparkSession, path: String): DataFrame = {
    graft.geo.sql.GeoFunctions.register(spark)
    import org.apache.spark.sql.functions.col
    featureTexts(spark, path).toDF("feature_json")
      .select(col("feature_json"),
        graft.geo.sql.GeoFunctions.from_geojson(col("feature_json"))
          .getField("feature").as("feature"))
  }

  /** Lazy iterator over the feature texts of one stream, auto-detecting the
    * container format in constant memory:
    *
    *  - RFC 8142 GeoJSON text sequences (RS 0x1E before each text);
    *  - ND-JSON / concatenated JSON (a sequence of root-level objects —
    *    Jackson reads consecutive root values natively);
    *  - a single FeatureCollection document (the original geojsone case):
    *    each element of the top-level "features" array. Nested "features"
    *    keys inside properties are not confused (depth tracking).
    */
  private[sources] def splitFeatures(in0: java.io.InputStream): Iterator[String] = {
    val factory = new JsonFactory()
    // sniff RS (RFC 8142): strip separators with a filter stream — each
    // text is then just another consecutive root value
    val pb    = new java.io.PushbackInputStream(in0, 1)
    val first = pb.read()
    if (first == -1) { pb.close(); return Iterator.empty }
    pb.unread(first)
    val in: java.io.InputStream =
      if (first == 0x1E) new java.io.FilterInputStream(pb) {
        override def read(): Int = {
          var b = super.read(); while (b == 0x1E) b = super.read(); b
        }
        override def read(buf: Array[Byte], off: Int, len: Int): Int = {
          val n = super.read(buf, off, len)
          if (n <= 0) return n
          var w = off; var r = off
          while (r < off + n) { if (buf(r) != 0x1E) { buf(w) = buf(r); w += 1 }; r += 1 }
          val kept = w - off
          if (kept == 0) read(buf, off, len) else kept
        }
      }
      else pb
    val parser = factory.createParser(in)
    // route on the first TOKEN (Jackson has already skipped whitespace and
    // handled BOM/encoding — a raw-byte '{' test would misroute docs with
    // leading whitespace or UTF-16 encodings): a root object may be a
    // FeatureCollection document or the first feature of a sequence
    // (splitCollection disambiguates); anything else is a plain sequence
    val t0 = parser.nextToken()
    if (t0 == null) { parser.close(); in.close(); return Iterator.empty }
    if (t0 != JsonToken.START_OBJECT) return rootValuesFromCurrent(factory, parser, in)
    splitCollection(factory, parser, in)
  }

  /** Every root-level JSON value as its own text, starting AFTER the current
    * one (ND-JSON etc.). */
  private def rootValues(factory: JsonFactory, parser: com.fasterxml.jackson.core.JsonParser,
                         in: java.io.InputStream): Iterator[String] =
    new Iterator[String] {
      private var nextTok = parser.nextToken()
      override def hasNext: Boolean = {
        val h = nextTok != null
        if (!h) { parser.close(); in.close() }
        h
      }
      override def next(): String = {
        val sw  = new java.io.StringWriter()
        val gen = factory.createGenerator(sw)
        gen.copyCurrentStructure(parser)
        gen.close()
        nextTok = parser.nextToken()
        sw.toString
      }
    }

  /** Every root-level JSON value as its own text, INCLUDING the current
    * token's value. */
  private def rootValuesFromCurrent(factory: JsonFactory,
                                    parser: com.fasterxml.jackson.core.JsonParser,
                                    in: java.io.InputStream): Iterator[String] =
    new Iterator[String] {
      private var nextTok = parser.currentToken()
      override def hasNext: Boolean = {
        val h = nextTok != null
        if (!h) { parser.close(); in.close() }
        h
      }
      override def next(): String = {
        val sw  = new java.io.StringWriter()
        val gen = factory.createGenerator(sw)
        gen.copyCurrentStructure(parser)
        gen.close()
        nextTok = parser.nextToken()
        sw.toString
      }
    }

  /** First root value starts with '{': disambiguate a FeatureCollection
    * DOCUMENT (split its "features" array) from a SEQUENCE of root objects
    * (ND-JSON / concatenated / RS — each root value is a feature text). The
    * discriminator is the first top-level member: `"type":
    * "FeatureCollection"` or `"features"` ⇒ document; `"type": <anything
    * else>` ⇒ sequence (our writer and the codec always emit `type` first);
    * any other first member ⇒ legacy document scan. */
  private def splitCollection(factory: JsonFactory,
                              parser: com.fasterxml.jackson.core.JsonParser,
                              in: java.io.InputStream): Iterator[String] = {

    // caller already consumed the START_OBJECT token
    var t = parser.nextToken()
    if (t == JsonToken.FIELD_NAME && parser.currentName() == "type") {
      val vt = parser.nextToken()
      if (vt == JsonToken.VALUE_STRING && parser.getText != "FeatureCollection") {
        // a sequence of feature objects; re-emit the partially-consumed
        // first object token-by-token, then iterate the remaining roots
        val typ = parser.getText
        val sw  = new java.io.StringWriter()
        val gen = factory.createGenerator(sw)
        gen.writeStartObject()
        gen.writeFieldName("type")
        gen.writeString(typ)
        var depth = 1
        while (depth > 0) {
          parser.nextToken() match {
            case JsonToken.START_OBJECT | JsonToken.START_ARRAY => depth += 1
            case JsonToken.END_OBJECT | JsonToken.END_ARRAY     => depth -= 1
            case _                                              => ()
          }
          gen.copyCurrentEvent(parser)
        }
        gen.close()
        return Iterator.single(sw.toString) ++ rootValues(factory, parser, in)
      }
      // non-string type value: skip its subtree so the depth scan below
      // starts balanced at the top level
      if (vt == JsonToken.START_OBJECT || vt == JsonToken.START_ARRAY) parser.skipChildren()
    }
    // document mode: advance to the start of the top-level "features" array
    // (the "type" member, if that's what we just consumed, is behind us)
    var found = t == JsonToken.FIELD_NAME && parser.currentName() == "features" && {
      val nxt = parser.nextToken()
      require(nxt == JsonToken.START_ARRAY, "features must be an array")
      true
    }
    var depth = 1
    while (!found && { t = parser.nextToken(); t != null }) {
      t match {
        case JsonToken.FIELD_NAME if depth == 1 && parser.currentName() == "features" =>
          val nxt = parser.nextToken()
          require(nxt == JsonToken.START_ARRAY, "features must be an array")
          found = true
        case JsonToken.START_OBJECT | JsonToken.START_ARRAY => depth += 1
        case JsonToken.END_OBJECT | JsonToken.END_ARRAY     => depth -= 1
        case _                                              => ()
      }
    }
    if (!found) { parser.close(); in.close(); return Iterator.empty }

    new Iterator[String] {
      private var nextTok = parser.nextToken()
      override def hasNext: Boolean = {
        val h = nextTok == JsonToken.START_OBJECT
        if (!h) { parser.close(); in.close() }
        h
      }
      override def next(): String = {
        val sw  = new java.io.StringWriter()
        val gen = factory.createGenerator(sw)
        gen.copyCurrentStructure(parser) // streams one feature through
        gen.close()
        nextTok = parser.nextToken()
        sw.toString
      }
    }
  }
}
