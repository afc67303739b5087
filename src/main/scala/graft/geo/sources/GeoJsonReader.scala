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

  /** Lazy iterator over the "features" array elements of one stream.
    * Non-features members (fm, bbox) are skipped; nested "features" keys
    * inside properties are not confused because only the TOP-level object's
    * member is honored (depth tracking).
    */
  private[sources] def splitFeatures(in: java.io.InputStream): Iterator[String] = {
    val factory = new JsonFactory()
    val parser  = factory.createParser(in)

    // advance to the start of the top-level "features" array
    var t = parser.nextToken()
    require(t == JsonToken.START_OBJECT, "GeoJSON document must be an object")
    var found = false
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
