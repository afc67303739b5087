package graft.geo.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.geo.sql.GeoFunctions._

/** GeoJSON sinks — the serialize side of the reference recast for tables:
  *
  *  - [[writeFeatureLines]]: one feature per line (newline-delimited
  *    GeoJSON, the format large pipelines actually exchange) — a plain
  *    distributed text write of `to_geojson`.
  *  - [[writeFeatureCollections]]: RFC 7946 FeatureCollection documents,
  *    one per output partition, assembled streamingly inside each task
  *    (constant memory — the encoder analogue of geojsone's push encoder,
  *    /root/reference/src/geojsone/vendor/jsone/jsone.ml:683-900).
  */
object GeoJsonWriter {

  /** df must carry a top-struct column (GeoStruct.topType) named `col`. */
  def writeFeatureLines(df: DataFrame, topCol: String, path: String): Unit =
    df.select(to_geojson(col(topCol)).as("value"))
      .write.mode(SaveMode.Overwrite).text(path)

  /** RFC 8142 GeoJSON text sequence: each row's JSON text prefixed with RS
    * (0x1E) and terminated with LF — the third container format the reader
    * auto-detects, closing the source/sink matrix. Input column: any GeoJSON
    * text per row (features or whole FeatureCollections). */
  def writeTextSequence(df: DataFrame, jsonCol: String, path: String): Unit =
    df.select(concat(lit("\u001e"), col(jsonCol).cast("string")).as("value"))
      .write.mode(SaveMode.Overwrite).text(path)

  /** One `{"type":"FeatureCollection","features":[...]}` document per
    * partition file. Input column: per-feature GeoJSON text. */
  def writeFeatureCollections(df: DataFrame, jsonCol: String, path: String, partitions: Int): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(jsonCol).cast("string")).as[String]
      .repartition(partitions)
      .mapPartitions { it =>
        // lazily stitch the document around the feature stream
        val head = Iterator.single("""{"type":"FeatureCollection","features":[""")
        var first = true
        val body = it.map { f =>
          val sep = if (first) { first = false; "" } else ","
          sep + f
        }
        val tail = Iterator.single("]}")
        head ++ body ++ tail
      }
      .write.mode(SaveMode.Overwrite).text(path)
  }
}
