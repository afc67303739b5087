package graft.geo

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

import graft.SparkTestBase
import graft.geo.sources.{GeoJsonReader, GeoJsonWriter}
import graft.geo.sql.GeoFunctions._

class GeoJsonWriterSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  def featureJson(i: Int) =
    s"""{"type":"Feature","properties":{"i":$i},"geometry":{"type":"Point","coordinates":[$i.5,2.25]}}"""

  test("newline-delimited sink round-trips through from_geojson") {
    val dir = Files.createTempDirectory("gjw1").toString + "/out"
    val df  = (1 to 50).map(featureJson).toDF("raw")
      .select(from_geojson($"raw").as("top"))
    GeoJsonWriter.writeFeatureLines(df, "top", dir)
    val back = spark.read.text(dir)
      .select(from_geojson($"value").getField("feature").as("f"))
      .select(get_json_object($"f.properties", "$.i").cast("int").as("i"))
      .as[Int].collect().sorted
    assert(back.toSeq == (1 to 50))
  }

  test("FeatureCollection document sink produces valid docs the reader can split") {
    val dir = Files.createTempDirectory("gjw2").toString + "/out"
    val df  = (1 to 40).map(featureJson).toDF("json")
    GeoJsonWriter.writeFeatureCollections(df, "json", dir, partitions = 3)
    // every part file is one valid FeatureCollection; reader re-splits them
    val feats = GeoJsonReader.features(spark, dir + "/part-*")
      .select(get_json_object(col("feature.properties"), "$.i").cast("int").as("i"))
      .as[Int].collect().sorted
    assert(feats.toSeq == (1 to 40))
    // and each document parses as a whole via the codec
    val files = new java.io.File(dir).listFiles().filter(_.getName.startsWith("part-"))
    assert(files.length == 3)
    files.foreach { f =>
      val doc = new String(Files.readAllBytes(f.toPath), "UTF-8")
      val parsed = graft.geo.json.GeoJsonCodec.parse(doc)
      assert(parsed.isRight, s"${f.getName}: ${parsed.left.getOrElse("")}")
    }
  }
}
