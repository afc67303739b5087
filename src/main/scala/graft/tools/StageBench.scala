package graft.tools

import org.apache.spark.sql.functions._

/** Bisect flagship wall time: generation → +lnglat → +cell → +join →
  * +refine → +tiles (dev tool). */
object StageBench {
  def main(args: Array[String]): Unit = {
    val n     = sys.env.getOrElse("N", "8000000").toLong
    val spark = graft.Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.geo.sql.GeoFunctions.register(spark)
    import graft.geo.sql.GeoFunctions._
    val parts = spark.sparkContext.defaultParallelism * 2

    def t(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[stage] $name: $sec%.2f s  (${n / sec}%.0f rows/s)")
    }
    def imgs  = graft.pipeline.ImageGen.table(spark, n, parts)
    def pts   = graft.pipeline.ImageGen.withLngLat(imgs)
    val polys = graft.pipeline.GeoImagePipeline.fixturePolygons(spark)

    t("range_only")(spark.range(0, n, 1, parts).toDF())
    t("gen")(imgs)
    t("gen2")(imgs) // repeat: JIT-warm measurement
    t("gen_lnglat")(pts)
    t("gen_cell")(pts.withColumn("c", hex_cell(col("lng"), col("lat"), lit(5))))
    t("gen_join")(graft.geo.join.SpatialJoins.pipJoin(pts, "lng", "lat", polys, "geom", 5))
    t("gen_join_tiles") {
      graft.geo.join.SpatialJoins.assignTiles(
        graft.geo.join.SpatialJoins.pipJoin(pts, "lng", "lat", polys, "geom", 5), "lng", "lat", 12)
    }
    t("gen_tiles_all")(graft.geo.join.SpatialJoins.assignTiles(pts, "lng", "lat", 12))
    spark.stop()
  }
}
