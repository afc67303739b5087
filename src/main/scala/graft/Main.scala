package graft

import org.apache.spark.sql.SparkSession

/** spark-submit entry point (north rule: "all stages run as typed
  * Dataset/DataFrame plans submitted via spark-submit"):
  *
  *   spark-submit --class graft.Main \
  *     --conf spark.sql.extensions=graft.geo.sql.GeoExtensions \
  *     ocamlgeojsonspark.jar <nImages> <workDir> [z=12] [res=5]
  *
  * Runs the flagship pipeline — image+caption synthesis, PIP join against
  * the GeoJSON fixture geometries, ZXY tile assignment — as
  * checkpoint-resumable stages with per-partition lineage, then prints the
  * per-stage summary. Re-running with the same workDir resumes at the first
  * incomplete stage.
  */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: graft.Main <nImages> <workDir> [z] [res]")
    val n       = args(0).toLong
    val workDir = args(1)
    val z       = if (args.length > 2) args(2).toInt else 12
    val res     = if (args.length > 3) args(3).toInt else 5

    // builder only configures what spark-submit didn't
    val spark = SparkSession.builder().appName("graft-flagship").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.geo.sql.GeoFunctions.register(spark)
    graft.geo.plans.PipPrefilterRule.install(spark)

    val t0 = System.nanoTime()
    val r  = graft.pipeline.GeoImagePipeline.run(spark, n, workDir, z, res)
    val joined = r.joined.count()
    val tiled  = r.tiled.count()
    val mosaics = r.mosaics.count()
    val sec    = (System.nanoTime() - t0) / 1e9
    r.infos.foreach { i =>
      println(f"[stage] ${i.name}%-8s resumed=${i.resumed} rows=${i.rows} wall_ms=${i.wallMs}")
    }
    println(f"[flagship] images=$n joined=$joined tiled=$tiled mosaics=$mosaics wall=$sec%.1f s (${n / sec}%.0f rows/s)")
    spark.stop()
  }
}
