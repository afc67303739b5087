package graft.tools

import java.nio.file.{Files, Paths}

/** Isolation benchmark (guide §1.4) — NOT the driver contract bench.
  *
  * Times selected SparkEntry queries (noop sink, best-of-N) and optionally
  * dumps their `.explain("formatted")` plans, without touching the frozen
  * [[graft.Bench]] harness. Used for round-7 optimization evidence
  * (OPTIMIZATION_r07.md, plans/r07/).
  *
  * Env:
  *   SPARK_GRAFT_SF_DIR        data dir (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_CPUS          local core count (default 4)
  *   SPARK_GRAFT_EXTRA_ONLY    comma-separated query-name prefixes (default: all)
  *   SPARK_GRAFT_EXTRA_RUNS    best-of-N runs per query (default 3)
  *   SPARK_GRAFT_EXTRA_PLANDIR if set, write <query><SUFFIX>.txt formatted plans there
  *   SPARK_GRAFT_EXTRA_SUFFIX  plan filename suffix (default "_before")
  *   SPARK_GRAFT_EXTRA_FLAGSHIP if set (any value), also time the flagship job
  *   SPARK_GRAFT_BENCH_IMAGES  flagship row count (default 2000000)
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir  = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus   = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs   = math.max(1, sys.env.getOrElse("SPARK_GRAFT_EXTRA_RUNS", "3").toInt)
    val planDir = sys.env.get("SPARK_GRAFT_EXTRA_PLANDIR")
    val suffix  = sys.env.getOrElse("SPARK_GRAFT_EXTRA_SUFFIX", "_before")
    val spark  = graft.Bench.buildSession(cpus)

    // same session warmup as Bench so isolated numbers are comparable
    graft.geo.sql.GeoFunctions.register(spark)
    spark.range(100000)
      .selectExpr("""from_geojson_geom(concat('{"type":"Point","coordinates":[', id % 360 - 180, ',', id % 160 - 80, ']}')) AS g""")
      .selectExpr("st_geometry_type(g)", "to_geojson_geom(g)")
      .write.format("noop").mode("overwrite").save()

    val prefixes = sys.env.get("SPARK_GRAFT_EXTRA_ONLY").map(_.split(",").toSeq)
    val selected = graft.SparkEntry.queries.toSeq
      .filter { case (n, _) => prefixes.forall(_.exists(n.startsWith)) }
      .sortBy(_._1)

    planDir.foreach(d => Files.createDirectories(Paths.get(d)))

    // job/task counters: how much of a leg is fixed job-scheduling overhead
    val jobCount  = new java.util.concurrent.atomic.AtomicLong
    val taskCount = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobCount.incrementAndGet()
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        taskCount.incrementAndGet()
    })

    val sb = new StringBuilder("{")
    selected.foreach { case (name, fn) =>
      spark.sparkContext.setJobDescription(s"extra: $name")
      val times = (1 to runs).map { _ =>
        val c0 = graft.Bench.canarySec()
        val j0 = jobCount.get(); val k0 = taskCount.get()
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[extra] $name failed: ${e.getMessage}") }
        val s = (System.nanoTime() - t0) / 1e9
        Thread.sleep(50) // let listener events drain
        (s, math.max(c0, graft.Bench.canarySec()), jobCount.get() - j0, taskCount.get() - k0)
      }
      val (best, canary, jobs, tasks) = times.minBy(_._1)
      planDir.foreach { d =>
        val txt = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(d, s"$name$suffix.txt"), txt)
      }
      val line = f""""$name":{"sec":$best%.3f,"canary":$canary%.4f,"jobs":$jobs%d,"tasks":$tasks%d}"""
      System.err.println(s"[extra] $line")
      if (sb.length > 1) sb.append(",")
      sb.append(line)
    }

    if (sys.env.contains("SPARK_GRAFT_EXTRA_FLAGSHIP")) {
      val nImg = sys.env.getOrElse("SPARK_GRAFT_BENCH_IMAGES", "2000000").toLong
      spark.sparkContext.setJobDescription("extra: flagship")
      planDir.foreach { d =>
        import org.apache.spark.sql.functions.col
        val imgs = graft.pipeline.ImageGen.withLngLat(
          graft.pipeline.ImageGen.table(spark, nImg, partitions = spark.sparkContext.defaultParallelism * 2))
        val polys = graft.pipeline.GeoImagePipeline.fixturePolygons(spark)
        val tiled = graft.geo.join.SpatialJoins.assignTiles(
          graft.geo.join.SpatialJoins.pipJoin(imgs, "lng", "lat", polys, "geom", res = 5),
          "lng", "lat", z = 12)
          .select(col("image_id"), col("poly_id"), col("tile_key"), col("phash"))
        Files.writeString(Paths.get(d, s"flagship_pip_tile$suffix.txt"),
          tiled.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
      }
      val times = (1 to runs).map { _ =>
        val c0 = graft.Bench.canarySec()
        val (_, s) = graft.Bench.flagshipRowsPerSec(spark, nImg)
        (s, math.max(c0, graft.Bench.canarySec()))
      }
      val (best, canary) = times.minBy(_._1)
      val line = f""""flagship_pip_tile":{"sec":$best%.3f,"canary":$canary%.4f}"""
      System.err.println(s"[extra] $line")
      if (sb.length > 1) sb.append(",")
      sb.append(line)
    }
    sb.append("}")
    println(sb.toString)
    val out = sys.env.getOrElse("SPARK_GRAFT_EXTRA_OUT", "/tmp/bench_extra.json")
    try Files.writeString(Paths.get(out), sb.toString + "\n")
    catch { case e: Exception => System.err.println(s"[extra] could not write $out: $e") }
    spark.stop()
  }
}
