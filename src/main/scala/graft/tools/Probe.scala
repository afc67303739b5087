package graft.tools

import org.apache.spark.scheduler._

/** Per-job profiler: runs ONE SparkEntry query (warm + measured) and
  * prints every job's duration, stage count and description — the
  * round-7 tool that separated job time from driver planning gaps. */
object Probe {
  def main(args: Array[String]): Unit = {
    val name  = args.headOption.getOrElse("q38")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.geo.sql.GeoFunctions.register(spark)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties.getProperty("spark.job.description")).getOrElse("")
        jobs.put(e.jobId, (e.time, desc, e.stageInfos.size))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val (t0, desc, ns) = jobs.getOrDefault(e.jobId, (e.time, "?", 0))
        System.err.println(f"[job] ${e.jobId}%3d ${(e.time - t0)}%6d ms  stages=$ns%2d  $desc")
      }
    })
    val (_, fn) = graft.SparkEntry.queries.find(_._1.startsWith(name)).get
    // warm once, then measure
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    System.err.println("==== measured run ====")
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    System.err.println(f"[total] ${(System.nanoTime() - t0) / 1e9}%.3f s")
    Thread.sleep(500)
    spark.stop()
  }
}
