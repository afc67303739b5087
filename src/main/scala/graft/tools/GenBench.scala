package graft.tools

/** Generation-only throughput probe (dev tool). */
object GenBench {
  def main(args: Array[String]): Unit = {
    val n     = sys.env.getOrElse("N", "2000000").toLong
    val spark = graft.Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    val parts = spark.sparkContext.defaultParallelism * 2
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.pipeline.ImageGen.table(spark, n, parts)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[gen] round $round: $sec%.2f s (${n / sec}%.0f rows/s)")
    }
    spark.stop()
  }
}
