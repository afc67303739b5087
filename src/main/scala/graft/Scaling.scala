package graft

/** Scaling-efficiency evidence (north rule: ">= 0.8 throughput scaling
  * efficiency from N to 4N executors"; no real cluster in this sandbox, so
  * per the task instructions the same flagship job runs at two local
  * parallelism levels on the same input).
  *
  *   efficiency = (rows/sec at 4N) / (4 × rows/sec at N)
  *
  * Prints one JSON line; numbers land in BASELINE.md.
  */
object Scaling {
  def main(args: Array[String]): Unit = {
    val n     = sys.env.getOrElse("SPARK_GRAFT_BENCH_IMAGES", "2000000").toLong
    val low   = sys.env.getOrElse("SPARK_GRAFT_SCALE_LOW", "8")
    val high  = sys.env.getOrElse("SPARK_GRAFT_SCALE_HIGH", "32")

    def runAt(cpus: String): (Double, Double) = {
      val spark = Bench.buildSession(cpus)
      try {
        // warmup (JIT + codegen), then the measured run
        Bench.flagshipRowsPerSec(spark, math.max(n / 10, 1))
        Bench.flagshipRowsPerSec(spark, n)
      } finally spark.stop()
    }

    val (rpsLow, secLow)   = runAt(low)
    val (rpsHigh, secHigh) = runAt(high)
    val factor     = high.toDouble / low.toDouble
    val efficiency = rpsHigh / (factor * rpsLow)
    println(
      f"""{"metric":"scaling_efficiency","value":$efficiency%.3f,"unit":"ratio","rows":$n,"low_cpus":$low,"high_cpus":$high,"rows_per_sec_low":$rpsLow%.0f,"rows_per_sec_high":$rpsHigh%.0f,"sec_low":$secLow%.2f,"sec_high":$secHigh%.2f}""")
  }
}
