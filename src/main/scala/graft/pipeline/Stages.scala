package graft.pipeline

import java.nio.file.{Files, Paths}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}

/** Checkpoint-resumable pipeline stages with per-partition lineage + metrics
  * (north rule: "resumable from checkpoint with per-partition lineage +
  * metrics", BASELINE.json:14).
  *
  * Each stage is a Parquet directory; its `_SUCCESS` marker (written
  * atomically by Spark's commit protocol) is the checkpoint. A re-run sees
  * the marker and reads the stage back instead of recomputing — so a
  * multi-stage pipeline resumes after a crash at the first incomplete stage.
  *
  * Lineage piggybacks on the write pass with a CollectionAccumulator — one
  * (partitionId, rowCount) pair per task, no second scan of the output —
  * and lands in `<stage>.lineage.json` next to the data, alongside wall time
  * and row totals ("per-partition lineage rows and checkpoint-resumable
  * stages written alongside each commit", BASELINE.json:6).
  */
object Stages {

  final case class StageInfo(name: String, path: String, resumed: Boolean,
                             rows: Long, wallMs: Long)

  /** Run (or resume) a stage. */
  def stage(spark: SparkSession, rootDir: String, name: String)
           (build: => DataFrame): DataFrame = {
    runStage(spark, rootDir, name)(build)._1
  }

  def runStage(spark: SparkSession, rootDir: String, name: String)
              (build: => DataFrame): (DataFrame, StageInfo) = {
    val path    = s"$rootDir/$name"
    val success = Paths.get(path, "_SUCCESS")
    if (Files.exists(success)) {
      (spark.read.parquet(path), StageInfo(name, path, resumed = true, -1L, 0L))
    } else {
      val t0  = System.nanoTime()
      val df  = build
      val acc = spark.sparkContext.collectionAccumulator[(Int, Long)](s"lineage_$name")
      implicit val enc = Encoders.row(df.schema)
      val counted = df.mapPartitions { it =>
        new Iterator[org.apache.spark.sql.Row] {
          private var n    = 0L
          private var done = false
          override def hasNext: Boolean = {
            val h = it.hasNext
            if (!h && !done) { done = true; acc.add((TaskContext.getPartitionId(), n)) }
            h
          }
          override def next(): org.apache.spark.sql.Row = { n += 1; it.next() }
        }
      }
      counted.write.mode("overwrite").parquet(path)
      val wallMs = (System.nanoTime() - t0) / 1000000
      val parts  = {
        import scala.jdk.CollectionConverters._
        // task retries/speculation can report a partition twice — keep one
        // entry per partition (they count the same rows on success)
        acc.value.asScala.toSeq.groupBy(_._1).map { case (pid, vs) => (pid, vs.map(_._2).max) }
          .toSeq.sortBy(_._1)
      }
      val rows = parts.map(_._2).sum
      val lineageJson = {
        val pj = parts.map { case (pid, n) => s"""{"partition":$pid,"rows":$n}""" }
          .mkString("[", ",", "]")
        s"""{"stage":"$name","rows":$rows,"wall_ms":$wallMs,"partitions":$pj}"""
      }
      Files.createDirectories(Paths.get(rootDir))
      Files.writeString(Paths.get(s"$path.lineage.json"), lineageJson)
      (spark.read.parquet(path), StageInfo(name, path, resumed = false, rows, wallMs))
    }
  }

  /** Drop a stage's checkpoint (forces recompute on the next run). */
  def invalidate(rootDir: String, name: String): Unit = {
    def rm(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(rm)
      p.delete()
    }
    rm(new java.io.File(s"$rootDir/$name"))
    new java.io.File(s"$rootDir/$name.lineage.json").delete()
  }
}
