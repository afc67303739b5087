package graft.geo

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.geo.sql.GeoFunctions._

/** Co-located joins via bucketing on the cell id (SURVEY.md §2.9 / build
  * brief "bucketing for co-located joins"): two tables bucketed by the same
  * s2 cell column join WITHOUT a shuffle on either side — the plan must show
  * no Exchange above the scans. This is the 100 TB pattern: persist the
  * big point table bucketed by cell once, join it repeatedly for free.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("bucketed cell tables join with zero exchanges and correct rows") {
    spark.sql("DROP TABLE IF EXISTS pts_bucketed")
    spark.sql("DROP TABLE IF EXISTS enrich_bucketed")
    // a previously-failed run can leave the managed location behind
    def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }
    rm(new java.io.File("spark-warehouse/pts_bucketed"))
    rm(new java.io.File("spark-warehouse/enrich_bucketed"))

    def pts = spark.range(20000).select(
      $"id",
      (pmod($"id" * 7919, lit(36000)) / 100.0 - 180.0).as("lng"),
      (pmod($"id" * 104729, lit(16800)) / 100.0 - 84.0).as("lat"))
      .withColumn("cell", s2_cell($"lng", $"lat", lit(8)))

    pts.write.bucketBy(16, "cell").sortBy("cell")
      .mode("overwrite").saveAsTable("pts_bucketed")
    pts.groupBy("cell").agg(count(lit(1)).as("n_here"))
      .write.bucketBy(16, "cell").sortBy("cell")
      .mode("overwrite").saveAsTable("enrich_bucketed")

    val a = spark.table("pts_bucketed")
    val b = spark.table("enrich_bucketed")
    // force the sort-merge path (broadcast would hide the bucketing win on
    // these tiny test tables); at 100 TB both sides are too big to broadcast
    val joined = a.hint("merge").join(b.hint("merge"), Seq("cell"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle either side:\n$plan")

    // correctness: every point matched its cell's count
    assert(joined.count() == 20000)
    val bad = joined.groupBy("cell").agg(count(lit(1)).as("n"), first("n_here").as("h"))
      .where($"n" =!= $"h").count()
    assert(bad == 0)

    spark.sql("DROP TABLE IF EXISTS pts_bucketed")
    spark.sql("DROP TABLE IF EXISTS enrich_bucketed")
  }
}
