package graft.geo

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.geo.plans.PipPrefilterRule
import graft.geo.sql.GeoFunctions._

/** The custom optimizer rule: a constant-geometry st_contains filter gains a
  * sound s2-cell InSet prefilter (semantics unchanged, plan gains a prunable
  * int64 predicate).
  */
class PipPrefilterRuleSpec extends AnyFunSuite {
  lazy val spark = { val s = SparkTestBase.spark; PipPrefilterRule.install(s); s }
  import spark.implicits._

  def points = spark.range(4000).select(
    $"id",
    (pmod($"id" * 7919, lit(4000)) / 1000.0 + 99.0).as("lng"),
    (pmod($"id" * 104729, lit(4000)) / 1000.0 - 1.0).as("lat"))

  val polyJson =
    """{"type":"Polygon","coordinates":[[[100.0,0.0],[101.0,0.0],[101.0,1.0],[100.0,1.0],[100.0,0.0]]]}"""

  test("rule injects an s2_cell InSet next to a foldable st_contains") {
    val df = points.where(st_contains(from_geojson_geom(lit(polyJson)), $"lng", $"lat"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("s2cellexpr") || optimized.toLowerCase.contains("s2cell"),
      s"prefilter missing from plan:\n$optimized")
    assert(optimized.contains("INSET") || optimized.contains("IN ("),
      s"InSet missing:\n$optimized")
  }

  test("rewrite is a semantic no-op (same rows as unoptimized brute filter)") {
    val df = points.cache()
    val withRule = df.where(st_contains(from_geojson_geom(lit(polyJson)), $"lng", $"lat"))
      .select("id").as[Long].collect().toSet
    // brute force evaluated via collect + kernel (no Filter node, rule can't touch it)
    val brute = df.select($"id", $"lng", $"lat").collect().filter { r =>
      val g = graft.geo.json.GeoJsonCodec.parse(polyJson).toOption.get
        .body.asInstanceOf[graft.geo.model.GeoModel.GGeometry].g
      graft.geo.sql.GeomAccess.contains(
        graft.geo.sql.GeoStruct.packGeometry(g), r.getDouble(1), r.getDouble(2))
    }.map(_.getLong(0)).toSet
    assert(withRule == brute && brute.nonEmpty)
  }

  test("rule is idempotent and skips non-foldable geometries") {
    val polys = Seq(("a", polyJson)).toDF("pid", "gj")
      .select($"pid", from_geojson_geom($"gj").as("geom"))
    val joined = points.crossJoin(polys).where(st_contains($"geom", $"lng", $"lat"))
    // non-foldable geom column: no prefilter injected, still correct
    assert(joined.count() > 0)
    val plan = joined.queryExecution.optimizedPlan.toString
    assert(!plan.contains("INSET"), "rule must not fire on non-foldable geometry")
  }
}
