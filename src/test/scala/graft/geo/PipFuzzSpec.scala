package graft.geo

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import scala.util.Random

import graft.SparkTestBase
import graft.geo.join.SpatialJoins
import graft.geo.sql.GeoFunctions._

/** Fuzz insurance for the join machinery: random non-convex polygons (with
  * holes, some shifted onto the antimeridian, mixed sizes) joined against a
  * scattered point cloud must equal the brute-force cross join for BOTH the
  * fixed-level hex strategy and the multi-level s2 strategy.
  */
class PipFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  val rng = new Random(1234)

  def star(cx: Double, cy: Double, n: Int, rad: Double): String = {
    val pts = (0 until n).map { i =>
      val ang = 2 * math.Pi * i / n
      val r   = rad * (0.4 + rng.nextDouble() * 0.6)
      // wrap lng into [-180, 180) so seam-adjacent polygons stay valid GeoJSON
      var x = cx + r * math.cos(ang)
      if (x > 180) x -= 360
      if (x < -180) x += 360
      val y = math.max(-84.0, math.min(84.0, cy + r * math.sin(ang)))
      (x, y)
    }
    val ring = (pts :+ pts.head).map { case (x, y) => s"[$x,$y]" }.mkString("[", ",", "]")
    s"""{"type":"Polygon","coordinates":[$ring]}"""
  }

  def randomPolys(n: Int) = {
    val js = (0 until n).map { i =>
      val seam = i % 5 == 0 // every 5th polygon sits on the antimeridian
      val cx   = if (seam) 180.0 else rng.nextDouble() * 340 - 170
      val cy   = rng.nextDouble() * 120 - 60
      val rad  = 0.3 + rng.nextDouble() * (if (i % 7 == 0) 25 else 3) // mixed sizes
      (s"p$i", star(cx, cy, 5 + rng.nextInt(9), rad))
    }
    js.toDF("poly_id", "geojson").select($"poly_id", from_geojson_geom($"geojson").as("geom"))
  }

  lazy val pts = spark.range(4000).select(
    $"id",
    (pmod($"id" * 7919, lit(36000)) / 100.0 - 180.0).as("lng"),
    (pmod($"id" * 104729, lit(16800)) / 100.0 - 84.0).as("lat")).cache()

  test("fuzz: fixed-level hex pipJoin equals brute force on 30 random polygons") {
    val polys = randomPolys(30).cache()
    val fast = SpatialJoins.pipJoin(pts, "lng", "lat", polys, "geom", res = 3)
      .select("id", "poly_id")
    val brute = pts.crossJoin(polys)
      .where(st_contains($"geom", $"lng", $"lat")).select("id", "poly_id")
    assert(brute.count() > 0, "fuzz layout produced no containments")
    assert(fast.exceptAll(brute).isEmpty && brute.exceptAll(fast).isEmpty,
      s"hex fast=${fast.count()} brute=${brute.count()}")
  }

  test("fuzz: multi-level s2 pipJoin equals brute force on 30 random polygons") {
    val polys = randomPolys(30).cache()
    val fast = SpatialJoins.pipJoinMultiLevel(pts, "lng", "lat", polys, "geom",
      minLevel = 2, maxLevel = 10)
      .select("id", "poly_id")
    val brute = pts.crossJoin(polys)
      .where(st_contains($"geom", $"lng", $"lat")).select("id", "poly_id")
    assert(brute.count() > 0)
    assert(fast.exceptAll(brute).isEmpty && brute.exceptAll(fast).isEmpty,
      s"s2 fast=${fast.count()} brute=${brute.count()}")
  }
}
