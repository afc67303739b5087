package graft.geo

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

import graft.geo.algo.GeoAlgo
import graft.geo.json.{GeoJsonCodec, JValue}
import graft.geo.sql.GeomAccess
import graft.geo.sql.GeoStruct

/** st_centroid / st_area / st_length_m kernels oracled against JTS (planar
  * centroid/area are defined identically) and closed-form expectations.
  */
class MeasuresSpec extends AnyFunSuite {
  val rng = new Random(3)

  def packed(json: String) =
    GeoStruct.packGeometry(JValue.parse(json).flatMap(GeoJsonCodec.geometryOfJson)
      .fold(e => fail(e), identity))

  def measure(json: String): (Double, Double, Double) = {
    val r = packed(json)
    val (cx, cy) = GeoAlgo.centroid(GeomAccess.gtype(r), GeomAccess.coords(r),
      GeomAccess.posOff(r), GeomAccess.ringOff(r), GeomAccess.partOff(r))
    val a = GeoAlgo.area(GeomAccess.gtype(r), GeomAccess.coords(r),
      GeomAccess.posOff(r), GeomAccess.ringOff(r), GeomAccess.partOff(r))
    (cx, cy, a)
  }

  def randomRing(cx: Double, cy: Double, n: Int, rad: Double): Seq[(Double, Double)] = {
    val pts = (0 until n).map { i =>
      val ang = 2 * math.Pi * i / n
      val r   = rad * (0.5 + rng.nextDouble() * 0.5)
      (cx + r * math.cos(ang), cy + r * math.sin(ang))
    }
    pts :+ pts.head
  }

  def ringJson(ring: Seq[(Double, Double)]): String =
    ring.map { case (x, y) => s"[$x,$y]" }.mkString("[", ",", "]")

  test("polygon centroid/area match JTS on random star polygons (+holes)") {
    import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
    val gf = new GeometryFactory()
    for (_ <- 1 to 300) {
      val shell = randomRing(rng.nextDouble() * 300 - 150, rng.nextDouble() * 140 - 70,
        5 + rng.nextInt(12), 0.5 + rng.nextDouble() * 3)
      val withHole = rng.nextBoolean()
      val hole = if (withHole) {
        val (sx, sy) = shell.head
        // tiny hole near a shell vertex center-of-mass; keep it inside by
        // shrinking around the shell centroid
        val cx = shell.map(_._1).sum / shell.length
        val cy = shell.map(_._2).sum / shell.length
        Some(randomRing(cx, cy, 6, 0.05).map(identity))
      } else None
      val json = s"""{"type":"Polygon","coordinates":[${ringJson(shell)}${
        hole.map(h => "," + ringJson(h)).getOrElse("")}]}"""

      val jtsShell = gf.createLinearRing(shell.map { case (x, y) => new Coordinate(x, y) }.toArray)
      val jtsHoles = hole.toArray.map(h =>
        gf.createLinearRing(h.map { case (x, y) => new Coordinate(x, y) }.toArray))
      val jts = gf.createPolygon(jtsShell, jtsHoles)
      if (jts.isValid) {
        val (cx, cy, a) = measure(json)
        assert(math.abs(a - jts.getArea) < 1e-9 * math.max(1, jts.getArea), s"area vs JTS: $a ${jts.getArea}")
        val c = jts.getCentroid
        assert(math.abs(cx - c.getX) < 1e-9 && math.abs(cy - c.getY) < 1e-9,
          s"centroid vs JTS: ($cx,$cy) vs (${c.getX},${c.getY})")
      }
    }
  }


  test("st_distance_deg matches JTS distance on random polygons and points") {
    import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
    val gf = new GeometryFactory()
    for (_ <- 1 to 300) {
      val cx = rng.nextDouble() * 200 - 100
      val cy = rng.nextDouble() * 120 - 60
      val shell = randomRing(cx, cy, 5 + rng.nextInt(10), 0.5 + rng.nextDouble() * 3)
      val json  = s"""{"type":"Polygon","coordinates":[${ringJson(shell)}]}"""
      val jts   = gf.createPolygon(
        gf.createLinearRing(shell.map { case (x, y) => new Coordinate(x, y) }.toArray))
      if (jts.isValid) {
        // probe points: inside-ish, near the boundary, and far away
        val probes = Seq(
          (cx, cy),
          (cx + rng.nextDouble() * 8 - 4, cy + rng.nextDouble() * 6 - 3),
          (cx + 20 + rng.nextDouble() * 10, cy - 15 - rng.nextDouble() * 10))
        val r = packed(json)
        probes.foreach { case (px, py) =>
          val ours = GeoAlgo.distanceDeg(GeomAccess.gtype(r), GeomAccess.coords(r),
            GeomAccess.posOff(r), GeomAccess.ringOff(r), GeomAccess.partOff(r), px, py)
          val ref = jts.distance(gf.createPoint(new Coordinate(px, py)))
          assert(math.abs(ours - ref) < 1e-9 * math.max(1.0, ref),
            s"distance vs JTS: $ours vs $ref at ($px,$py)\n$json")
        }
      }
    }
    // non-areal -> NaN; point in a hole gets the hole-ring distance
    val holed = packed("""{"type":"Polygon","coordinates":[[[0,0],[10,0],[10,10],[0,10],[0,0]],[[4,4],[6,4],[6,6],[4,6],[4,4]]]}""")
    val dHole = GeoAlgo.distanceDeg(5, GeomAccess.coords(holed), GeomAccess.posOff(holed),
      GeomAccess.ringOff(holed), GeomAccess.partOff(holed), 5.0, 5.0)
    assert(math.abs(dHole - 1.0) < 1e-12, s"hole-center distance $dHole != 1.0")
    val line = packed("""{"type":"LineString","coordinates":[[0,0],[1,1]]}""")
    assert(GeoAlgo.distanceDeg(3, GeomAccess.coords(line), GeomAccess.posOff(line),
      GeomAccess.ringOff(line), GeomAccess.partOff(line), 0.0, 0.0).isNaN)
  }

  test("multipoint/linestring centroids match JTS") {
    import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
    val gf = new GeometryFactory()
    for (_ <- 1 to 200) {
      val pts = (0 until 2 + rng.nextInt(8)).map(_ =>
        (rng.nextDouble() * 300 - 150, rng.nextDouble() * 140 - 70))
      val coordsJson = pts.map { case (x, y) => s"[$x,$y]" }.mkString("[", ",", "]")
      val coords = pts.map { case (x, y) => new Coordinate(x, y) }.toArray

      val (mx, my, _) = measure(s"""{"type":"MultiPoint","coordinates":$coordsJson}""")
      val mc = gf.createMultiPointFromCoords(coords).getCentroid
      assert(math.abs(mx - mc.getX) < 1e-9 && math.abs(my - mc.getY) < 1e-9)

      val (lx, ly, _) = measure(s"""{"type":"LineString","coordinates":$coordsJson}""")
      val lc = gf.createLineString(coords).getCentroid
      assert(math.abs(lx - lc.getX) < 1e-9 && math.abs(ly - lc.getY) < 1e-9, "lineal centroid")
    }
  }

  test("length: haversine path sums and polygon perimeter") {
    val r = packed("""{"type":"LineString","coordinates":[[0.0,0.0],[0.0,1.0],[0.0,3.0]]}""")
    val len = GeoAlgo.lengthMeters(GeomAccess.gtype(r), GeomAccess.coords(r),
      GeomAccess.posOff(r), GeomAccess.ringOff(r))
    assert(math.abs(len - GeoAlgo.haversine(0, 0, 0, 3)) < 1e-6) // meridian path is additive
    val sq = packed("""{"type":"Polygon","coordinates":[[[0.0,0.0],[1.0,0.0],[1.0,1.0],[0.0,1.0],[0.0,0.0]]]}""")
    val per = GeoAlgo.lengthMeters(GeomAccess.gtype(sq), GeomAccess.coords(sq),
      GeomAccess.posOff(sq), GeomAccess.ringOff(sq))
    assert(per > 4.4e5 && per < 4.5e5, s"unit-square perimeter ≈ 444.8 km, got $per")
  }

  def areaM2(json: String): Double = {
    val r = packed(json)
    GeoAlgo.areaM2(GeomAccess.gtype(r), GeomAccess.coords(r),
      GeomAccess.posOff(r), GeomAccess.ringOff(r), GeomAccess.partOff(r))
  }

  test("st_area_m2: boxes equal the closed-form spherical zone") {
    val R = GeoAlgo.EarthRadiusM
    for ((w, s, e, n) <- Seq((-170.0, -60.0, -130.0, -25.0), (0.0, 0.0, 1.0, 1.0),
      (100.0, 70.0, 140.0, 89.0), (-10.0, -89.0, 10.0, -80.0))) {
      val json = s"""{"type":"Polygon","coordinates":[[[$w,$s],[$e,$s],[$e,$n],[$w,$n],[$w,$s]]]}"""
      val want = R * R * math.toRadians(e - w) *
        (math.sin(math.toRadians(n)) - math.sin(math.toRadians(s)))
      val got = areaM2(json)
      assert(math.abs(got - want) <= 1e-9 * want, s"box ($w,$s,$e,$n): $got vs $want")
    }
  }

  test("st_area_m2: invariant under vertex densification (exact linear-edge integral)") {
    // the exact integral of sin(φ)dλ along a linear-in-(lng,lat) edge does
    // not change when the edge is subdivided — the discrete trapezoid
    // (Chamberlain-Duquette) formula fails this on sloped edges
    def densify(ring: Seq[(Double, Double)], k: Int): Seq[(Double, Double)] =
      ring.sliding(2).flatMap { case Seq((x1, y1), (x2, y2)) =>
        (0 until k).map(j => (x1 + (x2 - x1) * j / k, y1 + (y2 - y1) * j / k))
      }.toSeq :+ ring.last
    for (_ <- 1 to 50) {
      val ring = randomRing(rng.nextDouble() * 300 - 150, rng.nextDouble() * 120 - 60,
        5 + rng.nextInt(8), 1 + rng.nextDouble() * 15)
      val a1 = areaM2(s"""{"type":"Polygon","coordinates":[${ringJson(ring)}]}""")
      val a2 = areaM2(s"""{"type":"Polygon","coordinates":[${ringJson(densify(ring, 7))}]}""")
      assert(math.abs(a1 - a2) <= 1e-9 * math.max(1.0, a1), s"densify changed area: $a1 -> $a2")
    }
  }

  test("st_area_m2: tiny polygons approach planar area x cos(lat), holes subtract, parts add") {
    // local flatness: a small polygon's spherical area ≈ planar deg² area
    // scaled by (πR/180)² cos(φ)
    val scale = math.pow(math.Pi * GeoAlgo.EarthRadiusM / 180.0, 2)
    for (_ <- 1 to 50) {
      val cy = rng.nextDouble() * 120 - 60
      val ring = randomRing(rng.nextDouble() * 300 - 150, cy, 6 + rng.nextInt(6), 0.01)
      val json = s"""{"type":"Polygon","coordinates":[${ringJson(ring)}]}"""
      val (_, _, planar) = measure(json)
      val approx = planar * scale * math.cos(math.toRadians(cy))
      val got = areaM2(json)
      assert(math.abs(got - approx) <= 2e-3 * approx, s"tiny at lat $cy: $got vs $approx")
    }
    // holes subtract exactly
    val shell = """[[0.0,0.0],[10.0,0.0],[10.0,10.0],[0.0,10.0],[0.0,0.0]]"""
    val hole  = """[[4.0,4.0],[6.0,4.0],[6.0,6.0],[4.0,6.0],[4.0,4.0]]"""
    val a  = areaM2(s"""{"type":"Polygon","coordinates":[$shell]}""")
    val h  = areaM2(s"""{"type":"Polygon","coordinates":[$hole]}""")
    val ah = areaM2(s"""{"type":"Polygon","coordinates":[$shell,$hole]}""")
    assert(math.abs(ah - (a - h)) <= 1e-9 * a)
    // MultiPolygon adds parts
    val mp = areaM2(s"""{"type":"MultiPolygon","coordinates":[[$shell],[[[20.0,0.0],[30.0,0.0],[30.0,10.0],[20.0,10.0],[20.0,0.0]]]]}""")
    assert(math.abs(mp - 2 * a) <= 1e-6 * a)
    // non-areal -> 0
    assert(areaM2("""{"type":"LineString","coordinates":[[0,0],[1,1]]}""") == 0.0)
  }

  test("st_area_m2: pole-enclosing rings are NaN, never a silently wrong number") {
    // a ring encircling the north pole has net longitude winding 2π: the
    // line integral measures against the equator (~65x the cap area) and the
    // planar edge model has no inside convention for it — loud NaN instead
    val polar = areaM2("""{"type":"Polygon","coordinates":[[[0.0,80.0],[90.0,80.0],[180.0,80.0],[-90.0,80.0],[0.0,80.0]]]}""")
    assert(polar.isNaN, s"pole-enclosing ring must be NaN, got $polar")
    // a near-polar but NON-enclosing ring still measures normally
    val cap = areaM2("""{"type":"Polygon","coordinates":[[[0.0,80.0],[90.0,80.0],[90.0,89.0],[0.0,89.0],[0.0,80.0]]]}""")
    assert(!cap.isNaN && cap > 0)
  }

  test("st_area_m2: antimeridian-crossing ring gets the small (unwrapped) area") {
    // a 20°-wide box straddling ±180 must measure like its shifted twin, not
    // like the 340° complement
    val seam = areaM2("""{"type":"Polygon","coordinates":[[[170.0,-10.0],[-170.0,-10.0],[-170.0,10.0],[170.0,10.0],[170.0,-10.0]]]}""")
    val twin = areaM2("""{"type":"Polygon","coordinates":[[[-10.0,-10.0],[10.0,-10.0],[10.0,10.0],[-10.0,10.0],[-10.0,-10.0]]]}""")
    assert(math.abs(seam - twin) <= 1e-9 * twin, s"seam $seam vs twin $twin")
  }

  def simplifyArrays(json: String, tol: Double) = {
    val r = packed(json)
    GeoAlgo.simplify(GeomAccess.gtype(r), GeomAccess.coords(r), GeomAccess.posOff(r),
      GeomAccess.ringOff(r), GeomAccess.partOff(r), tol)
  }

  test("st_simplify: LineString Douglas-Peucker matches JTS exactly on 200 random polylines") {
    import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
    import org.locationtech.jts.simplify.DouglasPeuckerSimplifier
    val gf = new GeometryFactory()
    for (_ <- 1 to 200) {
      val n = 5 + rng.nextInt(40)
      val pts = (0 until n).map(i =>
        (i * 1.0 + rng.nextDouble() * 0.3, rng.nextDouble() * 8 - 4))
      val tol = 0.2 + rng.nextDouble() * 3
      val json = s"""{"type":"LineString","coordinates":[${pts.map { case (x, y) => s"[$x,$y]" }.mkString(",")}]}"""
      val (c2, p2, _, _) = simplifyArrays(json, tol)
      val ours = (0 until p2.length - 1).map(i => (c2(p2(i)), c2(p2(i) + 1)))
      val jts = DouglasPeuckerSimplifier.simplify(
        gf.createLineString(pts.map { case (x, y) => new Coordinate(x, y) }.toArray), tol)
      val want = jts.getCoordinates.toSeq.map(c => (c.getX, c.getY))
      assert(ours == want, s"tol=$tol\n$json\nours=$ours\njts=$want")
    }
  }

  test("st_simplify: dropped vertices stay within tol of the chain; subset; rings guarded") {
    for (_ <- 1 to 100) {
      val n = 6 + rng.nextInt(30)
      val pts = (0 until n).map(i => (i * 1.0, rng.nextDouble() * 6 - 3))
      val tol = 0.1 + rng.nextDouble() * 2
      val json = s"""{"type":"LineString","coordinates":[${pts.map { case (x, y) => s"[$x,$y]" }.mkString(",")}]}"""
      val (c2, p2, _, _) = simplifyArrays(json, tol)
      val kept = (0 until p2.length - 1).map(i => (c2(p2(i)), c2(p2(i) + 1)))
      // survivors are an ordered subset (x strictly increases in this corpus)
      assert(kept.toSet.subsetOf(pts.toSet) && kept == kept.sortBy(_._1))
      assert(kept.head == pts.head && kept.last == pts.last, "endpoints pinned")
      // DP guarantee: every original vertex within tol of some kept segment
      pts.foreach { case (px, py) =>
        val d = kept.sliding(2).map { case Seq((ax, ay), (bx, by)) =>
          GeoAlgo.pointSegmentDistance(px, py, ax, ay, bx, by) }.min
        assert(d <= tol + 1e-12, s"vertex ($px,$py) deviates $d > $tol")
      }
    }
    // a noisy square ring at coarse tolerance collapses to its 4 corners
    val noisy = (0 until 40).map { i =>
      val t = i / 10.0 % 1.0
      val (bx, by, dx, dy) = (i / 10) match {
        case 0 => (0.0, 0.0, 10.0, 0.0)
        case 1 => (10.0, 0.0, 0.0, 10.0)
        case 2 => (10.0, 10.0, -10.0, 0.0)
        case _ => (0.0, 10.0, 0.0, -10.0)
      }
      (bx + dx * t + (i % 3) * 0.01, by + dy * t + (i % 2) * 0.01)
    } :+ (0.0, 0.0)
    val ringJson = s"""{"type":"Polygon","coordinates":[[${noisy.map { case (x, y) => s"[$x,$y]" }.mkString(",")}]]}"""
    val (_, p2, r2, _) = simplifyArrays(ringJson, 0.5)
    assert(r2.last <= 6, s"noisy ring should collapse to ~5 positions, kept ${r2.last}")
    assert(r2.last >= 4, "ring must stay a ring")
    // degenerate-collapse guard: a tiny triangle at huge tolerance keeps all
    val tri = """{"type":"Polygon","coordinates":[[[0.0,0.0],[1.0,0.0],[0.5,1.0],[0.0,0.0]]]}"""
    val (tc, tp, _, _) = simplifyArrays(tri, 100.0)
    assert(tp.length - 1 == 4, "sub-4 survivor ring falls back to the original")
    // altitude passthrough: 3-D vertices keep their altitude when kept
    val line3d = """{"type":"LineString","coordinates":[[0.0,0.0,5.0],[1.0,4.0,6.0],[2.0,0.1,7.0]]}"""
    val (c3, p3, _, _) = simplifyArrays(line3d, 0.5)
    assert(p3.length - 1 == 3 && c3(p3(1) + 2) == 6.0)
    val (c4, p4, _, _) = simplifyArrays(line3d, 10.0)
    assert(p4.length - 1 == 2 && c4(p4(1) + 2) == 7.0)
  }

  test("st_convex_hull matches JTS on 200 random point clouds; degenerate -> empty") {
    import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
    val gf = new GeometryFactory()
    for (_ <- 1 to 200) {
      val n = 3 + rng.nextInt(60)
      val pts = Array.fill(n)((rng.nextDouble() * 300 - 150, rng.nextDouble() * 140 - 70))
      val hull = GeoAlgo.convexHull(pts)
      val jts = gf.createMultiPointFromCoords(
        pts.map { case (x, y) => new Coordinate(x, y) }).convexHull()
      if (hull.isEmpty) assert(jts.getArea == 0.0)
      else {
        // same vertex set (JTS closes the shell; drop the dup)
        val want = jts.getCoordinates.toSeq.map(c => (c.getX, c.getY)).dropRight(1).toSet
        assert(hull.toSet == want, s"hull vertices differ\nours=${hull.toSeq}\njts=$want")
        // CCW from the lexicographically smallest vertex
        assert(hull.head == hull.minBy(identity))
        val area2 = (hull :+ hull.head).sliding(2).map {
          case Array((x1, y1), (x2, y2)) => x1 * y2 - x2 * y1 }.sum
        assert(area2 > 0, "hull must be CCW")
        assert(math.abs(area2 / 2 - jts.getArea) <= 1e-9 * math.max(1, jts.getArea))
      }
    }
    // all-collinear and tiny inputs have no areal hull
    assert(GeoAlgo.convexHull(Array((0.0, 0.0), (1.0, 1.0), (2.0, 2.0))).isEmpty)
    assert(GeoAlgo.convexHull(Array((0.0, 0.0), (1.0, 1.0))).isEmpty)
    // SQL surface: grid cloud -> corner rectangle, canonical order
    val spark = graft.SparkTestBase.spark
    val out = spark.sql(
      """select to_geojson_geom(st_convex_hull(from_geojson_geom(
        |  '{"type":"MultiPoint","coordinates":[[1.0,1.0],[3.0,5.0],[1.0,5.0],[2.0,3.0],[3.0,1.0],[2.0,1.0]]}'))) h
        |""".stripMargin).collect()(0).getString(0)
    assert(out == """{"type":"Polygon","coordinates":[[[1,1],[3,1],[3,5],[1,5],[1,1]]]}""", out)
    // degenerate via SQL -> null
    val nul = spark.sql(
      """select st_convex_hull(from_geojson_geom('{"type":"LineString","coordinates":[[0.0,0.0],[2.0,2.0]]}')) h
        |""".stripMargin).collect()(0)
    assert(nul.isNullAt(0))
  }

  test("st_simplify: SQL surface round-trips and recurses collections") {
    val spark = graft.SparkTestBase.spark
    val out = spark.sql(
      """select to_geojson_geom(st_simplify(from_geojson_geom(
        |  '{"type":"LineString","coordinates":[[0.0,0.0],[1.0,0.01],[2.0,0.0]]}'), 0.5)) s
        |""".stripMargin).collect()(0).getString(0)
    assert(out == """{"type":"LineString","coordinates":[[0,0],[2,0]]}""", out)
    val coll = spark.sql(
      """select to_geojson_geom(st_simplify(from_geojson_geom(
        |  '{"type":"GeometryCollection","geometries":[{"type":"LineString","coordinates":[[0.0,0.0],[1.0,0.01],[2.0,0.0]]},{"type":"Point","coordinates":[7.0,8.0]}]}'), 0.5)) s
        |""".stripMargin).collect()(0).getString(0)
    assert(coll.contains("""[[0,0],[2,0]]""") && coll.contains("""[7,8]"""), coll)
  }

  test("expressions registered and usable from SQL") {
    val spark = graft.SparkTestBase.spark
    val row = spark.sql(
      """select st_centroid(g) c, st_area(g) a, st_length_m(g) l from (
        |  select from_geojson_geom('{"type":"Polygon","coordinates":[[[0.0,0.0],[2.0,0.0],[2.0,2.0],[0.0,2.0],[0.0,0.0]]]}') g)
        |""".stripMargin).collect()(0)
    assert(row.getSeq[Double](0) == Seq(1.0, 1.0))
    assert(row.getDouble(1) == 4.0)
    assert(row.getDouble(2) > 8.8e5)
  }
}
