package graft.geo

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Coordinate, GeometryFactory, LinearRing}

import graft.SparkTestBase
import graft.geo.json.{GeoJsonCodec, JValue}
import graft.geo.sql.{GeoFunctions, GeoStruct}
import graft.geo.sql.GeoFunctions._

/** st_intersects + intersectsJoin: fuzz against JTS (the vendored test
  * oracle, never a runtime dependency) and brute-force join equality. */
class IntersectsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._
  GeoFunctions.register(SparkTestBase.spark)

  private val gf = new GeometryFactory()

  /** Random closed simple-ish polygon (star-convex around a center, so
    * non-convex but non-self-intersecting) with continuous coordinates —
    * degenerate contacts have measure zero, keeping the naive-double kernel
    * and JTS's robust predicates in agreement. */
  private def randomPoly(rng: scala.util.Random, cx: Double, cy: Double,
                         rMin: Double, rMax: Double, nPts: Int): Vector[(Double, Double)] = {
    val pts = (0 until nPts).map { i =>
      val ang = 2 * math.Pi * i / nPts
      val r   = rMin + rng.nextDouble() * (rMax - rMin)
      (cx + r * math.cos(ang), cy + r * math.sin(ang))
    }.toVector
    pts :+ pts.head
  }

  private def toJson(ring: Vector[(Double, Double)]): String =
    ring.map { case (x, y) => s"[$x,$y]" }.mkString("""{"type":"Polygon","coordinates":[[""", ",", "]]}")

  private def toJts(ring: Vector[(Double, Double)]) = {
    val shell: LinearRing = gf.createLinearRing(
      ring.map { case (x, y) => new Coordinate(x, y) }.toArray)
    gf.createPolygon(shell)
  }

  private def packed(json: String) =
    GeoStruct.packGeometry(
      GeoJsonCodec.geometryOfJson(JValue.parseUnsafe(json)).toOption.get)

  test("st_intersects matches JTS on 400 random polygon pairs (all regimes)") {
    val rng = new scala.util.Random(31)
    var agree = 0; var hits = 0
    (1 to 400).foreach { _ =>
      val cx = rng.nextDouble() * 40 - 20
      val cy = rng.nextDouble() * 30 - 15
      // second center from overlapping to far — samples intersecting,
      // containing (small inside big) and disjoint configurations
      val dx = (rng.nextDouble() * 10 - 5) * (if (rng.nextBoolean()) 0.3 else 1.5)
      val dy = (rng.nextDouble() * 8 - 4) * (if (rng.nextBoolean()) 0.3 else 1.5)
      val a = randomPoly(rng, cx, cy, 1.0, 3.0, 5 + rng.nextInt(8))
      val b = randomPoly(rng, cx + dx, cy + dy,
        if (rng.nextInt(4) == 0) 0.2 else 1.0, if (rng.nextInt(4) == 0) 0.6 else 2.5,
        4 + rng.nextInt(8))
      val ours = graft.geo.sql.GeomAccess.intersects(packed(toJson(a)), packed(toJson(b)))
      val jts  = toJts(a).intersects(toJts(b))
      assert(ours == jts, s"mismatch ours=$ours jts=$jts\nA=${toJson(a)}\nB=${toJson(b)}")
      agree += 1; if (jts) hits += 1
    }
    // the sample must exercise both outcomes
    assert(hits > 50 && hits < 350, s"degenerate sample: $hits/400 intersecting")
  }

  test("st_intersects matches JTS on 200 random pairs WITH holes") {
    val rng = new scala.util.Random(47)
    def toJsonHoled(shell: Vector[(Double, Double)], hole: Vector[(Double, Double)]): String = {
      def ring(r: Vector[(Double, Double)]) = r.map { case (x, y) => s"[$x,$y]" }.mkString("[", ",", "]")
      s"""{"type":"Polygon","coordinates":[${ring(shell)},${ring(hole)}]}"""
    }
    def toJtsHoled(shell: Vector[(Double, Double)], hole: Vector[(Double, Double)]) = {
      def lr(r: Vector[(Double, Double)]) =
        gf.createLinearRing(r.map { case (x, y) => new Coordinate(x, y) }.toArray)
      gf.createPolygon(lr(shell), Array(lr(hole)))
    }
    var hits = 0
    (1 to 200).foreach { _ =>
      val cx = rng.nextDouble() * 20 - 10
      val cy = rng.nextDouble() * 16 - 8
      val shell = randomPoly(rng, cx, cy, 2.5, 4.0, 6 + rng.nextInt(6))
      val hole  = randomPoly(rng, cx, cy, 0.5, 1.2, 5) // star-radii keep it inside
      val a     = toJsonHoled(shell, hole)
      val aJts  = toJtsHoled(shell, hole)
      // B placed anywhere from inside-the-hole to far away
      val scale = rng.nextInt(3) match { case 0 => 0.15; case 1 => 0.8; case _ => 2.0 }
      val b = randomPoly(rng, cx + (rng.nextDouble() * 8 - 4) * scale,
        cy + (rng.nextDouble() * 6 - 3) * scale, 0.2 + scale / 3, 0.4 + scale, 4 + rng.nextInt(6))
      val ours = graft.geo.sql.GeomAccess.intersects(packed(a), packed(toJson(b)))
      val jts  = aJts.intersects(toJts(b))
      assert(ours == jts, s"holed mismatch ours=$ours jts=$jts\nA=$a\nB=${toJson(b)}")
      if (jts) hits += 1
    }
    assert(hits > 20 && hits < 190, s"degenerate holed sample: $hits/200")
  }

  test("st_intersects: holes, containment, boundary touch") {
    def g(s: String) = packed(s)
    val outer = g("""{"type":"Polygon","coordinates":[[[0,0],[10,0],[10,10],[0,10],[0,0]],[[3,3],[7,3],[7,7],[3,7],[3,3]]]}""")
    val inHole   = g("""{"type":"Polygon","coordinates":[[[4,4],[6,4],[6,6],[4,6],[4,4]]]}""")
    val inSolid  = g("""{"type":"Polygon","coordinates":[[[1,1],[2,1],[2,2],[1,2],[1,1]]]}""")
    val spanning = g("""{"type":"Polygon","coordinates":[[[2,5],[8,5],[8,6],[2,6],[2,5]]]}""")
    val touching = g("""{"type":"Polygon","coordinates":[[[10,0],[14,0],[14,4],[10,4],[10,0]]]}""")
    val disjoint = g("""{"type":"Polygon","coordinates":[[[20,20],[22,20],[22,22],[20,22],[20,20]]]}""")
    import graft.geo.sql.GeomAccess.{intersects => ix}
    assert(!ix(outer, inHole), "polygon fully inside the hole is disjoint")
    assert(ix(outer, inSolid), "polygon inside the solid part intersects")
    assert(ix(outer, spanning), "polygon crossing the hole boundary intersects")
    assert(ix(outer, touching), "shared edge counts as intersecting")
    assert(!ix(outer, disjoint))
    // containment both directions
    assert(ix(inSolid, outer))
    // multipolygon: one part hits
    val mp = g("""{"type":"MultiPolygon","coordinates":[[[[30,30],[31,30],[31,31],[30,31],[30,30]]],[[[1,1],[1.5,1],[1.5,1.5],[1,1.5],[1,1]]]]}""")
    assert(ix(outer, mp) && ix(mp, outer))
    // lineal args participate fully (the round-4 generalization replaced
    // the old non-areal → false limitation): the diagonal crosses the solid
    // part of the holed polygon
    val line = g("""{"type":"LineString","coordinates":[[0,0],[10,10]]}""")
    assert(ix(outer, line) && ix(line, outer))
  }

  test("st_intersects across the antimeridian (seam-crossing polygons)") {
    import graft.geo.sql.GeomAccess.{intersects => ix}
    def g(s: String) = packed(s)
    // A wraps the seam: lng 170..-170 (i.e. 170..190 unwrapped), lat 0..10
    val seam = g("""{"type":"Polygon","coordinates":[[[170,0],[-170,0],[-170,10],[170,10],[170,0]]]}""")
    // B cuts through the band near lng 175 — spherically intersecting
    val inBandE = g("""{"type":"Polygon","coordinates":[[[175,-5],[176,-5],[176,15],[175,15],[175,-5]]]}""")
    // same on the western side of the seam
    val inBandW = g("""{"type":"Polygon","coordinates":[[[-176,-5],[-175,-5],[-175,15],[-176,15],[-176,-5]]]}""")
    // C near lng 0 — spherically disjoint (the naive planar edge
    // (170,0)->(-170,0) would cross it: the old false positive)
    val atZero = g("""{"type":"Polygon","coordinates":[[[-1,-5],[1,-5],[1,15],[-1,15],[-1,-5]]]}""")
    // D fully inside the wrapped band, on the west side
    val insideW = g("""{"type":"Polygon","coordinates":[[[-175,2],[-172,2],[-172,8],[-175,8],[-175,2]]]}""")
    assert(ix(seam, inBandE) && ix(inBandE, seam), "east-side cut must intersect")
    assert(ix(seam, inBandW) && ix(inBandW, seam), "west-side cut must intersect")
    assert(ix(seam, insideW) && ix(insideW, seam), "containment across the seam")
    assert(!ix(seam, atZero) && !ix(atZero, seam), "lng-0 box is spherically disjoint")
    // two seam-crossers overlapping / disjoint
    val seam2 = g("""{"type":"Polygon","coordinates":[[[178,5],[-178,5],[-178,20],[178,20],[178,5]]]}""")
    val seam3 = g("""{"type":"Polygon","coordinates":[[[178,40],[-178,40],[-178,50],[178,50],[178,40]]]}""")
    assert(ix(seam, seam2) && ix(seam2, seam))
    assert(!ix(seam, seam3) && !ix(seam3, seam))
    // intersectsJoin end-to-end over the seam
    val a = Seq((1L, """{"type":"Polygon","coordinates":[[[170,0],[-170,0],[-170,10],[170,10],[170,0]]]}"""))
      .toDF("aid", "json").select($"aid", from_geojson_geom($"json").as("geom"))
    val b = Seq(
      (1L, """{"type":"Polygon","coordinates":[[[175,-5],[176,-5],[176,15],[175,15],[175,-5]]]}"""),
      (2L, """{"type":"Polygon","coordinates":[[[-1,-5],[1,-5],[1,15],[-1,15],[-1,-5]]]}"""),
      (3L, """{"type":"Polygon","coordinates":[[[-176,2],[-175,2],[-175,8],[-176,8],[-176,2]]]}"""))
      .toDF("bid", "json").select($"bid", from_geojson_geom($"json").as("geom"))
    val out = graft.geo.join.SpatialJoins.intersectsJoin(a, "aid", "geom", b, "bid", "geom",
      minLevel = 2, maxLevel = 10).as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 1L), (1L, 3L)), out.toString)
  }


  test("seam: wide band (>180 deg span) and RFC 7946 split halves at ±180") {
    import graft.geo.sql.GeomAccess.{intersects => ix}
    def g(x: String) = packed(x)
    // band covering lng 170..(+360)..10, i.e. [170,180] U [-180,10]
    val wide = g("""{"type":"Polygon","coordinates":[[[170,0],[-170,0],[-90,0],[10,0],[10,10],[-90,10],[-170,10],[170,10],[170,0]]]}""")
    val at5  = g("""{"type":"Polygon","coordinates":[[[4,2],[6,2],[6,8],[4,8],[4,2]]]}""")
    val at50 = g("""{"type":"Polygon","coordinates":[[[49,2],[51,2],[51,8],[49,8],[49,2]]]}""")
    assert(ix(wide, at5) && ix(at5, wide), "lng-5 box lies inside the wide band")
    assert(!ix(wide, at50) && !ix(at50, wide), "lng-50 box is outside the band")
    // the standard antimeridian-SPLIT representation: two halves sharing
    // the meridian 180 == -180 — boundary contact counts as intersecting
    val east = g("""{"type":"Polygon","coordinates":[[[179,0],[180,0],[180,10],[179,10],[179,0]]]}""")
    val west = g("""{"type":"Polygon","coordinates":[[[-180,0],[-179,0],[-179,10],[-180,10],[-180,0]]]}""")
    assert(ix(east, west) && ix(west, east), "split halves touch at the meridian")
    // and a hole inside a seam-crossing shell keeps its frame
    val holed = g("""{"type":"Polygon","coordinates":[[[170,0],[-170,0],[-170,10],[170,10],[170,0]],[[175,3],[-178,3],[-178,7],[175,7],[175,3]]]}""")
    val inHole = g("""{"type":"Polygon","coordinates":[[[179,4],[-180,4],[-180,6],[179,6],[179,4]]]}""")
    assert(!ix(holed, inHole) && !ix(inHole, holed), "box inside the seam hole is disjoint")
  }

  test("st_intersects line cases match JTS on 400 random line/line + line/polygon pairs") {
    val rng = new scala.util.Random(57)
    def randomLine(cx: Double, cy: Double, n: Int, rad: Double): Vector[(Double, Double)] =
      (0 until n).map { i =>
        (cx + (rng.nextDouble() * 2 - 1) * rad + i * rad / 2,
         cy + (rng.nextDouble() * 2 - 1) * rad)
      }.toVector
    def lineJson(pts: Vector[(Double, Double)]): String =
      pts.map { case (x, y) => s"[$x,$y]" }.mkString("""{"type":"LineString","coordinates":[""", ",", "]}")
    def jtsLine(pts: Vector[(Double, Double)]) =
      gf.createLineString(pts.map { case (x, y) => new Coordinate(x, y) }.toArray)
    var crossHits = 0; var polyHits = 0
    (1 to 400).foreach { _ =>
      val cx = rng.nextDouble() * 40 - 20
      val cy = rng.nextDouble() * 30 - 15
      val la = randomLine(cx, cy, 2 + rng.nextInt(5), 2.0)
      // line-line: second line from overlapping to far
      val far = if (rng.nextBoolean()) 1.0 else 8.0
      val lb = randomLine(cx + rng.nextDouble() * far, cy + rng.nextDouble() * far,
        2 + rng.nextInt(5), 2.0)
      val oursLL = graft.geo.sql.GeomAccess.intersects(packed(lineJson(la)), packed(lineJson(lb)))
      assert(oursLL == jtsLine(la).intersects(jtsLine(lb)),
        s"line-line mismatch\nA=${lineJson(la)}\nB=${lineJson(lb)}")
      if (oursLL) crossHits += 1
      // line-polygon: crossing, wholly-inside and disjoint regimes
      val poly = randomPoly(rng, cx + rng.nextDouble() * far, cy - rng.nextDouble() * far,
        1.0, 4.0, 5 + rng.nextInt(7))
      val oursLP = graft.geo.sql.GeomAccess.intersects(packed(lineJson(la)), packed(toJson(poly)))
      val oursPL = graft.geo.sql.GeomAccess.intersects(packed(toJson(poly)), packed(lineJson(la)))
      val jtsLP  = jtsLine(la).intersects(toJts(poly))
      assert(oursLP == jtsLP && oursPL == jtsLP,
        s"line-poly mismatch ours=($oursLP,$oursPL) jts=$jtsLP\nL=${lineJson(la)}\nP=${toJson(poly)}")
      if (jtsLP) polyHits += 1
    }
    assert(crossHits > 40 && crossHits < 360, s"degenerate line-line sample: $crossHits")
    assert(polyHits > 40 && polyHits < 360, s"degenerate line-poly sample: $polyHits")
  }

  test("st_intersects: line wholly inside polygon, on-boundary touch, points") {
    val box = """{"type":"Polygon","coordinates":[[[0.0,0.0],[10.0,0.0],[10.0,10.0],[0.0,10.0],[0.0,0.0]]]}"""
    def hit(a: String, b: String) =
      graft.geo.sql.GeomAccess.intersects(packed(a), packed(b))
    // wholly inside (no boundary contact): caught by vertex-in, not edges
    assert(hit("""{"type":"LineString","coordinates":[[2.0,2.0],[3.0,7.0]]}""", box))
    // crossing straight through (both endpoints outside)
    assert(hit("""{"type":"LineString","coordinates":[[-5.0,5.0],[15.0,5.0]]}""", box))
    // touching one boundary point only
    assert(hit("""{"type":"LineString","coordinates":[[-5.0,5.0],[0.0,5.0]]}""", box))
    // collinear overlap with an edge
    assert(hit("""{"type":"LineString","coordinates":[[2.0,0.0],[8.0,0.0]]}""", box))
    // inside the HOLE of a holed polygon: no intersection
    val holed = """{"type":"Polygon","coordinates":[[[0.0,0.0],[10.0,0.0],[10.0,10.0],[0.0,10.0],[0.0,0.0]],[[3.0,3.0],[7.0,3.0],[7.0,7.0],[3.0,7.0],[3.0,3.0]]]}"""
    assert(!hit("""{"type":"LineString","coordinates":[[4.0,4.0],[6.0,6.0]]}""", holed))
    assert(hit("""{"type":"LineString","coordinates":[[4.0,4.0],[8.0,8.0]]}""", holed)) // exits the hole
    // disjoint
    assert(!hit("""{"type":"LineString","coordinates":[[20.0,20.0],[30.0,25.0]]}""", box))
    // line-line: crossing, endpoint touch, collinear overlap, disjoint
    val diag = """{"type":"LineString","coordinates":[[0.0,0.0],[10.0,10.0]]}"""
    assert(hit(diag, """{"type":"LineString","coordinates":[[0.0,10.0],[10.0,0.0]]}"""))
    assert(hit(diag, """{"type":"LineString","coordinates":[[10.0,10.0],[20.0,0.0]]}"""))
    assert(hit(diag, """{"type":"LineString","coordinates":[[4.0,4.0],[6.0,6.0]]}"""))
    assert(!hit(diag, """{"type":"LineString","coordinates":[[0.0,1.0],[9.0,10.0]]}"""))
    // points: on-segment, in-polygon, equality, and misses
    assert(hit("""{"type":"Point","coordinates":[5.0,5.0]}""", diag))
    assert(hit("""{"type":"Point","coordinates":[5.0,5.0]}""", box))
    assert(hit("""{"type":"Point","coordinates":[5.0,0.0]}""", box)) // on boundary
    assert(!hit("""{"type":"Point","coordinates":[5.0,5.0]}""", holed)) // in the hole
    assert(hit("""{"type":"MultiPoint","coordinates":[[50.0,50.0],[5.0,5.0]]}""", box))
    assert(!hit("""{"type":"Point","coordinates":[11.0,5.0]}""", box))
    assert(hit("""{"type":"Point","coordinates":[1.0,2.0]}""",
      """{"type":"Point","coordinates":[1.0,2.0]}"""))
    assert(!hit("""{"type":"Point","coordinates":[1.0,2.0]}""",
      """{"type":"Point","coordinates":[1.0,2.1]}"""))
    // MultiPoint positions are ISOLATED points, never a path: the "segment"
    // between its members must not intersect anything
    assert(!hit("""{"type":"MultiPoint","coordinates":[[-5.0,-5.0],[15.0,-5.0]]}""",
      """{"type":"LineString","coordinates":[[5.0,-10.0],[5.0,0.0]]}"""))
  }

  test("st_intersects: the reference multilinestring fixture crosses the antimeridian") {
    // the reference's own multilinestring.json carries a seam-crossing line
    // ([[170,45],[180,45]],[[-180,45],[-170,45]] — RFC 7946 split halves);
    // a single unsplit line through the seam must hit boxes on both sides
    val seamLine = """{"type":"LineString","coordinates":[[175.0,45.0],[-175.0,45.0]]}"""
    val eastBox = """{"type":"Polygon","coordinates":[[[176.0,40.0],[179.0,40.0],[179.0,50.0],[176.0,50.0],[176.0,40.0]]]}"""
    val westBox = """{"type":"Polygon","coordinates":[[[-179.0,40.0],[-176.0,40.0],[-176.0,50.0],[-179.0,50.0],[-179.0,40.0]]]}"""
    val farBox  = """{"type":"Polygon","coordinates":[[[0.0,40.0],[10.0,40.0],[10.0,50.0],[0.0,50.0],[0.0,40.0]]]}"""
    def hit(a: String, b: String) =
      graft.geo.sql.GeomAccess.intersects(packed(a), packed(b))
    assert(hit(seamLine, eastBox) && hit(eastBox, seamLine))
    assert(hit(seamLine, westBox) && hit(westBox, seamLine))
    assert(!hit(seamLine, farBox))
    // the fixture itself (MultiLineString with RFC-split halves) vs both boxes
    val fixture = {
      val in = getClass.getResourceAsStream("/fixtures/multilinestring.json")
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    val mls = GeoJsonCodec.parse(fixture).toOption.get
    val gj  = mls match {
      case graft.geo.model.GeoModel.GeoJson(graft.geo.model.GeoModel.GGeometry(g), _) =>
        GeoStruct.packGeometry(g)
      case other => fail(s"unexpected fixture shape: $other")
    }
    assert(graft.geo.sql.GeomAccess.intersects(gj, packed(eastBox)))
    assert(graft.geo.sql.GeomAccess.intersects(gj, packed(westBox)))
  }

  test("st_intersects: antimeridian-hopping MultiPoint members stay in frame") {
    // points are independent — chain-unwrapping them like a path would drift
    // later members multiple 360° frames away and out of the ±360 shift
    // guard; each member must normalize individually
    val hops = (0 until 40).map(i => if (i % 2 == 0) "[179.0,10.0]" else "[-179.0,10.0]")
    val mp = s"""{"type":"MultiPoint","coordinates":[${hops.mkString(",")},[5.0,5.0]]}"""
    val box = """{"type":"Polygon","coordinates":[[[0.0,0.0],[10.0,0.0],[10.0,10.0],[0.0,10.0],[0.0,0.0]]]}"""
    assert(graft.geo.sql.GeomAccess.intersects(packed(mp), packed(box)),
      "the last member (5,5) is inside the box regardless of prior hops")
    assert(graft.geo.sql.GeomAccess.intersects(packed(box), packed(mp)))
    val farBox = """{"type":"Polygon","coordinates":[[[60.0,0.0],[70.0,0.0],[70.0,10.0],[60.0,10.0],[60.0,0.0]]]}"""
    assert(!graft.geo.sql.GeomAccess.intersects(packed(mp), packed(farBox)))
  }

  test("intersectsJoin with LINE sides equals brute force") {
    // mixed join: 40 random polylines vs 15 random polygons
    val rng = new scala.util.Random(91)
    val lines = (0 until 40).map { i =>
      val cx = rng.nextDouble() * 60 - 30; val cy = rng.nextDouble() * 40 - 20
      val pts = (0 until 3).map(j => s"[${cx + j * 2 + rng.nextDouble()},${cy + rng.nextDouble() * 4 - 2}]")
      (i.toLong, s"""{"type":"LineString","coordinates":[${pts.mkString(",")}]}""")
    }
    val polys = (0 until 15).map { i =>
      val ring = randomPoly(rng, rng.nextDouble() * 60 - 30, rng.nextDouble() * 40 - 20, 1.5, 4.0, 6)
      (i.toLong, toJson(ring))
    }
    val lDf = lines.toDF("lid", "json").select($"lid", from_geojson_geom($"json").as("geom"))
    val pDf = polys.toDF("pid", "json").select($"pid", from_geojson_geom($"json").as("geom"))
    val joined = graft.geo.join.SpatialJoins.intersectsJoin(
        pDf, "pid", "geom", lDf, "lid", "geom", minLevel = 2, maxLevel = 8)
      .select("pid", "lid").as[(Long, Long)].collect().toSet
    val brute = pDf.select($"pid", $"geom".as("ga"))
      .crossJoin(lDf.select($"lid", $"geom".as("gb")))
      .where(st_intersects($"ga", $"gb"))
      .select("pid", "lid").as[(Long, Long)].collect().toSet
    assert(joined == brute, s"join=${joined.size} brute=${brute.size} diff=${(joined diff brute) ++ (brute diff joined)}")
    assert(brute.nonEmpty, "degenerate sample: no intersecting pairs")
  }

  test("intersectsJoin equals brute-force st_intersects cross join") {
    val rng = new scala.util.Random(7)
    def polyDf(n: Int, idCol: String, seedShift: Int) = {
      val rows = (0 until n).map { i =>
        val cx = ((i * 37 + seedShift) % 300) / 10.0 - 15.0
        val cy = ((i * 53 + seedShift) % 200) / 10.0 - 10.0
        (i.toLong, toJson(randomPoly(rng, cx, cy, 0.5, 2.0, 5 + i % 6)))
      }
      rows.toDF(idCol, "json").select(col(idCol), from_geojson_geom($"json").as("geom"))
        .cache()
    }
    val a = polyDf(60, "aid", 0)
    val b = polyDf(50, "bid", 11)
    val fast = graft.geo.join.SpatialJoins.intersectsJoin(a, "aid", "geom", b, "bid", "geom",
        minLevel = 4, maxLevel = 11)
      .as[(Long, Long)].collect().toSet
    val brute = a.crossJoin(b.withColumnRenamed("geom", "geomB"))
      .where(st_intersects($"geom", $"geomB"))
      .select($"aid", $"bid").as[(Long, Long)].collect().toSet
    assert(fast == brute, s"missing=${(brute -- fast).take(5)} extra=${(fast -- brute).take(5)}")
    assert(brute.nonEmpty)
  }
}
