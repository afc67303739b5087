package graft.geo.algo

/** Pure spatial math used by the Catalyst expressions and joins.
  *
  * Everything operates on the packed flat-coordinate layout (SURVEY.md §1.4):
  * `coords` is a flat double array, `posOffsets(i)` is the start index of
  * position i (length nPos+1), `ringOffsets(r)` the start position-index of
  * ring/line r (length nRings+1), `partOffsets(p)` the start ring-index of
  * part p (length nParts+1). This mirrors the reference's flat
  * `float array` positions chosen "for performance"
  * (/root/reference/src/geojson/geojson.ml:42-43).
  */
object GeoAlgo {

  /** Mean Earth radius in metres (IUGG). */
  val EarthRadiusM: Double = 6371008.8

  /** Great-circle distance in metres (haversine formula). */
  def haversine(lng1: Double, lat1: Double, lng2: Double, lat2: Double): Double = {
    val p1   = math.toRadians(lat1)
    val p2   = math.toRadians(lat2)
    val dp   = math.toRadians(lat2 - lat1)
    val dl   = math.toRadians(lng2 - lng1)
    val a    = math.sin(dp / 2) * math.sin(dp / 2) +
               math.cos(p1) * math.cos(p2) * math.sin(dl / 2) * math.sin(dl / 2)
    2.0 * EarthRadiusM * math.asin(math.min(1.0, math.sqrt(a)))
  }

  // ------------------------------------------------------------------- PIP

  /** Does ring r (positions [start,end) in position-index space) cross the
    * antimeridian, i.e. contain a segment with |Δlng| > 180?
    */
  private def ringCrossesAntimeridian(
      coords: Array[Double], posOff: Array[Int], start: Int, end: Int): Boolean = {
    var i    = start
    var prev = coords(posOff(i))
    i += 1
    while (i < end) {
      val lng = coords(posOff(i))
      if (math.abs(lng - prev) > 180.0) return true
      prev = lng
      i += 1
    }
    false
  }

  /** Even-odd ray-casting crossing count contribution of one ring at
    * (x, y) = (lng, lat). Standard half-open rule; boundary points are
    * implementation-defined (consistent between engine and tests).
    */
  private def ringCrossings(
      coords: Array[Double], posOff: Array[Int], start: Int, end: Int,
      x: Double, y: Double): Int = {
    var crossings = 0
    var j = end - 1
    var i = start
    while (i < end) {
      val xi = coords(posOff(i)); val yi = coords(posOff(i) + 1)
      val xj = coords(posOff(j)); val yj = coords(posOff(j) + 1)
      if ((yi > y) != (yj > y)) {
        val xint = (xj - xi) * (y - yi) / (yj - yi) + xi
        if (x < xint) crossings += 1
      }
      j = i
      i += 1
    }
    crossings
  }

  /** Winding number of one ring around (x, y) in an UNWRAPPED longitude
    * space: longitudes are accumulated so consecutive deltas are <= 180,
    * and the test point is evaluated at x, x+360 and x-360 (nonzero rule).
    * This is the antimeridian fallback mandated by the north rule
    * (BASELINE.json:6 "winding-number fallback on antimeridian-crossing
    * rings").
    */
  private def ringWindingUnwrapped(
      coords: Array[Double], posOff: Array[Int], start: Int, end: Int,
      x: Double, y: Double): Boolean = {
    val n   = end - start
    val xs  = new Array[Double](n)
    val ys  = new Array[Double](n)
    var cur = coords(posOff(start))
    xs(0) = cur; ys(0) = coords(posOff(start) + 1)
    var i = 1
    while (i < n) {
      val raw   = coords(posOff(start + i))
      // choose the representative of raw closest to the running longitude
      var delta = raw - cur
      while (delta > 180) delta -= 360
      while (delta < -180) delta += 360
      cur += delta
      xs(i) = cur; ys(i) = coords(posOff(start + i) + 1)
      i += 1
    }
    def wn(px: Double): Int = {
      var w = 0
      var j = n - 1
      var k = 0
      while (k < n) {
        val x1 = xs(j); val y1 = ys(j); val x2 = xs(k); val y2 = ys(k)
        if (y1 <= y) {
          if (y2 > y && (x2 - x1) * (y - y1) - (px - x1) * (y2 - y1) > 0) w += 1
        } else {
          if (y2 <= y && (x2 - x1) * (y - y1) - (px - x1) * (y2 - y1) < 0) w -= 1
        }
        j = k
        k += 1
      }
      w
    }
    wn(x) != 0 || wn(x + 360.0) != 0 || wn(x - 360.0) != 0
  }

  /** Point-in-polygon over a set of rings (exterior + holes) in position-
    * index space: even-odd parity across ALL rings (holes flip parity), with
    * the winding-number fallback on any ring that crosses the antimeridian.
    */
  def pointInRings(
      coords: Array[Double], posOff: Array[Int], ringOff: Array[Int],
      ringStart: Int, ringEnd: Int, lng: Double, lat: Double): Boolean = {
    var inside = false
    var r = ringStart
    while (r < ringEnd) {
      val s = ringOff(r); val e = ringOff(r + 1)
      val in =
        if (ringCrossesAntimeridian(coords, posOff, s, e))
          ringWindingUnwrapped(coords, posOff, s, e, lng, lat)
        else
          (ringCrossings(coords, posOff, s, e, lng, lat) & 1) == 1
      if (in) inside = !inside
      r += 1
    }
    inside
  }

  /** st_contains over the packed geometry: true iff (lng,lat) falls inside
    * the (Multi)Polygon; non-areal geometry types yield false.
    * gtype per graft.geo.model.GeoModel.GType.
    */
  def contains(
      gtype: Int, coords: Array[Double], posOff: Array[Int],
      ringOff: Array[Int], partOff: Array[Int],
      lng: Double, lat: Double): Boolean = gtype match {
    case 5 => // Polygon: all rings together (even-odd handles holes)
      pointInRings(coords, posOff, ringOff, 0, ringOff.length - 1, lng, lat)
    case 6 => // MultiPolygon: inside any part
      var p = 0
      val nParts = partOff.length - 1
      while (p < nParts) {
        if (pointInRings(coords, posOff, ringOff, partOff(p), partOff(p + 1), lng, lat)) return true
        p += 1
      }
      false
    case _ => false
  }

  // -------------------------------------------- polygon-polygon intersects

  /** Segments (a,b) and (c,d) share a point (proper crossing, touching, or
    * collinear overlap) — planar orientation tests. */
  def segmentsIntersect(ax: Double, ay: Double, bx: Double, by: Double,
                        cx: Double, cy: Double, dx: Double, dy: Double): Boolean = {
    @inline def orient(px: Double, py: Double, qx: Double, qy: Double,
                       rx: Double, ry: Double): Double =
      (qx - px) * (ry - py) - (qy - py) * (rx - px)
    val d1 = orient(cx, cy, dx, dy, ax, ay)
    val d2 = orient(cx, cy, dx, dy, bx, by)
    val d3 = orient(ax, ay, bx, by, cx, cy)
    val d4 = orient(ax, ay, bx, by, dx, dy)
    if (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
        ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) return true
    @inline def onSeg(px: Double, py: Double, qx: Double, qy: Double,
                      rx: Double, ry: Double): Boolean =
      math.min(px, qx) <= rx && rx <= math.max(px, qx) &&
        math.min(py, qy) <= ry && ry <= math.max(py, qy)
    (d1 == 0 && onSeg(cx, cy, dx, dy, ax, ay)) ||
      (d2 == 0 && onSeg(cx, cy, dx, dy, bx, by)) ||
      (d3 == 0 && onSeg(ax, ay, bx, by, cx, cy)) ||
      (d4 == 0 && onSeg(ax, ay, bx, by, dx, dy))
  }

  /** Dimension class of a gtype: 0 point sets, 1 lineal, 2 areal; -1 for
    * collections (recursed before reaching the kernel). */
  @inline private def dimOf(gt: Int): Int = gt match {
    case 1 | 2 => 0
    case 3 | 4 => 1
    case 5 | 6 => 2
    case _     => -1
  }

  /** General intersects over two packed geometries — every dimension pair:
    * point/point (coordinate equality), point/line (on-segment), point/
    * polygon (containment or boundary), line/line (any segment pair meets,
    * incl. collinear overlap and endpoint touch), line/polygon (vertex
    * inside or boundary crossing), polygon/polygon (vertex containment with
    * holes honored via even-odd [[contains]], or any boundary segments
    * meet). Paths contribute segments WITHOUT a closing edge; rings include
    * the implicit closing edge; point sets contribute DEGENERATE (p, p)
    * segments, for which the orientation tests reduce exactly to
    * on-segment / equality. O(edgesA × edgesB) — exact refinement for
    * candidate pairs, not a scan primitive.
    *
    * Antimeridian: every ring/path is UNWRAPPED cumulatively (consecutive
    * longitude deltas normalized to |Δ| <= 180, the same walk as
    * [[pointInRings]]' winding fallback; an identity for non-crossing
    * rings), holes are aligned to their shell's frame, and the planar test
    * runs with B shifted by {0, +360, -360} (range-guarded, so off frames
    * cost nothing) — any true spherical contact, including touching at the
    * ±180 meridian between non-crossing halves, appears at some shift.
    */
  def intersectsGeoms(
      gtA: Int, cA: Array[Double], pA: Array[Int], rA: Array[Int], fA: Array[Int],
      gtB: Int, cB: Array[Double], pB: Array[Int], rB: Array[Int], fB: Array[Int]): Boolean = {
    if (dimOf(gtA) < 0 || dimOf(gtB) < 0) return false
    // point sets have INDEPENDENT members: chain-unwrapping them like a path
    // could drift a point multiple 360° frames away (an antimeridian-hopping
    // MultiPoint) and out of the ±360 shift guard — normalize each position
    // into [-180, 180] individually instead
    val cA2 = if (dimOf(gtA) == 0) normalizeLngs(cA, pA) else unwrapParts(cA, pA, rA, fA)
    val cB2 = if (dimOf(gtB) == 0) normalizeLngs(cB, pB) else unwrapParts(cB, pB, rB, fB)
    // lon ranges for the shift guard
    var minA = Double.PositiveInfinity; var maxA = Double.NegativeInfinity
    var i = 0
    while (i < pA.length - 1) {
      val x = cA2(pA(i)); if (x < minA) minA = x; if (x > maxA) maxA = x; i += 1
    }
    var minB = Double.PositiveInfinity; var maxB = Double.NegativeInfinity
    i = 0
    while (i < pB.length - 1) {
      val x = cB2(pB(i)); if (x < minB) minB = x; if (x > maxB) maxB = x; i += 1
    }
    var k = 0
    val shifts = IntersectShifts
    while (k < 3) {
      val sft = shifts(k)
      if (minB + sft <= maxA && minA <= maxB + sft &&
          intersectsPlanar(gtA, cA2, pA, rA, fA, gtB, cB2, pB, rB, fB, sft)) return true
      k += 1
    }
    false
  }

  private val IntersectShifts = Array(0.0, 360.0, -360.0)

  /** Copy of coords with every position's longitude wrapped into
    * [-180, 180] independently (point-set normalization — members are not a
    * connected path). */
  private def normalizeLngs(c: Array[Double], p: Array[Int]): Array[Double] = {
    val out = java.util.Arrays.copyOf(c, c.length)
    var i = 0
    while (i < p.length - 1) {
      var x = out(p(i))
      while (x > 180.0) x -= 360.0
      while (x < -180.0) x += 360.0
      out(p(i)) = x
      i += 1
    }
    out
  }

  /** Copy of coords with every ring unwrapped to continuous longitudes
    * (cumulative delta walk — identity for rings that never jump by more
    * than 180°), and every non-shell ring of a part shifted by a multiple
    * of 360 so it shares its shell's frame (holes stay inside). */
  private def unwrapParts(c: Array[Double], p: Array[Int], r: Array[Int],
                          f: Array[Int]): Array[Double] = {
    val out = java.util.Arrays.copyOf(c, c.length)
    var part = 0
    while (part < f.length - 1) {
      var shellFirst = 0.0
      var ri = f(part)
      while (ri < f(part + 1)) {
        val s = r(ri); val e = r(ri + 1)
        if (s < e) {
          var cur = c(p(s))
          out(p(s)) = cur
          var i = s + 1
          while (i < e) {
            val raw = c(p(i))
            var delta = raw - cur
            while (delta > 180) delta -= 360
            while (delta < -180) delta += 360
            cur += delta
            out(p(i)) = cur
            i += 1
          }
          if (ri == f(part)) shellFirst = out(p(s))
          else {
            // align this ring's frame to the shell's
            val offset = math.rint((shellFirst - out(p(s))) / 360.0) * 360.0
            if (offset != 0.0) {
              var j = s
              while (j < e) { out(p(j)) += offset; j += 1 }
            }
          }
        }
        ri += 1
      }
      part += 1
    }
    out
  }

  /** Planar intersects core with B shifted by `shiftB` degrees of
    * longitude. */
  private def intersectsPlanar(
      gtA: Int, cA: Array[Double], pA: Array[Int], rA: Array[Int], fA: Array[Int],
      gtB: Int, cB: Array[Double], pB: Array[Int], rB: Array[Int], fB: Array[Int],
      shiftB: Double): Boolean = {
    val dA = dimOf(gtA); val dB = dimOf(gtB)
    // vertex-in-areal tests. For lines/polygons the FIRST vertex of every
    // ring/path suffices for containment without boundary crossing (if no
    // edges meet, each ring lies wholly inside or outside); point sets test
    // EVERY position (each point is independent).
    if (dB == 2) {
      if (dA == 0) {
        var i = 0
        while (i < pA.length - 1) {
          if (contains(gtB, cB, pB, rB, fB, cA(pA(i)) - shiftB, cA(pA(i) + 1))) return true
          i += 1
        }
      } else {
        var r = 0
        while (r < rA.length - 1) {
          val i = rA(r)
          if (i < rA(r + 1) &&
              contains(gtB, cB, pB, rB, fB, cA(pA(i)) - shiftB, cA(pA(i) + 1))) return true
          r += 1
        }
      }
    }
    if (dA == 2) {
      if (dB == 0) {
        var i = 0
        while (i < pB.length - 1) {
          if (contains(gtA, cA, pA, rA, fA, cB(pB(i)) + shiftB, cB(pB(i) + 1))) return true
          i += 1
        }
      } else {
        var r = 0
        while (r < rB.length - 1) {
          val i = rB(r)
          if (i < rB(r + 1) &&
              contains(gtA, cA, pA, rA, fA, cB(pB(i)) + shiftB, cB(pB(i) + 1))) return true
          r += 1
        }
      }
    }
    // segment-segment over both sides' segment sets: paths have no closing
    // edge, rings do, point sets degrade to (p, p) degenerate segments
    var ra = 0
    while (ra < rA.length - 1) {
      val sa = rA(ra); val ea = rA(ra + 1)
      var ia = sa
      while (ia < ea) {
        val ja = if (dA == 0) ia
                 else if (ia + 1 < ea) ia + 1
                 else if (dA == 2) sa
                 else -1 // last vertex of a path: no closing edge
        if (ja >= 0) {
          val ax = cA(pA(ia)); val ay = cA(pA(ia) + 1)
          val bx = cA(pA(ja)); val by = cA(pA(ja) + 1)
          var rb = 0
          while (rb < rB.length - 1) {
            val sb = rB(rb); val eb = rB(rb + 1)
            var ib = sb
            while (ib < eb) {
              val jb = if (dB == 0) ib
                       else if (ib + 1 < eb) ib + 1
                       else if (dB == 2) sb
                       else -1
              if (jb >= 0 && segmentsIntersect(ax, ay, bx, by,
                  cB(pB(ib)) + shiftB, cB(pB(ib) + 1), cB(pB(jb)) + shiftB, cB(pB(jb) + 1)))
                return true
              ib += 1
            }
            rb += 1
          }
        }
        ia += 1
      }
      ra += 1
    }
    false
  }

  /** Planar point-to-segment distance (degrees² space, like st_area). */
  def pointSegmentDistance(px: Double, py: Double, ax: Double, ay: Double,
                           bx: Double, by: Double): Double = {
    val dx = bx - ax; val dy = by - ay
    val len2 = dx * dx + dy * dy
    val t =
      if (len2 == 0) 0.0
      else math.max(0.0, math.min(1.0, ((px - ax) * dx + (py - ay) * dy) / len2))
    val cx = ax + t * dx; val cy = ay + t * dy
    math.sqrt((px - cx) * (px - cx) + (py - cy) * (py - cy))
  }

  /** Planar distance in DEGREES from a point to a packed (Multi)Polygon:
    * 0 when the point is inside (holes honored — a point in a hole is
    * OUTSIDE and gets its distance to the hole ring), else the minimum
    * distance to any boundary segment (incl. implicit closing edges). JTS
    * `Geometry.distance(Point)` semantics exactly (planar, no seam
    * handling). Non-areal gtypes → NaN. */
  def distanceDeg(gtype: Int, coords: Array[Double], posOff: Array[Int],
                  ringOff: Array[Int], partOff: Array[Int],
                  x: Double, y: Double): Double = {
    if (gtype != 5 && gtype != 6) return Double.NaN
    if (contains(gtype, coords, posOff, ringOff, partOff, x, y)) return 0.0
    var best = Double.PositiveInfinity
    var r = 0
    while (r < ringOff.length - 1) {
      val s = ringOff(r); val e = ringOff(r + 1)
      var i = s
      while (i < e) {
        val j = if (i + 1 < e) i + 1 else s
        val d = pointSegmentDistance(x, y,
          coords(posOff(i)), coords(posOff(i) + 1),
          coords(posOff(j)), coords(posOff(j) + 1))
        if (d < best) best = d
        i += 1
      }
      r += 1
    }
    best
  }

  // -------------------------------------------------------------- measures

  /** Shoelace signed area of ring [start, end) (position indices), in the
    * planar lng/lat square-degree space. */
  private def ringSignedArea(coords: Array[Double], posOff: Array[Int], start: Int, end: Int): Double = {
    var a = 0.0
    var j = end - 1
    var i = start
    while (i < end) {
      val xi = coords(posOff(i)); val yi = coords(posOff(i) + 1)
      val xj = coords(posOff(j)); val yj = coords(posOff(j) + 1)
      a += xj * yi - xi * yj
      j = i; i += 1
    }
    a / 2.0
  }

  /** Filled-ring centroid (cx, cy) and |area| via the shoelace integrals
    * (sign cancels in the division). */
  private def ringCentroid(coords: Array[Double], posOff: Array[Int], start: Int, end: Int): (Double, Double, Double) = {
    var a = 0.0; var cx = 0.0; var cy = 0.0
    var j = end - 1
    var i = start
    while (i < end) {
      val xi = coords(posOff(i)); val yi = coords(posOff(i) + 1)
      val xj = coords(posOff(j)); val yj = coords(posOff(j) + 1)
      val cross = xj * yi - xi * yj
      a += cross
      cx += (xj + xi) * cross
      cy += (yj + yi) * cross
      j = i; i += 1
    }
    a /= 2.0
    if (a == 0.0) (coords(posOff(start)), coords(posOff(start) + 1), 0.0)
    else ((cx / (6.0 * a)), (cy / (6.0 * a)), math.abs(a))
  }

  /** Planar area (square degrees), JTS semantics: |shell| - Σ|holes| per
    * polygon part; non-areal types → 0. */
  def area(gtype: Int, coords: Array[Double], posOff: Array[Int],
           ringOff: Array[Int], partOff: Array[Int]): Double = gtype match {
    case 5 | 6 =>
      var total = 0.0
      var p = 0
      while (p < partOff.length - 1) {
        var r = partOff(p)
        while (r < partOff(p + 1)) {
          val a = math.abs(ringSignedArea(coords, posOff, ringOff(r), ringOff(r + 1)))
          total += (if (r == partOff(p)) a else -a)
          r += 1
        }
        p += 1
      }
      total
    case _ => 0.0
  }

  /** Planar centroid (lng, lat), matching JTS per dimension class:
    * points → mean; lines → length-weighted segment midpoints; polygons →
    * area-weighted filled-ring centroids with holes negative. */
  def centroid(gtype: Int, coords: Array[Double], posOff: Array[Int],
               ringOff: Array[Int], partOff: Array[Int]): (Double, Double) = gtype match {
    case 1 | 2 => // Point / MultiPoint: mean of positions
      val n = posOff.length - 1
      var sx = 0.0; var sy = 0.0
      var i = 0
      while (i < n) { sx += coords(posOff(i)); sy += coords(posOff(i) + 1); i += 1 }
      (sx / n, sy / n)
    case 3 | 4 => // lineal: length-weighted midpoints (planar length)
      var w = 0.0; var sx = 0.0; var sy = 0.0
      var r = 0
      while (r < ringOff.length - 1) {
        var i = ringOff(r)
        while (i < ringOff(r + 1) - 1) {
          val x1 = coords(posOff(i)); val y1 = coords(posOff(i) + 1)
          val x2 = coords(posOff(i + 1)); val y2 = coords(posOff(i + 1) + 1)
          val len = math.hypot(x2 - x1, y2 - y1)
          w += len; sx += len * (x1 + x2) / 2; sy += len * (y1 + y2) / 2
          i += 1
        }
        r += 1
      }
      if (w == 0) (coords(posOff(0)), coords(posOff(0) + 1)) else (sx / w, sy / w)
    case 5 | 6 => // areal: shell-positive / hole-negative weighting
      var w = 0.0; var sx = 0.0; var sy = 0.0
      var p = 0
      while (p < partOff.length - 1) {
        var r = partOff(p)
        while (r < partOff(p + 1)) {
          val (cx, cy, a) = ringCentroid(coords, posOff, ringOff(r), ringOff(r + 1))
          val s = if (r == partOff(p)) a else -a
          w += s; sx += s * cx; sy += s * cy
          r += 1
        }
        p += 1
      }
      if (w == 0) (coords(posOff(0)), coords(posOff(0) + 1)) else (sx / w, sy / w)
    case _ => (coords(posOff(0)), coords(posOff(0) + 1))
  }

  /** Signed spherical line integral R² ∮ sin(φ) dλ of ring [start, end),
    * with edges LINEAR IN (lng, lat) — the same edge model as
    * [[pointInRings]]/[[contains]], so "the area of what st_contains
    * considers inside". For an edge (λ1,φ1)→(λ2,φ2) the exact integral is
    *   (λ2−λ1) · sin((φ1+φ2)/2) · sinc((φ2−φ1)/2)
    * (from cos φ1 − cos φ2 = 2 sin((φ1+φ2)/2) sin((φ2−φ1)/2) — cancellation-
    * free as φ2 → φ1, where it degenerates to the constant-latitude strip
    * (λ2−λ1)·sin φ). Longitudes are unwrapped cumulatively (antimeridian).
    * Exactly R²·Δλ·(sin φn − sin φs) for axis-aligned boxes (the spherical
    * zone), and invariant under vertex densification — the discrete
    * Chamberlain-Duquette trapezoid formula is neither. Rings with NET
    * longitude winding (pole-enclosing) → NaN: the linear-edge model has no
    * inside convention for them (spec-pinned). */
  private def ringAreaM2(coords: Array[Double], posOff: Array[Int], start: Int, end: Int): Double = {
    val n = end - start
    if (n < 3) return 0.0
    var sum  = 0.0
    var lam1 = math.toRadians(coords(posOff(start)))
    var phi1 = math.toRadians(coords(posOff(start) + 1))
    val lam0 = lam1
    val phi0 = phi1
    var i = 1
    while (i <= n) {
      var lam2 = 0.0; var phi2 = 0.0
      if (i < n) {
        // unwrap: shift λ2 to within 180° of λ1
        var raw = math.toRadians(coords(posOff(start + i)))
        var d   = raw - lam1
        while (d > math.Pi) { raw -= 2 * math.Pi; d = raw - lam1 }
        while (d < -math.Pi) { raw += 2 * math.Pi; d = raw - lam1 }
        lam2 = raw; phi2 = math.toRadians(coords(posOff(start + i) + 1))
      } else {
        // closing edge back to the (unwrap-adjusted) first vertex — a no-op
        // for already-closed GeoJSON rings
        var raw = lam0
        var d   = raw - lam1
        while (d > math.Pi) { raw -= 2 * math.Pi; d = raw - lam1 }
        while (d < -math.Pi) { raw += 2 * math.Pi; d = raw - lam1 }
        lam2 = raw; phi2 = phi0
      }
      val dphi = phi2 - phi1
      val half = dphi / 2.0
      val sinc = if (half == 0.0) 1.0 else math.sin(half) / half
      sum += (lam2 - lam1) * math.sin((phi1 + phi2) / 2.0) * sinc
      lam1 = lam2; phi1 = phi2
      i += 1
    }
    // POLE-ENCLOSING ring: the unwrapped walk ends a non-zero multiple of 2π
    // away from where it started (net longitude winding). The line integral
    // then measures against the equator, not the cap, and the planar edge
    // model itself has no "which side is inside" convention for such rings
    // (st_contains treats them as a degenerate band) — NaN, loudly, instead
    // of a silently ~65x-wrong number.
    if (math.abs(lam1 - lam0) > 1e-9) return Double.NaN
    EarthRadiusM * EarthRadiusM * sum
  }

  /** Geodesic (spherical) polygon area in m²: |shell| − Σ|holes| per part,
    * matching [[area]]'s JTS hole convention; non-areal types → 0. Edges are
    * linear in degree space (see [[ringAreaM2]]); the spherical-excess error
    * of treating the reference ellipsoid as a sphere is ≤ ~0.5%. */
  def areaM2(gtype: Int, coords: Array[Double], posOff: Array[Int],
             ringOff: Array[Int], partOff: Array[Int]): Double = gtype match {
    case 5 | 6 =>
      var total = 0.0
      var p = 0
      while (p < partOff.length - 1) {
        var r = partOff(p)
        while (r < partOff(p + 1)) {
          val a = math.abs(ringAreaM2(coords, posOff, ringOff(r), ringOff(r + 1)))
          total += (if (r == partOff(p)) a else -a)
          r += 1
        }
        p += 1
      }
      total
    case _ => 0.0
  }

  /** Great-circle path length in metres: sum of haversine segments of every
    * line/ring (for polygons this is the perimeter). Points → 0. */
  def lengthMeters(gtype: Int, coords: Array[Double], posOff: Array[Int],
                   ringOff: Array[Int]): Double = {
    if (gtype == 1 || gtype == 2) return 0.0
    var total = 0.0
    var r = 0
    while (r < ringOff.length - 1) {
      var i = ringOff(r)
      while (i < ringOff(r + 1) - 1) {
        total += haversine(coords(posOff(i)), coords(posOff(i) + 1),
          coords(posOff(i + 1)), coords(posOff(i + 1) + 1))
        i += 1
      }
      r += 1
    }
    total
  }

  // ----------------------------------------------------------- convex hull

  /** Convex hull of a point set (Andrew's monotone chain): returns the hull
    * vertices in CCW order starting at the lexicographically smallest
    * (x, y), UNCLOSED, with collinear boundary points dropped (the minimal
    * hull, JTS's convention). Fewer than 3 non-collinear distinct points →
    * empty array (no areal hull exists). O(n log n). */
  def convexHull(pts: Array[(Double, Double)]): Array[(Double, Double)] = {
    val sorted = pts.distinct.sortBy(identity)
    val n = sorted.length
    if (n < 3) return Array.empty
    @inline def cross(o: (Double, Double), a: (Double, Double), b: (Double, Double)): Double =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    val hull = new Array[(Double, Double)](2 * n)
    var k = 0
    var i = 0
    while (i < n) { // lower hull
      while (k >= 2 && cross(hull(k - 2), hull(k - 1), sorted(i)) <= 0) k -= 1
      hull(k) = sorted(i); k += 1
      i += 1
    }
    val lower = k + 1
    i = n - 2
    while (i >= 0) { // upper hull
      while (k >= lower && cross(hull(k - 2), hull(k - 1), sorted(i)) <= 0) k -= 1
      hull(k) = sorted(i); k += 1
      i -= 1
    }
    // k-1 vertices (last == first); degenerate all-collinear input gives 2
    if (k - 1 < 3) Array.empty
    else java.util.Arrays.copyOfRange(hull, 0, k - 1)
  }

  // -------------------------------------------------------------- simplify

  /** Douglas-Peucker simplification of positions [start, end) (indices into
    * posOff space) with `keep(i)` marking survivors: recursively keeps the
    * point farthest from the chord while its distance exceeds `tol`
    * (degrees). Endpoints always survive. Iterative stack — no recursion
    * depth limit on adversarial inputs. */
  private def dpMark(coords: Array[Double], posOff: Array[Int],
                     start: Int, end: Int, tol: Double, keep: Array[Boolean]): Unit = {
    keep(start) = true; keep(end - 1) = true
    if (end - start <= 2) return
    val stack = new java.util.ArrayDeque[(Int, Int)]()
    stack.push((start, end - 1))
    while (!stack.isEmpty) {
      val (a, b) = stack.pop()
      if (b - a >= 2) {
        val ax = coords(posOff(a)); val ay = coords(posOff(a) + 1)
        val bx = coords(posOff(b)); val by = coords(posOff(b) + 1)
        var best = -1.0
        var bestI = -1
        var i = a + 1
        while (i < b) {
          val d = pointSegmentDistance(coords(posOff(i)), coords(posOff(i) + 1), ax, ay, bx, by)
          if (d > best) { best = d; bestI = i }
          i += 1
        }
        if (best > tol) {
          keep(bestI) = true
          stack.push((a, bestI))
          stack.push((bestI, b))
        }
      }
    }
  }

  /** Simplify a packed geometry with Douglas-Peucker at `tol` degrees,
    * returning new (coords, posOff, ringOff, partOff). Lineal types simplify
    * each path (endpoints pinned); polygon rings simplify the CLOSED ring
    * with the first vertex pinned and fall back to the original ring when
    * fewer than 4 positions would survive (a degenerate ring is worse than
    * an unsimplified one — the JTS ensureValid discipline). Point types pass
    * through. Guarantee (spec-pinned): every dropped vertex lies within
    * `tol` of the simplified chain; survivors are a subset of the original
    * vertices in order. */
  def simplify(gtype: Int, coords: Array[Double], posOff: Array[Int],
               ringOff: Array[Int], partOff: Array[Int],
               tol: Double): (Array[Double], Array[Int], Array[Int], Array[Int]) = {
    val nPos = posOff.length - 1
    val keep = new Array[Boolean](nPos)
    val areal  = gtype == 5 || gtype == 6
    val lineal = gtype == 3 || gtype == 4
    if (!areal && !lineal) {
      java.util.Arrays.fill(keep, true)
    } else {
      var r = 0
      while (r < ringOff.length - 1) {
        val s = ringOff(r); val e = ringOff(r + 1)
        dpMark(coords, posOff, s, e, tol, keep)
        if (areal) {
          // closed ring: if the explicit closing vertex survived trivially,
          // fewer than 4 kept positions means a collapsed ring — keep it all
          var kept = 0
          var i = s
          while (i < e) { if (keep(i)) kept += 1; i += 1 }
          if (kept < 4) { i = s; while (i < e) { keep(i) = true; i += 1 } }
        }
        r += 1
      }
    }
    // rebuild the packed arrays from the survivor mask; partOff is
    // RING-indexed and the ring count is unchanged, so it passes through
    val outCoords = Array.newBuilder[Double]
    val outPos    = Array.newBuilder[Int]
    val outRing   = Array.newBuilder[Int]
    var ci = 0; var pi = 0
    var r = 0
    while (r < ringOff.length - 1) {
      outRing += pi
      var i = ringOff(r)
      while (i < ringOff(r + 1)) {
        if (keep(i)) {
          outPos += ci
          val cs = posOff(i); val ce = posOff(i + 1)
          var c = cs
          while (c < ce) { outCoords += coords(c); c += 1 }
          ci += ce - cs
          pi += 1
        }
        i += 1
      }
      r += 1
    }
    outPos += ci
    outRing += pi
    (outCoords.result(), outPos.result(), outRing.result(), partOff.clone())
  }

  // ------------------------------------------------------------------ bbox

  /** (west, south, east, north) over all positions. Antimeridian-crossing
    * geometries get the UNWRAPPED box (east may exceed 180 / west go below
    * -180) when `unwrap` finds consecutive deltas > 180 within a ring; the
    * cover code splits it back into wrapped intervals.
    */
  def bbox(coords: Array[Double], posOff: Array[Int]): Array[Double] = {
    var w = Double.PositiveInfinity; var s = Double.PositiveInfinity
    var e = Double.NegativeInfinity; var n = Double.NegativeInfinity
    var i = 0
    val nPos = posOff.length - 1
    while (i < nPos) {
      val x = coords(posOff(i)); val y = coords(posOff(i) + 1)
      if (x < w) w = x; if (x > e) e = x
      if (y < s) s = y; if (y > n) n = y
      i += 1
    }
    Array(w, s, e, n)
  }

  /** Per-ring lat/lng boxes with antimeridian handling, for index covers.
    * Each ring is longitude-unwrapped (consecutive deltas <= 180), its box
    * computed in unwrapped space, then split back into 1-2 in-range
    * [w, s, e, n] boxes. Union of per-ring boxes bounds the filled geometry
    * (a ring's box equals its filled box). Sound and tight for
    * antimeridian-crossing rings where the naive box would span the world.
    */
  def ringWrappedBoxes(coords: Array[Double], posOff: Array[Int], ringOff: Array[Int]): Array[Array[Double]] = {
    val out = Array.newBuilder[Array[Double]]
    var r = 0
    while (r < ringOff.length - 1) {
      val start = ringOff(r); val end = ringOff(r + 1)
      var cur  = coords(posOff(start))
      var wU   = cur; var eU = cur
      var s    = coords(posOff(start) + 1); var n = s
      var i = start + 1
      while (i < end) {
        val raw = coords(posOff(i))
        var delta = raw - cur
        while (delta > 180) delta -= 360
        while (delta < -180) delta += 360
        cur += delta
        if (cur < wU) wU = cur; if (cur > eU) eU = cur
        val y = coords(posOff(i) + 1)
        if (y < s) s = y; if (y > n) n = y
        i += 1
      }
      if (eU - wU >= 360.0) out += Array(-180.0, s, 180.0, n)
      else {
        // normalize the unwrapped interval into [-180, 180], splitting on wrap
        var w2 = wU; var e2 = eU
        while (w2 > 180) { w2 -= 360; e2 -= 360 }
        while (e2 < -180) { w2 += 360; e2 += 360 }
        if (e2 > 180 && w2 < -180) out += Array(-180.0, s, 180.0, n)
        else if (e2 > 180) { out += Array(w2, s, 180.0, n); out += Array(-180.0, s, e2 - 360.0, n) }
        else if (w2 < -180) { out += Array(w2 + 360.0, s, 180.0, n); out += Array(-180.0, s, e2, n) }
        else out += Array(w2, s, e2, n)
      }
      r += 1
    }
    out.result()
  }

  // --------------------------------------------------------- web mercator

  /** Slippy-map ZXY tile for (lng, lat) at zoom z. Lat clamped to the Web-
    * Mercator domain. Returns (x, y).
    */
  def tileXY(lng: Double, lat: Double, z: Int): (Long, Long) = {
    val nTiles = 1L << z
    var xt = math.floor((lng + 180.0) / 360.0 * nTiles).toLong
    val latC = math.max(-85.05112878, math.min(85.05112878, lat))
    val latR = math.toRadians(latC)
    var yt = math.floor((1.0 - math.log(math.tan(latR) + 1.0 / math.cos(latR)) / math.Pi) / 2.0 * nTiles).toLong
    if (xt < 0) xt = 0; if (xt >= nTiles) xt = nTiles - 1
    if (yt < 0) yt = 0; if (yt >= nTiles) yt = nTiles - 1
    (xt, yt)
  }

  /** tileXY + packTile in one call (codegen kernel of tile_key). */
  def tileKeyPacked(lng: Double, lat: Double, z: Int): Long = {
    val (x, y) = tileXY(lng, lat, z)
    packTile(z, x, y)
  }

  /** Pack (z, x, y) into one int64 tile key: [z:6][x:29][y:29]. */
  def packTile(z: Int, x: Long, y: Long): Long =
    (z.toLong << 58) | (x << 29) | y
  def tileZ(key: Long): Int  = (key >>> 58).toInt
  def tileX(key: Long): Long = (key >>> 29) & ((1L << 29) - 1)
  def tileY(key: Long): Long = key & ((1L << 29) - 1)
}
