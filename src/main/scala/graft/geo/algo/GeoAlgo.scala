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
  private[algo] def unwrapParts(c: Array[Double], p: Array[Int], r: Array[Int],
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

  // -------------------------------------------------------------- box clip

  /** A clipped geometry in packed array form (the GeoStruct layout);
    * `gtype` can differ from the input's — a LineString split by the box
    * exits as MultiLineString, a Polygon split across the antimeridian as
    * MultiPolygon. */
  final case class Clipped(gtype: Int, coords: Array[Double], posOff: Array[Int],
                           ringOff: Array[Int], partOff: Array[Int])

  /** One finished ring/path: flat coords + RELATIVE position offsets. */
  private final class RingOut(val coords: Array[Double], val pos: Array[Int])

  // growable parallel position arrays; z = NaN marks a 2D position (NaN
  // interpolation naturally demotes a mixed-dims crossing to 2D)
  private final class PtBuf {
    var xs = new Array[Double](16); var ys = new Array[Double](16)
    var zs = new Array[Double](16); var n = 0
    def add(x: Double, y: Double, z: Double): Unit = {
      if (n == xs.length) {
        xs = java.util.Arrays.copyOf(xs, n * 2)
        ys = java.util.Arrays.copyOf(ys, n * 2)
        zs = java.util.Arrays.copyOf(zs, n * 2)
      }
      xs(n) = x; ys(n) = y; zs(n) = z; n += 1
    }
    /** drop exact consecutive (x, y) duplicates, including the wrap pair */
    def dedupe(): PtBuf = {
      val out = new PtBuf
      var i = 0
      while (i < n) {
        if (out.n == 0 || out.xs(out.n - 1) != xs(i) || out.ys(out.n - 1) != ys(i))
          out.add(xs(i), ys(i), zs(i))
        i += 1
      }
      while (out.n > 1 && out.xs(0) == out.xs(out.n - 1) && out.ys(0) == out.ys(out.n - 1))
        out.n -= 1
      out
    }
    def signedArea2(): Double = { // 2x shoelace over the OPEN ring
      var a = 0.0
      var i = 0
      while (i < n) {
        val j = (i + 1) % n
        a += xs(i) * ys(j) - xs(j) * ys(i)
        i += 1
      }
      a
    }
  }

  /** One Sutherland–Hodgman half-plane pass over an OPEN ring. axis 0 = x,
    * 1 = y; keepGE keeps coord >= bound, else coord <= bound (inclusive —
    * boundary points survive). The CLIPPED coordinate of a synthesized
    * crossing is set to `bound` EXACTLY (never re-derived through the
    * parameter), so axis-aligned inputs clip to exact interval arithmetic —
    * the q62 closed-form oracle depends on this. */
  private def shPass(in: PtBuf, axis: Int, bound: Double, keepGE: Boolean): PtBuf = {
    val out = new PtBuf
    val n = in.n
    if (n == 0) return out
    @inline def coord(i: Int) = if (axis == 0) in.xs(i) else in.ys(i)
    @inline def inside(i: Int) = if (keepGE) coord(i) >= bound else coord(i) <= bound
    @inline def cross(i: Int, j: Int): Unit = {
      val t = (bound - coord(i)) / (coord(j) - coord(i))
      val x = if (axis == 0) bound else in.xs(i) + t * (in.xs(j) - in.xs(i))
      val y = if (axis == 1) bound else in.ys(i) + t * (in.ys(j) - in.ys(i))
      out.add(x, y, in.zs(i) + t * (in.zs(j) - in.zs(i)))
    }
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      val ii = inside(i); val ij = inside(j)
      if (ij) { if (!ii) cross(i, j); out.add(in.xs(j), in.ys(j), in.zs(j)) }
      else if (ii) cross(i, j)
      i += 1
    }
    out
  }

  /** Clip one CLOSED packed ring against the (possibly shifted) box with
    * Sutherland–Hodgman; returns the closed output ring with `shift`
    * removed from its longitudes, or null when the clip is empty or
    * degenerate (fewer than 3 distinct positions, or exactly zero area —
    * boundary-touch slivers). */
  private def clipRingSH(ux: Array[Double], posOff: Array[Int], rs: Int, re: Int,
                         w: Double, s: Double, e: Double, n: Double,
                         shift: Double): RingOut = {
    val in = new PtBuf
    var i = rs
    val open = re - 1 // drop the closing duplicate vertex
    while (i < open) {
      val c0 = posOff(i); val dims = posOff(i + 1) - c0
      in.add(ux(c0), ux(c0 + 1), if (dims > 2) ux(c0 + 2) else Double.NaN)
      i += 1
    }
    var cur = in
    cur = shPass(cur, 0, w + shift, keepGE = true)
    cur = shPass(cur, 0, e + shift, keepGE = false)
    cur = shPass(cur, 1, s, keepGE = true)
    cur = shPass(cur, 1, n, keepGE = false)
    val d = stripSpurs(cur.dedupe())
    if (d.n < 3 || d.signedArea2() == 0.0) return null
    closeRing(d, shift)
  }

  /** Remove REVERSAL vertices — B exactly collinear with its ring neighbors
    * A, C with the path direction reversing at B (edges AB and BC overlap).
    * These are the zero-width spurs Sutherland–Hodgman leaves along clip
    * boundaries when a concave subject dips out of the window and back
    * (crossings are PINNED to the boundary, so the collinearity is exact):
    * the covered region and area are unchanged, but the output bbox
    * tightens to the true geometry. Runs to a fixpoint (a removed spike can
    * expose another). Bridge edges CONNECTING two real pieces survive — no
    * single vertex of a bridge is a reversal — and stay documented SH
    * behavior. */
  private def stripSpurs(in: PtBuf): PtBuf = {
    var cur = in
    var again = true
    while (again && cur.n >= 3) {
      again = false
      var drop = -1
      var i = 0
      while (i < cur.n && drop < 0) {
        val p = (i + cur.n - 1) % cur.n
        val q = (i + 1) % cur.n
        val abx = cur.xs(i) - cur.xs(p); val aby = cur.ys(i) - cur.ys(p)
        val bcx = cur.xs(q) - cur.xs(i); val bcy = cur.ys(q) - cur.ys(i)
        if (abx * bcy - aby * bcx == 0.0 && abx * bcx + aby * bcy < 0.0) drop = i
        i += 1
      }
      if (drop >= 0) {
        val out = new PtBuf
        var k = 0
        while (k < cur.n) {
          if (k != drop) out.add(cur.xs(k), cur.ys(k), cur.zs(k))
          k += 1
        }
        cur = out.dedupe() // an A,B,A spike leaves a consecutive duplicate
        again = true
      }
    }
    cur
  }

  /** Close and pack one clipped ring buffer, removing `shift` from
    * longitudes. */
  private def closeRing(d: PtBuf, shift: Double): RingOut = {
    val coords = Array.newBuilder[Double]
    val pos    = new Array[Int](d.n + 2)
    var ci = 0
    var k = 0
    while (k <= d.n) { // <= : re-close the ring
      val p = k % d.n
      pos(k) = ci
      coords += d.xs(p) - shift; coords += d.ys(p); ci += 2
      if (!d.zs(p).isNaN) { coords += d.zs(p); ci += 1 }
      k += 1
    }
    pos(d.n + 1) = ci
    new RingOut(coords.result(), pos)
  }

  /** Pack one open clipped path buffer (>= 2 positions), removing `shift`
    * from longitudes. */
  private def openPath(path: PtBuf, shift: Double): RingOut = {
    val coords = Array.newBuilder[Double]
    val pos    = new Array[Int](path.n + 1)
    var ci = 0
    var k = 0
    while (k < path.n) {
      pos(k) = ci
      coords += path.xs(k) - shift; coords += path.ys(k); ci += 2
      if (!path.zs(k).isNaN) { coords += path.zs(k); ci += 1 }
      k += 1
    }
    pos(path.n) = ci
    new RingOut(coords.result(), pos)
  }

  /** Liang–Barsky clip of one packed PATH against the shifted box: clipped
    * sub-segments stitch into maximal runs; returns the open output paths
    * (each >= 2 positions) with `shift` removed from longitudes. */
  private def clipPathLB(ux: Array[Double], posOff: Array[Int], rs: Int, re: Int,
                         w: Double, s: Double, e: Double, n: Double,
                         shift: Double): Seq[RingOut] = {
    val paths = Seq.newBuilder[RingOut]
    var path: PtBuf = null
    def flush(): Unit = {
      if (path != null && path.n >= 2) paths += openPath(path, shift)
      path = null
    }
    val wS = w + shift; val eS = e + shift
    var i = rs
    while (i < re - 1) {
      val c0 = posOff(i); val d0 = posOff(i + 1) - c0
      val c1 = posOff(i + 1); val d1 = posOff(i + 2) - c1
      val px = ux(c0); val py = ux(c0 + 1)
      val pz = if (d0 > 2) ux(c0 + 2) else Double.NaN
      val qx = ux(c1); val qy = ux(c1 + 1)
      val qz = if (d1 > 2) ux(c1 + 2) else Double.NaN
      val dx = qx - px; val dy = qy - py
      var t0 = 0.0; var t1 = 1.0
      var ok = !(px == qx && py == qy) // skip zero-length input segments
      @inline def edge(p: Double, q: Double): Unit = if (ok) {
        if (p == 0.0) { if (q < 0.0) ok = false }
        else {
          val t = q / p
          if (p < 0.0) { if (t > t0) t0 = t }
          else { if (t < t1) t1 = t }
          if (t0 > t1) ok = false
        }
      }
      edge(-dx, px - wS); edge(dx, eS - px)
      edge(-dy, py - s); edge(dy, n - py)
      if (ok && t0 < t1) {
        val ax = if (t0 == 0.0) px else px + t0 * dx
        val ay = if (t0 == 0.0) py else py + t0 * dy
        val az = if (t0 == 0.0) pz else pz + t0 * (qz - pz)
        val bx = if (t1 == 1.0) qx else px + t1 * dx
        val by = if (t1 == 1.0) qy else py + t1 * dy
        val bz = if (t1 == 1.0) qz else pz + t1 * (qz - pz)
        if (!(ax == bx && ay == by)) {
          if (path == null || path.xs(path.n - 1) != ax || path.ys(path.n - 1) != ay) {
            flush()
            path = new PtBuf
            path.add(ax, ay, az)
          }
          path.add(bx, by, bz)
        }
      } else if (path != null) flush()
      i += 1
    }
    flush()
    paths.result()
  }

  private val clipShifts = Array(0.0, 360.0, -360.0)

  /** Clip a packed geometry to the axis-aligned box [w, e] x [s, n]
    * (inclusive boundary), ANTIMERIDIAN-AWARE: each part is unwrapped to
    * continuous longitudes ([[unwrapParts]]) and clipped against the box
    * and its ±360° translates, so a part straddling ±180 contributes its
    * pieces on both sides with longitudes re-normalized — ZXY-tile clipping
    * carries exact per-tile geometry. Semantics per type:
    *   - (Multi)Point: positions inside the box survive
    *   - (Multi)LineString: Liang–Barsky per segment, contiguous runs
    *     stitched; a split path exits as MultiLineString
    *   - (Multi)Polygon: Sutherland–Hodgman per ring (holes clipped in
    *     their shell's frame and kept as holes); zero-area results drop.
    *     A CONCAVE polygon whose clip has several pieces comes back as ONE
    *     ring with zero-width bridge edges (the classic SH artifact) —
    *     its area is exact, the bridge edges cancel
    * Returns null for an empty clip, a GeometryCollection input (handled by
    * the expression layer), or an inverted box. The box must not cross the
    * antimeridian — clip twice ([w, 180] and [-180, e]) for that.
    */
  def clipBox(gtype: Int, coords0: Array[Double], posOff: Array[Int],
              ringOff: Array[Int], partOff: Array[Int],
              w: Double, s: Double, e: Double, n: Double): Clipped = {
    if (e < w || n < s) return null
    if (gtype == 1 || gtype == 2) { // Point / MultiPoint
      val kept = Seq.newBuilder[Int]
      var i = 0
      while (i < posOff.length - 1) {
        val x = coords0(posOff(i)); val y = coords0(posOff(i) + 1)
        if (y >= s && y <= n &&
            ((x >= w && x <= e) || (x + 360 >= w && x + 360 <= e) ||
             (x - 360 >= w && x - 360 <= e))) kept += i
        i += 1
      }
      return keptPoints(gtype, coords0, posOff, kept.result())
    }
    if (gtype < 3 || gtype > 6) return null
    val ux = unwrapParts(coords0, posOff, ringOff, partOff)
    val lineal = gtype == 3 || gtype == 4
    // packing convention (GeoStruct.packGeometry): lineal geometries are ONE
    // part whose rings are the paths; MultiPolygon is N parts. Lineal clips
    // therefore collect all paths into a single part; areal clips emit one
    // part per (input part x box translate) piece.
    val parts = Seq.newBuilder[Seq[RingOut]]
    val linealPaths = Seq.newBuilder[RingOut]
    var part = 0
    while (part < partOff.length - 1) {
      val r0 = partOff(part); val r1 = partOff(part + 1)
      var ri = r0
      var si = 0
      while (si < clipShifts.length) {
        val shift = clipShifts(si)
        if (lineal) {
          // each path gates its own translate set on its unwrapped range
          ri = r0
          while (ri < r1) {
            var minX = Double.PositiveInfinity; var maxX = Double.NegativeInfinity
            var i = ringOff(ri)
            while (i < ringOff(ri + 1)) {
              val x = ux(posOff(i))
              if (x < minX) minX = x
              if (x > maxX) maxX = x
              i += 1
            }
            if (maxX >= w + shift && minX <= e + shift)
              linealPaths ++= clipPathLB(ux, posOff, ringOff(ri), ringOff(ri + 1), w, s, e, n, shift)
            ri += 1
          }
        } else {
          // part's unwrapped longitude range gates which translates can hit
          var minX = Double.PositiveInfinity; var maxX = Double.NegativeInfinity
          ri = r0
          while (ri < r1) {
            var i = ringOff(ri)
            while (i < ringOff(ri + 1)) {
              val x = ux(posOff(i))
              if (x < minX) minX = x
              if (x > maxX) maxX = x
              i += 1
            }
            ri += 1
          }
          if (maxX >= w + shift && minX <= e + shift) {
            val shell = clipRingSH(ux, posOff, ringOff(r0), ringOff(r0 + 1), w, s, e, n, shift)
            if (shell != null) {
              val rings = Seq.newBuilder[RingOut]
              rings += shell
              ri = r0 + 1
              while (ri < r1) {
                val hole = clipRingSH(ux, posOff, ringOff(ri), ringOff(ri + 1), w, s, e, n, shift)
                if (hole != null) rings += hole
                ri += 1
              }
              parts += rings.result()
            }
          }
        }
        si += 1
      }
      part += 1
    }
    if (lineal) {
      val paths = linealPaths.result()
      if (paths.nonEmpty) parts += paths
    }
    assembleClipped(gtype, lineal, parts.result())
  }

  /** Subject MINUS box — the set-difference sibling of [[clipBox]] (the
    * missing construction half of redaction/carve-out flows: cut a
    * restricted zone out of a coverage polygon, erase a tile's already-
    * written window). The complement is decomposed into at most FOUR slabs
    * bounded by the subject's own raw bbox — west and east of the box over
    * the full latitude span, then the middle column's south and north
    * slabs — whose interiors partition subject∖box exactly (pieces share
    * boundary LINES only, zero area), and each slab is realized with
    * [[clipBox]], so hole handling, type promotion, and the per-part ±360°
    * translate machinery are inherited. Pieces merge into one geometry
    * ([[mergeClipped]]); a box missing the bbox returns the subject
    * unchanged; a box covering it returns null (Optional semantics, like
    * clipBox's empty output). Boundary semantics: clips are
    * edge-INCLUSIVE, so the erase keeps the box's boundary lines (areal
    * measure zero; a lineal run lying exactly ON an interior slab edge can
    * duplicate across pieces). Points erase by the negated [[clipBox]]
    * point test directly (closed-box complement — boundary points drop).
    * The box must not cross the antimeridian (clipBox's contract);
    * subjects spanning more than 360° minus a slab's width of unwrapped
    * longitude inherit clipBox's wide-window duplicate caveat. */
  def eraseBox(gtype: Int, coords0: Array[Double], posOff: Array[Int],
               ringOff: Array[Int], partOff: Array[Int],
               w: Double, s: Double, e: Double, n: Double): Clipped = {
    if (e < w || n < s) // empty box erases nothing
      return Clipped(gtype, coords0, posOff, ringOff, partOff)
    if (gtype == 1 || gtype == 2) { // Point / MultiPoint: negated box test
      val kept = Seq.newBuilder[Int]
      var i = 0
      while (i < posOff.length - 1) {
        val x = coords0(posOff(i)); val y = coords0(posOff(i) + 1)
        val inBox = y >= s && y <= n &&
          ((x >= w && x <= e) || (x + 360 >= w && x + 360 <= e) ||
           (x - 360 >= w && x - 360 <= e))
        if (!inBox) kept += i
        i += 1
      }
      return keptPoints(gtype, coords0, posOff, kept.result())
    }
    if (gtype < 3 || gtype > 6) return null
    // bbox in the subject's UNWRAPPED frame (a seam-crossing part spans
    // past ±180 in its own frame, where the raw bbox would lie about it)
    val ux = unwrapParts(coords0, posOff, ringOff, partOff)
    var minx = Double.PositiveInfinity; var maxx = Double.NegativeInfinity
    var miny = Double.PositiveInfinity; var maxy = Double.NegativeInfinity
    var i = 0
    while (i < posOff.length - 1) {
      val x = ux(posOff(i)); val y = coords0(posOff(i) + 1)
      if (x < minx) minx = x; if (x > maxx) maxx = x
      if (y < miny) miny = y; if (y > maxy) maxy = y
      i += 1
    }
    // pick the box longitude image overlapping the subject most (a raw
    // [-180,180] box can sit at ±360 relative to an unwrapped east part);
    // a subject whose parts straddle the seam so that TWO box images hit
    // different parts erases only the dominant image — compose two erase
    // calls for the degenerate both-images case
    var bestShift = 0.0; var bestOv = Double.NegativeInfinity
    var k = -1
    while (k <= 1) {
      val ov = math.min(e + 360.0 * k, maxx) - math.max(w + 360.0 * k, minx)
      if (ov > bestOv) { bestOv = ov; bestShift = 360.0 * k }
      k += 1
    }
    val bw = w + bestShift; val be = e + bestShift
    if (bestOv <= 0 || s > maxy || n < miny) // box misses the subject
      return Clipped(gtype, coords0, posOff, ringOff, partOff)
    val lineal = gtype == 3 || gtype == 4
    val pieces = Seq.newBuilder[Clipped]
    // slab bounds extend one degree past the bbox/box union so degenerate
    // bbox spans (a horizontal line, a vertical path) still get full
    // complement slabs; the clip bounds the result to the subject anyway
    val ow = math.min(minx, bw) - 1.0; val oe = math.max(maxx, be) + 1.0
    val os = math.min(miny, s) - 1.0; val on = math.max(maxy, n) + 1.0
    def slab(cw: Double, cs: Double, ce: Double, cn: Double): Unit = {
      val c = clipBox(gtype, coords0, posOff, ringOff, partOff, cw, cs, ce, cn)
      if (c != null) pieces += c
    }
    if (bw > minx) slab(ow, os, bw, on) // west of the box
    if (be < maxx) slab(be, os, oe, on) // east of the box
    if (s > miny)  slab(bw, os, be, s)  // middle column, south of the box
    if (n < maxy)  slab(bw, n, be, on)  // middle column, north of the box
    mergeClipped(gtype, lineal, pieces.result())
  }

  /** Concatenate several [[Clipped]] pieces of one subject into a single
    * packed geometry: areal pieces contribute their parts; lineal pieces
    * collapse into ONE part whose rings are all the paths (the
    * GeoStruct.packGeometry lineal convention). Type promotion matches
    * [[assembleClipped]]. */
  private def mergeClipped(origType: Int, lineal: Boolean, pieces: Seq[Clipped]): Clipped = {
    if (pieces.isEmpty) return null
    val nPos   = pieces.iterator.map(_.posOff.length - 1).sum
    val nRings = pieces.iterator.map(_.ringOff.length - 1).sum
    val nParts = if (lineal) 1 else pieces.iterator.map(_.partOff.length - 1).sum
    val coords = Array.newBuilder[Double]
    val pos    = new Array[Int](nPos + 1)
    val ring   = new Array[Int](nRings + 1)
    val partO  = new Array[Int](nParts + 1)
    var ci = 0; var pi = 0; var ri = 0; var gi = 0
    pieces.foreach { c =>
      var part = 0
      while (part < c.partOff.length - 1) {
        if (!lineal) { partO(gi) = ri; gi += 1 }
        var r = c.partOff(part)
        while (r < c.partOff(part + 1)) {
          ring(ri) = pi; ri += 1
          var p = c.ringOff(r)
          while (p < c.ringOff(r + 1)) { pos(pi) = ci + c.posOff(p); pi += 1; p += 1 }
          r += 1
        }
        part += 1
      }
      coords ++= c.coords
      ci += c.coords.length
    }
    if (lineal) partO(0) = 0
    partO(nParts) = ri
    ring(nRings) = pi
    pos(nPos) = ci
    val outType =
      if (lineal) { if (origType == 3 && nRings == 1) 3 else 4 }
      else { if (origType == 5 && nParts == 1) 5 else 6 }
    Clipped(outType, coords.result(), pos, ring, partO)
  }

  /** Pack kept point indices into a [[Clipped]] (Point/MultiPoint clips). */
  private def keptPoints(gtype: Int, coords0: Array[Double], posOff: Array[Int],
                         ks: Seq[Int]): Clipped = {
    if (ks.isEmpty) return null
    val coords = Array.newBuilder[Double]
    val pos    = new Array[Int](ks.length + 1)
    var ci = 0
    ks.zipWithIndex.foreach { case (p, k) =>
      pos(k) = ci
      var c = posOff(p)
      while (c < posOff(p + 1)) { coords += coords0(c); c += 1 }
      ci += posOff(p + 1) - posOff(p)
    }
    pos(ks.length) = ci
    Clipped(gtype, coords.result(), pos, Array(0, ks.length), Array(0, 1))
  }

  /** Pack clipped parts into one [[Clipped]] with type promotion (a split
    * LineString exits as MultiLineString, a split Polygon as MultiPolygon). */
  private def assembleClipped(gtype: Int, lineal: Boolean, ps: Seq[Seq[RingOut]]): Clipped = {
    if (ps.isEmpty) return null
    val outType =
      if (lineal) { if (gtype == 3 && ps.head.length == 1) 3 else 4 }
      else { if (gtype == 5 && ps.length == 1) 5 else 6 }
    // assemble packed arrays
    val nRings = ps.map(_.length).sum
    val nPos   = ps.iterator.flatten.map(_.pos.length - 1).sum
    val coords = Array.newBuilder[Double]
    val pos    = new Array[Int](nPos + 1)
    val ring   = new Array[Int](nRings + 1)
    val partO  = new Array[Int](ps.length + 1)
    var pi = 0; var ri2 = 0; var ci = 0
    ps.zipWithIndex.foreach { case (rings, pIdx) =>
      partO(pIdx) = ri2
      rings.foreach { r =>
        ring(ri2) = pi; ri2 += 1
        var k = 0
        while (k < r.pos.length - 1) {
          pos(pi) = ci + r.pos(k); pi += 1
          k += 1
        }
        coords ++= r.coords
        ci += r.coords.length
      }
    }
    partO(ps.length) = ri2
    ring(nRings) = pi
    pos(nPos) = ci
    Clipped(outType, coords.result(), pos, ring, partO)
  }

  // ------------------------------------------------ convex-polygon clipping

  /** Extract the clip shell of `st_clip_convex`'s clip argument from a
    * packed geometry: the OPEN, CCW-oriented, consecutive-duplicate-free
    * vertex cycle `(xs, ys)`. Throws (a loud ANSI-style failure, never a
    * silently-wrong clip) when the geometry is not a hole-free Polygon, is
    * degenerate (zero area), or is not convex — Sutherland–Hodgman computes
    * the true intersection only for convex clips. Collinear vertices are
    * tolerated; either input winding is accepted. */
  def convexShell(gtype: Int, coords: Array[Double], posOff: Array[Int],
                  ringOff: Array[Int], partOff: Array[Int]): (Array[Double], Array[Double]) = {
    require(gtype == 5, s"st_clip_convex: clip geometry must be a Polygon (got gtype $gtype)")
    require(ringOff.length == 2, "st_clip_convex: clip polygon must not have holes")
    val buf = new PtBuf
    var i = ringOff(0)
    while (i < ringOff(1) - 1) { // drop the closing duplicate vertex
      val c0 = posOff(i)
      buf.add(coords(c0), coords(c0 + 1), Double.NaN)
      i += 1
    }
    val d = buf.dedupe()
    require(d.n >= 3 && d.signedArea2() != 0.0, "st_clip_convex: clip polygon is degenerate")
    val m   = d.n
    val ccw = d.signedArea2() > 0.0
    val xs = new Array[Double](m); val ys = new Array[Double](m)
    var k = 0
    while (k < m) {
      val src = if (ccw) k else m - 1 - k
      xs(k) = d.xs(src); ys(k) = d.ys(src)
      k += 1
    }
    k = 0
    while (k < m) {
      val x0 = xs(k); val y0 = ys(k)
      val x1 = xs((k + 1) % m); val y1 = ys((k + 1) % m)
      val x2 = xs((k + 2) % m); val y2 = ys((k + 2) % m)
      require((x1 - x0) * (y2 - y1) - (y1 - y0) * (x2 - x1) >= 0.0,
        "st_clip_convex: clip polygon is not convex")
      k += 1
    }
    (xs, ys)
  }

  /** One Sutherland–Hodgman pass against the DIRECTED clip edge
    * (ax,ay)→(bx,by) of a CCW clip ring: keeps the closed half-plane to the
    * edge's LEFT (cross(b−a, p−a) >= 0 — boundary points survive, matching
    * [[shPass]]'s inclusive bounds). Crossings on an AXIS-ALIGNED edge
    * compute t from the raw coordinates and pin the constrained coordinate
    * to the edge EXACTLY, so a rectangle expressed as a convex clip ring
    * reproduces [[shPass]]'s interval arithmetic (identical t expression;
    * the inside test's cross product is the coordinate difference times a
    * nonzero constant — sign-exact in IEEE). */
  private def shPassEdge(in: PtBuf, ax: Double, ay: Double, bx: Double, by: Double): PtBuf = {
    val out = new PtBuf
    val n = in.n
    if (n == 0) return out
    val ex = bx - ax; val ey = by - ay
    @inline def side(i: Int): Double = ex * (in.ys(i) - ay) - ey * (in.xs(i) - ax)
    @inline def cross(i: Int, j: Int): Unit = {
      var t = 0.0; var x = 0.0; var y = 0.0
      if (ex == 0.0) {        // vertical edge: pin x = ax
        t = (ax - in.xs(i)) / (in.xs(j) - in.xs(i))
        x = ax; y = in.ys(i) + t * (in.ys(j) - in.ys(i))
      } else if (ey == 0.0) { // horizontal edge: pin y = ay
        t = (ay - in.ys(i)) / (in.ys(j) - in.ys(i))
        y = ay; x = in.xs(i) + t * (in.xs(j) - in.xs(i))
      } else {
        val di = side(i); val dj = side(j)
        t = di / (di - dj)
        x = in.xs(i) + t * (in.xs(j) - in.xs(i))
        y = in.ys(i) + t * (in.ys(j) - in.ys(i))
      }
      out.add(x, y, in.zs(i) + t * (in.zs(j) - in.zs(i)))
    }
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      val ii = side(i) >= 0.0; val ij = side(j) >= 0.0
      if (ij) { if (!ii) cross(i, j); out.add(in.xs(j), in.ys(j), in.zs(j)) }
      else if (ii) cross(i, j)
      i += 1
    }
    out
  }

  /** Clip one CLOSED packed ring against the convex clip shell shifted by
    * `shift` degrees of longitude; null when the clip is empty or
    * degenerate (same contract as [[clipRingSH]]). */
  private def clipRingConvex(ux: Array[Double], posOff: Array[Int], rs: Int, re: Int,
                             cxs: Array[Double], cys: Array[Double],
                             shift: Double): RingOut = {
    val in = new PtBuf
    var i = rs
    val open = re - 1 // drop the closing duplicate vertex
    while (i < open) {
      val c0 = posOff(i); val dims = posOff(i + 1) - c0
      in.add(ux(c0), ux(c0 + 1), if (dims > 2) ux(c0 + 2) else Double.NaN)
      i += 1
    }
    var cur = in
    val m = cxs.length
    var k = 0
    while (k < m && cur.n > 0) {
      cur = shPassEdge(cur, cxs(k) + shift, cys(k),
        cxs((k + 1) % m) + shift, cys((k + 1) % m))
      k += 1
    }
    val d = stripSpurs(cur.dedupe())
    if (d.n < 3 || d.signedArea2() == 0.0) null else closeRing(d, shift)
  }

  /** Cyrus–Beck clip of one packed PATH against the shifted convex shell —
    * the [[clipPathLB]] shape with per-edge parametric half-plane tests;
    * clipped sub-segments stitch into maximal runs. */
  private def clipPathCB(ux: Array[Double], posOff: Array[Int], rs: Int, re: Int,
                         cxs: Array[Double], cys: Array[Double],
                         shift: Double): Seq[RingOut] = {
    val paths = Seq.newBuilder[RingOut]
    var path: PtBuf = null
    def flush(): Unit = {
      if (path != null && path.n >= 2) paths += openPath(path, shift)
      path = null
    }
    val m = cxs.length
    var i = rs
    while (i < re - 1) {
      val c0 = posOff(i); val d0 = posOff(i + 1) - c0
      val c1 = posOff(i + 1); val d1 = posOff(i + 2) - c1
      val px = ux(c0); val py = ux(c0 + 1)
      val pz = if (d0 > 2) ux(c0 + 2) else Double.NaN
      val qx = ux(c1); val qy = ux(c1 + 1)
      val qz = if (d1 > 2) ux(c1 + 2) else Double.NaN
      var t0 = 0.0; var t1 = 1.0
      var ok = !(px == qx && py == qy) // skip zero-length input segments
      var k = 0
      while (k < m && ok) {
        val ax = cxs(k) + shift;           val ay = cys(k)
        val bx = cxs((k + 1) % m) + shift; val by = cys((k + 1) % m)
        val ex = bx - ax; val ey = by - ay
        val fp = ex * (py - ay) - ey * (px - ax) // signed side, >= 0 inside
        val fq = ex * (qy - ay) - ey * (qx - ax)
        if (fq == fp) { if (fp < 0.0) ok = false }
        else {
          val t = fp / (fp - fq) // f(t) = 0 along the segment
          if (fq < fp) { if (t < t1) t1 = t } // f decreasing: need t <= root
          else { if (t > t0) t0 = t }         // f increasing: need t >= root
          if (t0 > t1) ok = false
        }
        k += 1
      }
      if (ok && t0 < t1) {
        val dx = qx - px; val dy = qy - py
        val ax = if (t0 == 0.0) px else px + t0 * dx
        val ay = if (t0 == 0.0) py else py + t0 * dy
        val az = if (t0 == 0.0) pz else pz + t0 * (qz - pz)
        val bx = if (t1 == 1.0) qx else px + t1 * dx
        val by = if (t1 == 1.0) qy else py + t1 * dy
        val bz = if (t1 == 1.0) qz else pz + t1 * (qz - pz)
        if (!(ax == bx && ay == by)) {
          if (path == null || path.xs(path.n - 1) != ax || path.ys(path.n - 1) != ay) {
            flush()
            path = new PtBuf
            path.add(ax, ay, az)
          }
          path.add(bx, by, bz)
        }
      } else if (path != null) flush()
      i += 1
    }
    flush()
    paths.result()
  }

  /** Clip a packed geometry against an arbitrary CONVEX clip polygon
    * (`cxs`/`cys`: the open CCW shell from [[convexShell]]) — the general-
    * polygon sibling of [[clipBox]]: Sutherland–Hodgman per areal ring
    * (holes clipped in their shell's frame), Cyrus–Beck per lineal segment
    * with run stitching, half-plane point filtering. ANTIMERIDIAN-AWARE on
    * the subject side via the per-part unwrap + the clip ring's ±360°
    * translates; the clip polygon itself must not cross the antimeridian
    * (same contract as clipBox's box — clip twice for a crossing window).
    * A rectangle clip ring reproduces [[clipBox]] exactly up to ring
    * rotation (axis-aligned crossings pin coordinates verbatim). Returns
    * null for an empty clip or a GeometryCollection input (the expression
    * layer recurses). */
  def clipConvex(gtype: Int, coords0: Array[Double], posOff: Array[Int],
                 ringOff: Array[Int], partOff: Array[Int],
                 cxs: Array[Double], cys: Array[Double]): Clipped = {
    val m = cxs.length
    // clip bbox: gates which ±360° translates can intersect a subject part
    var cw = cxs(0); var ce = cxs(0); var cbS = cys(0); var cbN = cys(0)
    var q = 1
    while (q < m) {
      if (cxs(q) < cw) cw = cxs(q); if (cxs(q) > ce) ce = cxs(q)
      if (cys(q) < cbS) cbS = cys(q); if (cys(q) > cbN) cbN = cys(q)
      q += 1
    }
    @inline def insideAt(x: Double, y: Double): Boolean = {
      var k = 0
      while (k < m) {
        val ax = cxs(k); val ay = cys(k)
        val bx = cxs((k + 1) % m); val by = cys((k + 1) % m)
        if ((bx - ax) * (y - ay) - (by - ay) * (x - ax) < 0.0) return false
        k += 1
      }
      true
    }
    if (gtype == 1 || gtype == 2) { // Point / MultiPoint: half-plane tests
      val kept = Seq.newBuilder[Int]
      var i = 0
      while (i < posOff.length - 1) {
        val x = coords0(posOff(i)); val y = coords0(posOff(i) + 1)
        if (y >= cbS && y <= cbN &&
            (insideAt(x, y) || insideAt(x + 360, y) || insideAt(x - 360, y))) kept += i
        i += 1
      }
      return keptPoints(gtype, coords0, posOff, kept.result())
    }
    if (gtype < 3 || gtype > 6) return null
    val ux = unwrapParts(coords0, posOff, ringOff, partOff)
    val lineal = gtype == 3 || gtype == 4
    // lineal geometries are ONE part whose rings are the paths; MultiPolygon
    // is N parts (GeoStruct.packGeometry) — same shape as clipBox
    val parts = Seq.newBuilder[Seq[RingOut]]
    val linealPaths = Seq.newBuilder[RingOut]
    var part = 0
    while (part < partOff.length - 1) {
      val r0 = partOff(part); val r1 = partOff(part + 1)
      var ri = r0
      var si = 0
      while (si < clipShifts.length) {
        val shift = clipShifts(si)
        if (lineal) {
          // each path gates its own translate set on its unwrapped range
          ri = r0
          while (ri < r1) {
            var minX = Double.PositiveInfinity; var maxX = Double.NegativeInfinity
            var i = ringOff(ri)
            while (i < ringOff(ri + 1)) {
              val x = ux(posOff(i))
              if (x < minX) minX = x
              if (x > maxX) maxX = x
              i += 1
            }
            if (maxX >= cw + shift && minX <= ce + shift)
              linealPaths ++= clipPathCB(ux, posOff, ringOff(ri), ringOff(ri + 1), cxs, cys, shift)
            ri += 1
          }
        } else {
          // part's unwrapped longitude range gates which translates can hit
          var minX = Double.PositiveInfinity; var maxX = Double.NegativeInfinity
          ri = r0
          while (ri < r1) {
            var i = ringOff(ri)
            while (i < ringOff(ri + 1)) {
              val x = ux(posOff(i))
              if (x < minX) minX = x
              if (x > maxX) maxX = x
              i += 1
            }
            ri += 1
          }
          if (maxX >= cw + shift && minX <= ce + shift) {
            val shell = clipRingConvex(ux, posOff, ringOff(r0), ringOff(r0 + 1), cxs, cys, shift)
            if (shell != null) {
              val rings = Seq.newBuilder[RingOut]
              rings += shell
              ri = r0 + 1
              while (ri < r1) {
                val hole = clipRingConvex(ux, posOff, ringOff(ri), ringOff(ri + 1), cxs, cys, shift)
                if (hole != null) rings += hole
                ri += 1
              }
              parts += rings.result()
            }
          }
        }
        si += 1
      }
      part += 1
    }
    if (lineal) {
      val paths = linealPaths.result()
      if (paths.nonEmpty) parts += paths
    }
    assembleClipped(gtype, lineal, parts.result())
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

  /** Lng/lat bounds (w, s, e, n) of a ZXY tile — the inverse of [[tileXY]].
    * Adjacent tiles share the identical boundary DOUBLE ((x+1)/2^z evaluates
    * once per edge), so [[clipBox]] pieces of a tiled polygon partition it
    * exactly along tile seams. */
  def tileBounds(key: Long): Array[Double] = {
    val z = tileZ(key); val x = tileX(key); val y = tileY(key)
    val nTiles = (1L << z).toDouble
    @inline def lat(yy: Long): Double = {
      val t = math.Pi * (1.0 - 2.0 * yy / nTiles)
      math.toDegrees(math.atan(math.sinh(t)))
    }
    Array(x / nTiles * 360.0 - 180.0, lat(y + 1),
      (x + 1) / nTiles * 360.0 - 180.0, lat(y))
  }

  /** All ZXY tile keys at zoom z whose tiles intersect the lng/lat box
    * [w, e] x [s, n] (a sound cover: boundary-touching tiles included).
    * Throws when the cover would exceed `maxTiles` — pick a sane z for the
    * box instead of materializing a world-sized tile list. */
  def tileCoverBox(w: Double, s: Double, e: Double, n: Double, z: Int,
                   maxTiles: Int = 1 << 20): Array[Long] = {
    require(e >= w && n >= s, s"inverted box [$w,$s,$e,$n]")
    val (x0, y1) = tileXY(w, s, z) // south row has the LARGER y
    val (x1, y0) = tileXY(e, n, z)
    val count = (x1 - x0 + 1) * (y1 - y0 + 1)
    require(count <= maxTiles,
      s"tile cover of [$w,$s,$e,$n] at z=$z is $count tiles (> $maxTiles) — lower z")
    val out = new Array[Long](count.toInt)
    var i = 0
    var x = x0
    while (x <= x1) {
      var y = y0
      while (y <= y1) { out(i) = packTile(z, x, y); i += 1; y += 1 }
      x += 1
    }
    out
  }
}
