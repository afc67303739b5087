package graft.geo.json

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}
import scala.collection.immutable.VectorBuilder

/** Minimal ordered JSON value ADT.
  *
  * Mirrors the reference's eager JSON model (`/root/reference/src/geojsone/
  * vendor/ezjsone/ezjsone.ml:18-24`): all numbers are IEEE doubles (the
  * reference lexer produces only `Float`, jsone.ml:424-433), objects are
  * ordered association lists (duplicate keys preserved).
  */
sealed trait JValue {
  def render: String = { val sb = new StringBuilder; JValue.write(sb, this); sb.toString }
}
case object JNull extends JValue
final case class JBool(b: Boolean) extends JValue
final case class JNum(d: Double) extends JValue
final case class JStr(s: String) extends JValue
final case class JArr(items: Vector[JValue]) extends JValue
final case class JObj(fields: Vector[(String, JValue)]) extends JValue {
  def get(key: String): Option[JValue] = fields.collectFirst { case (k, v) if k == key => v }
}

/** A parse failure with its (1-based) source location — the engine-side
  * counterpart of the reference's located errors (jsone.ml:87-108 `error`,
  * geojsone.ml:27-37 `Err.location`): lexer errors carry the failure point;
  * decode (semantic) errors carry the end of the decoded value, the eager
  * analogue of the streaming decoder's last `decoded_range`. */
final case class ParseError(msg: String, line: Int, col: Int)

object JValue {
  private val factory = new JsonFactory()

  /** Parse a JSON text. Numbers always become doubles (reference semantics:
    * jsone.ml:424-433 — `float_of_string` for every number).
    */
  def parse(text: String): Either[String, JValue] =
    parseLoc(text).left.map(_.msg).map(_._1)

  /** Parse with location: Right((value, endLine, endCol)) where (endLine,
    * endCol) is the position just after the JSON value — the location
    * attached to semantic errors raised by the layer above — or
    * Left(ParseError) with the lexer's failure point. */
  def parseLoc(text: String): Either[ParseError, (JValue, Int, Int)] = {
    var p: JsonParser = null
    try {
      p = factory.createParser(text)
      try {
        p.nextToken()
        val v = readValue(p)
        val hasTrailing = p.nextToken() != null
        val loc = p.currentLocation()
        if (hasTrailing)
          Left(ParseError("Trailing content after JSON value", loc.getLineNr, loc.getColumnNr))
        else Right((v, loc.getLineNr, loc.getColumnNr))
      } finally p.close()
    } catch {
      case e: com.fasterxml.jackson.core.JsonProcessingException =>
        val loc = e.getLocation
        val (l, c) = if (loc == null) (1, 1) else (loc.getLineNr, loc.getColumnNr)
        Left(ParseError(Option(e.getOriginalMessage).getOrElse("parse error"), l, c))
      case e: Exception =>
        val (l, c) =
          if (p != null && p.currentLocation() != null)
            (p.currentLocation().getLineNr, p.currentLocation().getColumnNr)
          else (1, 1)
        Left(ParseError(Option(e.getMessage).getOrElse("parse error"), l, c))
    }
  }

  def parseUnsafe(text: String): JValue =
    parse(text).fold(m => throw new IllegalArgumentException(m), identity)

  /** Read the JSON value AT the parser's current token (shared with the
    * fast-path top parser for properties subtrees). */
  private[geo] def readValueAt(p: JsonParser): JValue = readValue(p)

  private def readValue(p: JsonParser): JValue = p.currentToken() match {
    case JsonToken.VALUE_NULL           => JNull
    case JsonToken.VALUE_TRUE           => JBool(true)
    case JsonToken.VALUE_FALSE          => JBool(false)
    case JsonToken.VALUE_NUMBER_INT    => JNum(p.getDoubleValue)
    case JsonToken.VALUE_NUMBER_FLOAT  => JNum(p.getDoubleValue)
    case JsonToken.VALUE_STRING         => JStr(p.getText)
    case JsonToken.START_ARRAY =>
      val b = new VectorBuilder[JValue]
      while (p.nextToken() != JsonToken.END_ARRAY) b += readValue(p)
      JArr(b.result())
    case JsonToken.START_OBJECT =>
      val b = new VectorBuilder[(String, JValue)]
      while (p.nextToken() != JsonToken.END_OBJECT) {
        val name = p.currentName()
        p.nextToken()
        b += (name -> readValue(p))
      }
      JObj(b.result())
    case t => throw new IllegalArgumentException(s"Unexpected token $t")
  }

  /** C-printf `%.16g` compatible double formatting (jsone.ml:814-819).
    * C's `%g` rounds the EXACT binary expansion of the double to 16
    * significant digits and strips trailing zeros; Java's `String.format`
    * rounds the shortest round-trip repr instead, which diverges on
    * subnormals and near-power-of-ten values (e.g. 1.5e-323: C
    * `1.48219693752374e-323`, Java `1.500000000000000e-323`) — so the slow
    * path here does true exact-expansion rounding via `BigDecimal(d)`.
    *
    * Hot path: doubles whose shortest representation (`Double.toString`)
    * carries <= 16 significant digits AND provably lies in the same 16-digit
    * decimal rounding cell as the exact expansion (ulp guard below) render
    * straight from the shortest digits (verified differentially against
    * python/C `%.16g` in GeoJsonCodecSpec).
    */
  def formatG16(d: Double): String = {
    // C printf prints non-finite doubles as nan/inf/-inf (not JSON, but a
    // programmatic model may carry them; the old String.format path emitted
    // Java's "NaN"/"Infinity", and BigDecimal would throw)
    if (java.lang.Double.isNaN(d)) return "nan"
    if (java.lang.Double.isInfinite(d)) return if (d > 0) "inf" else "-inf"
    val fast = formatG16Fast(d)
    if (fast != null) fast else formatG16Slow(d)
  }

  /** C `%g` rendering of (sign, significant digits, leading-digit power of
    * ten): scientific iff e < -4 or e >= 16, >=2-digit exponent, trailing
    * zeros already stripped from `digits`. */
  private def renderG(neg: Boolean, digits: String, e: Int): String = {
    val pointAt = e + 1
    val sb = new java.lang.StringBuilder(26)
    if (neg) sb.append('-')
    if (e < -4 || e >= 16) {
      sb.append(digits.charAt(0))
      if (digits.length > 1) { sb.append('.').append(digits, 1, digits.length) }
      sb.append('e').append(if (e < 0) '-' else '+')
      val ae = Math.abs(e)
      if (ae < 10) sb.append('0')
      sb.append(ae)
    } else if (e >= 0) {
      if (digits.length <= pointAt) {
        sb.append(digits)
        var i = digits.length
        while (i < pointAt) { sb.append('0'); i += 1 }
      } else {
        sb.append(digits, 0, pointAt).append('.').append(digits, pointAt, digits.length)
      }
    } else {
      sb.append("0.")
      var i = 0
      while (i < -pointAt) { sb.append('0'); i += 1 }
      sb.append(digits)
    }
    sb.toString
  }

  // 10^(i-350); out-of-range lookups clamp to 0 / +inf (both fail the guard
  // conservatively, deferring to the exact slow path)
  private val POW10: Array[Double] = Array.tabulate(700)(i => Math.pow(10.0, (i - 350).toDouble))
  @inline private def pow10(e: Int): Double = {
    val i = e + 350
    if (i < 0) 0.0 else if (i >= 700) Double.PositiveInfinity else POW10(i)
  }

  /** Shortest-repr-based %.16g; null when the slow path is required.
    * Allocation-light (serialization's hottest kernel): scans the
    * `Double.toString` chars in place, no intermediate substrings.
    *
    * Safety guard: the shortest repr r is a point of the 16-significant-
    * digit decimal grid, and |d_exact - r| <= ulp(d)/2. If ulp(d) is
    * strictly inside one grid cell, d_exact rounds to r and the fast path
    * equals C's exact rounding. The grid spacing at r is 10^(e-15) — one
    * decade finer (10^(e-16)) just BELOW r when r is exactly a power of ten
    * (single digit "1"), where the exact value may sit in the lower decade
    * (e.g. 1e23 whose double is 9.99...e22). Subnormals fail the guard
    * automatically (ulp 4.9e-324 vs grid ~1e-339) and defer to slow.
    */
  private def formatG16Fast(d: Double): String = {
    val s     = java.lang.Double.toString(d) // shortest round-trip repr
    val n     = s.length
    val neg   = s.charAt(0) == '-'
    val start = if (neg) 1 else 0
    var ePos  = -1
    var dot   = -1
    var i     = start
    while (i < n && ePos < 0) {
      val c = s.charAt(i)
      if (c == 'E') ePos = i
      else { if (c == '.') dot = i; i += 1 }
    }
    if (dot < 0) return null // unexpected form; defer
    val mantEnd = if (ePos < 0) n else ePos
    val exp10   = if (ePos < 0) 0 else Integer.parseInt(s, ePos + 1, n, 10)
    val intLen  = dot - start // digits before the point
    // digit k (0-based, point elided) lives at s(start + k) or +1 past the dot
    @inline def digitAt(k: Int): Char = s.charAt(if (k < intLen) start + k else start + k + 1)
    val nDigits = mantEnd - start - 1
    var firstNZ = 0
    while (firstNZ < nDigits && digitAt(firstNZ) == '0') firstNZ += 1
    if (firstNZ == nDigits) return if (neg) "-0" else "0"
    var lastNZ = nDigits - 1
    while (lastNZ > firstNZ && digitAt(lastNZ) == '0') lastNZ -= 1
    val count = lastNZ - firstNZ + 1
    if (count > 16) return null // needs true 16-digit rounding
    val e = intLen - 1 - firstNZ + exp10 // power of ten of the leading digit
    val grid = if (count == 1 && digitAt(firstNZ) == '1') pow10(e - 16) else pow10(e - 15)
    if (!(Math.ulp(d) < grid)) return null
    // render (C %g: scientific iff e < -4 or >= 16, >=2-digit exponent)
    val out = new Array[Char](32)
    var o = 0
    if (neg) { out(o) = '-'; o += 1 }
    if (e < -4 || e >= 16) {
      out(o) = digitAt(firstNZ); o += 1
      if (count > 1) {
        out(o) = '.'; o += 1
        var k = firstNZ + 1
        while (k <= lastNZ) { out(o) = digitAt(k); o += 1; k += 1 }
      }
      out(o) = 'e'; o += 1
      out(o) = if (e < 0) '-' else '+'; o += 1
      val ae = Math.abs(e)
      if (ae >= 100) { out(o) = ('0' + ae / 100).toChar; o += 1 }
      out(o) = ('0' + (ae / 10) % 10).toChar; o += 1
      out(o) = ('0' + ae % 10).toChar; o += 1
    } else if (e >= 0) {
      val pointAt = e + 1
      if (count <= pointAt) {
        var k = firstNZ
        while (k <= lastNZ) { out(o) = digitAt(k); o += 1; k += 1 }
        var z = count
        while (z < pointAt) { out(o) = '0'; o += 1; z += 1 }
      } else {
        var k = firstNZ
        while (k < firstNZ + pointAt) { out(o) = digitAt(k); o += 1; k += 1 }
        out(o) = '.'; o += 1
        while (k <= lastNZ) { out(o) = digitAt(k); o += 1; k += 1 }
      }
    } else {
      out(o) = '0'; o += 1; out(o) = '.'; o += 1
      var z = 0
      while (z < -e - 1) { out(o) = '0'; o += 1; z += 1 }
      var k = firstNZ
      while (k <= lastNZ) { out(o) = digitAt(k); o += 1; k += 1 }
    }
    new String(out, 0, o)
  }

  /** True C %.16g: round the exact binary expansion (BigDecimal(d)) to 16
    * significant digits, ties-to-even (glibc under round-to-nearest). */
  private def formatG16Slow(d: Double): String = {
    if (d == Math.rint(d) && Math.abs(d) < 1e16) {
      // integral values within %.16g's fixed range print without a point
      val l = d.toLong
      if (l == 0 && 1.0 / d < 0) "-0" else l.toString
    } else {
      val neg = java.lang.Double.doubleToRawLongBits(d) < 0
      val bd = new java.math.BigDecimal(Math.abs(d)) // exact expansion
        .round(new java.math.MathContext(16, java.math.RoundingMode.HALF_EVEN))
      var digits = bd.unscaledValue.toString
      var scale  = bd.scale
      val e      = digits.length - 1 - scale
      var end    = digits.length
      while (end > 1 && digits.charAt(end - 1) == '0') end -= 1
      digits = digits.substring(0, end)
      renderG(neg, digits, e)
    }
  }

  /** Minified serialization with the reference's escape rules
    * (jsone.ml:769-796): `"` `\` `\n` escaped, other control chars as \u00XX.
    */
  def write(sb: StringBuilder, v: JValue): Unit = v match {
    case JNull    => sb.append("null")
    case JBool(b) => sb.append(if (b) "true" else "false")
    case JNum(d)  => sb.append(formatG16(d))
    case JStr(s)  => writeString(sb, s)
    case JArr(items) =>
      sb.append('[')
      var first = true
      items.foreach { it => if (!first) sb.append(','); first = false; write(sb, it) }
      sb.append(']')
    case JObj(fields) =>
      sb.append('{')
      var first = true
      fields.foreach { case (k, fv) =>
        if (!first) sb.append(','); first = false
        writeString(sb, k); sb.append(':'); write(sb, fv)
      }
      sb.append('}')
  }

  /** 2-space-indent pretty printer with the reference encoder's exact
    * layout (jsone.ml:751-767 w_indent = nest*2 spaces; jsone.ml:839-900):
    * every member/array value on its own line, `"name": ` with one space
    * after the colon (w_name + u_sp, jsone.ml:798-802,858-861), closers on
    * their own line at the OUTER indent, empty containers stay `{}`/`[]`
    * (last_start short-circuit, jsone.ml:867-869). */
  def renderPretty(v: JValue): String = {
    val sb = new StringBuilder; writePretty(sb, v, 0); sb.toString
  }

  def writePretty(sb: StringBuilder, v: JValue, nest: Int): Unit = {
    def indent(n: Int): Unit = { var i = 0; while (i < 2 * n) { sb.append(' '); i += 1 } }
    v match {
      case JObj(fields) if fields.nonEmpty =>
        sb.append('{')
        var first = true
        fields.foreach { case (k, fv) =>
          if (!first) sb.append(',')
          first = false
          sb.append('\n'); indent(nest + 1)
          writeString(sb, k); sb.append(':'); sb.append(' ')
          writePretty(sb, fv, nest + 1)
        }
        sb.append('\n'); indent(nest); sb.append('}')
      case JArr(items) if items.nonEmpty =>
        sb.append('[')
        var first = true
        items.foreach { it =>
          if (!first) sb.append(',')
          first = false
          sb.append('\n'); indent(nest + 1)
          writePretty(sb, it, nest + 1)
        }
        sb.append('\n'); indent(nest); sb.append(']')
      case other => write(sb, other) // scalars and empty containers as minified
    }
  }

  private[json] def writeString(sb: StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'             => sb.append("\\\"")
        case '\\'            => sb.append("\\\\")
        case '\n'            => sb.append("\\n")
        case c if c <= 0x1f  => sb.append(f"\\u00${c.toInt}%02X")
        case c               => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  /** Structural equality where numbers compare by bit pattern — the JSON-value
    * equality the reference round-trip tests use (test/geojson/test.ml).
    * Object field ORDER matters (assoc lists), matching the reference's `=`.
    */
  def eq(a: JValue, b: JValue): Boolean = (a, b) match {
    case (JNum(x), JNum(y)) => java.lang.Double.compare(x, y) == 0
    case (JArr(x), JArr(y)) => x.length == y.length && x.iterator.zip(y.iterator).forall { case (p, q) => eq(p, q) }
    case (JObj(x), JObj(y)) =>
      x.length == y.length && x.iterator.zip(y.iterator).forall { case ((k1, v1), (k2, v2)) => k1 == k2 && eq(v1, v2) }
    case _ => a == b
  }
}
