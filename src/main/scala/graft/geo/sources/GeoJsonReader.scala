package graft.geo.sources

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** The geojsone capability recast for Spark (SURVEY.md §2.6): split a
  * FeatureCollection document "too big for memory" into one row per feature
  * WITHOUT materializing the document — a Jackson streaming parser walks the
  * byte stream and emits each element of the top-level "features" array as
  * its own JSON text, in constant memory per task (the direct analogue of
  * the reference's lexeme-driven `decode_single_object`,
  * /root/reference/src/geojsone/geojsone.ml:68-116).
  *
  * Files are distributed across tasks (one task per file via binaryFiles);
  * a single gigantic file is one task but still constant-memory, exactly
  * like the single-fiber reference.
  */
object GeoJsonReader {

  /** One JSON text per feature of every FeatureCollection file under `path`.
    * `malformedReplace = true` selects the reference's error-recovery mode:
    * malformed bytes decode to U+FFFD and the scan continues (uutfe.ml:35,68
    * `Malformed → add U+FFFD`) instead of failing the task. */
  def featureTexts(spark: SparkSession, path: String,
                   malformedReplace: Boolean = false,
                   resync: Boolean = false): Dataset[String] = {
    import spark.implicits._
    spark.sparkContext
      .binaryFiles(path)
      .flatMap { case (_, pds) =>
        if (resync) resyncFeatures(pds.open())
        else splitFeatures(pds.open(), malformedReplace)
      }
      .toDS()
  }

  /** Features parsed to the packed feature struct (GeoStruct.featureType). */
  def features(spark: SparkSession, path: String): DataFrame = {
    graft.geo.sql.GeoFunctions.register(spark)
    import org.apache.spark.sql.functions.col
    featureTexts(spark, path).toDF("feature_json")
      .select(col("feature_json"),
        graft.geo.sql.GeoFunctions.from_geojson(col("feature_json"))
          .getField("feature").as("feature"))
  }

  /** Lazy iterator over the feature texts of one stream, auto-detecting the
    * container format in constant memory:
    *
    *  - RFC 8142 GeoJSON text sequences (RS 0x1E before each text, each text
    *    any GeoJSON — FeatureCollections are split, features pass through);
    *  - ND-JSON / concatenated JSON (a sequence of root-level objects, any
    *    member order — Jackson reads consecutive root values natively);
    *  - FeatureCollection documents (the original geojsone case): each
    *    element of the top-level "features" array becomes a row. Nested
    *    "features" keys inside properties are not confused (the scan only
    *    honors the top level of each root object).
    *
    * Classification is PER ROOT VALUE: a root object is a collection iff its
    * top-level `type` is "FeatureCollection" (authoritative) or — for
    * type-less objects — it carries a top-level `features` array. Members
    * seen before the decision are held in a bounded TokenBuffer (for a
    * collection that is only the members preceding "features"; for a
    * feature, the feature itself) and replayed, so memory stays constant in
    * the document size. Non-object roots fail loudly (the reference requires
    * an object).
    */
  /** Charset-sniffing reader with malformed → U+FFFD replacement — the
    * engine twin of the reference's uutfe recovery (`Malformed → add
    * U+FFFD and continue`, uutfe.ml:35,68; the decoder replaces each
    * maximal ill-formed subsequence per the Unicode best practice the uutf
    * family follows). Detects UTF-16BE/LE via BOM or the RFC 4627
    * null-byte pattern (same routing as the strict path's Jackson
    * bootstrapper), strips the BOM, defaults to UTF-8. */
  private[sources] def replacingReader(in: java.io.InputStream): java.io.Reader = {
    val pb   = new java.io.PushbackInputStream(in, 4)
    val head = new Array[Byte](4)
    var n    = 0
    var eof  = false
    while (n < 4 && !eof) {
      val b = pb.read()
      if (b == -1) eof = true else { head(n) = b.toByte; n += 1 }
    }
    pb.unread(head, 0, n)
    val (cs, bomLen) =
      if (n >= 2 && head(0) == 0xFE.toByte && head(1) == 0xFF.toByte) ("UTF-16BE", 2)
      else if (n >= 2 && head(0) == 0xFF.toByte && head(1) == 0xFE.toByte) ("UTF-16LE", 2)
      else if (n >= 3 && head(0) == 0xEF.toByte && head(1) == 0xBB.toByte && head(2) == 0xBF.toByte)
        ("UTF-8", 3)
      else if (n >= 2 && head(0) == 0 && head(1) != 0) ("UTF-16BE", 0)
      else if (n >= 2 && head(0) != 0 && head(1) == 0) ("UTF-16LE", 0)
      else ("UTF-8", 0)
    var skip = bomLen
    while (skip > 0) { pb.read(); skip -= 1 }
    val dec = java.nio.charset.Charset.forName(cs).newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    new java.io.InputStreamReader(pb, dec)
  }

  /** Error-RECOVERING splitter (`mode=resync`) — the engine twin of jsone's
    * token-level resync (`discard_to u_comma u_rbrack`, jsone.ml:487-493 +
    * :416-422): malformed content inside a features array discards input to
    * the next `,` / `]` (the reference's literal scan, not string-aware —
    * faithful) and the stream continues, so ONE corrupt feature in a 10 GB
    * document no longer fails the whole task. Bytes decode through
    * [[replacingReader]] (U+FFFD on malformed sequences), i.e. resync
    * implies the uutfe byte-level recovery too.
    *
    * Structural contract: per root value — a root object carrying a
    * top-level `features` array streams that array's `{...}` elements
    * (string/escape-aware bracket balance for capture); any other root
    * object is emitted whole; a non-object root discards to the next `{`.
    * Emitted texts are BEST-EFFORT: semantically-invalid features still
    * emit and fall to `from_geojson`'s PERMISSIVE null + located
    * `geojson_error` downstream, mirroring the reference's decode-error-
    * then-continue loop.
    */
  private[sources] def resyncFeatures(in: java.io.InputStream): Iterator[String] = {
    val rd = new java.io.PushbackReader(replacingReader(in), 1)
    def readc(): Int = rd.read()
    def unread(c: Int): Unit = if (c != -1) rd.unread(c)
    def skipSep(): Int = { // whitespace + RS separators; returns next char
      var c = readc()
      while (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == 0x1E || c == 0xFEFF) c = readc()
      c
    }
    /** capture a balanced JSON string starting AFTER the opening quote. */
    def captureString(sb: StringBuilder): Unit = {
      var c = readc()
      while (c != -1 && c != '"') {
        sb.append(c.toChar)
        if (c == '\\') { val e = readc(); if (e != -1) sb.append(e.toChar); }
        c = readc()
      }
      if (c != -1) sb.append('"')
    }
    /** capture a balanced value whose opening char is `open` (already
      * consumed, appended by caller); string-aware. Returns false on EOF. */
    def captureBalanced(sb: StringBuilder, open: Int): Boolean = {
      val close = if (open == '{') '}' else ']'
      var depth = 1
      var c = readc()
      while (depth > 0 && c != -1) {
        sb.append(c.toChar)
        if (c == '"') captureString(sb)
        else if (c == open) depth += 1
        else if (c == close) depth -= 1
        c = readc()
      }
      unread(c)
      depth == 0
    }
    /** jsone's discard_to: literal scan to `,` or `]` (NOT string-aware —
      * reference-faithful), leaving the terminator unconsumed. */
    def discardTo(): Unit = {
      var c = readc()
      while (c != -1 && c != ',' && c != ']') c = readc()
      unread(c)
    }

    new Iterator[String] {
      private var pending: Iterator[String] = Iterator.empty
      private var eof = false
      private def parseRoot(): Unit = {
        var c = skipSep()
        // non-object root: resync = discard to the next object start
        while (c != -1 && c != '{') c = skipSep()
        if (c == -1) { eof = true; return }
        // scan the root object's members; buffer the text in case this is a
        // single value (no features member)
        val head = new StringBuilder("{")
        var inFeatures = false
        var done = false
        while (!done && !inFeatures) {
          val k = skipSep()
          if (k == -1) { eof = true; done = true }
          else if (k == '}') { head.append('}'); done = true }
          else if (k == ',') head.append(',')
          else if (k == '"') {
            val keySb = new StringBuilder("\"")
            captureString(keySb)
            head.append(keySb)
            val colon = skipSep()
            if (colon == ':') {
              head.append(':')
              val v = skipSep()
              if (v == -1) { eof = true; done = true }
              else if (keySb.toString == "\"features\"" && v == '[') inFeatures = true
              else if (v == '{' || v == '[') {
                head.append(v.toChar)
                if (!captureBalanced(head, v)) { eof = true; done = true }
              }
              else if (v == '"') { head.append('"'); captureString(head) }
              else { // scalar: copy to the next , or } at this level
                head.append(v.toChar)
                var c2 = readc()
                while (c2 != -1 && c2 != ',' && c2 != '}') { head.append(c2.toChar); c2 = readc() }
                unread(c2)
              }
            } else unread(colon) // malformed member: resync at next loop
          }
          else () // stray char inside object head: skip it (resync)
        }
        if (eof && !inFeatures) return
        if (!inFeatures) { pending = Iterator.single(head.toString); return }
        // stream the features array elements LAZILY (constant memory, like
        // the strict splitter) with discard_to recovery per element; the
        // root remainder (members after features) drains when `]` arrives
        def drainRoot(): Unit = {
          var depth = 1
          var c1 = readc()
          while (depth > 0 && c1 != -1) {
            if (c1 == '"') captureString(new StringBuilder)
            else if (c1 == '{' || c1 == '[') depth += 1
            else if (c1 == '}' || c1 == ']') depth -= 1
            c1 = readc()
          }
          unread(c1)
          if (c1 == -1) eof = true
        }
        pending = new Iterator[String] {
          private var nextElem: String = null
          private var arrDone = false
          private def advance(): Unit =
            while (nextElem == null && !arrDone) {
              val c0 = skipSep()
              if (c0 == -1) { eof = true; arrDone = true }
              else if (c0 == ']') { arrDone = true; drainRoot() }
              else if (c0 == ',') ()
              else if (c0 == '{') {
                val sb = new StringBuilder("{")
                if (captureBalanced(sb, '{')) nextElem = sb.toString
                else { eof = true; arrDone = true }
              }
              else discardTo() // malformed element: jsone's resync
            }
          override def hasNext: Boolean = { advance(); nextElem != null }
          override def next(): String = {
            advance(); val e = nextElem; nextElem = null; e
          }
        }
      }
      private def refill(): Unit =
        while (!pending.hasNext && !eof) parseRoot()
      override def hasNext: Boolean = { refill(); if (!pending.hasNext) rd.close(); pending.hasNext }
      override def next(): String = { refill(); pending.next() }
    }
  }

  private[sources] def splitFeatures(in0: java.io.InputStream,
                                     malformedReplace: Boolean = false): Iterator[String] = {
    val factory = new JsonFactory()
    // sniff RS (RFC 8142): strip separators with a filter stream — each
    // text is then just another consecutive root value
    val pb    = new java.io.PushbackInputStream(in0, 1)
    val first = pb.read()
    if (first == -1) { pb.close(); return Iterator.empty }
    pb.unread(first)
    val in: java.io.InputStream =
      if (first == 0x1E) new java.io.FilterInputStream(pb) {
        override def read(): Int = {
          var b = super.read(); while (b == 0x1E) b = super.read(); b
        }
        override def read(buf: Array[Byte], off: Int, len: Int): Int = {
          val n = super.read(buf, off, len)
          if (n <= 0) return n
          var w = off; var r = off
          while (r < off + n) { if (buf(r) != 0x1E) { buf(w) = buf(r); w += 1 }; r += 1 }
          val kept = w - off
          if (kept == 0) read(buf, off, len) else kept
        }
      }
      else pb
    // strict mode: Jackson's byte-level bootstrapper (loud on malformed
    // input); replace mode: decode through the U+FFFD-replacing reader
    val parser =
      if (malformedReplace) factory.createParser(replacingReader(in))
      else factory.createParser(in)

    // flatten every root value: FC roots stream their features, feature
    // roots emit themselves
    new Iterator[String] {
      private var pending: Iterator[String] = Iterator.empty
      private var closed = false
      private def closeAll(): Unit = { closed = true; parser.close(); in.close() }
      private def refill(): Unit = {
        while (!pending.hasNext && !closed) {
          try {
            val t = parser.nextToken()
            if (t == null) closeAll()
            else {
              require(t == JsonToken.START_OBJECT, "GeoJSON document must be an object")
              pending = splitRootObject(factory, parser)
            }
          } catch { case e: Throwable => closeAll(); throw e }
        }
      }
      override def hasNext: Boolean = { refill(); pending.hasNext }
      override def next(): String = { refill(); pending.next() }
    }
  }

  /** Current token is the START_OBJECT of one root value. Classify it and
    * return its feature texts; consumes exactly this root object (the
    * returned iterator must be drained before the parser is advanced —
    * [[splitFeatures]] guarantees that). */
  private def splitRootObject(factory: JsonFactory,
                              parser: com.fasterxml.jackson.core.JsonParser): Iterator[String] = {
    // buffer the object head until the classification is decidable
    val buf = new com.fasterxml.jackson.databind.util.TokenBuffer(parser)
    buf.copyCurrentEvent(parser) // START_OBJECT
    var decided: Option[Boolean] = None // Some(true)=collection, Some(false)=single value
    while (decided.isEmpty) {
      val t = parser.nextToken()
      t match {
        case JsonToken.FIELD_NAME if parser.currentName() == "type" =>
          buf.copyCurrentEvent(parser)
          val vt = parser.nextToken()
          buf.copyCurrentEvent(parser)
          if (vt == JsonToken.VALUE_STRING)
            decided = Some(parser.getText == "FeatureCollection")
          else if (vt == JsonToken.START_OBJECT || vt == JsonToken.START_ARRAY) {
            // non-string type: buffer the subtree, keep scanning
            copySubtreeRest(parser, buf)
          }
        case JsonToken.FIELD_NAME if parser.currentName() == "features" =>
          // type-less object carrying a features array: treat as collection
          // (the live parser stays ON this FIELD_NAME; collection mode
          // recognizes it via currentToken, the buffer is discarded)
          decided = Some(true)
        case JsonToken.FIELD_NAME =>
          buf.copyCurrentEvent(parser)
          val vt = parser.nextToken()
          buf.copyCurrentEvent(parser)
          if (vt == JsonToken.START_OBJECT || vt == JsonToken.START_ARRAY)
            copySubtreeRest(parser, buf)
        case JsonToken.END_OBJECT =>
          buf.copyCurrentEvent(parser)
          decided = Some(false) // no type, no features: one opaque value
        case _ =>
          buf.copyCurrentEvent(parser)
      }
    }
    if (!decided.get) {
      // single value: replay the buffered head + copy the unread remainder
      val sw  = new java.io.StringWriter()
      val gen = factory.createGenerator(sw)
      val replay = buf.asParser()
      var rt = replay.nextToken()
      var depth = 0
      var sawEnd = false
      while (rt != null) {
        gen.copyCurrentEvent(replay)
        rt match {
          case JsonToken.START_OBJECT | JsonToken.START_ARRAY => depth += 1
          case JsonToken.END_OBJECT | JsonToken.END_ARRAY     => depth -= 1; if (depth == 0) sawEnd = true
          case _ => ()
        }
        rt = replay.nextToken()
      }
      if (!sawEnd) { // remainder still on the live parser
        var depthLive = depth
        while (depthLive > 0) {
          val t = parser.nextToken()
          t match {
            case JsonToken.START_OBJECT | JsonToken.START_ARRAY => depthLive += 1
            case JsonToken.END_OBJECT | JsonToken.END_ARRAY     => depthLive -= 1
            case _ => ()
          }
          gen.copyCurrentEvent(parser)
        }
      }
      gen.close()
      buf.close()
      return Iterator.single(sw.toString)
    }
    buf.close()
    // collection mode: advance (within THIS object) to the top-level
    // "features" array — the buffered head holds only scalar members (type,
    // bbox, ...) or fully-buffered subtrees, so the live parser sits at the
    // top level; if the features name was the deciding token we are already
    // on it
    val onFeatures = parser.currentToken() == JsonToken.FIELD_NAME &&
      parser.currentName() == "features"
    var found = onFeatures && {
      val nxt = parser.nextToken()
      require(nxt == JsonToken.START_ARRAY, "features must be an array")
      true
    }
    var depth = 1
    var t: JsonToken = null
    while (!found && { t = parser.nextToken(); t != null }) {
      t match {
        case JsonToken.FIELD_NAME if depth == 1 && parser.currentName() == "features" =>
          val nxt = parser.nextToken()
          require(nxt == JsonToken.START_ARRAY, "features must be an array")
          found = true
        case JsonToken.START_OBJECT | JsonToken.START_ARRAY => depth += 1
        case JsonToken.END_OBJECT | JsonToken.END_ARRAY =>
          depth -= 1
          if (depth == 0) return Iterator.empty // FC without features member
        case _ => ()
      }
    }
    if (!found) return Iterator.empty

    new Iterator[String] {
      private var nextTok = parser.nextToken()
      private var drainedObject = false
      override def hasNext: Boolean = {
        val h = nextTok == JsonToken.START_OBJECT
        if (!h && !drainedObject) {
          // emission stops at the first non-object features element (same
          // behavior as the original splitter); skip any remaining elements
          // to the array's END_ARRAY so the drain below starts balanced
          var tk = nextTok
          while (tk != null && tk != JsonToken.END_ARRAY) {
            if (tk == JsonToken.START_OBJECT || tk == JsonToken.START_ARRAY)
              parser.skipChildren()
            tk = parser.nextToken()
          }
          // consume the rest of the collection object (bbox/fm after the
          // features array) so the NEXT root value can follow (RFC 8142
          // sequences of FeatureCollections)
          var depth = 1
          while (depth > 0 && parser.nextToken() != null) {
            parser.currentToken() match {
              case JsonToken.START_OBJECT | JsonToken.START_ARRAY => depth += 1
              case JsonToken.END_OBJECT | JsonToken.END_ARRAY     => depth -= 1
              case _ => ()
            }
          }
          drainedObject = true
        }
        h
      }
      override def next(): String = {
        val sw  = new java.io.StringWriter()
        val gen = factory.createGenerator(sw)
        gen.copyCurrentStructure(parser)
        gen.close()
        nextTok = parser.nextToken()
        sw.toString
      }
    }
  }

  /** The current token opened a subtree (START_OBJECT/ARRAY, already copied
    * to buf); copy the remainder of that subtree. */
  private def copySubtreeRest(parser: com.fasterxml.jackson.core.JsonParser,
                              buf: com.fasterxml.jackson.databind.util.TokenBuffer): Unit = {
    var depth = 1
    while (depth > 0) {
      val t = parser.nextToken()
      t match {
        case JsonToken.START_OBJECT | JsonToken.START_ARRAY => depth += 1
        case JsonToken.END_OBJECT | JsonToken.END_ARRAY     => depth -= 1
        case _ => ()
      }
      buf.copyCurrentEvent(parser)
    }
  }
}
