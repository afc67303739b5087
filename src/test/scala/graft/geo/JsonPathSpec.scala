package graft.geo

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.geo.json.{JNum, JStr, JValue, JsonPath}
import graft.geo.sql.GeoFunctions._

/** `json_update`/`json_remove` — the Ezjsone.map/update twin
  * (ezjsone.ml:282-307), pinned to the reference's map_dict semantics
  * including its quirks. */
class JsonPathSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._
  graft.geo.sql.GeoFunctions.register(SparkTestBase.spark)

  private def upd(doc: String, path: String, v: String): String =
    Seq(doc).toDF("j").select(json_update($"j", lit(path), lit(v))).as[String].head()
  private def rem(doc: String, path: String): String =
    Seq(doc).toDF("j").select(json_remove($"j", lit(path))).as[String].head()

  test("replace in place preserves member order; missing leaf appends") {
    assert(upd("""{"a":1,"b":2,"c":3}""", "$.b", "9") == """{"a":1,"b":9,"c":3}""")
    assert(upd("""{"a":1}""", "$.b", """{"x":true}""") == """{"a":1,"b":{"x":true}}""")
    // nested: in-place deep replace, siblings and order untouched
    assert(upd("""{"a":{"p":1,"q":2},"z":0}""", "$.a.q", "[1,2]")
      == """{"a":{"p":1,"q":[1,2]},"z":0}""")
  }

  test("missing intermediate member is a silent no-op (map_dict f Null -> None)") {
    assert(upd("""{"a":1}""", "$.b.c", "9") == """{"a":1}""")
  }

  test("descending into a non-object value removes the member (ezjsone quirk)") {
    // aux on a scalar returns None, which map_dict interprets as removal
    assert(upd("""{"a":1,"b":2}""", "$.a.c", "9") == """{"b":2}""")
  }

  test("non-object top with non-empty path is Not_found (null)") {
    val r = Seq("[1,2]").toDF("j").select(json_update($"j", lit("$.a"), lit("1"))).head()
    assert(r.isNullAt(0))
    // empty path on update replaces the whole document (map f t [] = f t)
    assert(upd("""{"a":1}""", "$", """"all"""") == "\"all\"")
    // empty path on remove is Not_found too (f t = None -> raise)
    assert(Seq("""{"a":1}""").toDF("j").select(json_remove($"j", lit("$"))).head().isNullAt(0))
  }

  test("first duplicate key wins; later duplicates untouched (assoc list)") {
    assert(upd("""{"k":1,"k":2}""", "$.k", "9") == """{"k":9,"k":2}""")
    assert(rem("""{"k":1,"k":2}""", "$.k") == """{"k":2}""")
  }

  test("remove: leaf removed, missing path no-op, fm preserved") {
    assert(rem("""{"a":1,"b":2}""", "$.a") == """{"b":2}""")
    assert(rem("""{"a":1}""", "$.zzz") == """{"a":1}""")
    // foreign members of a Feature survive a properties update untouched
    val doc = """{"type":"Feature","title":"fm kept","properties":{"n":"x"},"geometry":null}"""
    assert(upd(doc, "$.properties.n", "\"y\"")
      == """{"type":"Feature","title":"fm kept","properties":{"n":"y"},"geometry":null}""")
  }

  test("update-then-find law and unparseable inputs") {
    // find(update(d, p, v), p) == v for every object-path in a real doc
    val d = JValue.parseUnsafe("""{"a":{"b":{"c":1}},"x":[1,2],"y":"s"}""")
    for (p <- Seq(List("a"), List("a", "b"), List("a", "b", "c"), List("new"), List("y"))) {
      val v = JStr("sentinel")
      val u = JsonPath.update(d, p, v).get
      assert(JsonPath.find(u, p).contains(v), p.toString)
    }
    // numbers re-render through %.16g (canonical form)
    assert(JsonPath.update(d, List("x"), JNum(0.5)).get.render
      == """{"a":{"b":{"c":1}},"x":0.5,"y":"s"}""")
    // unparseable document or value -> null
    assert(Seq("{nope").toDF("j").select(json_update($"j", lit("$.a"), lit("1"))).head().isNullAt(0))
    assert(Seq("""{"a":1}""").toDF("j").select(json_update($"j", lit("$.a"), lit("{nope"))).head().isNullAt(0))
  }

  test("fuzz: set-get and get-set laws over 300 random generated documents") {
    // docs from the engine's Random generator (canonical serialization);
    // paths enumerated from each doc's own object spine — every object-path
    // must satisfy: find(update(d,p,v),p) == v   (set-get)
    //               update(d,p,find(d,p)) == d   (get-set, canonical docs)
    var checked = 0
    for (id <- 0L until 300L) {
      val doc = graft.geo.json.GeoJsonCodec.render(graft.geo.gen.GeoGen.docFor(id, 7L))
      val d   = JValue.parseUnsafe(doc)
      def paths(v: JValue, prefix: List[String]): Seq[List[String]] = v match {
        case o: graft.geo.json.JObj =>
          o.fields.flatMap { case (k, fv) =>
            (prefix :+ k) +: paths(fv, prefix :+ k)
          }
        case _ => Seq.empty
      }
      for (p <- paths(d, Nil).take(20)) {
        val v = JNum(id * 1.5)
        val updated = JsonPath.update(d, p, v)
          .getOrElse(fail(s"doc $id path $p: update failed"))
        assert(JsonPath.find(updated, p).contains(v), s"doc $id path $p set-get")
        val back = JsonPath.find(d, p)
          .flatMap(orig => JsonPath.update(d, p, orig))
          .getOrElse(fail(s"doc $id path $p: get-set failed"))
        assert(JValue.eq(back, d), s"doc $id path $p get-set")
        checked += 1
      }
    }
    assert(checked > 500, s"only $checked path-law checks ran")
  }

  test("SQL registration: json_update usable from spark.sql") {
    val r = spark.sql(
      """SELECT json_update('{"a":1}', '$.a', '2') AS u,
        |       json_remove('{"a":1,"b":2}', '$.b') AS r""".stripMargin).head()
    assert(r.getString(0) == """{"a":2}""" && r.getString(1) == """{"a":1}""")
  }
}
