package graft.geo.json

/** Generic JSON member-path update — the engine twin of the reference's
  * `Ezjsone.mem/find/map/update` (/root/reference/src/geojsone/vendor/
  * ezjsone/ezjsone.ml:262-307), with the exact quirks of `map_dict`:
  *
  *  - descends OBJECTS ONLY, by member label, FIRST match (duplicate keys:
  *    later duplicates are untouched — assoc-list semantics);
  *  - replace is IN PLACE (member order preserved); a missing LEAF member is
  *    APPENDED at the end of its object (map_dict's `f \`Null\` → Some`);
  *  - a missing INTERMEDIATE member is a silent NO-OP (the recursive `f
  *    \`Null\`` hits the non-object case and yields None, so map_dict leaves
  *    the dict unchanged);
  *  - descending INTO a non-object value REMOVES the member holding it (the
  *    recursive aux returns None and map_dict drops the entry) — quirky but
  *    faithful (ezjsone.ml:289-291,297-304);
  *  - a non-object at the TOP with a non-empty path is `Not_found`
  *    (ezjsone.ml:306) — surfaced as None here, null at the SQL layer.
  *
  * Paths are dotted member chains (`$.a.b` or `a.b`); the reference passes
  * OCaml string lists, so dots inside member names are out of scope (use the
  * list overloads for those).
  */
object JsonPath {

  /** `$.a.b` / `a.b` → List("a", "b"); `$` / "" → Nil (the whole document). */
  def parsePath(path: String): List[String] = {
    val p =
      if (path == "$" ) ""
      else if (path.startsWith("$.")) path.substring(2)
      else path
    if (p.isEmpty) Nil else p.split('.').toList
  }

  /** Ezjsone.map (ezjsone.ml:297-306): apply f at the path; None = Not_found. */
  def mapAt(t: JValue, path: List[String], f: JValue => Option[JValue]): Option[JValue] =
    path match {
      case Nil => f(t)
      case h :: tl =>
        t match {
          case JObj(fields) => Some(JObj(mapDict(fields, h, x => mapAt(x, tl, f))))
          case _            => None
        }
    }

  /** Ezjsone.update with Some v: set the member at the path. */
  def update(t: JValue, path: List[String], v: JValue): Option[JValue] =
    mapAt(t, path, _ => Some(v))

  /** Ezjsone.update with None: remove the member at the path. */
  def remove(t: JValue, path: List[String]): Option[JValue] =
    mapAt(t, path, _ => None)

  /** Ezjsone.find_opt (ezjsone.ml:271-280). */
  def find(t: JValue, path: List[String]): Option[JValue] = (path, t) match {
    case (Nil, j)               => Some(j)
    case (h :: tl, JObj(flds))  => flds.collectFirst { case (k, v) if k == h => v }
      .flatMap(find(_, tl))
    case _                      => None
  }

  /** Ezjsone.mem (ezjsone.ml:262-269). */
  def mem(t: JValue, path: List[String]): Boolean = find(t, path).isDefined

  /** map_dict (ezjsone.ml:282-295): first-match apply; None drops the
    * member; a miss applies f to JNull and appends on Some. */
  private def mapDict(fields: Vector[(String, JValue)], label: String,
                      f: JValue => Option[JValue]): Vector[(String, JValue)] = {
    val i = fields.indexWhere(_._1 == label)
    if (i < 0) f(JNull) match {
      case None    => fields
      case Some(j) => fields :+ (label -> j)
    }
    else f(fields(i)._2) match {
      case None    => fields.patch(i, Nil, 1)
      case Some(j) => fields.updated(i, (label, j))
    }
  }
}
