package graft.rdf

/** RFC 3986 §5 relative-reference resolution over raw strings.
  *
  * `java.net.URI` is unusable here: it rejects the unencoded unicode IRIs
  * that RDF documents (and the W3C test suites' i18n cases) legitimately
  * contain. The RDF readers resolve every relative IRI against the
  * document base (@base / BASE directives, or the caller-supplied base),
  * matching the reference's RIO parsers which inherit Sesame's
  * ParsedURI resolution (/root/reference/bigdata-rdf/src/java/com/bigdata/
  * rdf/rio/ — RIO delegates to org.openrdf.rio's base-URI handling).
  */
object Iri {

  private val SchemePat = "(?s)^([A-Za-z][A-Za-z0-9+.-]*):(.*)$".r

  /** Resolve `ref` against `base`. An empty/null base, a base without a
    * scheme, or an already-absolute ref returns `ref` unchanged.
    */
  def resolve(ref: String, base: String): String = {
    if (base == null || base.isEmpty) return ref
    ref match { case SchemePat(_, _) => return ref; case _ => }
    val (scheme, rest) = base match {
      case SchemePat(s, r) => (s, r)
      case _ => return ref
    }
    val noFrag = { val h = rest.indexOf('#'); if (h >= 0) rest.substring(0, h) else rest }
    val (authority, pathQuery) =
      if (noFrag.startsWith("//")) {
        val end = noFrag.indexWhere(c => c == '/' || c == '?', 2)
        if (end < 0) (noFrag, "") else (noFrag.substring(0, end), noFrag.substring(end))
      } else ("", noFrag)
    val (bPath, bQuery) = {
      val q = pathQuery.indexOf('?')
      if (q >= 0) (pathQuery.substring(0, q), pathQuery.substring(q))
      else (pathQuery, "")
    }
    if (ref.isEmpty) return scheme + ":" + authority + bPath + bQuery
    if (ref.startsWith("#")) return scheme + ":" + authority + bPath + bQuery + ref
    if (ref.startsWith("//")) return scheme + ":" + ref
    if (ref.startsWith("?")) return scheme + ":" + authority + bPath + ref
    val cut = ref.indexWhere(c => c == '?' || c == '#')
    val (rPath, rTail) =
      if (cut < 0) (ref, "") else (ref.substring(0, cut), ref.substring(cut))
    val merged =
      if (rPath.startsWith("/")) rPath
      else {
        val slash = bPath.lastIndexOf('/')
        (if (slash >= 0) bPath.substring(0, slash + 1) else "") + rPath
      }
    scheme + ":" + authority + removeDotSegments(merged) + rTail
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  def removeDotSegments(path: String): String = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) {
        in = "/" + in.substring(4)
        if (out.nonEmpty) out.remove(out.size - 1)
      } else if (in == "/..") {
        in = "/"
        if (out.nonEmpty) out.remove(out.size - 1)
      } else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.startsWith("/")) 1 else 0
        val next = in.indexOf('/', start)
        val seg = if (next < 0) in else in.substring(0, next)
        out += seg
        in = if (next < 0) "" else in.substring(next)
      }
    }
    out.mkString
  }

  /** Decode \\uXXXX and \\UXXXXXXXX escapes (Turtle UCHAR — legal in
    * IRIREF and string literals).
    */
  def decodeUchar(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length && (s.charAt(i + 1) == 'u' || s.charAt(i + 1) == 'U')) {
        val width = if (s.charAt(i + 1) == 'u') 4 else 8
        require(i + 2 + width <= s.length, s"truncated \\${s.charAt(i + 1)} escape")
        val cp = Integer.parseInt(s.substring(i + 2, i + 2 + width), 16)
        sb.appendAll(Character.toChars(cp))
        i += 2 + width
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
