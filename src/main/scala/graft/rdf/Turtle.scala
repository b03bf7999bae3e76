package graft.rdf

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Turtle reader: @prefix/PREFIX, @base/BASE with RFC 3986 relative-IRI
  * resolution, IRIs (with \u escapes), prefixed names, `a`, literals with
  * language tags / datatypes, short and long (`\"\"\"`) string forms with the
  * full ECHAR + UCHAR escape set, numeric (integer/decimal/double) +
  * boolean shorthand, `;` and `,` abbreviations, labelled and anonymous
  * (`[...]`) blank nodes, collections `(...)` (expanded to
  * rdf:first/rdf:rest/rdf:nil cells), comments. Plain-Turtle mode rejects
  * TriG graph blocks (N3 `{}` formulae are not Turtle).
  *
  * Reference: the RIO Turtle parser wired through StatementBuffer
  * (/root/reference/bigdata-rdf/src/java/com/bigdata/rdf/rio/turtle/,
  * rio/StatementBuffer.java:87).
  *
  * Scale posture: Turtle is not line-splittable (prefixes scope the whole
  * document), so parallelism is per *file* — `wholeTextFiles` distributes
  * one parse task per file, the standard approach for bulk Turtle corpora
  * (which ship as many files).
  */
object Turtle {

  private val rowSchema = StructType(Seq(
    StructField("s", Term.schema), StructField("p", Term.schema),
    StructField("o", Term.schema), StructField("c", Term.schema)))

  def read(spark: SparkSession, path: String, base: String = ""): DataFrame = {
    val rdd = spark.sparkContext.wholeTextFiles(path)
      .flatMap { case (_, content) => parseDoc(content, base) }
      .map { case (s, p, o) => Row(s, p, o, null) }
    spark.createDataFrame(rdd, rowSchema)
  }

  /** TriG reader: Turtle plus `<g> { ... }` / `GRAPH <g> { ... }` blocks
    * (reference ships its named-graph test data as TriG; RIO wires
    * TriGParser through the same StatementBuffer). Statements outside a
    * block land in the default graph (c = null).
    */
  def readTrig(spark: SparkSession, path: String, base: String = ""): DataFrame = {
    val rdd = spark.sparkContext.wholeTextFiles(path)
      .flatMap { case (_, content) => parseQuads(content, base) }
      .map { case (s, p, o, c) => Row(s, p, o, c) }
    spark.createDataFrame(rdd, rowSchema)
  }

  type T = Row // term struct row

  private val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val RdfType = RdfNs + "type"
  private val RdfFirst = RdfNs + "first"
  private val RdfRest = RdfNs + "rest"
  private val RdfNil = RdfNs + "nil"

  private def iriRow(lex: String) = Row(0.toByte, lex, null, null, null)
  private def bnodeRow(label: String) = Row(1.toByte, label, null, null, null)

  private def litRow(lex: String, dt: String, lang: String) = {
    val num = Term.litNumSlot(lex, dt)
    val lex2 =
      if (num != null && Term.numericDatatypes(dt)) Term.canonicalNumLex(lex)
      else lex
    Row(2.toByte, lex2, dt, if (lang == null) null else lang.toLowerCase, num)
  }

  /** Parse one Turtle document into statements (strict Turtle — TriG
    * graph blocks are a syntax error here).
    */
  def parseDoc(content: String, base: String = ""): Iterator[(T, T, T)] =
    new TtlParser(content, base, trig = false).document()
      .map { case (s, p, o, _) => (s, p, o) }

  /** Parse one TriG (or plain Turtle) document into quads; c is null for
    * default-graph statements.
    */
  def parseQuads(content: String, base: String = ""): Iterator[(T, T, T, T)] =
    new TtlParser(content, base, trig = true).document()

  private class TtlParser(s: String, initialBase: String, trig: Boolean) {
    private var i = 0
    private val n = s.length
    private var prefixes = Map.empty[String, String]
    private var base: String = initialBase
    private var bnodeId = 0
    private var graph: T = null
    private var inBlock = false
    private val out = Vector.newBuilder[(T, T, T, T)]

    private def ws(): Unit = {
      var go = true
      while (go && i < n) {
        val c = s.charAt(i)
        if (c == '#') { while (i < n && s.charAt(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') i += 1
        else go = false
      }
    }

    private def peekCh: Char = if (i < n) s.charAt(i) else '\u0000'

    /** `:-` graph-assignment connector (original TriG spec) -- only when
      * followed by whitespace or the block brace, so prefixed names with a
      * '-' local part are unaffected.
      */
    private def graphAssignAt(p: Int): Boolean =
      s.startsWith(":-", p) &&
        (p + 2 >= n || s.charAt(p + 2).isWhitespace || s.charAt(p + 2) == '{')

    def document(): Iterator[(T, T, T, T)] = {
      ws()
      while (i < n) {
        if (s.startsWith("@prefix", i) || s.regionMatches(true, i, "PREFIX", 0, 6)) {
          val atForm = s.charAt(i) == '@'
          i += (if (atForm) 7 else 6)
          ws()
          val colon = s.indexOf(':', i)
          require(colon >= 0 && s.substring(i, colon).indexWhere(
                    c => c.isWhitespace || c == '<') < 0,
                  s"prefix name must end in ':' at $i")
          val pfx = s.substring(i, colon).trim
          i = colon + 1
          ws()
          require(peekCh == '<', s"expected IRI in prefix decl at $i")
          val end = s.indexOf('>', i)
          // the namespace resolves against the current base (spec §6.3)
          prefixes += pfx -> Iri.resolve(
            Iri.decodeUchar(s.substring(i + 1, end)), base)
          i = end + 1
          ws()
          if (peekCh == '.') { i += 1; ws() }
        } else if (s.startsWith("@base", i) ||
                   (s.regionMatches(true, i, "BASE", 0, 4) &&
                    i + 4 < n && (s.charAt(i + 4).isWhitespace || s.charAt(i + 4) == '<'))) {
          val atForm = s.charAt(i) == '@'
          i += (if (atForm) 5 else 4)
          ws()
          require(peekCh == '<', s"expected IRI in base decl at $i")
          val end = s.indexOf('>', i)
          // a new @base resolves against the one in force before it
          base = Iri.resolve(Iri.decodeUchar(s.substring(i + 1, end)), base)
          i = end + 1
          ws()
          if (peekCh == '.') { i += 1; ws() }
        } else if (peekCh == '{') {
          require(trig, s"graph blocks are TriG, not Turtle (offset $i)")
          graphBlock(null) // TriG default-graph block
        } else if (trig && graphAssignAt(i)) {
          // old-TriG `:- { ... }` with no name: the default graph
          i += 2
          graphBlock(null)
        } else {
          // TriG: an optional GRAPH keyword, then a node followed by '{'
          // opens a named-graph block; otherwise the node is a subject.
          val hadGraphKw = trig && s.regionMatches(true, i, "GRAPH", 0, 5) &&
            i + 5 < n && (s.charAt(i + 5).isWhitespace || s.charAt(i + 5) == '<')
          if (hadGraphKw) { i += 5; ws() }
          val node = subjectTerm()
          ws()
          // `<g> :- { ... }` is the original TriG spec's optional graph-
          // assignment connector (kept by Sesame's TriG suite)
          if (trig && graphAssignAt(i)) { i += 2; ws() }
          if (hadGraphKw || (trig && peekCh == '{')) graphBlock(node)
          else {
            predicateObjectList(node)
            ws()
            require(peekCh == '.', s"expected '.' at offset $i: ...${s.substring(math.max(0, i - 20), math.min(n, i + 5))}")
            i += 1
          }
        }
        ws()
      }
      out.result().iterator
    }

    private def graphBlock(g: T): Unit = {
      ws()
      require(peekCh == '{', s"expected '{' at $i")
      i += 1
      graph = g
      inBlock = true
      ws()
      while (peekCh != '}' && i < n) {
        statement()
        ws()
      }
      require(peekCh == '}', s"unterminated graph block at $i")
      i += 1
      graph = null
      inBlock = false
      ws()
      if (peekCh == '.') i += 1 // optional terminator after a block
    }

    private def statement(): Unit = {
      val subj = subjectTerm()
      predicateObjectList(subj)
      ws()
      // inside a graph block the last statement's '.' is optional
      if (peekCh == '.') i += 1
      else require(inBlock && peekCh == '}',
        s"expected '.' at offset $i: ...${s.substring(math.max(0, i - 20), math.min(n, i + 5))}")
    }

    private def predicateObjectList(subj: T): Unit = {
      var go = true
      while (go) {
        ws()
        val pred = predicateTerm()
        var more = true
        while (more) {
          ws()
          val obj = objectTerm()
          out += ((subj, pred, obj, graph))
          ws()
          if (peekCh == ',') { i += 1 } else more = false
        }
        if (peekCh == ';') { i += 1; ws(); if (peekCh == '.' || peekCh == ']' || peekCh == '}') go = false }
        else go = false
      }
    }

    private def subjectTerm(): T = {
      ws()
      peekCh match {
        case '<' if i + 1 < n && s.charAt(i + 1) == '<' => quotedTriple()
        case '<' => iri()
        case '_' => bnodeLabel()
        case '[' => anonBnode()
        case '(' => collection()
        case _ => iriRow(pname())
      }
    }

    /** RDF-star terse syntax `<< s p o >>`: the quoted statement's SID (a
      * content-addressed bnode, same addressing as QuadStore.sidOf). Per
      * the reference's RDR fixtures, quoting DESCRIBES the statement — it
      * does not assert it.
      */
    private def quotedTriple(): T = {
      i += 2 // '<<'
      val qs = subjectTerm(); ws()
      val qp = predicateTerm(); ws()
      val qo = objectTerm(); ws()
      require(i + 1 < n && s.charAt(i) == '>' && s.charAt(i + 1) == '>',
        s"unterminated quoted triple at $i")
      i += 2
      def render(t: T) = NTriples.termToStringJvm(
        t.getByte(0), t.getString(1), t.getString(2), t.getString(3))
      // join with \u0001 exactly like QuadStore.sidOf's concat_ws
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(Seq(render(qs), render(qp), render(qo))
          .mkString("\u0001").getBytes("UTF-8"))
      bnodeRow("sid-" + md.map("%02x".format(_)).mkString)
    }

    private def predicateTerm(): T = {
      ws()
      if (peekCh == '<') iri()
      else {
        val start = i
        val name = pnameToken()
        if (name == "a") iriRow(RdfType)
        else { i = start; iriRow(pname()) }
      }
    }

    private def objectTerm(): T = {
      ws()
      peekCh match {
        case '<' if i + 1 < n && s.charAt(i + 1) == '<' => quotedTriple()
        case '<' => iri()
        case '_' => bnodeLabel()
        case '[' => anonBnode()
        case '(' => collection()
        case '"' | '\'' => literal()
        case c if c.isDigit || c == '-' || c == '+' ||
                  (c == '.' && i + 1 < n && s.charAt(i + 1).isDigit) => number()
        case _ =>
          val start = i
          val tok = pnameToken()
          if (tok == "true" || tok == "false")
            litRow(tok, Term.XsdBoolean, null)
          else { i = start; iriRow(pname()) }
      }
    }

    private def iri(): T = {
      val end = s.indexOf('>', i)
      require(end >= 0, s"unterminated IRI at $i")
      val lex = s.substring(i + 1, end)
      i = end + 1
      iriRow(Iri.resolve(Iri.decodeUchar(lex), base))
    }

    private def bnodeLabel(): T = {
      require(s.charAt(i + 1) == ':', "bad bnode label")
      i += 2
      val st = i
      // PN_CHARS: letters, digits, '_', '-'; '.' only mid-label
      while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_' ||
             s.charAt(i) == '-' ||
             (s.charAt(i) == '.' && i + 1 < n &&
              (s.charAt(i + 1).isLetterOrDigit || s.charAt(i + 1) == '_')))) i += 1
      bnodeRow(s.substring(st, i))
    }

    private def anonBnode(): T = {
      i += 1 // '['
      bnodeId += 1
      val node = bnodeRow(s"anon$bnodeId")
      ws()
      if (peekCh != ']') predicateObjectList(node)
      ws()
      require(peekCh == ']', s"expected ']' at $i")
      i += 1
      node
    }

    /** RDF collection `( item... )` → linked list of fresh bnode cells via
      * rdf:first/rdf:rest, terminated by rdf:nil; `()` is rdf:nil itself.
      */
    private def collection(): T = {
      i += 1 // '('
      ws()
      val items = Vector.newBuilder[T]
      while (peekCh != ')' && i < n) { items += objectTerm(); ws() }
      require(peekCh == ')', s"unterminated collection at $i")
      i += 1
      val list = items.result()
      if (list.isEmpty) iriRow(RdfNil)
      else {
        val cells = list.map { _ => bnodeId += 1; bnodeRow(s"anon$bnodeId") }
        cells.lazyZip(list).lazyZip(cells.indices).foreach { (cell, item, idx) =>
          out += ((cell, iriRow(RdfFirst), item, graph))
          val rest = if (idx == list.size - 1) iriRow(RdfNil) else cells(idx + 1)
          out += ((cell, iriRow(RdfRest), rest, graph))
        }
        cells.head
      }
    }

    private def pnameToken(): String = {
      val st = i
      // '{'/'}' end a token too: TriG graph names may abut their block
      while (i < n && !" \t\n\r<>\"'.,;[](){}#".contains(s.charAt(i))) i += 1
      s.substring(st, i)
    }

    private def pname(): String = {
      val tok = pnameToken()
      val idx = tok.indexOf(':')
      require(idx >= 0, s"not a prefixed name: '$tok' at $i")
      val pfx = tok.substring(0, idx)
      prefixes.get(pfx) match {
        case Some(ns) => ns + tok.substring(idx + 1)
        case None => throw new IllegalArgumentException(s"unknown prefix '$pfx:'")
      }
    }

    private def number(): T = {
      val st = i
      if (peekCh == '-' || peekCh == '+') i += 1
      var isDec = false
      var isDouble = false
      var done = false
      while (!done && i < n && (s.charAt(i).isDigit || s.charAt(i) == '.' ||
             s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
        s.charAt(i) match {
          case '.' =>
            // trailing '.' is the statement terminator
            if (i + 1 >= n || !s.charAt(i + 1).isDigit) done = true
            else { isDec = true; i += 1 }
          case 'e' | 'E' =>
            // exponent makes it a DOUBLE; sign directly after is legal
            isDouble = true
            i += 1
            if (i < n && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
            require(i < n && s.charAt(i).isDigit, s"malformed double exponent at $i")
          case _ => i += 1
        }
      }
      val dt = if (isDouble) Term.XsdDouble
               else if (isDec) Term.XsdDecimal else Term.XsdInteger
      litRow(s.substring(st, i), dt, null)
    }

    private def literal(): T = {
      val quote = peekCh
      // long string form: """...""" / '''...''' — may span lines and
      // contain unescaped quotes (fewer than 3 in a row)
      val long = i + 2 < n && s.charAt(i + 1) == quote && s.charAt(i + 2) == quote
      i += (if (long) 3 else 1)
      val sb = new StringBuilder
      def atEnd: Boolean =
        if (long) s.charAt(i) == quote && i + 2 < n &&
          s.charAt(i + 1) == quote && s.charAt(i + 2) == quote
        else s.charAt(i) == quote
      var closed = false
      while (!closed && i < n) {
        if (atEnd) closed = true
        else if (s.charAt(i) == '\\' && i + 1 < n) {
          s.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case '"' => sb.append('"'); i += 2
            case '\'' => sb.append('\''); i += 2
            case '\\' => sb.append('\\'); i += 2
            case 'u' | 'U' =>
              val width = if (s.charAt(i + 1) == 'u') 4 else 8
              require(i + 2 + width <= n, s"truncated unicode escape at $i")
              sb.appendAll(Character.toChars(
                Integer.parseInt(s.substring(i + 2, i + 2 + width), 16)))
              i += 2 + width
            case other =>
              throw new IllegalArgumentException(
                s"illegal string escape '\\$other' at $i")
          }
        } else if (!long && (s.charAt(i) == '\n' || s.charAt(i) == '\r')) {
          throw new IllegalArgumentException(
            s"unescaped newline in short string literal at $i")
        } else { sb.append(s.charAt(i)); i += 1 }
      }
      require(closed, s"unterminated string literal at $i")
      i += (if (long) 3 else 1)
      if (peekCh == '@') {
        i += 1
        val st = i
        while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '-')) i += 1
        litRow(sb.toString, null, s.substring(st, i))
      } else if (i + 1 < n && peekCh == '^' && s.charAt(i + 1) == '^') {
        i += 2
        val dt = if (peekCh == '<') { val t = iri(); t.getString(1) } else pname()
        litRow(sb.toString, dt, null)
      } else litRow(sb.toString, Term.XsdString, null)
    }
  }
}
