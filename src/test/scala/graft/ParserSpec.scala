package graft

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import graft.rdf.{NTriples, Term}
import graft.sparql.Parser

/** End-to-end SPARQL text → result tests over the same fixture graph as
  * RdfAlgebraSpec (the analogue of the reference's .rq golden files).
  */
class ParserSpec extends SparkSpecBase {

  private val EX = "http://ex/"

  private lazy val fixture: DataFrame = {
    val nt = Seq(
      s"""<${EX}alice> <${EX}worksFor> <${EX}acme> .""",
      s"""<${EX}bob> <${EX}worksFor> <${EX}acme> .""",
      s"""<${EX}carol> <${EX}worksFor> <${EX}globex> .""",
      s"""<${EX}dave> <${EX}worksFor> <${EX}globex> .""",
      s"""<${EX}acme> <${EX}name> "Acme" .""",
      s"""<${EX}globex> <${EX}name> "Globex" .""",
      s"""<${EX}alice> <${EX}age> "30"^^<${Term.XsdInteger}> .""",
      s"""<${EX}bob> <${EX}age> "25.5"^^<${Term.XsdDecimal}> .""",
      s"""<${EX}carol> <${EX}age> "41"^^<${Term.XsdInteger}> .""",
      s"""<${EX}alice> <${EX}knows> <${EX}bob> .""",
      s"""<${EX}bob> <${EX}knows> <${EX}carol> .""")
    NTriples.parseLines(spark,
      spark.createDataset(nt)(Encoders.STRING).toDF("value")).cache()
  }

  private def q(text: String): DataFrame = Parser.select(spark, fixture, text)
  private def parse(nt: Seq[String]): DataFrame =
    NTriples.parseLines(spark, spark.createDataset(nt)(Encoders.STRING).toDF("value"))
  private def lexSeq(df: DataFrame, v: String): Seq[String] =
    df.select(Term.lex(col(v))).collect().map(_.getString(0)).toSeq

  private val P = s"PREFIX ex: <$EX>\n"

  test("SELECT with prefixes, BGP, FILTER comparison") {
    val df = q(P + "SELECT ?x WHERE { ?x ex:age ?a . FILTER(?a > 26) } ORDER BY ?x")
    assert(lexSeq(df, "x") == Seq(EX + "alice", EX + "carol"))
  }

  test("OPTIONAL + BOUND") {
    val df = q(P +
      """SELECT ?x WHERE {
           ?x ex:worksFor ?o .
           OPTIONAL { ?x ex:age ?a }
           FILTER(!BOUND(?a))
         }""")
    assert(lexSeq(df, "x") == Seq(EX + "dave"))
  }

  test("UNION and DISTINCT") {
    val df = q(P +
      """SELECT DISTINCT ?n WHERE {
           { ?c ex:worksFor ?x . ?x ex:name ?n } UNION { ?x ex:name ?n }
         } ORDER BY ?n""")
    assert(lexSeq(df, "n") == Seq("Acme", "Globex"))
  }

  test("MINUS and FILTER NOT EXISTS agree here") {
    val m = q(P + "SELECT ?x WHERE { ?x ex:worksFor ?o MINUS { ?x ex:age ?a } }")
    val ne = q(P + "SELECT ?x WHERE { ?x ex:worksFor ?o FILTER NOT EXISTS { ?x ex:age ?a } }")
    assert(lexSeq(m, "x").sorted == Seq(EX + "dave"))
    assert(lexSeq(ne, "x").sorted == Seq(EX + "dave"))
  }

  // EXISTS{} as an expression *operand* outside FILTER — the reference's
  // askVar rewrite (ASTExistsOptimizer.java) applies in every expression
  // position: BIND, SELECT expression, HAVING, ORDER BY.
  test("BIND(EXISTS{} AS ?v) binds a boolean per row") {
    val df = q(P +
      """SELECT ?x ?has WHERE {
           ?x ex:worksFor ?o BIND(EXISTS { ?x ex:age ?a } AS ?has)
         } ORDER BY ?x""")
    assert(lexSeq(df, "x") ==
      Seq(EX + "alice", EX + "bob", EX + "carol", EX + "dave"))
    assert(lexSeq(df, "has") == Seq("true", "true", "true", "false"))
  }

  test("SELECT (NOT EXISTS{} AS ?v) projection expression") {
    val df = q(P +
      """SELECT ?x (NOT EXISTS { ?x ex:age ?a } AS ?no)
         WHERE { ?x ex:worksFor ?o } ORDER BY ?x""")
    assert(lexSeq(df, "no") == Seq("false", "false", "false", "true"))
  }

  test("HAVING with EXISTS over the group key") {
    val df = q(P +
      """SELECT ?o (COUNT(?x) AS ?n) WHERE { ?x ex:worksFor ?o }
         GROUP BY ?o HAVING(EXISTS { ?o ex:name "Acme" })""")
    assert(lexSeq(df, "o") == Seq(EX + "acme"))
    assert(lexSeq(df, "n") == Seq("2"))
  }

  test("ORDER BY ASC(EXISTS{}) sorts no-match rows first") {
    val df = q(P +
      """SELECT ?x WHERE { ?x ex:worksFor ?o }
         ORDER BY ASC(EXISTS { ?x ex:age ?a }) ?x""")
    assert(lexSeq(df, "x") ==
      Seq(EX + "dave", EX + "alice", EX + "bob", EX + "carol"))
  }

  test("EXISTS marker does not leak into SELECT * or corrupt later clauses") {
    val df = q(P +
      """SELECT * WHERE {
           ?x ex:knows ?y BIND(EXISTS { ?y ex:knows ?z } AS ?h)
           FILTER(?h || ?x = ex:bob)
         } ORDER BY ?x""")
    assert(df.columns.toSet == Set("x", "y", "h"))
    assert(lexSeq(df, "x") == Seq(EX + "alice", EX + "bob"))
  }

  test("decimal literal followed by statement-terminator dot (1.2. run)") {
    val df = q(P +
      "SELECT ?o WHERE { ?s ex:age 25.5. ?s ex:worksFor ?o }")
    assert(lexSeq(df, "o") == Seq(EX + "acme"))
  }

  test("CONCAT() with zero args is the empty string") {
    val df = q(P +
      """SELECT ?x (CONCAT() AS ?e) (CONCAT("a", "b", ?n) AS ?ab)
         WHERE { ?x ex:name ?n } ORDER BY ?x""")
    assert(lexSeq(df, "e") == Seq("", ""))
    assert(lexSeq(df, "ab") == Seq("abAcme", "abGlobex"))
  }

  test("DAWG bare-trailing-dot decimal still lexes as one token") {
    val df = q(P +
      "SELECT ?x WHERE { ?x ex:age ?a FILTER(?a < 456.) } ORDER BY ?x")
    assert(lexSeq(df, "x") == Seq(EX + "alice", EX + "bob", EX + "carol"))
  }

  test("BIND arithmetic and IN") {
    val df = q(P +
      """SELECT ?x ?a2 WHERE {
           ?x ex:age ?a . BIND(?a * 2 AS ?a2)
           FILTER(?x IN (ex:alice, ex:bob))
         } ORDER BY ?x""")
    assert(df.select(Term.numVal(col("a2"))).collect()
      .map(_.getDecimal(0).doubleValue()).toSeq == Seq(60.0, 51.0))
  }

  test("VALUES inline data") {
    val df = q(P +
      """SELECT ?x ?a WHERE {
           VALUES ?x { ex:alice ex:carol }
           ?x ex:age ?a
         } ORDER BY ?x""")
    assert(lexSeq(df, "a") == Seq("30", "41"))
  }

  test("aggregates with GROUP BY / HAVING and aliased expression") {
    val df = q(P +
      """SELECT ?o (COUNT(?x) AS ?n) (AVG(?a) AS ?avg) WHERE {
           ?x ex:worksFor ?o .
           OPTIONAL { ?x ex:age ?a }
         } GROUP BY ?o HAVING(COUNT(?x) > 1) ORDER BY ?o""")
    val rows = df.collect()
    assert(rows.length == 2)
    val byOrg = rows.map(r => r.getStruct(0).getString(1) ->
      r.getStruct(1).getDecimal(4).intValue()).toMap
    assert(byOrg(EX + "acme") == 2 && byOrg(EX + "globex") == 2)
  }

  test("property path + and sequence via text syntax") {
    val df = q(P + "SELECT ?y WHERE { ex:alice ex:knows+ ?y } ORDER BY ?y")
    assert(lexSeq(df, "y") == Seq(EX + "bob", EX + "carol"))
    val df2 = q(P + "SELECT ?n WHERE { ?x ex:worksFor/ex:name ?n . ?x ex:age ?a . FILTER(?a > 26) } ORDER BY ?n")
    assert(lexSeq(df2, "n") == Seq("Acme", "Globex"))
  }

  test("string functions and REGEX") {
    val df = q(P +
      """SELECT ?n ?u WHERE {
           ?x ex:name ?n . BIND(UCASE(?n) AS ?u)
           FILTER(REGEX(?n, "^A"))
         }""")
    val r = df.collect()
    assert(r.length == 1)
    assert(r(0).getStruct(1).getString(1) == "ACME")
  }

  test("ASK and CONSTRUCT from text") {
    assert(Parser.ask(spark, fixture, P + "ASK { ex:alice ex:knows ex:bob }"))
    assert(!Parser.ask(spark, fixture, P + "ASK { ex:bob ex:knows ex:alice }"))
    val g = Parser.construct(spark, fixture, P +
      """CONSTRUCT { ?x ex:colleague ?y } WHERE {
           ?x ex:worksFor ?o . ?y ex:worksFor ?o . FILTER(?x != ?y)
         }""")
    assert(g.count() == 4) // 2 pairs x 2 directions
  }

  test("sub-SELECT in a group") {
    val df = q(P +
      """SELECT ?x ?maxa WHERE {
           ?x ex:age ?maxa .
           { SELECT (MAX(?a) AS ?maxa) WHERE { ?y ex:age ?a } }
         }""")
    assert(lexSeq(df, "x") == Seq(EX + "carol"))
  }

  test("FILTER inside OPTIONAL referencing an outer var joins the LeftJoin condition") {
    // Per the W3C algebra: FILTER(?a > 26) sees the *merged* solution, so
    // alice (30) gets ?y bound, bob (25.5) and carol (41, no knows edge
    // FROM carol... carol knows nothing) keep/lose accordingly.
    val df = q(P +
      """SELECT ?x ?y WHERE {
           ?x ex:age ?a .
           OPTIONAL { ?x ex:knows ?y . FILTER(?a > 26) }
         } ORDER BY ?x""")
    val rows = df.collect().map { r =>
      (r.getStruct(0).getString(1),
       if (r.isNullAt(1)) null else r.getStruct(1).getString(1))
    }.toMap
    assert(rows(EX + "alice") == EX + "bob") // 30 > 26, knows bob
    assert(rows(EX + "bob") == null)         // 25.5 fails the condition
    assert(rows(EX + "carol") == null)       // 41 passes but no knows edge
  }

  test("badly-designed nested OPTIONAL follows bottom-up semantics") {
    // The ASTBottomUpOptimizer case (SURVEY §7.4): the inner OPTIONAL
    // references ?n, which is bound in the OUTER pattern but not in its
    // parent group. Bottom-up: the inner LeftJoin evaluates in isolation
    // (?n there comes from phone), and the outer join then rejects rows
    // whose phone-?n conflicts with name-?n — x2 loses its email binding
    // entirely. Top-down evaluation would instead keep (x2, e2).
    val data = parse(Seq(
      s"""<${EX}x1> <${EX}name> "a" .""",
      s"""<${EX}x1> <${EX}email> "e1" .""",
      s"""<${EX}x1> <${EX}phone> "a" .""",
      s"""<${EX}x2> <${EX}name> "b" .""",
      s"""<${EX}x2> <${EX}email> "e2" .""",
      s"""<${EX}x2> <${EX}phone> "c" ."""))
    val df = Parser.select(spark, data, P +
      """SELECT ?x ?n ?e WHERE {
           ?x ex:name ?n
           OPTIONAL { ?x ex:email ?e OPTIONAL { ?x ex:phone ?n } }
         } ORDER BY ?x""")
    val rows = df.collect().map { r =>
      (r.getStruct(0).getString(1), r.getStruct(1).getString(1),
       if (r.isNullAt(2)) null else r.getStruct(2).getString(1))
    }
    assert(rows(0) == ((EX + "x1", "a", "e1"))) // compatible all the way
    assert(rows(1) == ((EX + "x2", "b", null))) // phone-n "c" conflicts: optional drops
  }

  test("negative numeric literals in filters and VALUES") {
    val df = q(P + "SELECT ?x WHERE { ?x ex:age ?a . FILTER(?a > -5) } ORDER BY ?x")
    assert(df.count() == 3) // all ages exceed -5
    val spaced = q(P + "SELECT ?x WHERE { ?x ex:age ?a . FILTER(?a - 5 > 21) } ORDER BY ?x")
    assert(lexSeq(spaced, "x") == Seq(EX + "alice", EX + "carol")) // 25, 36 > 21
  }

  test("SELECT REDUCED and ORDER BY expression") {
    val red = q(P + "SELECT REDUCED ?o WHERE { ?x ex:worksFor ?o } ORDER BY ?o")
    assert(red.count() == 2)
    // order by a computed key: age descending via (0 - ?a)
    val byNegAge = q(P +
      "SELECT ?x WHERE { ?x ex:age ?a } ORDER BY (0 - ?a)")
    assert(lexSeq(byNegAge, "x") == Seq(EX + "carol", EX + "alice", EX + "bob"))
  }

  test("GROUP_CONCAT with separator and SAMPLE through text") {
    val df = q(P +
      """SELECT ?o (GROUP_CONCAT(?n; SEPARATOR=",") AS ?names) (SAMPLE(?n) AS ?one)
         WHERE { ?n ex:worksFor ?o } GROUP BY ?o ORDER BY ?o""")
    val byOrg = df.collect().map(r =>
      r.getStruct(0).getString(1) -> r.getStruct(1).getString(1)).toMap
    assert(byOrg(EX + "acme") == s"${EX}alice,${EX}bob") // sorted, joined
    assert(byOrg(EX + "globex") == s"${EX}carol,${EX}dave")
  }

  test("blank nodes in patterns are existential variables") {
    // _:who matches ANY subject, like a fresh variable — were it a constant
    // bnode term, nothing in the data would match
    val df = q(P + "SELECT ?o WHERE { _:who ex:worksFor ?o } ORDER BY ?o")
    assert(df.count() == 4)
  }

  test("aggregates over expressions rewrite to pre-group binds") {
    val df = q(P +
      """SELECT ?o (SUM(?a * 2) AS ?dbl) (COUNT(?x) AS ?n) WHERE {
           ?x ex:worksFor ?o . ?x ex:age ?a
         } GROUP BY ?o ORDER BY ?o""")
    val rows = df.collect().map(r =>
      r.getStruct(0).getString(1) -> r.getStruct(1).getDecimal(4).doubleValue()).toMap
    assert(rows(EX + "acme") == 111.0)  // (30 + 25.5) * 2
    assert(rows(EX + "globex") == 82.0) // 41 * 2
  }

  test("every registered function parses, plans, and executes") {
    // arguments per function (default: one string-literal term)
    val args = Map(
      "BOUND" -> "?v", "SAMETERM" -> "?v, ?v", "IF" -> "ISLITERAL(?v), ?v, ?v",
      "COALESCE" -> "?u, ?v", "REGEX" -> "?v, \"a\"", "CONTAINS" -> "?v, \"a\"",
      "STRSTARTS" -> "?v, \"a\"", "STRENDS" -> "?v, \"a\"",
      "CONCAT" -> "?v, \"x\"", "SUBSTR" -> "?v, 1, 2",
      "LANGMATCHES" -> "LANG(?v), \"en\"", "STRBEFORE" -> "?v, \"c\"",
      "STRAFTER" -> "?v, \"c\"", "REPLACE" -> "?v, \"a\", \"b\"",
      "ABS" -> "?n", "CEIL" -> "?n", "FLOOR" -> "?n", "ROUND" -> "?n",
      "YEAR" -> "?t", "MONTH" -> "?t", "DAY" -> "?t",
      "HOURS" -> "?t", "MINUTES" -> "?t", "SECONDS" -> "?t",
      "STRDT" -> "?v, STR(ex:dt)", "STRLANG" -> "?v, \"en\"", "TZ" -> "?t"
    ).withDefaultValue("?v")
    val binds = graft.sparql.Parser.functionNames.toSeq.sorted.zipWithIndex
      .map { case (f, i) => s"BIND($f(${args(f)}) AS ?r$i)" }.mkString("\n")
    val store = parse(Seq(
      s"""<${EX}x> <${EX}sv> "acme" .""",
      s"""<${EX}x> <${EX}nv> "7"^^<${Term.XsdInteger}> .""",
      s"""<${EX}x> <${EX}tv> "2026-03-15T10:30:00"^^<${Term.XsdDateTime}> ."""))
    val df = graft.sparql.Parser.select(spark, store, s"""PREFIX ex: <$EX>
      SELECT * WHERE {
        ?x ex:sv ?v . ?x ex:nv ?n . ?x ex:tv ?t .
        OPTIONAL { ?x ex:none ?u }
        $binds
      }""")
    assert(df.count() == 1) // all functions plan and evaluate
  }

  test("ORDER BY DESC with LIMIT/OFFSET") {
    val df = q(P +
      "SELECT ?x ?a WHERE { ?x ex:age ?a } ORDER BY DESC(?a) LIMIT 2 OFFSET 1")
    assert(lexSeq(df, "x") == Seq(EX + "alice", EX + "bob"))
  }

  test("SELECT DISTINCT preserves ORDER BY order and LIMIT picks sorted rows") {
    // two employees per employer → duplicates that dedup must collapse
    // BEFORE the sort, not after (dropDuplicates shuffles row order)
    val base = P +
      """SELECT DISTINCT ?n WHERE { ?x ex:worksFor ?c . ?c ex:name ?n }
         ORDER BY DESC(STRLEN(?n)) """
    assert(lexSeq(q(base), "n") == Seq("Globex", "Acme"))
    assert(lexSeq(q(base + "LIMIT 1"), "n") == Seq("Globex"))
    // bare-variable key, ascending
    val bare = P +
      """SELECT DISTINCT ?n WHERE { ?x ex:worksFor ?c . ?c ex:name ?n }
         ORDER BY DESC(?n) LIMIT 1"""
    assert(lexSeq(q(bare), "n") == Seq("Globex"))
  }

  test("STRAFTER takes the FIRST occurrence; STRBEFORE unchanged") {
    val df = q(P +
      """SELECT ?r ?b WHERE { ?c ex:name ?n . FILTER(?n = "Acme")
           BIND(STRAFTER("abcabc", "b") AS ?r)
           BIND(STRBEFORE("abcabc", "b") AS ?b) }""")
    assert(lexSeq(df, "r") == Seq("cabc"))
    assert(lexSeq(df, "b") == Seq("a"))
  }

  test("LANGMATCHES does RFC 4647 subtag-prefix matching") {
    val g = parse(Seq(
      s"""<${EX}d1> <${EX}label> "hello"@en-US .""",
      s"""<${EX}d2> <${EX}label> "bonjour"@fr .""",
      s"""<${EX}d3> <${EX}label> "plain" ."""))
    val en = Parser.select(spark, g, P +
      """SELECT ?x WHERE { ?x ex:label ?l . FILTER(LANGMATCHES(LANG(?l), "en")) }""")
    assert(lexSeq(en, "x") == Seq(EX + "d1"))
    val any = Parser.select(spark, g, P +
      """SELECT ?x WHERE { ?x ex:label ?l . FILTER(LANGMATCHES(LANG(?l), "*")) }
         ORDER BY ?x""")
    assert(lexSeq(any, "x") == Seq(EX + "d1", EX + "d2"))
  }

  test("query-level trailing VALUES joins before solution modifiers") {
    val df = q(P +
      """SELECT ?x ?a WHERE { ?x ex:age ?a }
         ORDER BY DESC(?a) LIMIT 1
         VALUES ?x { ex:alice ex:bob }""")
    // VALUES restricts to alice/bob BEFORE the limit: carol's higher age
    // must not absorb the LIMIT slot — alice (30) wins among the two
    assert(lexSeq(df, "x") == Seq(EX + "alice"))
  }

  test("term constructors: IRI, STRDT, STRLANG, BNODE(str), TZ") {
    val df = q(P +
      """SELECT ?i ?d ?l ?b WHERE {
           ?c ex:name ?n . FILTER(?n = "Acme")
           BIND(IRI(CONCAT("http://ex/", "made")) AS ?i)
           BIND(STRDT("42", ex:mytype) AS ?d)
           BIND(STRLANG("chat", "fr") AS ?l)
           BIND(BNODE("seed") AS ?b)
         }""")
    val r = df.head()
    assert(r.getStruct(0).getString(1) == EX + "made") // IRI lex
    val d = r.getStruct(1)
    assert(d.getString(1) == "42" && d.getString(2) == EX + "mytype")
    val l = r.getStruct(2)
    assert(l.getString(1) == "chat" && l.getString(3) == "fr")
    assert(r.getStruct(3).getByte(0) == 1) // bnode kind
    // same BNODE argument gives the same label (content-addressed)
    val b2 = q(P + """SELECT ?b WHERE { ?c ex:name "Acme" . BIND(BNODE("seed") AS ?b) }""")
    assert(b2.head().getStruct(0).getString(1) == r.getStruct(3).getString(1))
    // TZ over a zoned and unzoned dateTime (valid lexicals keep their
    // form; only bare dates normalize to a full UTC instant)
    val tz = q(P + """SELECT ?z ?u WHERE { ?c ex:name "Acme" .
        BIND(TZ("2026-01-01T10:00:00Z"^^<http://www.w3.org/2001/XMLSchema#dateTime>) AS ?z)
        BIND(TZ("2026-01-01T10:00:00"^^<http://www.w3.org/2001/XMLSchema#dateTime>) AS ?u) }""")
    val t = tz.head()
    assert(t.getStruct(0).getString(1) == "Z" && t.getStruct(1).getString(1) == "")
  }

  test("CONSTRUCT WHERE shorthand uses the pattern as template") {
    val g = Parser.construct(spark, fixture, P +
      """CONSTRUCT WHERE { ?x ex:worksFor ?o }""")
    assert(g.count() == 4)
    assert(g.filter(col("p") === Term.iri(EX + "worksFor")).count() == 4)
    assert(!g.filter(col("s") === Term.iri(EX + "alice") &&
                     col("o") === Term.iri(EX + "acme")).isEmpty)
  }

  test("property path inside GRAPH is scoped to that graph") {
    val g = parse(Seq(
      s"""<${EX}a> <${EX}k> <${EX}b> <${EX}g1> .""",
      s"""<${EX}b> <${EX}k> <${EX}c> <${EX}g1> .""",
      s"""<${EX}c> <${EX}k> <${EX}d> <${EX}g2> .""",
      s"""<${EX}a> <${EX}k> <${EX}z> ."""))
    // constant graph: closure stays inside g1 (must not reach d via g2 or
    // z via the default graph)
    val const = Parser.select(spark, g, P +
      """SELECT ?y WHERE { GRAPH <http://ex/g1> { ex:a ex:k+ ?y } } ORDER BY ?y""")
    assert(lexSeq(const, "y") == Seq(EX + "b", EX + "c"))
    // variable graph: per-graph closure, graph var binds; a→b→c only in g1
    val perG = Parser.select(spark, g, P +
      """SELECT ?g ?y WHERE { GRAPH ?g { ex:a ex:k+ ?y } } ORDER BY ?y""")
    assert(lexSeq(perG, "g") == Seq(EX + "g1", EX + "g1"))
    assert(lexSeq(perG, "y") == Seq(EX + "b", EX + "c"))
    // default graph (no GRAPH clause) still excludes named-graph edges
    val dflt = Parser.select(spark, g, P +
      """SELECT ?y WHERE { ex:a ex:k+ ?y }""")
    assert(lexSeq(dflt, "y") == Seq(EX + "z"))
  }

  test("RDF-star quoted-triple patterns bind statement identifiers") {
    import graft.rdf.QuadStore
    val base = parse(Seq(
      s"""<${EX}alice> <${EX}worksFor> <${EX}acme> .""",
      s"""<${EX}bob> <${EX}worksFor> <${EX}acme> ."""))
    // meta: only alice's statement has provenance
    val meta = base.filter(Term.lex(col("s")) === (EX + "alice"))
      .select(QuadStore.sidOf(col("s"), col("p"), col("o")).as("s"),
              Term.iri(EX + "saidBy").as("p"), Term.str("hr").as("o"),
              Term.unbound.as("c"))
    val store = base.unionByName(meta)
    val df = Parser.select(spark, store,
      s"""PREFIX ex: <$EX>
         SELECT ?x ?w WHERE { <<?x ex:worksFor ?o>> ex:saidBy ?w }""")
    assert(lexSeq(df, "x") == Seq(EX + "alice"))
    assert(lexSeq(df, "w") == Seq("hr"))
    // constant quoted triple also matches (all positions bound)
    val df2 = Parser.select(spark, store,
      s"""PREFIX ex: <$EX>
         SELECT ?w WHERE { <<ex:alice ex:worksFor ex:acme>> ex:saidBy ?w }""")
    assert(lexSeq(df2, "w") == Seq("hr"))
  }

  test("RDF-star terse Turtle data equals expanded reification via SIDs") {
    import graft.rdf.{QuadStore, Turtle}
    val tmp = java.nio.file.Files.createTempDirectory("graft-rdr")
    val terseFile = tmp.resolve("terse.ttl")
    java.nio.file.Files.writeString(terseFile,
      """@prefix : <http://example.com/> .
        |:SAP :bought :sybase .
        |<<:SAP :bought :sybase>> :src :news .
        |""".stripMargin)
    val expandedFile = tmp.resolve("expanded.ttl")
    java.nio.file.Files.writeString(expandedFile,
      """@prefix : <http://example.com/> .
        |@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
        |:SAP :bought :sybase .
        |_:s1 rdf:subject :SAP .
        |_:s1 rdf:predicate :bought .
        |_:s1 rdf:object :sybase .
        |_:s1 rdf:type rdf:Statement .
        |_:s1 :src :news .
        |""".stripMargin)
    val terse = Turtle.read(spark, terseFile.toString)
    val expanded = QuadStore.fromReified(Turtle.read(spark, expandedFile.toString))
    val query = """PREFIX : <http://example.com/>
                  |SELECT ?who ?src WHERE { <<?who :bought :sybase>> :src ?src }""".stripMargin
    def run(store: org.apache.spark.sql.DataFrame) =
      Parser.select(spark, store, query)
        .select(Term.lex(col("who")), Term.lex(col("src")))
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val (a, b) = (run(terse), run(expanded))
    assert(a == Seq(("http://example.com/SAP", "http://example.com/news")))
    assert(a == b, "terse and expanded reification must address the same SID")
  }

  test("NOW() is query-constant; fixed clock makes it replay-deterministic") {
    Parser.fixedNowForReplay = Some(java.time.Instant.parse("2026-01-02T03:04:05Z"))
    try {
      val df = q(P + "SELECT ?x (NOW() AS ?t) WHERE { ?x ex:worksFor ?o }")
      val ts = df.select(Term.lex(col("t"))).collect().map(_.getString(0)).toSet
      assert(ts == Set("2026-01-02T03:04:05Z")) // one value across all rows
      val dts = df.select(Term.dt(col("t"))).head().getString(0)
      assert(dts == Term.XsdDateTime)
    } finally Parser.fixedNowForReplay = None
  }

  test("RAND() draws doubles in [0,1), identically on replay") {
    val text = P + "SELECT ?x (RAND() AS ?r) WHERE { ?x ex:age ?a } ORDER BY ?x"
    def draw() = q(text).select(Term.numVal(col("r")))
      .collect().map(_.getDecimal(0)).toSeq
    val (a, b) = (draw(), draw())
    assert(a == b, "same query must draw the same stream")
    assert(a.forall(v => v.doubleValue >= 0.0 && v.doubleValue < 1.0))
  }

  test("UUID()/STRUUID() are row-distinct, well-formed, replay-stable") {
    val text = P + "SELECT ?x (UUID() AS ?u) (STRUUID() AS ?s) WHERE { ?x ex:age ?a }"
    val rows = q(text)
      .select(Term.lex(col("u")).as("u"), Term.lex(col("s")).as("s"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows.map(_._1).distinct.size == rows.size, "UUIDs must differ per row")
    assert(rows.forall(_._1.matches(
      "urn:uuid:[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}")))
    assert(rows.forall(_._2.matches(
      "[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}")))
    assert(rows.map(_._1) != rows.map(r => "urn:uuid:" + r._2),
      "UUID and STRUUID draw independent values")
    val replay = q(text).select(Term.lex(col("u"))).collect().map(_.getString(0)).toSeq
    assert(replay.sorted == rows.map(_._1).sorted)
  }
}
