package graft

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import graft.rdf.{NTriples, Term, Turtle}
import graft.rules.OwlSameAs
import graft.sparql.{Parser, Results}

/** Coverage additions: Turtle reader, owl:sameAs reasoning, result sinks,
  * datetime/hash SPARQL functions.
  */
class CoverageSpec extends SparkSpecBase {

  private val EX = "http://ex/"

  test("Turtle subset: prefixes, abbreviations, typed/lang literals, bnodes") {
    val ttl = s"""
      @prefix ex: <$EX> .
      @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
      # a comment
      ex:alice ex:worksFor ex:acme ;
               ex:age "30"^^xsd:integer ;
               ex:nick "ali"@en , "al" .
      ex:acme ex:name "Acme Corp" ;
              ex:rating 4.5 ;
              ex:active true .
      _:b1 ex:knows ex:alice .
      ex:bob ex:address [ ex:city "Berlin" ] .
    """
    val df = Turtle.read(spark, writeTmp("cov.ttl", ttl))
    assert(df.count() == 10)
    // typed number normalized
    val rating = df.filter(col("p") === Term.iri(EX + "rating"))
      .select(Term.numVal(col("o"))).head().getDecimal(0)
    assert(rating.doubleValue() == 4.5)
    // lang literal
    assert(df.filter(col("o") === Term.langStr(lit("ali"), lit("en"))).count() == 1)
    // anon bnode produced a subject for the nested triple
    val city = df.filter(col("p") === Term.iri(EX + "city")).select("s").head().getStruct(0)
    assert(city.getByte(0) == 1)
  }

  test("RDF/XML subset: typed nodes, resources, literals with lang/datatype") {
    val xml = s"""<?xml version="1.0"?>
      <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
               xmlns:ex="$EX">
        <ex:Person rdf:about="${EX}alice">
          <ex:name xml:lang="en">Alice</ex:name>
          <ex:age rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">30</ex:age>
          <ex:worksFor rdf:resource="${EX}acme"/>
          <ex:address>
            <rdf:Description>
              <ex:city>Berlin</ex:city>
            </rdf:Description>
          </ex:address>
        </ex:Person>
      </rdf:RDF>"""
    val df = graft.rdf.RdfXml.read(spark, writeTmp("cov.rdf", xml))
    assert(df.count() == 6) // type + name + age + worksFor + address + city
    // typed node element produced the rdf:type triple
    assert(df.filter(col("o") === Term.iri(EX + "Person")).count() == 1)
    // typed literal normalized numerically
    val age = df.filter(col("p") === Term.iri(EX + "age"))
      .select(Term.numVal(col("o"))).head().getDecimal(0)
    assert(age.intValue() == 30)
    // lang literal preserved
    assert(df.filter(col("o") === Term.langStr(lit("Alice"), lit("en"))).count() == 1)
    // nested bnode object chains
    val city = df.filter(col("p") === Term.iri(EX + "city")).select("s").head().getStruct(0)
    assert(city.getByte(0) == 1)
  }

  test("Turtle collections expand to rdf:first/rdf:rest/rdf:nil") {
    val Rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    val ttl = s"""
      @prefix ex: <$EX> .
      ex:menu ex:items ( ex:soup "bread" 3 ) .
      ex:empty ex:items () .
    """
    val df = Turtle.read(spark, writeTmp("coll.ttl", ttl)).cache()
    // 2 statement triples + 3 first + 3 rest
    assert(df.count() == 8)
    assert(df.filter(col("p") === Term.iri(Rdf + "first")).count() == 3)
    // exactly one cell terminates the chain; the empty list IS rdf:nil
    assert(df.filter(col("p") === Term.iri(Rdf + "rest") &&
                     col("o") === Term.iri(Rdf + "nil")).count() == 1)
    assert(df.filter(col("s") === Term.iri(EX + "empty") &&
                     col("o") === Term.iri(Rdf + "nil")).count() == 1)
    // list items: iri, plain literal, integer all present as rdf:first objects
    val firsts = df.filter(col("p") === Term.iri(Rdf + "first"))
    assert(firsts.filter(col("o") === Term.iri(EX + "soup")).count() == 1)
    assert(firsts.filter(Term.lex(col("o")) === "bread").count() == 1)
    df.unpersist()
  }

  test("RDF/XML parseType: Collection, Resource, Literal") {
    val Rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    val xml = s"""<?xml version="1.0"?>
      <rdf:RDF xmlns:rdf="$Rdf" xmlns:ex="$EX">
        <rdf:Description rdf:about="${EX}menu">
          <ex:items rdf:parseType="Collection">
            <rdf:Description rdf:about="${EX}soup"/>
            <rdf:Description rdf:about="${EX}salad"/>
          </ex:items>
          <ex:detail rdf:parseType="Resource">
            <ex:kind>lunch</ex:kind>
          </ex:detail>
          <ex:markup rdf:parseType="Literal">bold text</ex:markup>
        </rdf:Description>
      </rdf:RDF>"""
    val df = graft.rdf.RdfXml.read(spark, writeTmp("pt.rdf", xml)).cache()
    // collection: items + 2 first + 2 rest; resource: detail + kind; literal: 1
    assert(df.filter(col("p") === Term.iri(Rdf + "first")).count() == 2)
    assert(df.filter(col("p") === Term.iri(Rdf + "rest") &&
                     col("o") === Term.iri(Rdf + "nil")).count() == 1)
    // parseType=Resource hangs properties off an implicit bnode
    val kindSubj = df.filter(col("p") === Term.iri(EX + "kind"))
      .select("s").head().getStruct(0)
    assert(kindSubj.getByte(0) == 1)
    // parseType=Literal keeps content as rdf:XMLLiteral
    assert(df.filter(col("p") === Term.iri(EX + "markup") &&
                     Term.dt(col("o")) === (Rdf + "XMLLiteral")).count() == 1)
    df.unpersist()
  }

  test("owl:sameAs: canonicalize merges cliques; expand materializes variants") {
    val nt = Seq(
      s"<${EX}a1> <${OwlSameAs.SameAs}> <${EX}a2> .",
      s"<${EX}a2> <${OwlSameAs.SameAs}> <${EX}a3> .",
      s"<${EX}a3> <${EX}likes> <${EX}pizza> .",
      s"<${EX}b> <${EX}knows> <${EX}a2> .")
    val quads = NTriples.parseLines(spark,
      spark.createDataset(nt)(Encoders.STRING).toDF("value"))
    val canon = OwlSameAs.canonicalize(quads)
    // a1 is the lexical minimum: both statements rewrite onto a1
    assert(!canon.filter(col("s") === Term.iri(EX + "a1") &&
                         col("p") === Term.iri(EX + "likes")).isEmpty)
    assert(!canon.filter(col("o") === Term.iri(EX + "a1") &&
                         col("p") === Term.iri(EX + "knows")).isEmpty)
    assert(canon.count() == 2)
    val exp = OwlSameAs.expand(quads)
    // likes holds for a1, a2, a3; knows targets all three
    assert(exp.filter(col("p") === Term.iri(EX + "likes")).count() == 3)
    assert(exp.filter(col("p") === Term.iri(EX + "knows")).count() == 3)
  }

  test("result sinks: SPARQL JSON and XML") {
    val nt = Seq(
      s"""<${EX}x> <${EX}name> "Nørd" .""",
      s"""<${EX}x> <${EX}age> "30"^^<${Term.XsdInteger}> .""")
    val quads = NTriples.parseLines(spark,
      spark.createDataset(nt)(Encoders.STRING).toDF("value"))
    val sols = Parser.select(spark, quads,
      s"PREFIX ex: <$EX> SELECT ?n ?a WHERE { ?x ex:name ?n . ?x ex:age ?a }")
    val json = Results.toJson(sols)
    assert(json.contains(""""vars":["n","a"]"""))
    assert(json.contains(""""type":"literal","value":"Nørd""""))
    assert(json.contains(s""""datatype":"${Term.XsdInteger}""""))
    val xml = Results.toXml(sols)
    assert(xml.contains("""<variable name="n"/>"""))
    assert(xml.contains(s"""<literal datatype="${Term.XsdInteger}">30</literal>"""))
    // round-trips through Python's json parser (sanity via structure)
    assert(json.count(_ == '{') == json.count(_ == '}'))
  }

  test("DESCRIBE from query text: constants and WHERE-bound targets") {
    val nt = Seq(
      s"<${EX}a> <${EX}p> <${EX}b> .",
      s"<${EX}b> <${EX}p> <${EX}c> .",
      s"""<${EX}a> <${EX}name> "A" .""")
    val quads = NTriples.parseLines(spark,
      spark.createDataset(nt)(Encoders.STRING).toDF("value"))
    val byConst = Parser.describe(spark, quads, s"DESCRIBE <${EX}a>")
    assert(byConst.count() == 2) // a's out-edges: p->b, name
    val byWhere = Parser.describe(spark, quads,
      s"PREFIX ex: <$EX> DESCRIBE ?x WHERE { ?x ex:p <${EX}c> }")
    assert(byWhere.count() == 2) // b: in-edge from a, out-edge to c
  }

  test("EXPLAIN renders algebra, scope analysis, and the physical plan") {
    val quads = NTriples.parseLines(spark, spark.createDataset(Seq(
      s"<${EX}a> <${EX}p> <${EX}b> ."))(Encoders.STRING).toDF("value"))
    val ex = graft.sparql.Explain.explain(spark, quads, s"""
      PREFIX ex: <$EX>
      SELECT ?x WHERE { ?x ex:p ?y OPTIONAL { ?y ex:p ?z } } ORDER BY ?x LIMIT 5""")
    val out = ex.render
    assert(out.contains("LeftJoin") && out.contains("Slice(offset=0, limit=5)"))
    assert(ex.certainVars == Set("x"))
    assert(out.contains("== physical plan"))
    assert(out.contains("Scan ExistingRDD") || out.contains("Project"))
    // EXISTS in an expression position surfaces the marker count — the
    // engine-level marker-join count plan guards key off
    val ex2 = graft.sparql.Explain.explain(spark, quads, s"""
      PREFIX ex: <$EX>
      SELECT ?x WHERE {
        ?x ex:p ?y
        FILTER(EXISTS { ?y ex:p ?z } || EXISTS { ?x ex:q ?w })
      }""")
    val out2 = ex2.render
    assert(ex2.existsMarkers == 2)
    assert(out2.contains("FilterExists(markers=2:"))
    assert(out2.contains("exists markers: 2"))
    // a bound-endpoint closure path surfaces the seeded-frontier plan
    // choice; a var-var closure stays on the full doubling closure
    val ex3 = graft.sparql.Explain.explain(spark, quads, s"""
      PREFIX ex: <$EX> SELECT ?y WHERE { ex:a ex:p+ ?y }""")
    assert(ex3.render.contains("Path(OneOrMore, seeded)"))
    val ex4 = graft.sparql.Explain.explain(spark, quads, s"""
      PREFIX ex: <$EX> SELECT ?x ?y WHERE { ?x ex:p+ ?y }""")
    assert(ex4.render.contains("Path(OneOrMore)"))
  }

  test("CSV sink round-trips term rendering distributed") {
    val quads = NTriples.parseLines(spark, spark.createDataset(Seq(
      s"""<${EX}x> <${EX}name> "A,B" .""",
      s"""<${EX}x> <${EX}age> "3"^^<${Term.XsdInteger}> ."""))(Encoders.STRING)
      .toDF("value"))
    val sols = Parser.select(spark, quads,
      s"PREFIX ex: <$EX> SELECT ?n ?a WHERE { ?x ex:name ?n . ?x ex:age ?a }")
    val path = "/tmp/graft_csv_sink"
    Results.writeCsv(sols, path)
    val back = spark.read.option("header", "true").csv(path).collect()
    assert(back.length == 1)
    // SPARQL 1.1 CSV is the LOSSY plain form: bare lexical values, RFC
    // 4180 quoting only for the comma (round-tripped by the reader)
    assert(back(0).getString(0) == "A,B")
    assert(back(0).getString(1) == "3")
  }

  test("datetime and hash functions in SPARQL text") {
    val nt = Seq(
      s"""<${EX}e> <${EX}at> "2026-03-15T10:30:00"^^<${Term.XsdDateTime}> .""")
    val quads = NTriples.parseLines(spark,
      spark.createDataset(nt)(Encoders.STRING).toDF("value"))
    val df = Parser.select(spark, quads, s"""PREFIX ex: <$EX>
      SELECT ?y ?mo ?h ?hash WHERE {
        ?e ex:at ?t .
        BIND(YEAR(?t) AS ?y) BIND(MONTH(?t) AS ?mo) BIND(HOURS(?t) AS ?h)
        BIND(SHA256(STR(?e)) AS ?hash)
      }""")
    val r = df.head()
    def numAt(i: Int) = r.getStruct(i).getDecimal(4).intValue()
    assert(numAt(0) == 2026 && numAt(1) == 3 && numAt(2) == 10)
    assert(r.getStruct(3).getString(1).length == 64)
  }

  private def writeTmp(name: String, content: String): String = {
    val p = java.nio.file.Paths.get(s"/tmp/graft_$name")
    java.nio.file.Files.writeString(p, content)
    p.toString
  }
}
