package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import graft.rdf.{Dict, NTriples, Term}
import graft.sparql.Algebra.{C, TriplePattern, V}

/** Dictionary-encoded store: id determinism, lexicon round-trip, BGP
  * evaluation parity with the struct path.
  */
class DictSpec extends SparkSpecBase {

  private val EX = "http://ex/"

  private lazy val quads = NTriples.parseLines(spark,
    spark.createDataset(Seq(
      s"""<${EX}alice> <${EX}worksFor> <${EX}acme> .""",
      s"""<${EX}bob> <${EX}worksFor> <${EX}acme> .""",
      s"""<${EX}acme> <${EX}name> "Acme" .""",
      s"""<${EX}alice> <${EX}age> "30"^^<${Term.XsdInteger}> ."""))(Encoders.STRING)
      .toDF("value"))

  test("encode: lexicon covers every distinct term, ids are stable") {
    val st = Dict.encode(quads)
    assert(st.lexicon.count() == 8) // 5 iris + 2 literals + ... distinct terms
    // id of a reconstructed constant equals the stored id
    val aliceId = st.lexicon
      .filter(col("term") === Term.iri(EX + "alice")).select("id").head().getLong(0)
    val computed = spark.range(1)
      .select(Dict.termId(Term.iri(EX + "alice"))).head().getLong(0)
    assert(aliceId == computed)
    // re-encoding yields identical ids (content-addressed, no sequence)
    val st2 = Dict.encode(quads)
    assert(st.lexicon.except(st2.lexicon).isEmpty)
  }

  test("dict BGP equals struct BGP results") {
    val st = Dict.encode(quads)
    def tp(s: graft.sparql.Algebra.Pat, p: String, o: graft.sparql.Algebra.Pat) =
      TriplePattern(s, C(Term.iri(EX + p)), o)
    val res = Dict.bgp(st,
      Seq(tp(V("x"), "worksFor", V("org")), tp(V("org"), "name", V("n"))),
      Seq("x", "n"))
    val got = res.select(Term.lex(col("x")), Term.lex(col("n"))).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set((EX + "alice", "Acme"), (EX + "bob", "Acme")))
    // constant filter folds to an id comparison
    val one = Dict.bgp(st,
      Seq(tp(C(Term.iri(EX + "alice")), "worksFor", V("org"))), Seq("org"))
    assert(one.count() == 1)
  }

  test("bgpFilter: id-space joins, lazy decode only for filter + projection") {
    val quadsF = NTriples.parseLines(spark,
      spark.createDataset(Seq(
        s"""<${EX}alice> <${EX}age> "30"^^<${Term.XsdInteger}> .""",
        s"""<${EX}bob> <${EX}age> "25"^^<${Term.XsdInteger}> .""",
        s"""<${EX}alice> <${EX}name> "Alice" .""",
        s"""<${EX}bob> <${EX}name> "Bob" ."""))(Encoders.STRING)
        .toDF("value"))
    val st = Dict.encode(quadsF)
    def tp(s: graft.sparql.Algebra.Pat, p: String, o: graft.sparql.Algebra.Pat) =
      TriplePattern(s, C(Term.iri(EX + p)), o)
    val res = Dict.bgpFilter(st,
      Seq(tp(V("x"), "age", V("a")), tp(V("x"), "name", V("n"))),
      filters = Seq("a" -> ((a: org.apache.spark.sql.Column) =>
        graft.sparql.TermOps.gt(a, Term.num(lit(26))))),
      project = Seq("n"))
    assert(res.select(Term.lex(col("n"))).collect().map(_.getString(0)).toSeq
      == Seq("Alice"))
  }

  test("termKey separates fields: shifted boundaries don't collide") {
    // same concatenated bytes, different field splits — each pair must get
    // distinct ids ("ab"@cd vs "a"@bcd; lex/datatype shifts likewise)
    val terms = Seq(
      Term.langStr(lit("ab"), lit("cd")), Term.langStr(lit("a"), lit("bcd")),
      Term.typed(lit("ab"), lit(EX + "dt")), Term.typed(lit("a"), lit("b" + EX + "dt")),
      Term.str(lit("abcd")))
    val ids = spark.range(1).select(terms.map(Dict.termId): _*).head()
    val distinctIds = (0 until terms.size).map(ids.getLong).toSet
    assert(distinctIds.size == terms.size)
  }
}
