package graft

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import graft.rdf.{NTriples, QuadStore, Term}
import graft.sparql._
import graft.sparql.Algebra._

/** SPARQL semantics tests over tiny hand-written fixtures, mirroring the
  * reference's data-driven golden tests (AbstractDataDrivenSPARQLTestCase).
  */
class RdfAlgebraSpec extends SparkSpecBase {

  private val EX = "http://ex/"
  private def ex(s: String) = EX + s

  private lazy val fixture: DataFrame = {
    val nt = Seq(
      s"""<${ex("alice")}> <${ex("worksFor")}> <${ex("acme")}> .""",
      s"""<${ex("bob")}> <${ex("worksFor")}> <${ex("acme")}> .""",
      s"""<${ex("carol")}> <${ex("worksFor")}> <${ex("globex")}> .""",
      s"""<${ex("dave")}> <${ex("worksFor")}> <${ex("globex")}> .""",
      s"""<${ex("acme")}> <${ex("name")}> "Acme" .""",
      s"""<${ex("globex")}> <${ex("name")}> "Globex" .""",
      s"""<${ex("alice")}> <${ex("age")}> "30"^^<${Term.XsdInteger}> .""",
      s"""<${ex("bob")}> <${ex("age")}> "25.5"^^<${Term.XsdDecimal}> .""",
      s"""<${ex("dave")}> <${ex("age")}> "abc" .""",
      s"""<${ex("alice")}> <${ex("knows")}> <${ex("bob")}> .""",
      s"""<${ex("bob")}> <${ex("knows")}> <${ex("carol")}> .""",
      s"""<${ex("carol")}> <${ex("knows")}> <${ex("alice")}> .""",
      s"""<${ex("m1")}> <${ex("val")}> "10"^^<${Term.XsdInteger}> .""",
      s"""<${ex("m2")}> <${ex("val")}> "9"^^<${Term.XsdDecimal}> .""",
      s"""<${ex("m3")}> <${ex("val")}> "text" .""",
      s"""<${ex("m4")}> <${ex("val")}> <${ex("someiri")}> ."""
    )
    val lines = spark.createDataset(nt)(Encoders.STRING).toDF("value")
    NTriples.parseLines(spark, lines).cache()
  }

  private def tp(s: Pat, p: String, o: Pat) = TriplePattern(s, C(Term.iri(ex(p))), o)
  private def lexOf(df: DataFrame, v: String): Seq[String] =
    df.select(Term.lex(col(v))).collect().map(_.getString(0)).toSeq

  test("N-Triples parser: kinds, datatypes, numeric normalization") {
    assert(fixture.count() == 16)
    val age = fixture.filter(col("p") === Term.iri(ex("age")) &&
                             col("s") === Term.iri(ex("bob")))
      .select(Term.numVal(col("o"))).head().getDecimal(0)
    assert(age.doubleValue() == 25.5)
  }

  test("BGP self-join: worksFor + name") {
    val q = Bgp(Seq(tp(V("x"), "worksFor", V("org")), tp(V("org"), "name", V("n"))))
    val res = Translator.translate(fixture, q)
    assert(res.df.count() == 4)
    assert(res.certain == Set("x", "org", "n"))
  }

  test("OPTIONAL: unmatched left rows keep unbound right vars") {
    val q = LeftJoin(Bgp(Seq(tp(V("x"), "worksFor", V("org")))),
                     Bgp(Seq(tp(V("x"), "age", V("a")))))
    val res = Translator.translate(fixture, q)
    val rows = res.df.collect()
    assert(rows.length == 4)
    assert(rows.count(_.isNullAt(res.df.columns.indexOf("a"))) == 1) // carol
    assert(res.maybe.contains("a"))
  }

  test("FILTER: type error counts as false") {
    // ?a > 26: alice(30) passes; bob(25.5) fails; dave("abc") errors->false
    val q = Filter(r => TermOps.gt(r("a"), Term.num(lit(26))),
                   Bgp(Seq(tp(V("x"), "age", V("a")))))
    val res = Translator.translate(fixture, q)
    assert(lexOf(res.df, "x") == Seq(ex("alice")))
  }

  test("FILTER on OPTIONAL var: unbound is an error, row dropped") {
    val q = Filter(r => TermOps.gt(r("a"), Term.num(lit(0))),
      LeftJoin(Bgp(Seq(tp(V("x"), "worksFor", V("org")))),
               Bgp(Seq(tp(V("x"), "age", V("a"))))))
    assert(Translator.translate(fixture, q).df.count() == 2) // alice, bob
  }

  test("UNION pads disjoint vars with unbound and keeps duplicates") {
    val q = Union(Bgp(Seq(tp(V("x"), "worksFor", V("org")))),
                  Bgp(Seq(tp(V("x"), "age", V("a")))))
    val res = Translator.translate(fixture, q)
    assert(res.df.count() == 7)
    assert(res.certain == Set("x"))
    assert(res.maybe == Set("org", "a"))
  }

  test("MINUS removes compatible solutions; disjoint-domain MINUS is a no-op") {
    val hasAge = Bgp(Seq(tp(V("x"), "age", V("a"))))
    val workers = Bgp(Seq(tp(V("x"), "worksFor", V("org"))))
    val r1 = Translator.translate(fixture, Minus(workers, hasAge))
    assert(lexOf(r1.df, "x") == Seq(ex("carol")))
    // no shared vars: nothing removed
    val disjoint = Minus(workers, Bgp(Seq(tp(V("y"), "age", V("b")))))
    assert(Translator.translate(fixture, disjoint).df.count() == 4)
  }

  test("FILTER EXISTS and NOT EXISTS") {
    val workers = Bgp(Seq(tp(V("x"), "worksFor", V("org"))))
    val knowsSomeone = Bgp(Seq(tp(V("x"), "knows", V("y"))))
    val e = Translator.translate(fixture, ExistsFilter(workers, knowsSomeone, negated = false))
    assert(e.df.count() == 3) // alice, bob, carol
    val ne = Translator.translate(fixture, ExistsFilter(workers, knowsSomeone, negated = true))
    assert(lexOf(ne.df, "x") == Seq(ex("dave")))
  }

  test("BIND extends solutions; arithmetic promotes numerics") {
    val q = Extend("a2", r => TermOps.arith(r("a"), Term.num(lit(2)), _ * _),
                   Bgp(Seq(tp(V("x"), "age", V("a")))))
    val res = Translator.translate(fixture, q)
    val byX = res.df.select(Term.lex(col("x")), Term.numVal(col("a2"))).collect()
      .map(r => (r.getString(0), Option(r.getDecimal(1)).map(_.doubleValue()))).toMap
    assert(byX(ex("alice")) == Some(60.0))
    assert(byX(ex("bob")) == Some(51.0))
    assert(byX(ex("dave")).isEmpty) // "abc" -> type error -> unbound
  }

  test("ORDER BY follows the SPARQL total order: IRIs < numerics < strings") {
    val q = OrderBy(Seq("v" -> true), Bgp(Seq(tp(V("x"), "val", V("v")))))
    val res = Translator.translate(fixture, q)
    assert(lexOf(res.df, "v")
      == Seq(ex("someiri"), "9", "10", "text"))
  }

  test("aggregation: COUNT / SUM with sticky errors / MIN by total order") {
    val q = Group(Seq("org"),
      Seq("n" -> Aggs.countVar("x"), "total" -> Aggs.sumVar("a"),
          "youngest" -> Aggs.minVar("a")),
      LeftJoin(Bgp(Seq(tp(V("x"), "worksFor", V("org")))),
               Bgp(Seq(tp(V("x"), "age", V("a"))))))
    val res = Translator.translate(fixture, q)
    val rows = res.df.select(Term.lex(col("org")),
        Term.numVal(col("n")), Term.numVal(col("total"))).collect()
      .map(r => r.getString(0) -> ((r.getDecimal(1).intValue(),
                 Option(r.getDecimal(2)).map(_.doubleValue())))).toMap
    assert(rows(ex("acme")) == ((2, Some(55.5))))
    assert(rows(ex("globex")) == ((2, None))) // dave's "abc" poisons SUM
  }

  test("property paths: + with a cycle terminates, * adds identity") {
    val plus = Translator.translate(fixture,
      PathPattern(C(Term.iri(ex("alice"))), OneOrMore(Link(ex("knows"))), V("y")))
    assert(lexOf(plus.df, "y").sorted
      == Seq(ex("alice"), ex("bob"), ex("carol")))
    val seq = Translator.translate(fixture,
      PathPattern(V("x"), PSeq(Link(ex("worksFor")), Link(ex("name"))), V("n")))
    assert(seq.df.count() == 4)
    val inv = Translator.translate(fixture,
      PathPattern(C(Term.iri(ex("acme"))), Inv(Link(ex("worksFor"))), V("who")))
    assert(inv.df.count() == 2)
  }

  test("property paths: a 200-hop chain closes completely (path doubling)") {
    // regression: one-hop closure growth under the 64-round bound silently
    // truncated any path longer than 65 edges; doubling closes a D-chain
    // in ceil(log2 D) rounds, so 200 hops take 8
    val n = 200
    val chain = NTriples.parseLines(spark,
      spark.createDataset((1 until n).map(i =>
        s"<${ex(s"n$i")}> <${ex("next")}> <${ex(s"n${i + 1}")}> ."))(
        Encoders.STRING).toDF("value"))
    val r = Translator.translate(chain,
      PathPattern(V("x"), OneOrMore(Link(ex("next"))), V("y")))
    // all ordered pairs i<j reachable: n*(n-1)/2
    assert(r.df.count() == n.toLong * (n - 1) / 2)
    // the longest path (n1 -> n200) is present
    val ends = Translator.translate(chain,
      PathPattern(C(Term.iri(ex("n1"))), OneOrMore(Link(ex("next"))), V("y")))
    assert(lexOf(ends.df, "y").contains(ex(s"n$n")))
  }

  test("seeded closure: cycle re-enters the seed, components stay disjoint, object-bound walks inverse") {
    // a -> b -> c -> a (cycle) and an unrelated island x -> y
    val g = NTriples.parseLines(spark,
      spark.createDataset(Seq(
        s"<${ex("a")}> <${ex("next")}> <${ex("b")}> .",
        s"<${ex("b")}> <${ex("next")}> <${ex("c")}> .",
        s"<${ex("c")}> <${ex("next")}> <${ex("a")}> .",
        s"<${ex("x")}> <${ex("next")}> <${ex("y")}> ."))(
        Encoders.STRING).toDF("value"))
    // + from a: the cycle brings a itself back; the island never appears
    val plus = Translator.translate(g,
      PathPattern(C(Term.iri(ex("a"))), OneOrMore(Link(ex("next"))), V("y")))
    assert(lexOf(plus.df, "y").sorted == Seq(ex("a"), ex("b"), ex("c")))
    // * from a: same set (identity already in the cycle's answer)
    val star = Translator.translate(g,
      PathPattern(C(Term.iri(ex("a"))), ZeroOrMore(Link(ex("next"))), V("y")))
    assert(lexOf(star.df, "y").sorted == Seq(ex("a"), ex("b"), ex("c")))
    // * from the island's leaf: zero-length only
    val leaf = Translator.translate(g,
      PathPattern(C(Term.iri(ex("y"))), ZeroOrMore(Link(ex("next"))), V("z")))
    assert(lexOf(leaf.df, "z") == Seq(ex("y")))
    // object-bound: ?x next+ y walks the inverse — only the island's root
    val objBound = Translator.translate(g,
      PathPattern(V("x"), OneOrMore(Link(ex("next"))), C(Term.iri(ex("y")))))
    assert(lexOf(objBound.df, "x") == Seq(ex("x")))
    // both endpoints bound: reachable and unreachable
    assert(Translator.translate(g, PathPattern(C(Term.iri(ex("a"))),
      OneOrMore(Link(ex("next"))), C(Term.iri(ex("c"))))).df.count() == 1)
    assert(Translator.translate(g, PathPattern(C(Term.iri(ex("a"))),
      OneOrMore(Link(ex("next"))), C(Term.iri(ex("y"))))).df.count() == 0)
    // constant GRAPH scope: the seeded walk stays inside the named graph
    val g1 = Term.iri(ex("g1"))
    val named = g.filter(col("s") === Term.iri(ex("a")) ||
                         col("s") === Term.iri(ex("x")))
      .withColumn("c", g1)
    val store = g.unionByName(named)
    val scoped = Translator.translate(store,
      PathPattern(C(Term.iri(ex("a"))), OneOrMore(Link(ex("next"))), V("y"),
                  g = Some(C(g1))))
    // only a->b is in g1 (b's and c's edges are default-graph only)
    assert(lexOf(scoped.df, "y") == Seq(ex("b")))
  }

  test("path connectives: alternative, zero-or-one, negated set") {
    // alt: worksFor | knows from alice
    val alt = Translator.translate(fixture,
      PathPattern(C(Term.iri(ex("alice"))),
        Alt(Link(ex("worksFor")), Link(ex("knows"))), V("y")))
    assert(lexOf(alt.df, "y").sorted == Seq(ex("acme"), ex("bob")))
    // zero-or-one: knows? from alice = alice itself + bob
    val zoo = Translator.translate(fixture,
      PathPattern(C(Term.iri(ex("alice"))), ZeroOrOne(Link(ex("knows"))), V("y")))
    assert(lexOf(zoo.df, "y").sorted == Seq(ex("alice"), ex("bob")))
    // negated set: alice's edges that are NOT worksFor/knows = age only
    val neg = Translator.translate(fixture,
      PathPattern(C(Term.iri(ex("alice"))),
        NegatedSet(Seq(ex("worksFor"), ex("knows"))), V("y")))
    assert(lexOf(neg.df, "y") == Seq("30"))
  }

  test("GRAPH patterns bind the context variable") {
    val g1 = Term.iri(ex("g1"))
    val named = fixture.limit(0)
      .unionByName(fixture.filter(col("p") === Term.iri(ex("worksFor")))
        .withColumn("c", g1))
    val store = fixture.unionByName(named)
    val q = GraphNode(V("g"), Bgp(Seq(tp(V("x"), "worksFor", V("org")))))
    val res = Translator.translate(store, q)
    assert(res.df.count() == 4)
    assert(res.certain.contains("g"))
    // constant graph
    val qc = GraphNode(C(g1), Bgp(Seq(tp(V("x"), "worksFor", V("org")))))
    assert(Translator.translate(store, qc).df.count() == 4)
  }

  test("VALUES joins as an inline solution set") {
    val vdf = spark.createDataset(Seq(ex("alice"), ex("carol")))(Encoders.STRING)
      .toDF("value").select(Term.iri(col("value")).as("x"))
    val q = Join(Bgp(Seq(tp(V("x"), "worksFor", V("org")))),
                 Values(vdf, Set("x")))
    assert(Translator.translate(fixture, q).df.count() == 2)
  }

  test("DISTINCT / projection / slice") {
    val q = Slice(0, 2,
      OrderBy(Seq("org" -> true),
        Distinct(Project(Seq("org"), Bgp(Seq(tp(V("x"), "worksFor", V("org"))))))))
    val res = Translator.translate(fixture, q)
    assert(res.df.count() == 2)
  }

  test("ASK / CONSTRUCT with deterministic bnodes / DESCRIBE") {
    import QueryForms._
    assert(ask(fixture, Bgp(Seq(tp(V("x"), "knows", C(Term.iri(ex("bob"))))))))
    assert(!ask(fixture, Bgp(Seq(tp(V("x"), "knows", C(Term.iri(ex("dave"))))))))

    val tmpl = Seq[(TPos, TPos, TPos)](
      (TBnode("emp"), TConst(Term.iri(ex("employedBy"))), TVar("org")),
      (TBnode("emp"), TConst(Term.iri(ex("person"))), TVar("x")))
    val g = construct(fixture, Bgp(Seq(tp(V("x"), "worksFor", V("org")))), tmpl)
    assert(g.count() == 8) // 4 solutions x 2 template triples
    // same solution => same bnode across the two triples
    assert(g.select(Term.lex(col("s"))).distinct().count() == 4)

    val nodes = fixture.select(col("s").as("n"))
      .filter(col("n") === Term.iri(ex("alice")))
    val cbd = describe(fixture, nodes)
    assert(cbd.count() == 4) // alice: worksFor, age, knows-out, knows-in
  }

  test("NTriples round-trip preserves the store") {
    val path = "/tmp/graft_nt_roundtrip"
    NTriples.write(fixture, path)
    val back = NTriples.read(spark, path)
    assert(back.count() == fixture.count())
    assert(back.except(fixture).isEmpty && fixture.except(back).isEmpty)
  }

  test("NTriples round-trip survives quotes, newlines, tabs in literals") {
    import org.apache.spark.sql.Encoders
    val nasty = Seq(
      "<http://ex/x> <http://ex/p> \"line\\nbreak and \\\"quote\\\" and\\ttab\" .",
      "<http://ex/x> <http://ex/q> \"back\\\\slash\"@en .")
    val quads = NTriples.parseLines(spark,
      spark.createDataset(nasty)(Encoders.STRING).toDF("value"))
    val path = "/tmp/graft_nt_nasty"
    NTriples.write(quads, path)
    val back = NTriples.read(spark, path)
    assert(back.count() == 2)
    assert(back.except(quads).isEmpty && quads.except(back).isEmpty)
    // the parsed lex really contains the control characters
    val lex = quads.filter(col("p") === Term.iri("http://ex/p"))
      .select(Term.lex(col("o"))).head().getString(0)
    assert(lex.contains("\n") && lex.contains("\"") && lex.contains("\t"))
  }

  test("QuadStore update ops: insert / delete / clearGraph") {
    val add = fixture.filter(col("p") === Term.iri(ex("knows")))
      .withColumn("o", Term.iri(ex("zed")))
    val s2 = QuadStore.insert(fixture, add)
    assert(s2.count() == fixture.count() + 3)
    val s3 = QuadStore.delete(s2, add)
    assert(s3.count() == fixture.count())
    val g1 = Term.iri(ex("g1"))
    val withG = QuadStore.insert(fixture, add.withColumn("c", g1))
    assert(QuadStore.clearGraph(withG, g1).count() == fixture.count())
  }
}
