package graft

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import graft.rdf.{NTriples, Term}
import graft.sparql.{Algebra, Explain, Parser}

/** Query-hint surface (the reference's QueryHints.java:74 / hint: namespace,
  * applied by ASTQueryHintOptimizer.java:180). Two hints carry plan effect
  * here — optimizer "None" pins written join order (Bgp.fixedOrder),
  * optimizer "Runtime" activates the sampled RTO; the rest are recorded on
  * the Query and surfaced by EXPLAIN. Hints never change results.
  */
class HintsSpec extends SparkSpecBase {

  private val EX = "http://ex/"
  private val P = s"PREFIX ex: <$EX>\n"

  private lazy val fixture: DataFrame = {
    val nt = Seq(
      s"""<${EX}alice> <${EX}worksFor> <${EX}acme> .""",
      s"""<${EX}bob> <${EX}worksFor> <${EX}acme> .""",
      s"""<${EX}carol> <${EX}worksFor> <${EX}globex> .""",
      s"""<${EX}acme> <${EX}name> "Acme" .""",
      s"""<${EX}globex> <${EX}name> "Globex" .""",
      s"""<${EX}alice> <${EX}age> "30"^^<${Term.XsdInteger}> .""")
    NTriples.parseLines(spark,
      spark.createDataset(nt)(Encoders.STRING).toDF("value")).cache()
  }

  private def lexSeq(df: DataFrame, v: String): Seq[String] =
    df.select(Term.lex(col(v))).collect().map(_.getString(0)).toSeq

  private val joinQuery =
    """SELECT ?c ?n WHERE {
         ?c ex:worksFor ?x ; ex:age ?a .
         ?x ex:name ?n .
       } ORDER BY ?c"""

  test("hint statements parse, are recorded, and do not bind or match") {
    val q = Parser.parse(spark, P +
      """SELECT ?c WHERE {
           hint:Query hint:optimizer "None" .
           hint:Query hint:analytic "true" .
           hint:Query hint:chunkSize "1000" .
           ?c ex:worksFor ?x .
         } ORDER BY ?c""")
    assert(q.hints("optimizer") == "None")
    assert(q.hints("analytic") == "true")
    assert(q.hints("chunkSize") == "1000")
    // projection unaffected; hint subjects/objects never become patterns
    val df = Parser.select(spark, fixture, P +
      """SELECT ?c WHERE {
           hint:Query hint:analytic "true" .
           ?c ex:worksFor ?x .
         } ORDER BY ?c""")
    assert(lexSeq(df, "c") == Seq(EX + "alice", EX + "bob", EX + "carol"))
  }

  test("optimizer None pins written order structurally and preserves results") {
    val hinted = Parser.parse(spark, P +
      s"""SELECT ?c ?n WHERE { hint:Query hint:optimizer "None" .
          ?c ex:worksFor ?x ; ex:age ?a . ?x ex:name ?n . } ORDER BY ?c""")
    var sawFixed = false
    Algebra.transformBgps(hinted.node) { b => sawFixed ||= b.fixedOrder; b }
    assert(sawFixed, "optimizer=None should set fixedOrder on BGPs")
    val unhinted = Parser.parse(spark, P + joinQuery)
    var anyFixed = false
    Algebra.transformBgps(unhinted.node) { b => anyFixed ||= b.fixedOrder; b }
    assert(!anyFixed, "no hint, no pin")
    val a = Parser.select(spark, fixture, P +
      s"""SELECT ?c ?n WHERE { hint:Query hint:optimizer "None" .
          ?c ex:worksFor ?x ; ex:age ?a . ?x ex:name ?n . } ORDER BY ?c""")
    val b = Parser.select(spark, fixture, P + joinQuery)
    assert(a.collect().toSeq == b.collect().toSeq)
  }

  test("optimizer Runtime (sampled RTO) yields identical results") {
    val a = Parser.select(spark, fixture, P +
      s"""SELECT ?c ?n WHERE { hint:Query hint:optimizer "Runtime" .
          ?c ex:worksFor ?x ; ex:age ?a . ?x ex:name ?n . } ORDER BY ?c""")
    val b = Parser.select(spark, fixture, P + joinQuery)
    assert(a.collect().toSeq == b.collect().toSeq)
  }

  test("Runtime join-order search dodges a skewed mid-join the greedy order hits") {
    // A: 20 x's all in one group (join fan-out on ?g); B: that group fans
    // to 30 y's; C: 40 flag rows, exactly ONE on an x. Every pattern has
    // boundness 1, so the static order is the written order A,B,C — whose
    // mid-join A⋈B is 20×30 = 600 rows. Cheapest-per-pattern greedy agrees
    // (card(B)=30 < card(C)=40). The measured search instead runs the flag
    // join second: prefix cards 20 → 1 → 30.
    val nt = (1 to 20).map(i => s"<${EX}x$i> <${EX}inGroup> <${EX}g0> .") ++
      (1 to 30).map(j => s"<${EX}g0> <${EX}groupOf> <${EX}y$j> .") ++
      Seq(s"<${EX}x1> <${EX}flag> <${EX}on> .") ++
      (1 to 39).map(k => s"<${EX}z$k> <${EX}flag> <${EX}on> .")
    val quads = NTriples.parseLines(spark,
      spark.createDataset(nt)(Encoders.STRING).toDF("value"))
    // the skewed mid-join the written order pays, measured
    assert(Parser.select(spark, quads, P +
      "SELECT ?x ?g ?y WHERE { ?x ex:inGroup ?g . ?g ex:groupOf ?y }")
      .count() == 600L)
    val q = Parser.parse(spark, P +
      """SELECT ?y WHERE {
           ?x ex:inGroup ?g . ?g ex:groupOf ?y . ?x ex:flag ?f .
         }""")
    val res = graft.sparql.Translator.translateSampled(quads, q.node, fraction = 1.0)
    assert(res.df.count() == 30L)
    val d = graft.sparql.Translator.lastRtoDecision.get
    assert(d.searched == 3, s"expected full search over 3 patterns: $d")
    assert(d.order(1).contains("flag"),
           s"search should run the selective flag join second, got: ${d.order}")
    assert(d.prefixCards == Seq(20L, 1L, 30L),
           s"measured prefix cards should be 20 -> 1 -> 30: ${d.prefixCards}")
    // EXPLAIN prints the chosen order with the estimates
    val e = Explain.explain(spark, quads, P +
      """SELECT ?y WHERE { hint:Query hint:optimizer "Runtime" .
           ?x ex:inGroup ?g . ?g ex:groupOf ?y . ?x ex:flag ?f . }""")
    assert(e.render.contains("runtime optimizer (sampled join-order search)"))
    assert(e.render.contains("flag"), e.render)
    // ordering never changes results
    val hinted = res.df.select(Term.lex(col("y"))).collect().map(_.getString(0)).sorted
    val unhinted = Parser.select(spark, quads, P +
      "SELECT ?y WHERE { ?x ex:inGroup ?g . ?g ex:groupOf ?y . ?x ex:flag ?f }")
      .select(Term.lex(col("y"))).collect().map(_.getString(0)).sorted
    assert(hinted.toSeq == unhinted.toSeq)
  }

  test("runFirst/runLast record as pass-through hints") {
    val q = Parser.parse(spark, P +
      """SELECT ?c WHERE {
           ?c ex:worksFor ?x .
           hint:Prior hint:runFirst "true" .
           ?x ex:name ?n .
         }""")
    assert(q.hints("runFirst") == "true")
  }

  test("EXPLAIN surfaces recorded hints") {
    val e = Explain.explain(spark, fixture, P +
      """SELECT ?c WHERE {
           hint:Query hint:optimizer "None" .
           hint:Query hint:maxParallel "8" .
           ?c ex:worksFor ?x . ?x ex:name ?n .
         }""")
    assert(e.hints == Map("optimizer" -> "None", "maxParallel" -> "8"))
    assert(e.render.contains("== query hints =="))
    assert(e.render.contains("optimizer = None"))
    assert(e.algebra.contains("fixedOrder"))
  }

  test("ASK and CONSTRUCT accept hints") {
    assert(Parser.ask(spark, fixture, P +
      """ASK { hint:Query hint:optimizer "Runtime" . ?c ex:worksFor ?x }"""))
    val g = Parser.construct(spark, fixture, P +
      """CONSTRUCT { ?c ex:member ?x } WHERE {
           hint:Query hint:optimizer "None" .
           ?c ex:worksFor ?x . }""")
    assert(g.count() == 3)
  }
}
