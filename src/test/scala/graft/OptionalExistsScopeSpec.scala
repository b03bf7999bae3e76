package graft

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import graft.rdf.{NTriples, Term}
import graft.sparql.Parser

/** 18.2 LeftJoin filter scope: EXISTS inside an OPTIONAL's FILTER
  * evaluates over the MERGED solution, so it sees variables bound only on
  * the left side of the OPTIONAL (the reference evaluates the askVar
  * subquery with the upstream bindings in scope — pipelined joins).
  */
class OptionalExistsScopeSpec extends SparkSpecBase {

  private val EX = "http://ex/"
  private def intLit(n: Int) =
    s""""$n"^^<http://www.w3.org/2001/XMLSchema#integer>"""

  private lazy val quads: DataFrame = {
    val nt = Seq(
      s"<${EX}a> <${EX}p> ${intLit(1)} .",
      s"<${EX}a> <${EX}q> ${intLit(2)} .",
      s"<${EX}a> <${EX}r> ${intLit(9)} .",   // a has :r but NOT with ?v=1
      s"<${EX}b> <${EX}p> ${intLit(1)} .",
      s"<${EX}b> <${EX}q> ${intLit(2)} .",   // b has no :r at all
      s"<${EX}c> <${EX}p> ${intLit(1)} .",
      s"<${EX}c> <${EX}q> ${intLit(2)} .",
      s"<${EX}c> <${EX}r> ${intLit(1)} .")   // c's :r matches ?v=1
    NTriples.parseLines(spark,
      spark.createDataset(nt)(Encoders.STRING).toDF("value"))
  }

  private def rows(q: String): Seq[(String, String)] =
    Parser.select(spark, quads, q)
      .select(Term.lex(col("x")), Term.lex(col("y")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted

  test("EXISTS in OPTIONAL filter sees the outer binding") {
    val got = rows(s"""
      PREFIX ex: <$EX>
      SELECT ?x ?y WHERE {
        ?x ex:p ?v OPTIONAL { ?x ex:q ?y FILTER EXISTS { ?x ex:r ?v } }
      }""")
    // a's :r is 9 != v=1 -> EXISTS false -> optional unmatched;
    // b has no :r -> unmatched; c matches
    assert(got == Seq((EX + "a", null), (EX + "b", null), (EX + "c", "2")))
  }

  test("NOT EXISTS in OPTIONAL filter sees the outer binding") {
    val got = rows(s"""
      PREFIX ex: <$EX>
      SELECT ?x ?y WHERE {
        ?x ex:p ?v OPTIONAL { ?x ex:q ?y FILTER NOT EXISTS { ?x ex:r ?v } }
      }""")
    assert(got == Seq((EX + "a", "2"), (EX + "b", "2"), (EX + "c", null)))
  }

  test("EXISTS in OPTIONAL filter combined with a plain condition") {
    val got = rows(s"""
      PREFIX ex: <$EX>
      SELECT ?x ?y WHERE {
        ?x ex:p ?v
        OPTIONAL { ?x ex:q ?y FILTER(?y = 2 && EXISTS { ?x ex:r ?v }) }
      }""")
    assert(got == Seq((EX + "a", null), (EX + "b", null), (EX + "c", "2")))
  }

  test("inner-scoped EXISTS stays a plain semi-join inside the optional") {
    // no outer refs: behavior identical to the pre-hoist path, and the
    // algebra keeps the EXISTS inside the right operand (no marker binds)
    val q = Parser.parse(spark, s"""
      PREFIX ex: <$EX>
      SELECT ?x ?y WHERE {
        ?x ex:p ?v OPTIONAL { ?x ex:q ?y FILTER EXISTS { ?x ex:r ?w } }
      }""")
    import graft.sparql.Algebra
    def hasBindfulLeftJoin(n: Algebra.Node): Boolean = n match {
      case Algebra.LeftJoin(l, r, _, ex) =>
        ex.nonEmpty || hasBindfulLeftJoin(l) || hasBindfulLeftJoin(r)
      case _ => false
    }
    assert(!hasBindfulLeftJoin(q.node), "inner-scoped EXISTS was hoisted")
    val got = rows(s"""
      PREFIX ex: <$EX>
      SELECT ?x ?y WHERE {
        ?x ex:p ?v OPTIONAL { ?x ex:q ?y FILTER EXISTS { ?x ex:r ?w } }
      }""")
    assert(got == Seq((EX + "a", "2"), (EX + "b", null), (EX + "c", "2")))
  }

  test("hoisted path plans hash semi/anti joins, no cartesian, no leaked columns") {
    val df = Parser.select(spark, quads, s"""
      PREFIX ex: <$EX>
      SELECT ?x ?y WHERE {
        ?x ex:p ?v OPTIONAL { ?x ex:q ?y FILTER EXISTS { ?x ex:r ?v } }
      }""")
    assert(!df.columns.exists(c => c.startsWith("__ex_") || c.startsWith("__lj_")),
           s"internal columns leaked: ${df.columns.mkString(",")}")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"),
           s"hoisted EXISTS lost its semi/anti marker joins:\n$p")
    assert(!p.contains("CartesianProduct"),
           s"hoisted EXISTS planned a cartesian product:\n$p")
  }

  test("duplicate left rows keep bag semantics through the hoisted path") {
    val nt = Seq(
      s"<${EX}a> <${EX}p> ${intLit(1)} .",
      s"<${EX}a> <${EX}p2> ${intLit(1)} .",  // second binding row for a
      s"<${EX}a> <${EX}q> ${intLit(2)} .",
      s"<${EX}a> <${EX}r> ${intLit(9)} .")
    val g = NTriples.parseLines(spark,
      spark.createDataset(nt)(Encoders.STRING).toDF("value"))
    // UNION gives TWO identical left solutions {x=a, v=1}; both must
    // surface as unmatched rows (EXISTS false for each)
    val df = Parser.select(spark, g, s"""
      PREFIX ex: <$EX>
      SELECT ?x ?y WHERE {
        { ?x ex:p ?v } UNION { ?x ex:p2 ?v }
        OPTIONAL { ?x ex:q ?y FILTER EXISTS { ?x ex:r ?v } }
      }""")
    val got = df.select(Term.lex(col("x")), Term.lex(col("y")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq((EX + "a", null), (EX + "a", null)))
  }
}
