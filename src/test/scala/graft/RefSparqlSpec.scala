package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.rdf.{NTriples, Term, Turtle}
import graft.sparql.{Parser, QueryForms, Results, Translator}
import scala.jdk.CollectionConverters._

/** Conformance runner over golden tests ported from the reference's
  * data-driven SPARQL suite (/root/reference/bigdata-rdf/src/test/com/
  * bigdata/rdf/sparql/ast/eval/, harness pattern
  * AbstractDataDrivenSPARQLTestCase.java:113): each case is query (.rq) +
  * data (.ttl/.trig/.nt) + expected results (.srx SPARQL-XML, or a
  * -result.trig graph for CONSTRUCT).
  *
  * Manifest: refsparql/cases.tsv — caseName, query, data, expected.
  *
  * Comparison is BAG semantics (sorted rendered solutions); SELECT
  * solutions render each expected var N-Triples-style, CONSTRUCT graphs
  * compare as sorted triples with blank-node labels normalized (labels are
  * arbitrary; full bnode isomorphism is unnecessary for this corpus).
  *
  * Queries run with the reference's quads-mode dataset default: no dataset
  * clause → the default graph is the union of all graphs.
  */
class RefSparqlSpec extends SparkSpecBase
    with org.scalatest.concurrent.TimeLimitedTests {

  // one stuck case must not stall the whole conformance suite; plan
  // construction is driver-side and interruptible
  override val timeLimit = org.scalatest.time.Span(120, org.scalatest.time.Seconds)

  private val dir = Paths.get(getClass.getResource("/refsparql").toURI)

  private final case class Case(name: String, rq: String, data: String, expected: String)

  private val cases: Seq[Case] = Files.readAllLines(dir.resolve("cases.tsv")).asScala
    .filter(_.trim.nonEmpty)
    .map { line =>
      val f = line.split("\t")
      Case(f(0), f(1), f(2), f(3))
    }.toSeq

  test("refsparql case discovery") {
    assert(cases.size >= 65, s"expected >= 65 manifest rows, found ${cases.size}")
  }

  private def loadData(file: String, sidsMode: Boolean): DataFrame = {
    val p = dir.resolve(file).toString
    val raw =
      if (file.endsWith(".nt") || file.endsWith(".nq")) NTriples.read(spark, p)
      else if (file.endsWith(".trig")) Turtle.readTrig(spark, p)
      else Turtle.read(spark, p)
    // the RDR suite runs in statement-identifiers mode: classic
    // reification in the data collapses to SIDs at load
    if (sidsMode) graft.rdf.QuadStore.fromReified(raw) else raw
  }

  /** Render solutions for comparison: one tab-joined line per row in the
    * expected-vars order, bnode labels normalized, sorted (bag compare).
    */
  private def render(df: DataFrame, vars: Seq[String]): Seq[String] = {
    val cols = vars.map { v =>
      val c = if (df.columns.contains(v)) col(v) else Term.unbound
      coalesce(NTriples.termToString(c), lit(""))
    }
    df.select(concat_ws("\t", cols: _*).as("line"))
      .collect().map(_.getString(0))
      .map(_.replaceAll("_:[A-Za-z0-9_-]+", "_:b"))
      .sorted.toSeq
  }

  cases.foreach { c =>
    test(s"refsparql: ${c.name}") {
      val quads = loadData(c.data, sidsMode = c.name.startsWith("rdr"))
      val text = Files.readString(dir.resolve(c.rq))
      val q = Parser.parse(spark, text)
      val store = Parser.datasetQuads(quads, q, unionDefaultGraph = true)
      q.form match {
        case Parser.AskForm =>
          val want = "<boolean>\\s*(true|false)\\s*</boolean>".r
            .findFirstMatchIn(Files.readString(dir.resolve(c.expected)))
            .map(_.group(1).toBoolean)
            .getOrElse(fail(s"no <boolean> in ${c.expected}"))
          assert(QueryForms.ask(store, q.node) == want)
        case Parser.SelectForm =>
          val (vars, expDf) =
            Results.fromXml(spark, Files.readString(dir.resolve(c.expected)))
          val got = Translator.translate(store, q.node).df
          val (gotR, expR) = (render(got, vars), render(expDf, vars))
          assert(gotR == expR,
            s"\nvars: ${vars.mkString(",")}\ngot:\n${gotR.mkString("\n")}\nwant:\n${expR.mkString("\n")}")
        case Parser.ConstructForm | Parser.DescribeForm =>
          val expDf =
            if (c.expected.endsWith(".ttl")) Turtle.read(spark, dir.resolve(c.expected).toString)
            else Turtle.readTrig(spark, dir.resolve(c.expected).toString)
          val got =
            if (q.form == Parser.ConstructForm)
              QueryForms.construct(store, q.node, q.template)
            else Parser.describe(spark, store, text)
          val spo = Seq("s", "p", "o")
          val (gotR, expR) = (render(got, spo), render(expDf, spo))
          assert(gotR == expR,
            s"\ngot:\n${gotR.mkString("\n")}\nwant:\n${expR.mkString("\n")}")
      }
    }
  }
}
