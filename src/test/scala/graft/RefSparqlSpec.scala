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
  // construction is driver-side and interruptible. 300s: cases run in
  // 1-10s alone, but this host shows 10-30x hypervisor swings and two
  // cases (property-paths-7, sparql11-bindings-01) hit a 120s limit late
  // in a full run while passing in 16s isolated.
  override val timeLimit = org.scalatest.time.Span(300, org.scalatest.time.Seconds)


  private val dir = Paths.get(getClass.getResource("/refsparql").toURI)

  private final case class Case(name: String, rq: String, data: String, expected: String)

  private val cases: Seq[Case] = Files.readAllLines(dir.resolve("cases.tsv")).asScala
    .filter(_.trim.nonEmpty)
    .map { line =>
      val f = line.split("\t")
      Case(f(0), f(1), f(2), f(3))
    }.toSeq

  test("refsparql case discovery") {
    assert(cases.size >= 300, s"expected >= 300 manifest rows, found ${cases.size}")
  }

  private def loadOne(file: String): DataFrame = {
    val p = dir.resolve(file).toString
    // .gz fixtures (LUBM-U1.rdf.gz, barData.trig.gz) decompress
    // transparently in wholeTextFiles; detect the format on the inner name
    val f = file.stripSuffix(".gz")
    val df =
      if (f.endsWith(".nt") || f.endsWith(".nq")) NTriples.read(spark, p)
      else if (f.endsWith(".trig")) Turtle.readTrig(spark, p)
      else if (f.endsWith(".rdf")) graft.rdf.RdfXml.read(spark, p)
      else Turtle.read(spark, p)
    normalizeDateTimes(df)
  }

  /** The reference stores xsd:dateTime as UTC epoch millis and re-renders
    * in UTC (DateTimeExtension): bare dates become the UTC midnight
    * instant and explicit non-Z offsets convert to the UTC instant. This
    * dialect transform is applied at load HERE (the W3C TCK pins the
    * opposite, lexical-form-preserving behavior).
    */
  private def normalizeDateTimes(df: DataFrame): DataFrame = {
    val canon = org.apache.spark.sql.functions.udf(
      (lex: String) => Term.canonicalDateTimeLex(lex))
    def fix(c: org.apache.spark.sql.Column) =
      when(Term.isLiteral(c) && Term.dt(c) === Term.XsdDateTime,
           org.apache.spark.sql.functions.struct(
             Term.kind(c).as("kind"), canon(Term.lex(c)).as("lex"),
             Term.dt(c).as("dt"), Term.lang(c).as("lang"),
             Term.numVal(c).as("num")))
        .otherwise(c)
    df.select(fix(col("s")).as("s"), fix(col("p")).as("p"),
              fix(col("o")).as("o"), col("c"))
  }

  private def loadData(spec: String, sidsMode: Boolean): DataFrame = {
    val files = spec.split(";").toSeq
    val raw =
      if (files.size == 1) loadOne(files.head)
      else
        // multi-file case (TestHelper's String[] dataFileURLs): the
        // reference loads each data URL as its own context in quads mode,
        // so default-graph statements take the file URL as their graph
        files.map { f =>
          loadOne(f).withColumn("c",
            coalesce(col("c"), Term.iri(lit("file:" + f))))
        }.reduce(_ unionByName _)
    // the RDR suite runs in statement-identifiers mode: classic
    // reification in the data collapses to SIDs at load
    if (sidsMode) graft.rdf.QuadStore.fromReified(raw) else raw
  }

  /** Per-case environment the reference harness sets up in code: custom
    * functions (TestCustomFunction.java:84), mock internal services
    * (TestBigdataNativeServiceEvaluation.java:120), and durable named
    * solution sets (TestInclude.java:140). Registrations are idempotent
    * and IRIs are case-private, so no teardown is needed.
    */
  private def xint(i: Int) =
    Term.num(lit(i).cast(Term.numType), Term.XsdNs + "int")

  private def setupCase(name: String): Unit = {
    import graft.sparql.{Functions, Services, SolutionSets, Translator}
    name match {
      case n if n.startsWith("custom-function") =>
        // myFunction(lit) = "<label>-<label>" plain literal;
        // myFunction2(lit) = (label == "Mike") boolean
        Functions.register("http://www.bigdata.com/myFunction", args =>
          when(args(0).isNotNull,
               Term.str(concat(Term.lex(args(0)), lit("-"), Term.lex(args(0)))))
            .otherwise(Term.unbound))
        Functions.register("http://www.bigdata.com/myFunction2", args =>
          when(args(0).isNotNull, Term.bool(Term.lex(args(0)) === "Mike"))
            .otherwise(Term.unbound))
      case n if n.startsWith("query-hints-08") || n.startsWith("query-hints-09") ||
                n.startsWith("query-hints-10") =>
        // TestQueryHints.java:1283 — mock service returns {x=Mike},{x=Bryan};
        // the hint:Prior hint:atOnce annotation must not change results
        Services.register("http://www.bigdata.com/mockService",
          (_, _) => Translator.Result(
            spark.range(1).select(
                Term.iri("http://www.bigdata.com/Mike").as("x"))
              .unionByName(spark.range(1).select(
                Term.iri("http://www.bigdata.com/Bryan").as("x"))),
            Set("x"), Set.empty))
      case n if n.startsWith("sparql11-service-001") =>
        Services.register("http://www.bigdata.com/mockService/test_service_001",
          (_, _) => Translator.Result(
            spark.range(1).select(
              Term.iri("http://example.org/book/book1").as("book")),
            Set("book"), Set.empty))
      case n if n.startsWith("sparql11-service-002") =>
        // three mock solutions, one of them empty — the empty one joins
        // as unconstrained and duplicates the BGP's rows
        Services.register("http://www.bigdata.com/mockService/test_service_002",
          (_, _) => Translator.Result(
            spark.range(1).select(
                Term.iri("http://example.org/book/book1").as("book"))
              .unionByName(spark.range(1).select(
                Term.iri("http://example.org/book/book2").as("book")))
              .unionByName(spark.range(1).select(Term.unbound.as("book"))),
            Set.empty, Set("book")))
      case n if n.startsWith("include_03") =>
        val b = "http://www.bigdata.com/"
        SolutionSets.put("%solutionSet1",
          spark.range(1).select(Term.iri(b + "Mike").as("x"), xint(2).as("y"))
            .unionByName(spark.range(1).select(Term.iri(b + "Bryan").as("x"), xint(4).as("y")))
            .unionByName(spark.range(1).select(Term.iri(b + "DC").as("x"), xint(1).as("y"))))
      case n if n.startsWith("include_") =>
        SolutionSets.put("%solutionSet1",
          spark.range(1).select(xint(1).as("x"), xint(2).as("y"), Term.unbound.as("z"))
            .unionByName(spark.range(1).select(
              Term.unbound.as("x"), Term.unbound.as("y"), Term.unbound.as("z")))
            .unionByName(spark.range(1).select(xint(3).as("x"), xint(4).as("y"), xint(5).as("z"))))
      case _ =>
    }
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
      .map(_.replaceAll("_:[A-Za-z0-9_:.@/-]+", "_:b"))
      .sorted.toSeq
  }

  /** Expected SELECT results stored as a DAWG rs:ResultSet graph (.ttl or
    * .rdf — the W3C test-vocabulary form several TestTCK fixtures use):
    * load the graph, pivot solution → one row per rs:solution with a
    * column per rs:resultVariable.
    */
  private def dawgResultSet(file: String): (Seq[String], DataFrame) = {
    val rs = "http://www.w3.org/2001/sw/DataAccess/tests/result-set#"
    val p = dir.resolve(file).toString
    val g =
      if (file.endsWith(".rdf")) graft.rdf.RdfXml.read(spark, p)
      else Turtle.read(spark, p)
    def byPred(pred: String) = g.filter(col("p") === Term.iri(rs + pred))
    val vars = byPred("resultVariable")
      .select(Term.lex(col("o"))).collect().map(_.getString(0)).toSeq.distinct
    val sols = byPred("solution").select(col("o").as("sol"))
    val bindings = byPred("binding")
      .select(col("s").as("sol2"), col("o").as("b"))
    val bvar = byPred("variable").select(col("s").as("b1"), Term.lex(col("o")).as("v"))
    val bval = byPred("value").select(col("s").as("b2"), col("o").as("value"))
    val long = sols
      .join(bindings, col("sol") === col("sol2"))
      .join(bvar, col("b") === col("b1"))
      .join(bval, col("b") === col("b2"))
      .select(col("sol"), col("v"), col("value"))
    val wide = long.groupBy("sol").pivot("v", vars).agg(first(col("value")))
      .drop("sol")
    // solutions with NO bindings at all (all-unbound rows) drop out of the
    // join; re-add them as all-null rows
    val nEmpty = sols.count() - long.select("sol").distinct().count()
    val expDf =
      if (nEmpty == 0) wide
      else (1L to nEmpty).foldLeft(wide)((d, _) =>
        d.unionByName(spark.range(1).select(vars.map(v => Term.unbound.as(v)): _*)))
    (vars, expDf)
  }

  override def withFixture(test: NoArgTest): org.scalatest.Outcome = {
    // this suite mirrors the REFERENCE's dialect: zero-length paths range
    // over the path relation's vertices (property-paths-6), not the REC's
    // whole-graph node set (which W3cSparqlTckSpec pins)
    graft.sparql.Paths.zeroLengthOverAllTerms = false
    val out =
      try super.withFixture(test)
      finally graft.sparql.Paths.zeroLengthOverAllTerms = true
    // free per-case scratch state (path fixpoints localCheckpoint RDDs);
    // without this a full 250-case run accumulates hundreds of persisted
    // RDDs and late cases slow enough to trip the time limit
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    out
  }

  cases.foreach { c =>
    test(s"refsparql: ${c.name}") {
      setupCase(c.name)
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
          val (headVars, expDf) =
            if (c.expected.endsWith(".srx"))
              Results.fromXml(spark, Files.readString(dir.resolve(c.expected)))
            else dawgResultSet(c.expected)
          // some reference fixtures over-declare head vars (sparql11-order-02's
          // srx carries ?cnt though its query projects only ?type — the srx
          // was captured from an engine that projected the ORDER BY
          // aggregate); compare on the query's explicit projection when given
          val vars =
            if (q.projection.nonEmpty && headVars.exists(q.projection.contains))
              headVars.filter(q.projection.contains)
            else headVars
          val got = Translator.translate(store, q.node).df
          val (gotR, expR) = (render(got, vars), render(expDf, vars))
          assert(gotR == expR,
            s"\nvars: ${vars.mkString(",")}\ngot:\n${gotR.mkString("\n")}\nwant:\n${expR.mkString("\n")}")
        case Parser.ConstructForm | Parser.DescribeForm =>
          val expDf =
            if (c.expected.endsWith(".ttl")) Turtle.read(spark, dir.resolve(c.expected).toString)
            else if (c.expected.endsWith(".rdf"))
              graft.rdf.RdfXml.read(spark, dir.resolve(c.expected).toString)
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
