package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.rdf.{NTriples, Turtle}
import graft.sparql.Parser
import scala.jdk.CollectionConverters._

/** Data-driven golden-file harness — the reference's primary test pattern
  * (AbstractDataDrivenSPARQLTestCase: query file + data file + expected
  * results, /root/reference/bigdata-rdf/src/test/com/bigdata/rdf/sparql/
  * ast/eval/AbstractDataDrivenSPARQLTestCase.java:113).
  *
  * Each case under src/test/resources/sparql/ is <name>.ttl + <name>.rq +
  * <name>.expected (tab-separated N-Triples-rendered terms, one solution
  * per line, empty cell = unbound). All queries ORDER BY, so comparison is
  * ordered.
  */
class GoldenSpec extends SparkSpecBase {

  private val dir = Paths.get(getClass.getResource("/sparql").toURI)

  private val cases: Seq[String] = Files.list(dir).iterator().asScala
    .map(_.getFileName.toString).filter(_.endsWith(".rq"))
    .map(_.stripSuffix(".rq")).toSeq.sorted

  test("golden case discovery") {
    assert(cases.nonEmpty, s"no .rq cases under $dir")
  }

  cases.foreach { name =>
    test(s"golden: $name") {
      val data = Turtle.read(spark, dir.resolve(s"$name.ttl").toString)
      val query = Files.readString(dir.resolve(s"$name.rq"))
      val isConstruct = query.toUpperCase.contains("CONSTRUCT")
      val df0 =
        if (isConstruct) Parser.construct(spark, data, query)
        else Parser.select(spark, data, query)
      // CONSTRUCT output compares as sorted triples (bag semantics)
      val df = if (isConstruct) df0.orderBy("s.lex", "p.lex", "o.lex") else df0
      val rendered = df.select(
        concat_ws("\t", df.columns.map(c =>
          coalesce(NTriples.termToString(col(c)), lit(""))): _*).as("line"))
        .collect().map(_.getString(0)).toSeq
      val expected = Files.readString(dir.resolve(s"$name.expected"))
        .split("\n").toSeq.filter(_.nonEmpty)
      assert(rendered == expected,
        s"\ngot:\n${rendered.mkString("\n")}\nwant:\n${expected.mkString("\n")}")
    }
  }
}
