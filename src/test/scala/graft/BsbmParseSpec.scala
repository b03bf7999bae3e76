package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.Encoders
import graft.rdf.NTriples
import graft.sparql.{Parser, QueryForms, Translator}
import scala.jdk.CollectionConverters._

/** BSBM explore + BI query-mix smoke: the reference ships these as its
  * benchmark conformance surface (bigdata-rdf/src/test/com/bigdata/rdf/
  * sparql/ast/eval/bsbm/ — TestBsbmExploreQuery, TestBsbmBIQuery, run
  * against a generated dataset). Without the generated data the
  * end-to-end numbers aren't reproducible here, so this spec pins the
  * grammar + translation surface instead: every query must parse and
  * translate/execute against a minimal store without error.
  */
class BsbmParseSpec extends SparkSpecBase {

  private val dir = Paths.get(getClass.getResource("/bsbm").toURI)

  private val queryFiles: Seq[String] = Files.list(dir).iterator().asScala
    .map(_.getFileName.toString).filter(_.endsWith(".txt")).toSeq.sorted

  private lazy val tinyStore = NTriples.parseLines(spark,
    spark.createDataset(Seq(
      """<http://ex/s> <http://ex/p> "o" ."""))(Encoders.STRING).toDF("value"))

  test("bsbm query discovery") {
    assert(queryFiles.size >= 20, s"expected >= 20 BSBM queries, found ${queryFiles.size}")
  }

  queryFiles.foreach { f =>
    test(s"bsbm parses and translates: $f") {
      val text = Files.readString(dir.resolve(f))
      val q = Parser.parse(spark, text)
      q.form match {
        case Parser.SelectForm =>
          Translator.translate(tinyStore, q.node).df.count()
        case Parser.AskForm =>
          QueryForms.ask(tinyStore, q.node)
        case Parser.ConstructForm =>
          QueryForms.construct(tinyStore, q.node, q.template).count()
        case Parser.DescribeForm =>
          Parser.describe(spark, tinyStore, text).count()
      }
    }
  }
}
