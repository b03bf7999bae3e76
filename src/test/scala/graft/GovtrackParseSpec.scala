package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.Encoders
import graft.rdf.NTriples
import graft.sparql.Parser
import scala.jdk.CollectionConverters._

/** Govtrack CI query corpus smoke: the reference's scale benchmark queries
  * over the govtrack.us dataset (bigdata-perf/CI/govtrack/{queries,
  * background}/ — run by its CI perf harness against a multi-billion-triple
  * store). The dataset itself isn't reproducible here, so like
  * [[BsbmParseSpec]] this pins the grammar + translation surface: every
  * query must parse and translate/execute against a minimal store without
  * error. These are genuinely messy machine-generated real-world queries —
  * WITH/INCLUDE named sets, SAMPLE projections, 12-graph FROM lists,
  * FILTER(?x IN (...)), and TriG-style quads CONSTRUCT templates.
  */
class GovtrackParseSpec extends SparkSpecBase {

  private val dir = Paths.get(getClass.getResource("/govtrack").toURI)

  private val queryFiles: Seq[String] = Files.list(dir).iterator().asScala
    .map(_.getFileName.toString).filter(_.endsWith(".rq")).toSeq.sorted

  private lazy val tinyStore = NTriples.parseLines(spark,
    spark.createDataset(Seq(
      """<http://ex/s> <http://ex/p> "o" ."""))(Encoders.STRING).toDF("value"))

  test("govtrack query discovery") {
    assert(queryFiles.size >= 28,
      s"expected >= 28 govtrack queries, found ${queryFiles.size}")
  }

  queryFiles.foreach { f =>
    test(s"govtrack parses and translates: $f") {
      val text = Files.readString(dir.resolve(f))
      val q = Parser.parse(spark, text)
      q.form match {
        case Parser.SelectForm =>
          Parser.select(spark, tinyStore, text).count()
        case Parser.AskForm =>
          Parser.ask(spark, tinyStore, text)
        case Parser.ConstructForm =>
          Parser.construct(spark, tinyStore, text).count()
        case Parser.DescribeForm =>
          Parser.describe(spark, tinyStore, text).count()
      }
    }
  }
}
