package graft.sparql

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.rdf.{NTriples, Term}

/** SPARQL result serializers — the result-sink surface (reference:
  * content-negotiated writers behind
  * /root/reference/bigdata-sails/src/java/com/bigdata/rdf/sail/webapp/
  * ConnegUtil.java — SPARQL results XML/JSON/CSV/TSV).
  *
  * `toJson`/`toXml` collect (they serialize a *result*, inherently driver
  * side — same as the reference streaming a response); `writeCsv` stays
  * distributed.
  */
object Results {

  private def esc(s: String): String = s
    .replace("\\", "\\\\").replace("\"", "\\\"")
    .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")

  private def xesc(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def termJson(r: Row): Option[String] = {
    if (r == null) return None
    val kind = r.getByte(0)
    val lex = esc(r.getString(1))
    val dt = Option(r.getString(2))
    val lang = Option(r.getString(3))
    Some(kind match {
      case 0 => s"""{"type":"uri","value":"$lex"}"""
      case 1 => s"""{"type":"bnode","value":"$lex"}"""
      case _ =>
        val extra = lang.map(l => s""","xml:lang":"$l"""")
          .orElse(dt.filter(_ != Term.XsdString).map(d => s""","datatype":"${esc(d)}""""))
          .getOrElse("")
        s"""{"type":"literal","value":"$lex"$extra}"""
    })
  }

  /** XHTML results table — the workbench face (the reference renders
    * SPARQL-XML through bigdata-war/src/result-to-html.xsl; here the table
    * renders directly). Terms print in N-Triples lexical form, escaped.
    */
  def toXhtml(solutions: DataFrame): String = {
    val vars = solutions.columns.toSeq
    val header = vars.map(v => s"<th>${xesc(v)}</th>").mkString
    val cells = vars.map(v => coalesce(NTriples.termToString(col(v)), lit("")))
    val rows = solutions.select(cells: _*).collect().map { r =>
      vars.indices.map(i => s"<td>${xesc(r.getString(i))}</td>")
        .mkString("<tr>", "", "</tr>")
    }
    "<!DOCTYPE html><html><head><meta charset=\"utf-8\"/>" +
      "<title>query results</title></head><body><table border=\"1\">" +
      s"<thead><tr>$header</tr></thead><tbody>${rows.mkString("\n")}" +
      "</tbody></table></body></html>"
  }

  /** SPARQL 1.1 Query Results JSON. */
  def toJson(solutions: DataFrame): String = {
    val vars = solutions.columns.toSeq
    val rows = solutions.collect().map { row =>
      val fields = vars.zipWithIndex.flatMap { case (v, i) =>
        termJson(if (row.isNullAt(i)) null else row.getStruct(i))
          .map(t => s""""${esc(v)}":$t""")
      }
      fields.mkString("{", ",", "}")
    }
    s"""{"head":{"vars":[${vars.map(v => s""""${esc(v)}"""").mkString(",")}]},""" +
      s""""results":{"bindings":[${rows.mkString(",")}]}}"""
  }

  /** SPARQL Query Results XML. */
  def toXml(solutions: DataFrame): String = {
    val vars = solutions.columns.toSeq
    val sb = new StringBuilder
    sb ++= """<?xml version="1.0"?><sparql xmlns="http://www.w3.org/2005/sparql-results#"><head>"""
    vars.foreach(v => sb ++= s"""<variable name="${xesc(v)}"/>""")
    sb ++= "</head><results>"
    solutions.collect().foreach { row =>
      sb ++= "<result>"
      vars.zipWithIndex.foreach { case (v, i) =>
        if (!row.isNullAt(i)) {
          val t = row.getStruct(i)
          val lex = xesc(t.getString(1))
          sb ++= s"""<binding name="${xesc(v)}">"""
          t.getByte(0) match {
            case 0 => sb ++= s"<uri>$lex</uri>"
            case 1 => sb ++= s"<bnode>$lex</bnode>"
            case _ =>
              val dt = Option(t.getString(2)).filter(_ != Term.XsdString)
              val lang = Option(t.getString(3))
              val attrs = lang.map(l => s""" xml:lang="$l"""")
                .orElse(dt.map(d => s""" datatype="${xesc(d)}""""))
                .getOrElse("")
              sb ++= s"<literal$attrs>$lex</literal>"
          }
          sb ++= "</binding>"
        }
      }
      sb ++= "</result>"
    }
    sb ++= "</results></sparql>"
    sb.toString
  }

  /** Parse SPARQL 1.1 JSON results into (vars, term-struct DataFrame) — the
    * inverse of `toJson`, used by federated SERVICE to ingest a remote
    * endpoint's response. Jackson ships with Spark (no added dependency).
    */
  def fromJson(spark: org.apache.spark.sql.SparkSession,
               body: String): (Seq[String], DataFrame) = {
    import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
    val root = new ObjectMapper().readTree(body)
    val vars: Seq[String] = {
      val it = root.path("head").path("vars").elements()
      val b = Vector.newBuilder[String]
      while (it.hasNext) b += it.next().asText()
      b.result()
    }
    val numericDts = Term.numericDatatypes
    def term(n: JsonNode): Row = {
      if (n == null || n.isMissingNode) return null
      val v = n.path("value").asText()
      n.path("type").asText() match {
        case "uri" => Row(0.toByte, v, null, null, null)
        case "bnode" => Row(1.toByte, v, null, null, null)
        case _ => // literal / typed-literal
          val lang = Option(n.get("xml:lang")).map(_.asText()).orNull
          val dt0 = Option(n.get("datatype")).map(_.asText()).orNull
          val dt = if (lang == null && dt0 == null) Term.XsdString else dt0
          val num =
            if (dt != null && numericDts(dt))
              try new java.math.BigDecimal(v)
                .setScale(18, java.math.RoundingMode.HALF_UP)
              catch { case _: Exception => null }
            else null
          Row(2.toByte, v, dt, lang, num)
      }
    }
    val bindings = {
      val it = root.path("results").path("bindings").elements()
      val b = Vector.newBuilder[Row]
      while (it.hasNext) {
        val o = it.next()
        b += Row(vars.map(v => term(o.get(v))): _*)
      }
      b.result()
    }
    val schema = org.apache.spark.sql.types.StructType(
      vars.map(v => org.apache.spark.sql.types.StructField(v, Term.schema)))
    (vars, spark.createDataFrame(
      java.util.Arrays.asList(bindings: _*), schema))
  }

  /** Parse SPARQL Query Results XML (the .srx format) into (vars,
    * term-struct DataFrame) — the inverse of `toXml`; JDK DOM, no added
    * dependency. The result-sink counterpart used by the data-driven
    * conformance harness and XML-speaking SERVICE endpoints.
    */
  def fromXml(spark: org.apache.spark.sql.SparkSession,
              body: String): (Seq[String], DataFrame) = {
    import javax.xml.parsers.DocumentBuilderFactory
    import org.w3c.dom.Element
    val doc = DocumentBuilderFactory.newInstance().newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(body.getBytes("UTF-8")))
    def elems(parent: Element, name: String): Seq[Element] = {
      val nl = parent.getElementsByTagName(name)
      (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
    }
    val root = doc.getDocumentElement
    val vars = elems(root, "variable").map(_.getAttribute("name"))
    def term(b: Element): Row = {
      val kids = b.getChildNodes
      val el = (0 until kids.getLength).map(kids.item)
        .collectFirst { case e: Element => e }
        .getOrElse(return null)
      val v = el.getTextContent
      el.getTagName match {
        case "uri" => Row(0.toByte, v, null, null, null)
        case "bnode" => Row(1.toByte, v, null, null, null)
        case _ =>
          val lang = Option(el.getAttribute("xml:lang")).filter(_.nonEmpty).orNull
          val dt0 = Option(el.getAttribute("datatype")).filter(_.nonEmpty).orNull
          val dt = if (lang == null && dt0 == null) Term.XsdString else dt0
          val num =
            if (dt != null && Term.numericDatatypes(dt))
              try new java.math.BigDecimal(v)
                .setScale(18, java.math.RoundingMode.HALF_UP)
              catch { case _: Exception => null }
            else null
          val lex = if (num != null) Term.canonicalNumLex(v) else v
          Row(2.toByte, lex, dt, lang, num)
      }
    }
    val rows = elems(root, "result").map { res =>
      val bound = elems(res, "binding")
        .map(b => b.getAttribute("name") -> term(b)).toMap
      Row(vars.map(v => bound.get(v).orNull): _*)
    }
    val schema = org.apache.spark.sql.types.StructType(
      vars.map(v => org.apache.spark.sql.types.StructField(v, Term.schema)))
    (vars, spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema))
  }

  /** SPARQL 1.1 Query Results TSV: header of ?var names, N-Triples term
    * rendering per cell (the ConnegUtil family's remaining member).
    */
  def toTsv(solutions: DataFrame): String = {
    val vars = solutions.columns.toSeq
    val header = vars.map("?" + _).mkString("\t")
    val rows = solutions
      .select(vars.map(v => coalesce(NTriples.termToString(col(v)), lit(""))): _*)
      .collect()
      .map(r => vars.indices.map(r.getString).mkString("\t"))
    (header +: rows).mkString("\n")
  }

  /** The SPARQL 1.1 CSV results format is deliberately LOSSY: IRIs and
    * literal lexical forms render bare, blank nodes as _:label (csv-tsv-res
    * csvtsv01-03 pin this shape; the N-Triples form belongs to TSV).
    */
  private def csvPlain(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(c.isNull, lit(""))
      .when(Term.isBnode(c), concat(lit("_:"), Term.lex(c)))
      .otherwise(Term.lex(c))

  /** SPARQL 1.1 Query Results CSV, driver-side (conneg surface). */
  def toCsv(solutions: DataFrame): String = {
    val vars = solutions.columns.toSeq
    def field(s: String): String =
      if (s.exists(ch => ch == ',' || ch == '"' || ch == '\n' || ch == '\r'))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    val rows = solutions.select(vars.map(v => csvPlain(col(v)).as(v)): _*)
      .collect()
      .map(r => vars.indices.map(i => field(r.getString(i))).mkString(","))
    (vars.mkString(",") +: rows.toSeq).mkString("\r\n")
  }

  /** CSV sink, written distributed (Spark applies the RFC 4180 quoting). */
  def writeCsv(solutions: DataFrame, path: String): Unit =
    solutions
      .select(solutions.columns.toIndexedSeq.map(v => csvPlain(col(v)).as(v)): _*)
      .write.mode("overwrite").option("header", "true").csv(path)
}
