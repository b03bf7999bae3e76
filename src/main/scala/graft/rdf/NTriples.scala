package graft.rdf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** N-Triples / N-Quads line-format reader and writer.
  *
  * Replaces the reference's RIO parser + StatementBuffer ingestion
  * (/root/reference/bigdata-rdf/src/java/com/bigdata/rdf/rio/
  * StatementBuffer.java:87): each text line parses independently, so the
  * parser is a per-partition map over `spark.read.text` — embarrassingly
  * parallel, no driver bottleneck, ideal for 100 TB bulk load
  * (AsynchronousStatementBufferFactory's goal, subsumed by partitioned read).
  */
object NTriples {

  private val NumericDts = Term.numericDatatypes

  /** Parse one RDF term in N-Triples syntax. Returns (kind, lex, dt, lang).
    * IRIs decode their \\u escapes (UCHAR is the only way N-Triples can
    * carry non-ASCII IRI characters).
    */
  private[rdf] def parseTerm(tok: String): (Byte, String, String, String) = {
    if (tok.startsWith("<"))
      (0.toByte, Iri.decodeUchar(tok.substring(1, tok.length - 1)), null, null)
    else if (tok.startsWith("_:")) (1.toByte, tok.substring(2), null, null)
    else {
      // literal: "lex"(@lang | ^^<dt>)?
      val endQ = lastUnescapedQuote(tok)
      val lex = unescape(tok.substring(1, endQ))
      val rest = tok.substring(endQ + 1)
      if (rest.startsWith("@")) (2.toByte, lex, null, rest.substring(1))
      else if (rest.startsWith("^^<")) (2.toByte, lex, rest.substring(3, rest.length - 1), null)
      else (2.toByte, lex, Term.XsdString, null)
    }
  }

  private def lastUnescapedQuote(s: String): Int = {
    var i = s.length - 1
    while (i > 0) {
      if (s.charAt(i) == '"') {
        var bs = 0
        var j = i - 1
        while (j > 0 && s.charAt(j) == '\\') { bs += 1; j -= 1 }
        if (bs % 2 == 0) return i
      }
      i -= 1
    }
    0
  }

  private def unescape(s: String): String = {
    if (!s.contains('\\')) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'u' =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case 'U' =>
            sb.appendAll(Character.toChars(
              Integer.parseInt(s.substring(i + 2, i + 10), 16))); i += 10
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Split a statement line into term tokens (respecting quoted literals). */
  private[rdf] def tokenize(line: String): Seq[String] = {
    val toks = Vector.newBuilder[String]
    var i = 0
    val n = line.length
    while (i < n) {
      val c = line.charAt(i)
      if (c == ' ' || c == '\t' || c == '.') i += 1
      else {
        val start = i
        if (c == '"') {
          i += 1
          var done = false
          while (i < n && !done) {
            if (line.charAt(i) == '\\') i += 2
            else if (line.charAt(i) == '"') { i += 1; done = true }
            else i += 1
          }
          // datatype/lang suffix: '^^<dt>' runs to its '>', a lang tag to
          // whitespace or the statement '.' (terms may abut the final '.')
          if (i + 1 < n && line.charAt(i) == '^' && line.charAt(i + 1) == '^') {
            i += 2
            if (i < n && line.charAt(i) == '<') {
              while (i < n && line.charAt(i) != '>') i += 1
              if (i < n) i += 1
            }
          } else if (i < n && line.charAt(i) == '@') {
            while (i < n && line.charAt(i) != ' ' && line.charAt(i) != '\t' &&
                   line.charAt(i) != '.') i += 1
          }
        } else if (c == '<') {
          // IRI: runs to '>', regardless of what abuts it
          while (i < n && line.charAt(i) != '>') i += 1
          if (i < n) i += 1
        } else {
          // bnode label / keyword: stop at whitespace or statement '.'
          while (i < n && line.charAt(i) != ' ' && line.charAt(i) != '\t' &&
                 line.charAt(i) != '.') i += 1
        }
        toks += line.substring(start, i)
      }
    }
    toks.result().filter(t => t.nonEmpty && t != ".")
  }

  private val rowSchema = StructType(Seq(
    StructField("s", Term.schema), StructField("p", Term.schema),
    StructField("o", Term.schema), StructField("c", Term.schema)))

  /** Read an N-Triples or N-Quads file into a quads DataFrame (c NULL for
    * triples — the default graph).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
    parseLines(spark, lines)
  }

  /** Term tuple → struct Row with the canonical lex/num treatment (scale
    * must match DecimalType(38,18) for createDataFrame).
    */
  private def termRow(t: (Byte, String, String, String)): org.apache.spark.sql.Row = {
    val num = Term.litNumSlot(t._2, t._3)
    val lex =
      if (num != null && NumericDts(t._3)) Term.canonicalNumLex(t._2)
      else t._2
    org.apache.spark.sql.Row(t._1, lex, t._3,
      if (t._4 == null) null else t._4.toLowerCase, num)
  }

  /** Parse a DataFrame of lines (column `value`) into quads. */
  def parseLines(spark: SparkSession, lines: DataFrame): DataFrame = {
    val rdd = lines.rdd.mapPartitions { it =>
      it.flatMap { r =>
        val line = r.getString(0).trim
        if (line.isEmpty || line.startsWith("#")) None
        else {
          val toks = tokenize(line)
          if (toks.size < 3) None
          else {
            val s = termRow(parseTerm(toks(0)))
            val p = termRow(parseTerm(toks(1)))
            val o = termRow(parseTerm(toks(2)))
            val c = if (toks.size > 3) termRow(parseTerm(toks(3))) else null
            Some(org.apache.spark.sql.Row(s, p, o, c))
          }
        }
      }
    }
    spark.createDataFrame(rdd, rowSchema)
  }

  /** Driver-side N-Triples parse of one document — the conformance
    * harnesses' expected-results path (small files, no Spark job); same
    * tokenizer and canonicalization as `parseLines`.
    */
  def parseDocJvm(content: String): Seq[(org.apache.spark.sql.Row,
                                         org.apache.spark.sql.Row,
                                         org.apache.spark.sql.Row)] =
    content.linesIterator.map(_.trim)
      .filterNot(l => l.isEmpty || l.startsWith("#"))
      .map(tokenize)
      .filter(_.size >= 3)
      .map(toks => (termRow(parseTerm(toks(0))),
                    termRow(parseTerm(toks(1))),
                    termRow(parseTerm(toks(2)))))
      .toSeq

  /** Driver-side N-Triples/N-Quads parse of one document into quad Rows
    * (c null on triple lines) — the REST data API's request-body path
    * (InsertServlet/DeleteServlet bodies are one HTTP request, not a bulk
    * load; bulk ingest goes through `read`). Same tokenizer and
    * canonicalization as `parseLines`.
    */
  def parseDocJvmQuads(content: String): Seq[org.apache.spark.sql.Row] =
    content.linesIterator.map(_.trim)
      .filterNot(l => l.isEmpty || l.startsWith("#"))
      .map(tokenize)
      .filter(_.size >= 3)
      .map { toks =>
        val c = if (toks.size > 3) termRow(parseTerm(toks(3))) else null
        org.apache.spark.sql.Row(termRow(parseTerm(toks(0))),
          termRow(parseTerm(toks(1))), termRow(parseTerm(toks(2))), c)
      }.toSeq

  /** Driver-side parse of one N-Triples-syntax term (`<iri>`, `_:label`,
    * `"lit"`/`"lit"@lang`/`"lit"^^<dt>`) into a term struct Row — the REST
    * access-path parameters (s=/p=/o=/c=).
    */
  def parseTermJvm(tok: String): org.apache.spark.sql.Row = termRow(parseTerm(tok))

  /** JVM-side mirror of `termToString` for driver/parse-time rendering —
    * MUST stay bit-identical with the Column version (SID content
    * addressing hashes this rendering on both sides).
    */
  def termToStringJvm(kind: Byte, lex: String, dt: String, lang: String): String = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
    kind match {
      case 0 => s"<$lex>"
      case 1 => s"_:$lex"
      case _ =>
        if (lang != null) "\"" + esc(lex) + "\"@" + lang
        else if (dt != null && dt != Term.XsdString) "\"" + esc(lex) + "\"^^<" + dt + ">"
        else "\"" + esc(lex) + "\""
    }
  }

  /** Serialize a term struct column back to N-Triples token syntax.
    * Literal lexical forms escape backslash, quote, and line controls so
    * the line-based format survives arbitrary content.
    */
  def termToString(t: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val lex = Term.lex(t)
    val esc = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(lex, "\\\\", "\\\\\\\\"),
      "\"", "\\\\\""), "\n", "\\\\n"), "\r", "\\\\r"), "\t", "\\\\t")
    when(t.isNull, lit(null).cast(StringType))
      .when(Term.isIri(t), concat(lit("<"), lex, lit(">")))
      .when(Term.isBnode(t), concat(lit("_:"), lex))
      .when(Term.lang(t).isNotNull,
        concat(lit("\""), esc, lit("\"@"), Term.lang(t)))
      .when(Term.dt(t).isNotNull && Term.dt(t) =!= Term.XsdString,
        concat(lit("\""), esc, lit("\"^^<"), Term.dt(t), lit(">")))
      .otherwise(concat(lit("\""), esc, lit("\"")))
  }

  /** Write quads as N-Triples/N-Quads text. */
  def write(quads: DataFrame, path: String): Unit =
    quads.select(concat_ws(" ",
        termToString(col("s")), termToString(col("p")), termToString(col("o")),
        when(col("c").isNotNull, termToString(col("c"))).otherwise(lit("")),
        lit(".")).as("value"))
      .write.mode("overwrite").text(path)
}
