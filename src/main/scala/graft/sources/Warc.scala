package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, EOFException, InputStream}
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) ingestion — the container format web-crawl corpora
  * (Common Crawl and friends) ship in, parsed into a relational record
  * frame the pipeline operators consume. (The reference engine ingests RDF
  * serializations only — bigdata-rdf/src/java/com/bigdata/rdf/rio — so
  * this is training-pipeline source surface, per the public WARC/1.0 and
  * /1.1 specifications.)
  *
  * A WARC file is a sequence of records, each a header block
  * (`WARC/1.0\r\n` + `Name: value` lines + blank line) followed by exactly
  * `Content-Length` body bytes and a `\r\n\r\n` separator. `.warc.gz`
  * files are per-record gzip MEMBERS concatenated; JDK GZIPInputStream
  * reads concatenated members transparently, so one stream walk covers
  * both layouts (gzip detected by the 1f 8b magic).
  *
  * Scale posture: `spark.read.format("binaryFile")` distributes files
  * across tasks (one task per file — the WARC shard convention is ~1 GB
  * files, thousands per crawl, so parallelism is the file count) and the
  * record walk is a streaming parse inside `flatMap` — the one legitimate
  * imperative-decode site, exactly like [[graft.pipeline.Multimodal]]'s
  * codecs. No shuffle anywhere; downstream filters/projections are
  * ordinary Catalyst. Memory is bounded by the largest single RECORD (the
  * walk streams the file), plus binaryFile's whole-file content column —
  * for corpora sharded beyond single-task sizes, split shards upstream
  * (the CC convention already does).
  */
object Warc {

  /** One parsed WARC record. `body` is the raw block (for `response`
    * records: HTTP headers + payload).
    */
  case class WarcRec(file: String, record_idx: Long, warc_type: String,
                     target_uri: String, warc_date: String, record_id: String,
                     content_type: String, content_length: Long,
                     body: Array[Byte])

  /** Read every record of every WARC/WARC.GZ file under `path`. */
  def records(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) => parseAll(file, bytes) }
      .toDF()
  }

  /** The documents-table face: `response` records decoded to text rows
    * (doc_id = 60-bit hash of the record id; text = UTF-8 payload after
    * the HTTP header block; source = the WARC file name) — plug-compatible
    * with every text-pipeline operator.
    */
  def documents(records: DataFrame): DataFrame = {
    // HTTP payload starts after the first \r\n\r\n of the body block;
    // records without an HTTP header block are taken whole
    val s = decode(col("body"), "UTF-8")
    val parts = split(s, "\\r\\n\\r\\n", 2)
    records.filter(col("warc_type") === "response")
      .withColumn("text",
        when(size(parts) > 1, element_at(parts, 2)).otherwise(s))
      .select(
        graft.pipeline.TextPrep.hash64(col("record_id")).as("doc_id"),
        col("text"),
        lit("und").as("lang"),
        regexp_extract(col("file"), "([^/]+)$", 1).as("source"),
        length(col("text")).cast("long").as("n_chars"),
        col("target_uri"), col("warc_date"))
  }

  /** Streaming parse of one WARC file (plain or concatenated-member gzip).
    * Malformed trailing bytes end the walk (records parsed so far are
    * kept); a malformed HEADER mid-file raises — silent data loss is worse
    * than a loud shard.
    */
  private[graft] def parseAll(file: String, bytes: Array[Byte]): Seq[WarcRec] = {
    val raw = new ByteArrayInputStream(bytes)
    val in: InputStream = new BufferedInputStream(
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f &&
          (bytes(1) & 0xff) == 0x8b) new GZIPInputStream(raw) else raw)
    val out = Seq.newBuilder[WarcRec]
    var idx = 0L
    var more = true
    while (more) {
      readRecord(in) match {
        case Some((headers, body)) =>
          out += WarcRec(file, idx,
            headers.getOrElse("warc-type", ""),
            // WARC/1.0 writes <uri> brackets around WARC-Target-URI
            headers.getOrElse("warc-target-uri", "").stripPrefix("<").stripSuffix(">"),
            headers.getOrElse("warc-date", ""),
            headers.getOrElse("warc-record-id", "").stripPrefix("<").stripSuffix(">"),
            headers.getOrElse("content-type", ""),
            body.length.toLong, body)
          idx += 1
        case None => more = false
      }
    }
    out.result()
  }

  /** One record: version line + headers + blank + Content-Length bytes +
    * record separator. None at clean EOF.
    */
  private def readRecord(in: InputStream): Option[(Map[String, String], Array[Byte])] = {
    // skip inter-record blank lines, find the version line
    var line = readLine(in)
    while (line.exists(_.isEmpty)) line = readLine(in)
    line match {
      case None => None
      case Some(v) if !v.startsWith("WARC/") =>
        throw new IllegalArgumentException(s"not a WARC record header: '$v'")
      case Some(_) =>
        val hdrs = Map.newBuilder[String, String]
        var h = readLine(in).getOrElse(throw new EOFException("EOF in WARC headers"))
        while (h.nonEmpty) {
          val i = h.indexOf(':')
          if (i > 0) hdrs += (h.substring(0, i).trim.toLowerCase ->
                              h.substring(i + 1).trim)
          h = readLine(in).getOrElse(throw new EOFException("EOF in WARC headers"))
        }
        val headers = hdrs.result()
        val len = headers.getOrElse("content-length", "0").toLong
        val body = new Array[Byte](len.toInt)
        var got = 0
        while (got < body.length) {
          val n = in.read(body, got, body.length - got)
          if (n < 0) throw new EOFException("EOF in WARC body")
          got += n
        }
        Some((headers, body))
    }
  }

  /** Read a CRLF/LF-terminated line as ISO-8859-1 (header bytes are ASCII);
    * None at EOF before any byte.
    */
  private def readLine(in: InputStream): Option[String] = {
    val sb = new java.lang.StringBuilder()
    var c = in.read()
    if (c < 0) return None
    while (c >= 0 && c != '\n') {
      if (c != '\r') sb.append(c.toChar)
      c = in.read()
    }
    Some(sb.toString)
  }
}
