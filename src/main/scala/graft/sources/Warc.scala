package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, EOFException, InputStream}
import java.util.zip.{CRC32, DataFormatException, Inflater, ZipException}

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
  * files are per-record gzip MEMBERS concatenated, walked by
  * [[GzipMembers]] — NOT JDK GZIPInputStream, which treats a malformed
  * next-member header as clean EOF (its trailer probe swallows the error),
  * i.e. exactly the silent-shard-truncation failure mode this module
  * forbids. The member walk tracks its byte position precisely, so
  * trailing garbage, a truncated member, or a CRC mismatch all RAISE
  * (gzip detected by the 1f 8b magic).
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
    * Every malformation RAISES — a malformed record or gzip-member header,
    * a body truncated short of its Content-Length, trailing garbage after
    * the last gzip member, a member CRC/length mismatch. Silent data loss
    * is worse than a loud shard: a crawl job should die on the corrupt
    * shard, not quietly train on its first half.
    */
  private[graft] def parseAll(file: String, bytes: Array[Byte]): Seq[WarcRec] = {
    val gz = bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f &&
             (bytes(1) & 0xff) == 0x8b
    val members = if (gz) new GzipMembers(bytes) else null
    val in: InputStream = new BufferedInputStream(
      if (gz) members else new ByteArrayInputStream(bytes))
    try {
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
    } finally if (members != null) members.end()
  }

  /** Concatenated-gzip-member decompressor with PRECISE malformed-input
    * detection. JDK GZIPInputStream cannot serve here: its next-member
    * probe catches the IOException a malformed header raises and reports
    * clean EOF, and its read-ahead buffer hides up to 512 trailing bytes
    * from any underlying-stream check. This walk drives an [[Inflater]]
    * directly over the in-memory shard, so after each member finishes the
    * exact consumed offset is `length - inf.getRemaining` — the next bytes
    * are either a valid member header, or an error. Decompression is still
    * streaming (memory bounded by the read buffer, not the shard).
    *
    * CONTRACT: the integrity checks (member CRC/ISIZE trailers,
    * trailing-garbage detection) fire as the stream is consumed — a
    * caller must drain to EOF (read() == -1) to get them all. [[parseAll]]
    * always drains; a future caller that stops early (e.g. after finding
    * a target record) skips verification of everything past its stop
    * point by design, not by accident. `end()` only releases the native
    * inflater and deliberately never throws: it runs in `finally` on
    * exception paths where a raise would mask the original error.
    */
  private[graft] final class GzipMembers(bytes: Array[Byte]) extends InputStream {
    private val inf = new Inflater(true) // nowrap: headers/trailers are ours
    private val crc = new CRC32()
    private var pos = 0          // next unconsumed offset in `bytes`
    private var inMember = false
    private var done = false
    private val one = new Array[Byte](1)

    /** Release the native inflater (flatMap tasks never call close()). */
    def end(): Unit = inf.end()

    override def read(): Int = {
      val n = read(one, 0, 1)
      if (n < 0) -1 else one(0) & 0xff
    }

    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (len == 0) return 0
      while (true) {
        if (done) return -1
        if (!inMember) {
          if (pos >= bytes.length) { done = true; return -1 }
          parseMemberHeader() // raises on anything but a valid header
          inf.reset(); crc.reset()
          inf.setInput(bytes, pos, bytes.length - pos)
          inMember = true
        }
        val n =
          try inf.inflate(b, off, len)
          catch { case e: DataFormatException =>
            throw new ZipException(s"corrupt gzip member data: ${e.getMessage}") }
        if (n > 0) { crc.update(b, off, n); return n }
        if (inf.finished()) {
          pos = bytes.length - inf.getRemaining
          readMemberTrailer()
          inMember = false // loop: next member header or clean EOF
        } else if (inf.needsInput()) {
          throw new EOFException(
            s"truncated gzip member (compressed data ends at offset ${bytes.length})")
        } else if (inf.needsDictionary()) {
          throw new ZipException("gzip member demands a preset dictionary")
        }
      }
      -1 // unreachable
    }

    /** RFC 1952 header: magic, CM=deflate, then the optional fields the
      * FLG byte declares. Raises on truncation or any violation —
      * including the trailing-garbage case, where these bytes are not a
      * header at all.
      */
    private def parseMemberHeader(): Unit = {
      def u8(): Int = {
        if (pos >= bytes.length)
          throw new EOFException(s"truncated gzip member header at offset $pos")
        val v = bytes(pos) & 0xff; pos += 1; v
      }
      def skip(n: Int): Unit = (1 to n).foreach(_ => u8())
      val at = pos
      if (u8() != 0x1f || u8() != 0x8b)
        throw new ZipException(
          s"not a gzip member header at offset $at (trailing garbage after last member?)")
      if (u8() != 8)
        throw new ZipException(s"unsupported gzip compression method at offset $at")
      val flg = u8()
      if ((flg & 0xe0) != 0)
        throw new ZipException(s"reserved gzip FLG bits set at offset $at")
      skip(6)                                     // MTIME, XFL, OS
      if ((flg & 4) != 0) { val xlen = u8() | (u8() << 8); skip(xlen) } // FEXTRA
      if ((flg & 8) != 0) while (u8() != 0) ()    // FNAME, zero-terminated
      if ((flg & 16) != 0) while (u8() != 0) ()   // FCOMMENT
      if ((flg & 2) != 0) skip(2)                 // FHCRC
    }

    /** RFC 1952 trailer: CRC32 + ISIZE (both LE), verified. */
    private def readMemberTrailer(): Unit = {
      if (pos + 8 > bytes.length)
        throw new EOFException(s"truncated gzip member trailer at offset $pos")
      def u32(): Long = {
        val v = (bytes(pos) & 0xffL) | ((bytes(pos + 1) & 0xffL) << 8) |
                ((bytes(pos + 2) & 0xffL) << 16) | ((bytes(pos + 3) & 0xffL) << 24)
        pos += 4; v
      }
      val wantCrc = u32(); val wantLen = u32()
      if (wantCrc != crc.getValue)
        throw new ZipException(s"gzip member CRC mismatch before offset $pos")
      if (wantLen != (inf.getBytesWritten & 0xffffffffL))
        throw new ZipException(s"gzip member ISIZE mismatch before offset $pos")
    }
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
        // binaryFile caps file content at 2 GiB, so a larger single record
        // cannot arrive through records(); the bound is stated loudly here
        // rather than silently truncated by a toInt
        require(len >= 0 && len <= Int.MaxValue,
          s"WARC Content-Length $len outside the [0, 2 GiB) single-record " +
          "bound (split oversized shards upstream)")
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
