package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.util.zip.GZIPOutputStream

import graft.sources.Warc
import graft.pipeline.TextPrep

/** WARC source: record walk, gzip-member handling, and the documents-table
  * bridge into the text pipeline. Fixtures are constructed per the WARC/1.0
  * spec (there is no WARC in the driver's testdata).
  */
class WarcSpec extends SparkSpecBase {

  private def record(tpe: String, uri: String, id: String,
                     body: Array[Byte], ctype: String): Array[Byte] = {
    val h = new StringBuilder()
    h ++= "WARC/1.0\r\n"
    h ++= s"WARC-Type: $tpe\r\n"
    h ++= "WARC-Date: 2026-01-01T00:00:00Z\r\n"
    if (uri.nonEmpty) h ++= s"WARC-Target-URI: <$uri>\r\n"
    h ++= s"WARC-Record-ID: <urn:uuid:$id>\r\n"
    h ++= s"Content-Type: $ctype\r\n"
    h ++= s"Content-Length: ${body.length}\r\n\r\n"
    h.result().getBytes("ISO-8859-1") ++ body ++ "\r\n\r\n".getBytes("ISO-8859-1")
  }

  private def gzMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  private val httpBody =
    ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
     "<html>hello warc world</html>").getBytes("ISO-8859-1")

  private def fixtures(): (String, Seq[Array[Byte]]) = {
    val recs = Seq(
      record("warcinfo", "", "i1", "software: graft-test\r\n".getBytes,
             "application/warc-fields"),
      record("response", "http://example.org/a", "r1", httpBody,
             "application/http;msgtype=response"),
      record("request", "http://example.org/a", "q1",
             "GET /a HTTP/1.1\r\n\r\n".getBytes,
             "application/http;msgtype=request"))
    val dir = java.nio.file.Files.createTempDirectory("warcspec").toFile
    dir.deleteOnExit()
    val plain = new FileOutputStream(new java.io.File(dir, "a.warc"))
    recs.foreach(plain.write); plain.close()
    // .warc.gz convention: one gzip MEMBER per record, concatenated
    val gz = new FileOutputStream(new java.io.File(dir, "b.warc.gz"))
    recs.foreach(r => gz.write(gzMember(r))); gz.close()
    (dir.getAbsolutePath, recs)
  }

  test("warc records parse identically from plain and gzip-member files") {
    val (dir, _) = fixtures()
    val df = Warc.records(spark, dir)
    assert(df.count() == 6)
    val byFile = df.collect().groupBy(r =>
      r.getAs[String]("file").contains(".gz"))
    // both layouts produce the same (type, uri, id, len) triples in order
    for (recs <- byFile.values) {
      val sorted = recs.sortBy(_.getAs[Long]("record_idx"))
      assert(sorted.map(_.getAs[String]("warc_type")).toSeq ==
             Seq("warcinfo", "response", "request"))
      assert(sorted(1).getAs[String]("target_uri") == "http://example.org/a")
      assert(sorted(1).getAs[String]("record_id") == "urn:uuid:r1")
      assert(sorted(1).getAs[Long]("content_length") == httpBody.length.toLong)
      assert(sorted(1).getAs[Array[Byte]]("body").toSeq == httpBody.toSeq)
    }
  }

  test("warc documents bridge: responses become text-pipeline rows") {
    val (dir, _) = fixtures()
    val docs = Warc.documents(Warc.records(spark, dir))
    val rows = docs.collect()
    assert(rows.length == 2) // one response per file
    rows.foreach { r =>
      // HTTP header block stripped, payload decoded
      assert(r.getAs[String]("text") == "<html>hello warc world</html>")
      assert(r.getAs[String]("target_uri") == "http://example.org/a")
      // doc_id is the shared 60-bit hash of the record id — deterministic
      assert(r.getAs[Long]("doc_id") == TextPrep.hash64Jvm("urn:uuid:r1"))
      assert(r.getAs[Long]("n_chars") == 29L)
    }
    // and the frame is plug-compatible with the pipeline operators
    val stats = graft.pipeline.TextAnalysis
      .tokenStats(docs.select("doc_id", "text")).collect()
    assert(stats.forall(_.getAs[Long]("n_tokens") == 3L)) // whitespace tokens
  }

  test("warc -> pipeline bridge end to end: crawl responses flow through " +
       "exact dedup and gopher quality unchanged") {
    // a crawl shard with a duplicated page (mirror URL, same payload) and
    // two distinct ones — the plug-compatibility claim proven by running
    // the REAL pipeline operators over Warc.documents output, not by
    // schema assertion
    def page(body: String): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n$body")
        .getBytes("ISO-8859-1")
    val longText = ("the quick brown fox jumps over the lazy dog and " * 4).trim
    val recs = Seq(
      record("response", "http://a.example/x", "p1", page(longText),
             "application/http;msgtype=response"),
      record("response", "http://mirror.example/x", "p2", page(longText),
             "application/http;msgtype=response"),
      record("response", "http://a.example/y", "p3", page("tiny page"),
             "application/http;msgtype=response"))
    val dir = java.nio.file.Files.createTempDirectory("warcbridge").toFile
    dir.deleteOnExit()
    val out = new FileOutputStream(new java.io.File(dir, "c.warc.gz"))
    recs.foreach(r => out.write(gzMember(r))); out.close()

    val docs = Warc.documents(Warc.records(spark, dir.getAbsolutePath))
    // exact dedup: the mirrored payload forms ONE duplicate group whose
    // canonical id is the smaller record-id hash
    val groups = graft.pipeline.Dedup
      .exactGroups(docs, org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.col("text"))).collect()
    assert(groups.length == 1 && groups(0).getAs[Long]("n_docs") == 2L)
    val dupIds = Seq("urn:uuid:p1", "urn:uuid:p2").map(TextPrep.hash64Jvm)
    assert(groups(0).getAs[Long]("keep_id") == dupIds.min)
    // gopher quality: the long page passes the tuned word floor, the tiny
    // one is flagged out — the rule battery reads the bridged rows as-is
    val gq = graft.pipeline.TextAnalysis
      .gopherQuality(docs, minWords = 20L).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("gopher_pass")).toMap
    assert(gq(TextPrep.hash64Jvm("urn:uuid:p1")) == 1L)
    assert(gq(TextPrep.hash64Jvm("urn:uuid:p3")) == 0L)
  }

  test("warc walk fails loudly on a malformed header, not silently short") {
    val dir = java.nio.file.Files.createTempDirectory("warcbad").toFile
    dir.deleteOnExit()
    val f = new FileOutputStream(new java.io.File(dir, "bad.warc"))
    f.write(record("response", "http://x/", "r9", "ok".getBytes, "text/plain"))
    f.write("NOT-A-WARC-HEADER\r\n\r\n".getBytes); f.close()
    val ex = intercept[org.apache.spark.SparkException] {
      Warc.records(spark, dir.getAbsolutePath).collect()
    }
    assert(ex.getMessage != null)
  }

  // --- gzip-member malformation battery (the GzipMembers walk must raise
  // on every corruption JDK GZIPInputStream would swallow as clean EOF) ---

  private val goodRec = record("response", "http://x/", "g1",
                               "payload".getBytes, "text/plain")

  test("gzip shard: trailing garbage after the last member raises") {
    // JDK GZIPInputStream reports clean EOF here (its next-member probe
    // catches the malformed-header error) — the precise walk must not
    val bytes = gzMember(goodRec) ++ "garbage!".getBytes("ISO-8859-1")
    val ex = intercept[java.util.zip.ZipException] {
      Warc.parseAll("t.warc.gz", bytes)
    }
    assert(ex.getMessage.contains("not a gzip member header"))
    // even a SHORT tail (under GZIPInputStream's 512-byte read-ahead,
    // where a raw.available() check could not see it) raises
    val short = gzMember(goodRec) ++ Array[Byte](0x42)
    intercept[Exception] { Warc.parseAll("t.warc.gz", short) }
  }

  test("gzip shard: a truncated member raises, records before it are lost loudly") {
    val m1 = gzMember(goodRec)
    val m2 = gzMember(record("response", "http://y/", "g2",
                             "second".getBytes, "text/plain"))
    val truncated = m1 ++ m2.dropRight(12) // cuts into deflate data/trailer
    val ex = intercept[java.io.EOFException] {
      Warc.parseAll("t.warc.gz", truncated)
    }
    assert(ex.getMessage.contains("truncated"))
  }

  test("gzip shard: a corrupted member CRC raises") {
    val m = gzMember(goodRec)
    // flip a bit in the stored CRC (first of the 8 trailer bytes)
    val bad = m.clone()
    bad(m.length - 8) = (bad(m.length - 8) ^ 0x01).toByte
    val ex = intercept[java.util.zip.ZipException] {
      Warc.parseAll("t.warc.gz", bad)
    }
    assert(ex.getMessage.contains("CRC mismatch"))
  }

  test("gzip shard: concatenated members after a valid one still all parse") {
    val recs = (1 to 5).map(i => record("response", s"http://x/$i", s"m$i",
                                        s"body $i".getBytes, "text/plain"))
    val bytes = recs.map(gzMember).reduce(_ ++ _)
    val out = Warc.parseAll("t.warc.gz", bytes)
    assert(out.length == 5)
    assert(out.map(_.record_id) == (1 to 5).map(i => s"urn:uuid:m$i"))
  }

  test("warc body truncated short of Content-Length raises") {
    val full = record("response", "http://x/", "t1",
                      "0123456789".getBytes, "text/plain")
    val cut = full.dropRight(8) // into the declared body
    val ex = intercept[java.io.EOFException] {
      Warc.parseAll("t.warc", cut)
    }
    assert(ex.getMessage.contains("EOF in WARC body"))
  }

  test("warc Content-Length outside [0, 2 GiB) is rejected loudly") {
    val h = ("WARC/1.0\r\nWARC-Type: response\r\n" +
             s"Content-Length: ${Int.MaxValue.toLong + 1}\r\n\r\n")
      .getBytes("ISO-8859-1")
    val ex = intercept[IllegalArgumentException] {
      Warc.parseAll("t.warc", h)
    }
    assert(ex.getMessage.contains("2 GiB"))
  }
}
