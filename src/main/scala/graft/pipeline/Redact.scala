package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training corpora.
  *
  * New pipeline surface (no reference analogue — curation, not query). The
  * detectors are deliberately pattern-based and dialect-portable: every
  * regex below runs identically under Java's engine (Spark) and RE2
  * (DuckDB/re2-based scanners) — no lookaround, no backreferences — so the
  * operator is oracle-checkable and its behavior is stable across engines a
  * corpus pipeline might mix.
  *
  * Scale posture: pure per-row column expressions (regexp_count /
  * regexp_replace, whole-stage codegen) — zero shuffles, embarrassingly
  * parallel, cost linear in corpus bytes.
  */
object Redact {

  /** Detection patterns, applied (and counted) in this fixed order. Email
    * precedes IPv4 so a dotted host in an address is consumed as part of
    * the email, mirroring the sequential redaction below.
    */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\+\\d{9,15}\\b", "<PHONE>"))

  /** Redacted form of a text column: each pattern replaced by its tag, in
    * declaration order (so an email's host is never re-matched as an IP).
    */
  def redact(text: Column): Column =
    patterns.foldLeft(text) { case (t, (_, pat, tag)) =>
      regexp_replace(t, pat, tag)
    }

  /** Per-document PII profile: one `n_<kind>` count per pattern (counted on
    * the progressively redacted text, matching what `redact` removes), the
    * total, and the redacted text's md5. Input column must be `text`.
    */
  def piiStats(docs: DataFrame): DataFrame = {
    // each stage lands in a real column referenced twice (its count + the
    // next replace), so Catalyst keeps the projections separate and every
    // regexp_replace runs ONCE per row — folding the chain into one select
    // would re-evaluate the whole replace prefix per count (~2.5x the
    // regex work, the dominant cost at corpus scale)
    var df = docs.withColumn("__t", col("text"))
    patterns.foreach { case (kind, pat, tag) =>
      df = df
        .withColumn(s"n_$kind", regexp_count(col("__t"), lit(pat)).cast("long"))
        .withColumn("__t", regexp_replace(col("__t"), pat, tag))
    }
    df.select(
      col("doc_id") +:
        patterns.map { case (kind, _, _) => col(s"n_$kind") } :+
        md5(col("__t")).as("redacted_md5") :+
        patterns.map { case (kind, _, _) => col(s"n_$kind") }.reduce(_ + _)
          .as("n_pii"): _*)
  }
}
