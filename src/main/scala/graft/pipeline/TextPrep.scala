package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared text primitives for the dedup/analysis operators.
  *
  * Every hash here is derived from md5 so the DuckDB oracle can reproduce it
  * bit-for-bit: `hash64(x) = conv(substr(md5(x),1,15),16,10)` in Spark equals
  * `CAST('0x' || substr(md5(x),1,15) AS BIGINT)` in DuckDB — 15 hex digits
  * keep the value below 2^60, safely positive in a signed 64-bit long.
  *
  * All expressions are Spark built-ins (whole-stage codegen; no UDFs), so the
  * shingle/minhash pipeline stays inside Tungsten at 100 TB scale.
  */
object TextPrep {

  /** Deterministic 60-bit hash of a string, reproducible in ANSI SQL. */
  def hash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** JVM replica of [[hash64]] — first 15 hex digits of md5 parsed base-16,
    * bit-identical to the column expression (spec-pinned in StreamingSpec) —
    * for driver-side constructions (streaming bitset probes, literal sign
    * matrices) that must probe exactly what the column plans compute.
    */
  def hash64Jvm(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Whitespace tokenization (empty tokens removed). */
  def words(text: Column): Column =
    filter(split(trim(text), "\\s+"), w => length(w) > 0)

  /** Word n-grams of a token array column WITH multiplicity (one entry per
    * start position) — the span-level relation behind duplicated-span
    * analysis, where each occurrence counts.
    */
  def ngrams(ws: Column, n: Int): Column = {
    val joined = transform(
      sequence(lit(0), greatest(size(ws) - n, lit(-1))),
      i => concat_ws(" ", (0 until n).map(j => element_at(ws, (i + lit(j + 1)))): _*))
    when(size(ws) >= n, joined).otherwise(array().cast(ArrayType(StringType)))
  }

  /** Distinct word n-gram shingles of a token array column. */
  def shingles(ws: Column, n: Int): Column =
    array_distinct(ngrams(ws, n))

  /** Canonical whitespace-normalized lowercase form (fingerprint input). */
  def normalized(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")
}
