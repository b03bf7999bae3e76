package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Count-based bigram language model for perplexity-style quality scoring —
  * the CCNet/KenLM-shaped filter every large-scale curation pipeline runs:
  * train n-gram statistics on a reference corpus, score candidate documents
  * by cross-entropy, and keep the head (or middle) of the distribution.
  * Here the model is a plain (token, next-token) count relation with
  * add-one smoothing over the reference vocabulary, so both the training
  * and the scoring pass are exact relational algebra — no external model
  * artifact, and the DuckDB oracle reproduces scores bit-for-bit (counts
  * are integers; the only float ops are ln of an integer ratio and one
  * mean, identical IEEE sequences in both engines under a fixed rounding).
  *
  * Scale posture: training is two hash aggregations over the exploded
  * token/bigram stream (map-side combined); scoring is two equi-joins of
  * the candidate bigram stream against the model relations — bigram types
  * follow Zipf, so at 100 TB the model stays far smaller than the corpus
  * and the unigram side is broadcastable. For a truly giant reference,
  * prune hapax bigrams (count=1) before scoring: smoothing already
  * absorbs unseen pairs, and the model relation shrinks ~2x.
  */
object LanguageModel {

  /** Adjacent-token pairs of a token-array column (docs with <2 tokens
    * contribute nothing).
    */
  private def bigramPairs(docs: DataFrame, textCol: String,
                          keyCol: String): DataFrame = {
    val ws = TextPrep.words(lower(col(textCol)))
    docs.select(col(keyCol), ws.as("__ws"))
      .filter(size(col("__ws")) >= 2)
      .select(col(keyCol),
        explode(zip_with(
          slice(col("__ws"), lit(1), size(col("__ws")) - 1),
          slice(col("__ws"), lit(2), size(col("__ws")) - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("__p"))
      .select(col(keyCol), col("__p.a").as("a"), col("__p.b").as("b"))
  }

  /** Bigram counts of the reference corpus: (a, b, c_ab). */
  def bigramCounts(ref: DataFrame, textCol: String = "text"): DataFrame =
    bigramPairs(ref, textCol, "doc_id")
      .groupBy("a", "b").agg(count(lit(1)).as("c_ab"))

  /** Unigram counts of the reference corpus: (w, c_w). */
  def unigramCounts(ref: DataFrame, textCol: String = "text"): DataFrame =
    ref.select(explode(TextPrep.words(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c_w"))

  /** Cross-entropy (nats per bigram) of each candidate document under the
    * add-one-smoothed bigram model of `ref`:
    *
    *   H(d) = -avg over bigrams (a,b) of d of
    *            ln( (c_ab + 1) / (c_a + V) )
    *
    * where V is the reference vocabulary size (distinct unigrams). Unseen
    * bigrams cost ln(c_a + V) nats; unseen histories fall back to ln(V+?)
    * with c_a = 0. Output: (keyCol, n_bigrams, cross_entropy) for every
    * candidate with at least one bigram; low H ≈ fluent under the
    * reference distribution, high H ≈ junk or out-of-domain.
    *
    * The vocabulary size is one count() action — a scalar broadcast, the
    * same shape as any global-statistic literal.
    */
  /** CCNet-style perplexity bucketing (Wenzek et al. 2020: score each
    * document's LM perplexity against a reference corpus, split each
    * language into head/middle/tail, keep head+middle): per language,
    * candidates rank by [[crossEntropy]] under the reference bigram model
    * (ascending — head = most reference-like) and NTILE into `buckets`
    * equal tiles. Output per (lang, bucket): document count, the bucket's
    * cross-entropy range, and an id-sum membership checksum — the frame a
    * curation report keeps and a selection filter joins against.
    *
    * Determinism: the tile rank orders by the ROUNDED cross-entropy
    * (the tfidf discipline — a 1-ulp ln() difference cannot flip a rank)
    * with keyCol tiebreak, and NTILE's front-loaded-remainder semantics
    * are identical in Spark and ANSI SQL. Documents with fewer than two
    * tokens have no bigram score and are not bucketed (documented
    * corpus-reality: they carry no LM evidence either way).
    *
    * Scale posture: inherits crossEntropy's shape (Zipf-bounded model
    * relations broadcast against the candidate bigram stream) plus one
    * language-keyed window over the per-document score frame — rows =
    * documents, not tokens.
    */
  def pplBuckets(candidates: DataFrame, ref: DataFrame, buckets: Int = 3,
                 textCol: String = "text", langCol: String = "lang",
                 keyCol: String = "doc_id"): DataFrame = {
    require(buckets >= 2, "pplBuckets needs at least 2 buckets")
    val ce = crossEntropy(candidates, ref, textCol, keyCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(langCol)).orderBy(col("cross_entropy"), col(keyCol))
    candidates.select(col(keyCol), col(langCol))
      .join(ce, keyCol)
      .withColumn("bucket", ntile(buckets).over(w).cast(LongType))
      .groupBy(col(langCol), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
           min(col("cross_entropy")).as("min_ce"),
           max(col("cross_entropy")).as("max_ce"),
           sum(col(keyCol)).as("id_sum"))
  }

  def crossEntropy(candidates: DataFrame, ref: DataFrame,
                   textCol: String = "text",
                   keyCol: String = "doc_id"): DataFrame = {
    val big = bigramCounts(ref, textCol)
    val uni = unigramCounts(ref, textCol)
    val v = uni.count()
    bigramPairs(candidates, textCol, keyCol)
      .join(big, Seq("a", "b"), "left_outer")
      .join(uni.withColumnRenamed("w", "a"), Seq("a"), "left_outer")
      .select(col(keyCol),
        log((coalesce(col("c_ab"), lit(0L)) + 1L).cast(DoubleType) /
            (coalesce(col("c_w"), lit(0L)) + lit(v)).cast(DoubleType))
          .as("__lp"))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_bigrams"),
           round(-avg(col("__lp")), 6).as("cross_entropy"))
  }
}
