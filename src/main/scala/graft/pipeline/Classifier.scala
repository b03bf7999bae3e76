package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import TextPrep._

/** Seed-trained document classifier for corpus curation — the
  * "train a quality classifier on a trusted seed, score the crawl" step
  * (GPT-3's WebText-vs-crawl logistic filter, CCNet's fastText step,
  * FineWeb-Edu's educational scorer). New surface for the training-data
  * pipeline; the reference has no learned scoring (its only ranked
  * retrieval is the cosine full-text index,
  * /root/reference/bigdata/src/java/com/bigdata/search/FullTextIndex.java:892).
  *
  * The model is multinomial Naive Bayes with add-one smoothing over
  * whitespace tokens. Deliberately shaped for exact replay: training is
  * integer counting (one hash aggregation), and scoring is
  *
  *   score(d) = ln(d1/d0)                                  [prior log-odds]
  *            + Σ_t tf(t,d) · (ln(c1(t)+1) − ln(c0(t)+1))  [seen-token odds]
  *            + |d| · (ln(n0+V) − ln(n1+V))                 [mass normalizer]
  *
  * which equals the textbook Σ tf·ln P(t|1)/P(t|0) + ln P(1)/P(0) with the
  * per-class denominators factored into the |d| term — so tokens absent
  * from the model contribute exactly 0 to the Σ (ln 1 − ln 1) and the
  * join below can stay an INNER join on the vocabulary.
  *
  * Scale posture (100 TB): the model is vocabulary-sized — it broadcasts;
  * the corpus is token-exploded once and aggregated back per doc (one
  * shuffle on doc_id; Zipf token skew never becomes a join key). Training
  * reads only the (small) labeled seed.
  */
object Classifier {

  /** Train: per-token class counts (token, c0, c1) from a labeled seed
    * frame (doc_id, text, label ∈ {0,1}). One explode + one hash
    * aggregation on the token key.
    */
  def trainNaiveBayes(labeled: DataFrame): DataFrame =
    labeled
      .select(col("label"), explode(words(lower(col("text")))).as("token"))
      .groupBy("token")
      .agg(sum(when(col("label") === 0, 1L).otherwise(0L)).as("c0"),
           sum(when(col("label") === 1, 1L).otherwise(0L)).as("c1"))

  /** The scalar training statistics the score needs: class token masses
    * (n0, n1), vocabulary size v, and class doc counts (d0, d1) — one row,
    * derived from the model plus the seed's labels.
    */
  def nbStats(labeled: DataFrame, model: DataFrame): DataFrame =
    model.agg(sum(col("c0")).as("n0"), sum(col("c1")).as("n1"),
              count(lit(1)).as("v"))
      .crossJoin(labeled.agg(
        sum(when(col("label") === 0, 1L).otherwise(0L)).as("d0"),
        sum(when(col("label") === 1, 1L).otherwise(0L)).as("d1")))

  /** Score every document: log-odds of class 1 vs class 0 (rounded to 6
    * decimals) and the hard prediction. `model`/`stats` are load-time
    * artifacts (a classifier is trained once per seed) — both broadcast.
    */
  def scoreNaiveBayes(docs: DataFrame, model: DataFrame,
                      stats: DataFrame): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(words(lower(col("text")))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val seen = tf.join(broadcast(model), "token")
      .groupBy("doc_id")
      .agg(sum(col("tf") * (log(col("c1") + lit(1.0)) -
                            log(col("c0") + lit(1.0)))).as("s"))
    docs
      .select(col("doc_id"),
              size(words(lower(col("text")))).cast(LongType).as("n_tokens"))
      .join(seen, Seq("doc_id"), "left_outer")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("n_tokens"),
              round(log(col("d1").cast(DoubleType) / col("d0")) +
                    coalesce(col("s"), lit(0.0)) +
                    col("n_tokens") * (log((col("n0") + col("v")).cast(DoubleType)) -
                                       log((col("n1") + col("v")).cast(DoubleType))),
                    6).as("score"))
      .withColumn("pred", when(col("score") > 0, 1L).otherwise(0L))
  }
}
