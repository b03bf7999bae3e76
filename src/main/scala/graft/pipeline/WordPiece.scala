package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WordPiece tokenizer TRAINING (Schuster & Nakajima 2012; the BERT
  * tokenizer) — the third member of the engine's tokenizer-training family
  * next to [[Bpe]] (merge by raw pair count) and [[Unigram]] (prune by
  * corpus likelihood). WordPiece merges the adjacent pair maximizing
  * count(lr) / (count(l) · count(r)) — the pair whose fusion most raises
  * corpus likelihood under a unigram model — so rare-but-collocated pairs
  * win over merely frequent ones. (The reference engine has no tokenizer
  * surface; its analyzers are Lucene term pipelines —
  * /root/reference/bigdata-rdf/src/java/com/bigdata/rdf/lexicon/
  * ITextIndexer.java:48 — this is training-pipeline surface.)
  *
  * Scale posture (100 TB): identical to [[Bpe.train]] — the corpus is
  * touched EXACTLY ONCE (one hash aggregation to the Zipf-bounded
  * (word, freq) table); each merge round is two aggregations over that
  * vocabulary frame (symbol counts + pair counts, both map-side combined)
  * and a fold-rewrite projection; exactly ONE row per round reaches the
  * driver (the sequential dependency every BPE-family trainer has).
  *
  * Exactness: the score is the QUANTIZED likelihood ratio
  * `score_q = (count(lr) · 10^12) div (count(l) · count(r))`, computed in
  * Decimal(38,0) — never a float. Ties (including rationals that collide
  * after quantization) break lexicographically on (l, r), so the merge
  * table is a pure function of the corpus and the DuckDB oracle (HUGEINT
  * arithmetic) replays every round bit-for-bit. The 38-digit budget holds
  * through count(l)·count(r) ≤ 10^28, i.e. corpora up to 10^14 symbol
  * occurrences — beyond the 100 TB design point.
  *
  * Symbols use the BERT convention: a word's first character is bare, every
  * continuation character carries the `##` prefix, and merging (l, r)
  * yields l + r-without-`##` (word-internal position is encoded in the
  * symbol itself, so no end-of-word marker is needed).
  */
object WordPiece {

  private val SCALE = 1000000000000L // 10^12 score quantization

  /** Initial WordPiece symbols: [c1, ##c2, ##c3, ...]. */
  private def initialSymbols(word: Column): Column = {
    val chars = filter(split(word, ""), s => length(s) > 0)
    zip_with(chars, sequence(lit(1), size(chars)),
      (c, i) => when(i === 1, c).otherwise(concat(lit("##"), c)))
  }

  /** Greedy leftmost application of one merge (l, r) -> merged, same
    * left-to-right fold as [[Bpe.applyMerge]] but with the WordPiece
    * merged form (continuation prefix stripped from r).
    */
  def applyMerge(syms: Column, l: String, r: String, merged: String): Column =
    aggregate(syms, array().cast(ArrayType(StringType)),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
             concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
          .otherwise(concat(acc, array(x))))

  private def mergedForm(l: String, r: String): String =
    l + (if (r.startsWith("##")) r.substring(2) else r)

  /** Frequency-weighted symbol counts of the current state (1-symbol words
    * included — they contribute no pairs but their symbol IS in the unigram
    * denominator).
    */
  private def symbolCounts(state: DataFrame): DataFrame =
    state.select(col("freq"), explode(col("st")).as("sym"))
      .groupBy("sym").agg(sum(col("freq")).as("cs"))

  /** Frequency-weighted adjacent-pair counts (words already collapsed to
    * one symbol contribute none; filtered BEFORE the index expansion —
    * Spark's sequence(1, 0) counts DOWN).
    */
  private def pairCounts(state: DataFrame): DataFrame =
    state.filter(size(col("st")) >= 2).select(col("freq"),
        explode(transform(sequence(lit(1), size(col("st")) - 1),
          i => struct(element_at(col("st"), i).as("l"),
                      element_at(col("st"), i + 1).as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("c"))

  /** Quantized likelihood score of a pair-count row joined with its two
    * symbol counts: floor(c · 10^12 / (cl · cr)), exact in Decimal(38,0)
    * (the division is of an exact multiple, so no rounding mode matters).
    */
  private def scoreQ(c: Column, cl: Column, cr: Column): Column = {
    val dec = DecimalType(38, 0)
    val num = c.cast(dec) * lit(SCALE).cast(dec)
    val den = cl.cast(dec) * cr.cast(dec)
    ((num - pmod(num, den)) / den).cast(LongType)
  }

  /** Train `merges` WordPiece merges; one row per merge:
    * (rank, left, right, merged, pair_count, score_q), rank 1-based.
    */
  def train(spark: SparkSession, docs: DataFrame, merges: Int): DataFrame = {
    import spark.implicits._
    var state = graft.util.Fixpoint.materialize(
      Bpe.wordFreq(docs).select(col("word"), col("freq"),
                                initialSymbols(col("word")).as("st")))
    val out = Seq.newBuilder[(Int, String, String, String, Long, Long)]
    for (rank <- 1 to merges) {
      val syms = symbolCounts(state)
      val top = pairCounts(state)
        .join(syms.select(col("sym").as("l"), col("cs").as("cl")), "l")
        .join(syms.select(col("sym").as("r"), col("cs").as("cr")), "r")
        .withColumn("score_q", scoreQ(col("c"), col("cl"), col("cr")))
        .orderBy(col("score_q").desc, col("l"), col("r")).limit(1)
        .collect() // the merge decision: exactly one row crosses to the driver
      if (top.nonEmpty) {
        val row = top(0)
        val (l, r) = (row.getAs[String]("l"), row.getAs[String]("r"))
        val m = mergedForm(l, r)
        out += ((rank, l, r, m, row.getAs[Long]("c"), row.getAs[Long]("score_q")))
        state = graft.util.Fixpoint.materialize(
          state.select(col("word"), col("freq"),
                       applyMerge(col("st"), l, r, m).as("st")))
      }
    }
    out.result()
      .toDF("rank", "left", "right", "merged", "pair_count", "score_q")
      .withColumn("rank", col("rank").cast(LongType))
  }

  /** Tokenize words with a trained merge table (ranks applied in order) —
    * the inference side, for round-trip specs.
    */
  def tokenize(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(initialSymbols(word)) { case (st, (l, r)) =>
      applyMerge(st, l, r, mergedForm(l, r))
    }

  /** The train→infer round trip with a pre-trained merge-table frame —
    * same deployment shape as [[Bpe.tokenizeStats]]: pieces computed once
    * per DISTINCT word (the Zipf-bounded vocabulary), joined back to the
    * exploded corpus; the K-row merge table is the driver-side artifact a
    * tokenizer ships.
    */
  def tokenizeStats(docs: DataFrame, mergeTable: DataFrame): DataFrame = {
    val table = mergeTable.orderBy("rank").collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
    val words = docs.select(col("doc_id"),
                            explode(TextPrep.words(col("text"))).as("word"))
    val vocab = words.select("word").distinct()
      .withColumn("n_p", size(tokenize(col("word"), table)).cast(LongType))
    words.join(vocab, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_p")).as("n_pieces"))
      .withColumn("fertility",
        round(col("n_pieces").cast(DoubleType) / col("n_words"), 6))
      .select("doc_id", "n_words", "n_pieces", "fertility")
  }
}
