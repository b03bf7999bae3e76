package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding tokenizer TRAINING as a distributed pipeline — the
  * step that produces the merge table [[TextAnalysis.subwordStats]]-style
  * tokenizers consume. (The reference engine has no tokenizer surface at
  * all; its text analyzers are Lucene term pipelines —
  * /root/reference/bigdata-rdf/src/java/com/bigdata/rdf/lexicon/
  * ITextIndexer.java:48 — so this is new surface for the training-data
  * pipeline, per the classic Sennrich et al. 2016 algorithm.)
  *
  * Scale posture (100 TB): the corpus is touched EXACTLY ONCE — a single
  * hash aggregation to the (word, freq) table, the classic BPE compression
  * (training operates on word types weighted by frequency, not tokens).
  * The merge loop then runs over that vocabulary frame, which is Zipf-
  * bounded (millions of rows for a 100 TB corpus — thousands of times
  * smaller than the corpus; it lives comfortably in one executor's
  * memory but stays a DataFrame so nothing here assumes it fits anywhere).
  * Each round is one pair-count aggregation plus a fold-rewrite
  * projection; the chosen pair — a SINGLE row — is the only thing that
  * ever reaches the driver, and that collect is inherent: BPE merge k+1
  * is defined on the corpus AFTER merge k, a sequential dependency no
  * engine can parallelize away. State is re-materialized per round so the
  * plan does not deepen with the merge count.
  *
  * Determinism: ties on pair count break lexicographically on (left,
  * right), so the merge table is a pure function of the corpus — no hash
  * seeds, no partition-order dependence — and the DuckDB oracle replays
  * the identical K unrolled rounds bit-for-bit.
  */
object Bpe {

  /** (word, freq) — the corpus's single full pass. */
  def wordFreq(docs: DataFrame): DataFrame =
    docs.select(explode(TextPrep.words(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial symbol sequence of a word: its characters plus the
    * end-of-word marker (Sennrich et al.'s `</w>`, which lets merges
    * distinguish word-final from word-internal contexts).
    */
  private def initialSymbols(word: Column): Column =
    concat(filter(split(word, ""), s => length(s) > 0),
           array(lit("</w>")))

  /** Greedy leftmost application of one merge (l, r) -> l+r to a symbol
    * array, as a single codegen-able fold: scan left to right, and when
    * the accumulator's last symbol is `l` and the next is `r`, replace
    * them with the merged symbol. Identical semantics to the oracle's
    * `list_reduce` and to the classic implementation's re-scan loop
    * (a freshly merged symbol never re-pairs with a following `r` because
    * the merged token equals `l+r`, not `l`).
    */
  def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast(ArrayType(StringType)),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
             concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x))))

  /** Frequency-weighted adjacent-pair counts of the current state. Words
    * already collapsed to one symbol contribute no pairs (and must be
    * filtered BEFORE the index expansion: Spark's `sequence(1, 0)` counts
    * DOWN, which would index past the array).
    */
  private def pairCounts(state: DataFrame): DataFrame =
    state.filter(size(col("st")) >= 2).select(col("freq"),
        explode(transform(sequence(lit(1), size(col("st")) - 1),
          i => struct(element_at(col("st"), i).as("l"),
                      element_at(col("st"), i + 1).as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("c"))

  /** Train `merges` BPE merges over the corpus; returns one row per merge:
    * (rank, left, right, merged, pair_count), rank 1-based in merge order.
    */
  def train(spark: SparkSession, docs: DataFrame, merges: Int): DataFrame = {
    import spark.implicits._
    var state = graft.util.Fixpoint.materialize(
      wordFreq(docs).select(col("word"), col("freq"),
                            initialSymbols(col("word")).as("st")))
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    for (rank <- 1 to merges) {
      // the merge decision: exactly one row crosses to the driver
      val top = pairCounts(state)
        .orderBy(col("c").desc, col("l"), col("r")).limit(1)
        .collect()
      if (top.nonEmpty) {
        val (l, r, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += ((rank, l, r, l + r, c))
        state = graft.util.Fixpoint.materialize(
          state.select(col("word"), col("freq"),
                       applyMerge(col("st"), l, r).as("st")))
      }
    }
    out.result()
      .toDF("rank", "left", "right", "merged", "pair_count")
      .withColumn("rank", col("rank").cast(LongType))
  }

  /** Tokenize words with a trained merge table (ranks applied in order) —
    * the inference side, provided so specs can assert the round trip.
    */
  def tokenize(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(initialSymbols(word)) { case (st, (l, r)) =>
      applyMerge(st, l, r)
    }

  /** Corpus tokenization statistics with a freshly trained merge table —
    * the full train→infer round trip as one operator: per document, the
    * word count, BPE piece count, and fertility (pieces per word).
    *
    * Scale posture: the expensive part is NOT re-running the tokenizer
    * over every word occurrence — pieces are computed once per DISTINCT
    * word (the Zipf-bounded vocabulary, exactly the frame training
    * already aggregates), then joined back to the exploded corpus on the
    * word key. Catalyst/AQE picks broadcast when the vocab fits (always
    * at bench scale; at 100 TB a vocab of tens of millions of short rows
    * still usually broadcasts — otherwise it is a standard dim join).
    * The trained table itself is K rows on the driver, the same artifact
    * any tokenizer ships.
    */
  def tokenizeStats(spark: SparkSession, docs: DataFrame,
                    merges: Int): DataFrame =
    tokenizeStats(docs, train(spark, docs, merges))

  /** Same, with a pre-trained merge-table frame (rank, left, right, ...) —
    * the deployment shape: the table is a load-time artifact
    * ([[graft.queries.Catalog]]), trained once per corpus and read by
    * every tokenizing query.
    */
  def tokenizeStats(docs: DataFrame, mergeTable: DataFrame): DataFrame = {
    val table = mergeTable.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
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
