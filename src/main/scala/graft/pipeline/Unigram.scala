package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unigram-language-model tokenizer TRAINING (Kudo 2018, the SentencePiece
  * unigram algorithm) — the second real-world tokenizer family next to BPE
  * ([[Bpe]]): pieces carry probabilities, a word's segmentation is the
  * lattice of all vocab-piece covers, and training fits the piece
  * distribution by EM over that lattice. (The reference engine has no
  * tokenizer surface; its text analyzers are Lucene term pipelines —
  * /root/reference/bigdata-rdf/src/java/com/bigdata/rdf/lexicon/
  * ITextIndexer.java:48 — so, like BPE, this is new surface for the
  * training-data pipeline.)
  *
  * Scope: seed-vocabulary selection (frequency-top substrings + all single
  * characters), `emIters` rounds of exact Baum-Welch on the segmentation
  * lattice, then a prune-to-target + renormalize. Full SentencePiece
  * alternates EM with likelihood-loss pruning; the shape here keeps every
  * step a deterministic relational transform so the trained model replays
  * bit-for-bit in an external oracle (and in the in-memory reference the
  * property spec runs).
  *
  * Scale posture (100 TB): the corpus is touched ONCE (the same
  * [[Bpe.wordFreq]] aggregation); everything after operates on the
  * Zipf-bounded distinct-word frame weighted by freq. Each EM round is:
  * one projection computing the per-word forward/backward arrays (pure
  * column lambdas over a word — O(len·K) map lookups), one explode of
  * per-occurrence expected counts, and one hash aggregation on the piece
  * key. The vocab rides along as a broadcast map column (seed size ~1e2
  * here, ~1e5-1e6 in a real tokenizer — still a broadcast). Rounds are
  * re-materialized so the plan does not deepen with `emIters`.
  *
  * Determinism/bit-reproducibility: within-word DP sums fold k ascending
  * (fixed IEEE op order); cross-word aggregation quantizes each expected
  * count to a 1e-10-resolution long BEFORE summing (the
  * [[Similarity.kmeansCentroids]] discipline), so the M-step is
  * order-free; probabilities round to 12 decimals at every step. The
  * long-sum headroom is ~9e18/1e10 ≈ 9e8 expected-count mass — petabyte
  * corpora re-scale the quantum, as the kmeans scaladoc documents.
  */
object Unigram {

  /** Seed vocabulary: every substring of length 1..maxLen of every distinct
    * word, weighted by word frequency and occurrence multiplicity; all
    * single characters enter the vocab, plus the `seedMulti` heaviest
    * multi-character substrings (ties break lexicographically). Initial
    * probabilities are the frequency shares over the selected vocab,
    * rounded to 12 decimals.
    */
  def seedVocab(wordFreq: DataFrame, maxLen: Int, seedMulti: Int): DataFrame = {
    val subs = wordFreq
      .select(col("freq"), col("word"), length(col("word")).as("l"))
      .select(col("freq"),
        explode(flatten(transform(sequence(lit(1), col("l")),
          j => transform(sequence(lit(1), least(lit(maxLen), col("l") - j + 1)),
            k => col("word").substr(j, k)))))
          .as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("tot"))
    val singles = subs.filter(length(col("piece")) === 1)
    val multis = subs.filter(length(col("piece")) >= 2)
      .orderBy(col("tot").desc, col("piece")).limit(seedMulti)
    val sel = singles.unionByName(multis)
    val z = sel.agg(sum(col("tot"))).head().getLong(0)
    sel.select(col("piece"),
               round(col("tot").cast(DoubleType) / z, 12).as("p"))
  }

  /** α/β lattice arrays for one word as column expressions.
    * `alist[i+1]` = α(i) = total probability of covering the first i chars
    * (α(0)=1); built by a fold over positions with the inner sum folding
    * k ascending. `vmap` is the piece→p map column.
    */
  private def forward(word: Column, vmap: Column, maxLen: Int): Column =
    aggregate(sequence(lit(1), length(word)),
      array(lit(1.0)),
      (acc, i) => concat(acc, array(
        aggregate(sequence(lit(1), least(lit(maxLen), i)), lit(0.0),
          (s, k) => s + element_at(acc, i - k + 1) *
            coalesce(element_at(vmap, word.substr(i - k + 1, k)),
                     lit(0.0))))))

  /** Backward probabilities, built left-to-right over the reversed
    * position axis then flipped, so `blist[j+1]` = β(j) = total
    * probability of covering chars after position j (β(L)=1).
    */
  private def backward(word: Column, vmap: Column, maxLen: Int): Column =
    reverse(aggregate(sequence(lit(1), length(word)),
      array(lit(1.0)),
      (acc, i) => concat(acc, array(
        aggregate(sequence(lit(1), least(lit(maxLen), i)), lit(0.0),
          (s, k) => s + coalesce(
              element_at(vmap, word.substr(length(word) - i + 1, k)),
              lit(0.0)) * element_at(acc, i - k + 1))))))

  /** One Baum-Welch step: expected piece counts over every word's
    * segmentation lattice, quantized to 1e-10-resolution longs, summed,
    * and renormalized to 12-decimal probabilities. The vocab (piece, p)
    * frame enters as a broadcast map column; the output has the same
    * schema and piece set.
    */
  def emStep(spark: SparkSession, wordFreq: DataFrame,
             vocab: DataFrame, maxLen: Int): DataFrame = {
    val vm = vocab.agg(
      map_from_entries(sort_array(collect_list(struct(col("piece"), col("p")))))
        .as("vm"))
    // materialize the lattice arrays so the count projection reads plain
    // columns — otherwise CollapseProject re-inlines the whole fold into
    // every element_at (the winnowing lesson: O(len²) interpreted blowup)
    val staged = graft.util.Fixpoint.materialize(
      wordFreq.crossJoin(broadcast(vm))
        .select(col("word"), col("freq"), col("vm"),
                forward(col("word"), col("vm"), maxLen).as("alist"),
                backward(col("word"), col("vm"), maxLen).as("blist")))
    val L = length(col("word"))
    val z = element_at(col("alist"), L + 1)
    // expected count of the piece occurrence covering chars j+1..j+k:
    //   freq · α(j) · p(piece) · β(j+k) / Z        (Baum-Welch posteriors)
    val contribs = staged
      .filter(z > 0.0)
      .select(explode(filter(flatten(
        transform(sequence(lit(0), L - 1), j =>
          transform(sequence(lit(1), least(lit(maxLen), L - j)), k =>
            struct(
              col("word").substr(j + 1, k).as("piece"),
              (((col("freq").cast(DoubleType) *
                 element_at(col("alist"), (j + 1).cast(IntegerType))) *
                coalesce(element_at(col("vm"),
                  col("word").substr(j + 1, k)), lit(0.0))) *
               element_at(col("blist"), (j + k + 1).cast(IntegerType)) / z)
                .as("cnt"))))),
        x => x.getField("cnt") > 0.0)).as("e"))
    val counts = contribs
      .select(col("e.piece").as("piece"),
              round(col("e.cnt") * 1e10).cast(LongType).as("cq"))
      .groupBy("piece").agg(sum(col("cq")).as("cq"))
    // pieces whose expected count hit zero stay in the vocab at p = 0
    // (SentencePiece prunes them; our prune step does too, later)
    val totq = counts.agg(sum(col("cq"))).head().getLong(0)
    vocab.select(col("piece"))
      .join(counts, Seq("piece"), "left_outer")
      .select(col("piece"),
              round(coalesce(col("cq"), lit(0L)).cast(DoubleType) / totq, 12)
                .as("p"))
  }

  /** Train a unigram tokenizer: seed → `emIters` Baum-Welch rounds →
    * prune to all singles + the `keepMulti` heaviest multi-char pieces
    * (ties lexicographic) → renormalize. Output (piece, p), the deployable
    * model table ([[graft.queries.Catalog]]-able like the BPE merge
    * table).
    */
  def train(spark: SparkSession, docs: DataFrame, maxLen: Int = 4,
            seedMulti: Int = 48, emIters: Int = 2,
            keepMulti: Int = 32): DataFrame = {
    val wf = graft.util.Fixpoint.materialize(Bpe.wordFreq(docs))
    var vocab = graft.util.Fixpoint.materialize(seedVocab(wf, maxLen, seedMulti))
    for (_ <- 1 to emIters)
      vocab = graft.util.Fixpoint.materialize(emStep(spark, wf, vocab, maxLen))
    val singles = vocab.filter(length(col("piece")) === 1)
    val multis = vocab.filter(length(col("piece")) >= 2)
      .orderBy(col("p").desc, col("piece")).limit(keepMulti)
    val kept = graft.util.Fixpoint.materialize(singles.unionByName(multis))
    // order-free renormalizer: the 12-decimal probs quantize exactly to
    // 1e-12-scaled longs, so the mass sums deterministically
    val zq = kept.agg(sum(round(col("p") * 1e12).cast(LongType)))
      .head().getLong(0)
    val z = zq.toDouble / 1e12
    kept.select(col("piece"), round(col("p") / z, 12).as("p"))
  }

  /** Corpus tokenization statistics under a trained model — the unigram
    * train→infer round trip (the [[Bpe.tokenizeStats]] analogue): Viterbi
    * piece counts computed once per DISTINCT word (the Zipf-bounded
    * frame), joined back to the exploded corpus. The model frame is the
    * deployable artifact ([[graft.queries.Catalog]]-able).
    */
  def tokenizeStats(docs: DataFrame, model: DataFrame,
                    maxLen: Int = 4): DataFrame = {
    val vm = model.agg(
      map_from_entries(sort_array(collect_list(struct(col("piece"), col("p")))))
        .as("vm"))
    val words = docs.select(col("doc_id"),
                            explode(TextPrep.words(col("text"))).as("word"))
    val vocab = words.select("word").distinct()
      .crossJoin(broadcast(vm))
      .select(col("word"),
              viterbiPieces(col("word"), col("vm"), maxLen).cast(LongType).as("n_p"))
    words.join(vocab, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_p")).as("n_pieces"))
      .withColumn("fertility",
        round(col("n_pieces").cast(DoubleType) / col("n_words"), 6))
      .select("doc_id", "n_words", "n_pieces", "fertility")
  }

  /** Viterbi segmentation piece count for a word under a trained model,
    * as a pure column fold: v(i) = best probability over the last piece's
    * length k (k ascending, strict improvement — ties keep the earlier,
    * shorter-k candidate; then fewer pieces win). Returns the piece count
    * of the best segmentation (null when the word is uncoverable — cannot
    * happen while every character is in the vocab with p > 0).
    */
  def viterbiPieces(word: Column, vmap: Column, maxLen: Int): Column = {
    val fold = aggregate(sequence(lit(1), length(word)),
      array(struct(lit(1.0).as("v"), lit(0).as("c"))),
      (acc, i) => concat(acc, array(
        aggregate(sequence(lit(1), least(lit(maxLen), i)),
          struct(lit(0.0).as("v"), lit(0).as("c")),
          (best, k) => {
            val prev = element_at(acc, i - k + 1)
            val cv = prev.getField("v") *
              coalesce(element_at(vmap, word.substr(i - k + 1, k)),
                       lit(0.0))
            val cc = prev.getField("c") + 1
            when(cv > best.getField("v") ||
                 (cv === best.getField("v") && cv > 0.0 &&
                  cc < best.getField("c")),
                 struct(cv.as("v"), cc.as("c")))
              .otherwise(best)
          }))))
    val last = element_at(fold, length(word) + 1)
    when(last.getField("v") > 0.0, last.getField("c"))
  }
}
