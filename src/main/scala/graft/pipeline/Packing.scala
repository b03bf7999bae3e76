package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the "concat then chunk" step every LLM pretraining
  * pipeline runs after curation: documents are laid end-to-end in a
  * deterministic order and the token stream is cut into fixed-length
  * training sequences. A document whose span crosses a cut contributes to
  * both neighboring sequences (standard packed-dataset semantics; no
  * padding waste, boundaries marked downstream by EOS tokens).
  *
  * Determinism: the concatenation order is the salted-hash order of the
  * shared 60-bit md5 key ([[TextPrep.hash64]], salt ":pack"), the same
  * replay-stable device used by [[Sampling]] — identical across runs,
  * partitionings, and engines, and therefore exactly checkable by the
  * DuckDB oracle.
  *
  * Scale posture: packing is per GROUP (source/shard), not global — a
  * single global running sum would serialize 100 TB through one reducer.
  * Within a group the running offset is one window over the group's hash
  * order (one shuffle on the group key; Spark's window sort spills, it
  * does not OOM). For mega-sources, pre-shard by a salted hash bucket
  * column and pack per (source, bucket): each shard still yields exact
  * fixed-length sequences, only shard-boundary remainders differ. The
  * span explode emits ceil(n_tok/seqLen)+1 rows per document — output is
  * proportional to corpus tokens / seqLen, never quadratic.
  */
object Packing {

  /** Assigns every document its token span in the packed stream of its
    * group and explodes one row per (document, sequence) overlap.
    *
    * Output columns: groupCol, `seq_id` (0-based within the group),
    * keyCol, `n_tok_in_seq` (how many of the sequence's tokens this
    * document supplies). Sequences are exactly `seqLen` tokens except each
    * group's last. Zero-token documents are dropped (they occupy no span).
    */
  def packSequences(docs: DataFrame, seqLen: Long,
                    groupCol: String = "source",
                    keyCol: String = "doc_id"): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(TextPrep.hash64(concat(col(keyCol).cast("string"),
                                      lit(":pack"))), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("__n", size(TextPrep.words(col("text"))).cast("long"))
      .filter(col("__n") > 0)
      .withColumn("__end", sum(col("__n")).over(w))
      .withColumn("__start", col("__end") - col("__n"))
      .withColumn("seq_id",
        explode(sequence(expr(s"__start div ${seqLen}L"),
                         expr(s"(__end - 1L) div ${seqLen}L"))))
      .withColumn("n_tok_in_seq",
        least(col("__end"), (col("seq_id") + 1) * seqLen) -
          greatest(col("__start"), col("seq_id") * seqLen))
      .select(col(groupCol), col("seq_id"), col(keyCol), col("n_tok_in_seq"))
  }

  /** Per-sequence rollup of [[packSequences]]: documents touching each
    * sequence, tokens filled (== seqLen except each group's last), and a
    * membership checksum. The shape a packed-dataset manifest needs.
    */
  def packedManifest(docs: DataFrame, seqLen: Long,
                     groupCol: String = "source",
                     keyCol: String = "doc_id"): DataFrame =
    packSequences(docs, seqLen, groupCol, keyCol)
      .groupBy(col(groupCol), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_tok_in_seq")).as("n_tokens"),
           sum(col(keyCol)).as("id_sum"))

  /** Sliding-window chunking — packing's other face: where [[packSequences]]
    * concatenates documents into fixed sequences, this splits each document
    * into fixed-length token windows with overlap (`stride < chunkLen`),
    * the standard retrieval/context-window preparation (RAG chunking, long-
    * document pretraining with overlapping views). Window w starts at token
    * w·stride and takes up to `chunkLen` tokens; a window is emitted only
    * while it contributes tokens its predecessor did not (start <
    * n − overlap, overlap = chunkLen − stride), so the tail is always
    * covered, no window is contained in the previous one, and a document
    * with at most `chunkLen` tokens yields exactly one whole-document
    * chunk. Empty documents yield none.
    *
    * Output: (keyCol, chunk_idx, tok_start, n_tok, chunk_md5) — the md5 of
    * the space-joined window, giving a content-addressed chunk manifest
    * (dedup-able and oracle-checkable without shipping chunk text).
    *
    * Scale posture: a pure per-document projection + explode — ZERO
    * shuffles (plan-guarded), output rows ∝ corpus tokens / stride. The
    * token array is projected before the window slice (the established
    * lambda-inlining discipline).
    */
  def chunkWindows(docs: DataFrame, chunkLen: Int, stride: Int,
                   keyCol: String = "doc_id"): DataFrame = {
    require(chunkLen > 0 && stride > 0 && stride <= chunkLen,
            "need 0 < stride <= chunkLen")
    docs
      .select(col(keyCol), TextPrep.words(col("text")).as("ws"))
      .withColumn("__n", size(col("ws")))
      .filter(col("__n") > 0)
      .select(col(keyCol), col("ws"), col("__n"),
              explode(sequence(lit(0),
                               greatest(col("__n") - (chunkLen - stride) - 1,
                                        lit(0)),
                               lit(stride)))
                .as("tok_start"))
      .select(col(keyCol),
              expr(s"tok_start div $stride").as("chunk_idx"),
              col("tok_start").cast("long").as("tok_start"),
              least(lit(chunkLen), col("__n") - col("tok_start"))
                .cast("long").as("n_tok"),
              md5(concat_ws(" ",
                slice(col("ws"), col("tok_start") + 1, lit(chunkLen))))
                .as("chunk_md5"))
  }
}
