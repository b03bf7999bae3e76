package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import TextPrep._

/** Benchmark decontamination and cross-corpus deduplication.
  *
  * New pipeline surface (the reference engine has no document curation;
  * its nearest primitive is solution DISTINCT — see graft.pipeline.Dedup's
  * provenance note). Decontamination is the standard eval-leakage guard for
  * training corpora: drop (or flag) every training document sharing a word
  * n-gram with a held-out benchmark set.
  *
  * Scale posture (100 TB train / ~GB benchmark):
  *  - the benchmark n-gram set is tiny relative to the corpus, so the
  *    overlap join broadcasts it (`broadcastBench`) — the train side is
  *    never shuffled, the whole pass is scan + broadcast-hash-join +
  *    one hash aggregation keyed by doc_id;
  *  - with a large benchmark (`broadcastBench = false`) the join falls back
  *    to a shuffle on the shingle key, still linear in the shingle count;
  *  - the zero-tolerance `decontaminate` path skips per-doc counting
  *    entirely: contaminated ids come from one semi-join + distinct, and the
  *    corpus is filtered with a left-anti join on doc_id.
  *
  * Streaming corpora: the contaminated-id frame derives from the corpus
  * side, so a direct streaming plan would need a stream-stream anti-join
  * (unsupported). Run these operators inside `foreachBatch` — each
  * micro-batch is a static frame, so the broadcast anti-join applies
  * unchanged with no state store (see StreamingSpec).
  */
object Decontam {

  /** The (doc_id, shingle) relation: distinct word n-grams per document.
    * Documents shorter than n tokens contribute no rows (they cannot share
    * an n-gram with anything).
    *
    * Deliberately NO repartition here: the downstream doc_id aggregations
    * partial-aggregate map-side, so they shuffle doc-sized count rows —
    * pre-shuffling the full shingle relation to co-locate docs would move
    * strictly more bytes than it saves (and `materialize` drops partitioning
    * metadata anyway, so the exchange wouldn't even be elided).
    */
  def shingleSet(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"), explode(shingles(col("ws"), n)).as("shingle"))

  /** Per-document overlap against the benchmark corpus's n-gram set:
    * (doc_id, n_sh, n_hit, hit_frac) for every train document with at least
    * one n-gram. n_hit counts the doc's distinct n-grams that appear
    * anywhere in the benchmark set.
    */
  def ngramOverlap(train: DataFrame, bench: DataFrame, n: Int,
                   broadcastBench: Boolean = true): DataFrame = {
    val tSh = graft.util.Fixpoint.materialize(shingleSet(train, n))
    val bSh0 = shingleSet(bench, n).select("shingle").distinct()
    val bSh = if (broadcastBench) broadcast(bSh0) else bSh0
    val sizes = tSh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val hits = tSh.join(bSh, "shingle")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
    sizes.join(hits, Seq("doc_id"), "left_outer")
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .withColumn("hit_frac",
        round(col("n_hit").cast(DoubleType) / col("n_sh"), 6))
  }

  /** Remove train documents overlapping the benchmark set. `maxHitFrac = 0`
    * (the default, and the usual policy) drops any document sharing even one
    * n-gram and needs no per-doc counting; a positive tolerance keeps
    * documents whose contaminated-n-gram fraction stays at or below it.
    */
  def decontaminate(train: DataFrame, bench: DataFrame, n: Int,
                    maxHitFrac: Double = 0.0,
                    broadcastBench: Boolean = true): DataFrame =
    if (maxHitFrac == 0.0) {
      val tSh = shingleSet(train, n)
      val bSh0 = shingleSet(bench, n).select("shingle").distinct()
      val bSh = if (broadcastBench) broadcast(bSh0) else bSh0
      val contaminated = tSh.join(bSh, "shingle").select("doc_id").distinct()
      train.join(contaminated, Seq("doc_id"), "left_anti")
    } else {
      val over = ngramOverlap(train, bench, n, broadcastBench)
        .filter(col("hit_frac") > maxHitFrac).select("doc_id")
      train.join(over, Seq("doc_id"), "left_anti")
    }

  /** Cross-corpus exact dedup: remove rows of `a` whose content key appears
    * in corpus `b` (e.g. drop re-crawled documents already in an earlier
    * snapshot). One distinct on b's keys + one left-anti hash join; with
    * `broadcastB` the pass never shuffles `a`.
    */
  def crossCorpusDedup(a: DataFrame, b: DataFrame,
                       key: org.apache.spark.sql.Column,
                       broadcastB: Boolean = true): DataFrame = {
    val bk0 = b.select(key.as("__ck")).distinct()
    val bk = if (broadcastB) broadcast(bk0) else bk0
    a.withColumn("__ck", key).join(bk, Seq("__ck"), "left_anti").drop("__ck")
  }

  /** Bloom-filter cross-corpus membership (Bloom 1970): flag rows of `a`
    * whose content key POSSIBLY appears in corpus `b`, by testing `k`
    * salted hash positions against an `mBits`-bit filter built from b's
    * keys. One-sided like every Bloom filter: `possibly_dup = false` is
    * definite (zero false negatives — the guarantee the spec pins), `true`
    * carries the classical ~(1-e^(-kn/m))^k false-positive rate.
    *
    * This is [[crossCorpusDedup]]'s fixed-memory face: the exact left-anti
    * must broadcast (or shuffle) every distinct key of `b`, which at a
    * 100 TB reference corpus is itself terabytes; here `b` collapses to
    * `mBits` bits — a plan literal up to 1 Mbit, and past that a broadcast
    * one-row frame shipped once per executor. `mBits: Int` caps one filter
    * at 2^31 bits (~268 MB, ~2.2e8 keys at 1 % FP); a reference corpus
    * beyond that partitions keys across several filters of this shape
    * (chunked bitsets), each still one broadcast instead of a key shuffle
    * and never a per-task literal. The build side never touches the driver
    * with per-position rows: positions OR-fold to 64-bit words on the
    * executors ([[bloomWords]]) and only word rows — at most mBits/64 —
    * are collected. The probe side stays a pure
    * per-row projection either way: `k` md5 probes + `getbit` word tests,
    * all codegen'd built-ins, `a` is NEVER shuffled (plan-guarded on both
    * paths). Hashes use
    * the shared 60-bit md5 ([[TextPrep.hash64]], salt `i || ":"`), so the
    * DuckDB oracle replays the filter — including its false positives —
    * bit-for-bit. Null keys probe to null positions and flag `false`,
    * matching SQL `IN`-filter semantics on both engines.
    */
  /** The k salted probe positions of a key in an mBits-bit filter. */
  private def bloomPositions(keyCol: org.apache.spark.sql.Column,
                             mBits: Int, k: Int) =
    transform(sequence(lit(0), lit(k - 1)),
      i => pmod(hash64(concat(i.cast(StringType), lit(":"), keyCol)),
                lit(mBits.toLong)))

  /** Build-side word aggregation: b's probe positions OR-folded to
    * (word_index, 64-bit word) rows on the executors. Row count is bounded
    * by mBits/64 (words actually containing a set bit), independent of b's
    * key count — the frame [[bloomFlag]] collects. Package-visible so the
    * spec can pin the word-count bound.
    */
  private[graft] def bloomWords(b: DataFrame,
                                key: org.apache.spark.sql.Column,
                                mBits: Int, k: Int): DataFrame =
    b.select(explode(bloomPositions(key, mBits, k)).as("pos"))
      .filter(col("pos").isNotNull)
      .groupBy(shiftright(col("pos"), 6).cast(IntegerType).as("widx"))
      .agg(expr("bit_or(shiftleft(cast(1 as bigint), cast(pos % 64 as int)))")
        .as("w"))

  def bloomFlag(a: DataFrame, b: DataFrame,
                key: org.apache.spark.sql.Column,
                mBits: Int, k: Int): DataFrame = {
    require(mBits > 0 && mBits % 64 == 0, "mBits must pack 64-bit words")
    def positions(keyCol: org.apache.spark.sql.Column) =
      bloomPositions(keyCol, mBits, k)
    // build side: b's set bits OR-folded into 64-bit words DISTRIBUTEDLY
    // (one shuffle on the word index, map-side combinable), so the driver
    // collects at most mBits/64 word rows — never one row per distinct bit
    // position, which at the documented production scale would be a
    // billions-of-rows driver OOM. The reference corpus never joins the
    // probe side at any size.
    val words = new Array[Long](mBits / 64)
    bloomWords(b, key, mBits, k).collect()
      .foreach(r => words(r.getInt(0)) = r.getLong(1))
    // small filters ride the plan as a literal (zero plan nodes added); a
    // GB-scale filter would bloat every serialized task with the literal,
    // so past the threshold the bitset ships ONCE per executor as a
    // broadcast one-row frame cross-joined in (BroadcastExchange of one
    // row; still no shuffle of `a`)
    val threshold = 1 << 20
    def bitAt(bits: org.apache.spark.sql.Column,
              p: org.apache.spark.sql.Column) =
      getbit(element_at(bits, shiftright(p.cast(IntegerType), 6) + lit(1)),
             p.bitwiseAND(lit(63L)).cast(IntegerType))
    def hits(bits: org.apache.spark.sql.Column,
             ps: org.apache.spark.sql.Column) =
      aggregate(ps, lit(0), (acc, p) => acc + bitAt(bits, p).cast(IntegerType))
    if (mBits <= threshold)
      a.withColumn("possibly_dup",
        coalesce(hits(typedLit(words.toSeq), positions(key)) === lit(k),
                 lit(false)))
    else {
      val one = broadcast(
        a.sparkSession.createDataFrame(
          java.util.List.of(org.apache.spark.sql.Row(words.toSeq)),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("__bloom_bits",
              org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.LongType))))))
      // positions project on the probe side BEFORE the one-row cross join,
      // so each post-join expression references exactly one input
      a.withColumn("__bloom_pos", positions(key))
        .crossJoin(one)
        .withColumn("possibly_dup",
          coalesce(hits(col("__bloom_bits"), col("__bloom_pos")) === lit(k),
                   lit(false)))
        .drop("__bloom_bits", "__bloom_pos")
    }
  }
}
