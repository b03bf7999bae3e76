package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import TextPrep._

/** Text-analysis operators for training-data curation: token statistics,
  * language identification, quality scoring, and content fingerprinting.
  * All pure column expressions — shuffle-free single-pass projections
  * wherever the operator allows (the higher-order array lambdas some ops
  * use evaluate interpreted, not whole-stage-codegen'd; the plan-guarded
  * claim is the shuffle shape, not codegen).
  *
  * Each operator tokenizes into a real `ws` column once, then computes over
  * it — referencing the tokenizer expression repeatedly would re-inline (and
  * re-run) the split per use.
  */
object TextAnalysis {

  /** Minimal per-language stopword lexicons for the n-gram/stopword language
    * heuristic. Deliberately tiny and hard-coded: the operator's contract is
    * a deterministic, SQL-reproducible heuristic, not a trained model.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "de", "un", "une", "des", "que"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "de", "un", "una", "que"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不", "这", "他"))

  private def withWs(docs: DataFrame, lower_ : Boolean = false): DataFrame =
    docs.withColumn("ws",
      if (lower_) words(lower(col("text"))) else words(col("text")))

  /** Token statistics: count, distinct count, type/token ratio, mean token
    * length.
    */
  def tokenStats(docs: DataFrame): DataFrame = {
    val ws = col("ws")
    // empty/null documents exist in any real corpus: a bare `/ size(ws)`
    // is a DIVIDE_BY_ZERO crash under ANSI mode — ratios are null there
    // (n_tokens/n_distinct stay 0 for empty, null for null text)
    val n = size(ws)
    withWs(docs).select(
      col("doc_id"),
      n.cast(LongType).as("n_tokens"),
      size(array_distinct(ws)).cast(LongType).as("n_distinct"),
      when(n > 0, round(size(array_distinct(ws)).cast(DoubleType) / n, 6))
        .as("ttr"),
      when(n > 0, round(aggregate(ws, lit(0L), (acc, w) => acc + length(w))
                          .cast(DoubleType) / n, 6))
        .as("mean_token_len"))
  }

  /** Stopword-vote language ID: predicted language = argmax over languages of
    * the count of tokens in that language's stopword list; ties and zero
    * votes resolve to 'und'. One pass, no explode: a filter-count per lexicon.
    */
  def langId(docs: DataFrame): DataFrame = {
    val ws = col("ws")
    val scores: Seq[(String, Column)] = stopwords.toSeq.sortBy(_._1).map {
      case (lang, sw) =>
        lang -> size(filter(ws, w => w.isin(sw: _*)))
    }
    // argmax with deterministic tie-break: higher count wins, then earlier
    // language alphabetically; all-zero → 'und'
    val best = scores.foldLeft((lit("und"), lit(0))) {
      case ((bl, bs), (lang, s)) =>
        (when(s > bs, lit(lang)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }
    withWs(docs, lower_ = true)
      .select(col("doc_id"), best._1.as("pred_lang"), best._2.cast(LongType).as("votes"))
  }

  /** Heuristic quality score in [0,1]: combines length band, alphabetic
    * ratio, type/token ratio, and mean word length band. Deterministic
    * arithmetic only.
    */
  /** The composite quality score of a (text, token-array) pair — the single
    * formula behind qualityScore / curate / TrainingPrep (length band 0.3,
    * alphabetic ratio 0.3, type/token ratio 0.2, word-length band 0.2).
    */
  def qualityExpr(text: Column, ws: Column): Column = {
    val nTok = size(ws).cast(DoubleType)
    val alphaRatio =
      length(regexp_replace(lower(text), "[^a-z]", "")).cast(DoubleType) /
        greatest(length(text), lit(1)).cast(DoubleType)
    val ttr = size(array_distinct(ws)).cast(DoubleType) / greatest(size(ws), lit(1))
    val meanLen = aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast(DoubleType) /
      greatest(size(ws), lit(1))
    val lenScore = when(nTok >= 20 && nTok <= 1000, 1.0)
      .when(nTok >= 5, 0.5).otherwise(0.0)
    val wordLenScore = when(meanLen >= 3 && meanLen <= 10, 1.0).otherwise(0.5)
    round(lenScore * 0.3 + alphaRatio * 0.3 + ttr * 0.2 + wordLenScore * 0.2, 6)
  }

  def qualityScore(docs: DataFrame): DataFrame = {
    val ws = col("ws")
    val nTok = size(ws).cast(DoubleType)
    val alphaRatio =
      length(regexp_replace(lower(col("text")), "[^a-z]", "")).cast(DoubleType) /
        greatest(length(col("text")), lit(1)).cast(DoubleType)
    val ttr = size(array_distinct(ws)).cast(DoubleType) / greatest(size(ws), lit(1))
    val meanLen = aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast(DoubleType) /
      greatest(size(ws), lit(1))
    val lenScore = when(nTok >= 20 && nTok <= 1000, 1.0)
      .when(nTok >= 5, 0.5).otherwise(0.0)
    val wordLenScore = when(meanLen >= 3 && meanLen <= 10, 1.0).otherwise(0.5)
    withWs(docs).select(
      col("doc_id"),
      round(lenScore, 6).as("len_score"),
      round(alphaRatio, 6).as("alpha_ratio"),
      round(ttr, 6).as("ttr"),
      round((lenScore * 0.3 + alphaRatio * 0.3 + ttr * 0.2 + wordLenScore * 0.2), 6)
        .as("quality"))
  }

  /** One-pass corpus curation — the end-to-end shape of a training-data
    * cleanup run, as a single declarative plan: exact-dedup survivors
    * (content-key hash aggregation + equi-join back on doc_id), then
    * language-ID, quality scoring and token accounting computed over ONE
    * shared token array in one projection (no per-analysis re-scan), then
    * a map-side-combined per-language aggregate. At 100 TB this is two
    * shuffles total (dedup keys, final language rollup); everything else
    * is embarrassingly parallel and whole-stage-codegen'd.
    */
  def curate(docs: DataFrame, minQuality: Double = 0.5): DataFrame = {
    val keep = docs
      .groupBy(md5(substring(col("text"), 1, 50)).as("ck"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val d = docs.join(keep, "doc_id")
      .withColumn("ws", words(lower(col("text"))))
    val ws = col("ws")
    val nTok = size(ws).cast(DoubleType)
    val alphaRatio =
      length(regexp_replace(lower(col("text")), "[^a-z]", "")).cast(DoubleType) /
        greatest(length(col("text")), lit(1)).cast(DoubleType)
    val ttr = size(array_distinct(ws)).cast(DoubleType) / greatest(size(ws), lit(1))
    val meanLen = aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast(DoubleType) /
      greatest(size(ws), lit(1))
    val lenScore = when(nTok >= 20 && nTok <= 1000, 1.0)
      .when(nTok >= 5, 0.5).otherwise(0.0)
    val wordLenScore = when(meanLen >= 3 && meanLen <= 10, 1.0).otherwise(0.5)
    val quality =
      round(lenScore * 0.3 + alphaRatio * 0.3 + ttr * 0.2 + wordLenScore * 0.2, 6)
    val scores: Seq[(String, Column)] = stopwords.toSeq.sortBy(_._1).map {
      case (lang, sw) => lang -> size(filter(ws, w => w.isin(sw: _*)))
    }
    val best = scores.foldLeft((lit("und"), lit(0))) {
      case ((bl, bs), (lang, s)) =>
        (when(s > bs, lit(lang)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }
    d.select(best._1.as("lang"), quality.as("quality"),
             size(ws).cast(LongType).as("n_tokens"))
      .filter(col("quality") >= minQuality)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
           sum("n_tokens").as("total_tokens"),
           round(avg("quality"), 6).as("avg_quality"))
  }

  /** Repetition signals (the Gopher/C4-style quality-filter family:
    * fraction-of-duplicate-n-grams rules) as pure column expressions —
    * one projection, no explode, no shuffle:
    *   - top_word_frac:   share of tokens that are the single most
    *                      frequent token
    *   - dup_word_frac:   share of tokens that are repeats of an earlier
    *                      token (1 - ttr)
    *   - top_bigram_frac: share of word 2-grams that are the most
    *                      frequent 2-gram
    *   - dup_bigram_frac: share of word 2-grams occurring more than once
    * Per-document cost is O(distinct × length) over in-memory arrays —
    * document-bounded, embarrassingly parallel, codegen-friendly.
    */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val ws = col("ws")
    val emptyArr = array().cast(ArrayType(StringType))
    val bg = when(size(ws) >= 2,
      transform(sequence(lit(0), size(ws) - 2),
        i => concat_ws(" ", element_at(ws, i + 1), element_at(ws, i + 2))))
      .otherwise(emptyArr)
    def counts(arr: Column) =
      transform(array_distinct(arr), g => size(filter(arr, x => x === g)))
    def topFrac(arr: Column) =
      round(coalesce(array_max(counts(arr)), lit(0)).cast(DoubleType) /
        greatest(size(arr), lit(1)), 6)
    def dupFrac(arr: Column) =
      round(aggregate(counts(arr), lit(0L),
          (acc, c) => acc + when(c > 1, c.cast(LongType)).otherwise(0L))
        .cast(DoubleType) / greatest(size(arr), lit(1)), 6)
    withWs(docs, lower_ = true).select(
      col("doc_id"),
      topFrac(ws).as("top_word_frac"),
      round((size(ws) - size(array_distinct(ws))).cast(DoubleType) /
        greatest(size(ws), lit(1)), 6).as("dup_word_frac"),
      topFrac(bg).as("top_bigram_frac"),
      dupFrac(bg).as("dup_bigram_frac"))
  }

  /** Content fingerprints: md5 of the whitespace-normalized lowercase text,
    * plus a 64-bit order-sensitive polynomial word hash (so reordered words
    * produce different fingerprints, unlike a bag hash).
    */
  def fingerprint(docs: DataFrame): DataFrame = {
    val ws = col("ws")
    val posHash = aggregate(
      zip_with(ws, sequence(lit(1), size(ws)), (w, i) => (hash64(w) % 1000003L) * i),
      lit(0L), (acc, v) => acc + v)
    withWs(docs, lower_ = true).select(
      col("doc_id"),
      md5(normalized(col("text"))).as("fp_md5"),
      when(size(ws) > 0, posHash).otherwise(0L).as("fp_poly"))
  }

  /** Per-group document-length distribution: count, mean, and exact
    * interpolated percentiles of `n_chars` — the numbers behind length-filter
    * thresholds in corpus curation.
    *
    * Exact `percentile` holds each group's values; it is right for the
    * per-source/per-language group sizes this targets. For percentiles over
    * BILLIONS of rows in one group, swap `percentile` for
    * `approx_percentile(col, p, accuracy)` (t-digest, bounded memory) — not
    * used here because its answer is not bit-reproducible across
    * partitionings, which the oracle contract requires.
    */
  def lengthStats(docs: DataFrame, by: String = "source"): DataFrame =
    docs.groupBy(col(by))
      .agg(count(lit(1)).as("n"),
           round(avg(col("n_chars")), 6).as("mean_chars"),
           round(percentile(col("n_chars"), lit(0.5)), 6).as("p50"),
           round(percentile(col("n_chars"), lit(0.9)), 6).as("p90"),
           round(percentile(col("n_chars"), lit(0.99)), 6).as("p99"))

  /** Corpus vocabulary: the top-k lowercase tokens by total occurrence count
    * with document frequency and a deterministic rank (count desc, token
    * asc). The raw material of tokenizer/BPE training and frequency-based
    * filtering.
    *
    * Scale posture: explode → one hash aggregation on the token key with
    * map-side partial counts (count + count distinct doc via two-level agg),
    * then a global top-k (TakeOrderedAndProject — no full sort of the
    * vocabulary). The token key is naturally skewed (Zipf); the partial
    * aggregation absorbs the skew before the shuffle.
    */
  def vocabulary(docs: DataFrame, topK: Int): DataFrame =
    vocabularyFrom(withWs(docs, lower_ = true)
      .select(col("doc_id"), explode(col("ws")).as("token")), topK)

  private def vocabularyFrom(tok: DataFrame, topK: Int): DataFrame = {
    // two-level aggregate: (token, doc) partial counts combine map-side, so
    // the shuffle carries one row per distinct (token, doc), not per token
    // occurrence
    val perDoc = tok.groupBy("token", "doc_id").agg(count(lit(1)).as("n"))
    perDoc.groupBy("token")
      .agg(sum(col("n")).as("n_total"), count(lit(1)).as("n_docs"))
      .orderBy(col("n_total").desc, col("token"))
      .limit(topK)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n_total").desc, col("token"))).cast(LongType))
  }

  /** Count-Min sketch cells over the corpus token stream (Cormode &
    * Muthukrishnan 2005): `depth` salted hash rows × `width` buckets; each
    * cell holds the total occurrence count of the tokens hashing into it.
    *
    * This is [[vocabulary]]'s fixed-memory face: the exact aggregation
    * shuffles one row per distinct (token, doc) — fine for word vocabularies,
    * prohibitive when the key space is itself corpus-sized (URLs, n-grams,
    * session ids). The sketch's aggregation key space is depth×width
    * REGARDLESS of corpus size, so map-side partial aggregation collapses
    * every task's stream to at most depth×width cells and the shuffle
    * carries only those — frequency estimation with no token-keyed shuffle
    * at any scale. Estimates (min over rows of the probed cells) carry the
    * classical one-sided error: never below the true count, over by at most
    * εN with probability 1-δ at width=⌈e/ε⌉, depth=⌈ln 1/δ⌉. Each key is
    * hashed ONCE with the shared 60-bit md5 and row r reads its own
    * disjoint log2(width)-bit slice (see [[cmsBits]]), so the DuckDB oracle
    * replays every cell — including hash collisions — with integer shifts,
    * bit-for-bit.
    */
  def cmsCells(docs: DataFrame, depth: Int, width: Int): DataFrame =
    cmsCellsFrom(withWs(docs, lower_ = true)
      .select(explode(col("ws")).as("token")), depth, width)

  /** Bits per CMS row, with the power-of-two and 60-bit-budget checks the
    * one-hash-per-key construction needs: row r reads bits
    * [r·b, (r+1)·b) of the shared 60-bit md5 — one hash per occurrence
    * instead of depth (measured 4× less hashing = the difference between a
    * linear and a super-linear sf0.1→sf1 exponent), with the disjoint
    * slices giving the per-row independence the sketch bound needs.
    */
  private def cmsBits(depth: Int, width: Int): Int = {
    require(width > 1 && Integer.bitCount(width) == 1,
            "width must be a power of two")
    val b = Integer.numberOfTrailingZeros(width)
    require(depth * b <= 60, s"depth*log2(width) = ${depth * b} exceeds the 60 hash bits")
    b
  }

  private[graft] def cmsCellsFrom(tok: DataFrame, depth: Int, width: Int): DataFrame = {
    val b = cmsBits(depth, width)
    tok
      .select(hash64(col("token")).as("h"))
      .select(col("h"), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .withColumn("c", pmod(call_function("shiftright", col("h"),
                              (col("r") * lit(b)).cast(IntegerType)),
                            lit(width.toLong)))
      .groupBy("r", "c").agg(count(lit(1)).as("n"))
  }

  /** Sketch-quality evaluation: for the exact top-k tokens, the Count-Min
    * estimate next to the true count (`overcount = n_cms - n_total >= 0`,
    * pinned by spec). The probe joins the top-k's depth positions against
    * the broadcast cell frame and takes the per-token min — the same dial
    * surface as the ANN recall queries: what the fixed-memory compression
    * costs in accuracy at the chosen width.
    */
  def cmsTopKEvaluate(docs: DataFrame, topK: Int,
                      depth: Int, width: Int): DataFrame = {
    // two scan passes (sketch + exact), each tokenizing from the projected
    // ws array — a checkpoint of the token stream was measured strictly
    // worse at both sf0.1 and sf1 (it pays a full token-frame write that
    // the re-scan amortizes away)
    val tok = withWs(docs, lower_ = true)
      .select(col("doc_id"), explode(col("ws")).as("token"))
    val cells = cmsCellsFrom(tok, depth, width)
    val b = cmsBits(depth, width)
    val probes = vocabularyFrom(tok, topK)
      .withColumn("h", hash64(col("token")))
      .select(col("token"), col("n_total"), col("rank"), col("h"),
              explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .withColumn("c", pmod(call_function("shiftright", col("h"),
                              (col("r") * lit(b)).cast(IntegerType)),
                            lit(width.toLong)))
    probes.join(broadcast(cells), Seq("r", "c"))
      .groupBy("token", "n_total", "rank")
      .agg(min(col("n")).as("n_cms"))
      .withColumn("overcount", col("n_cms") - col("n_total"))
      .select("token", "n_total", "n_cms", "overcount", "rank")
  }

  /** HyperLogLog cardinality estimation (Flajolet et al. 2007) with exact
    * evaluation — the third fixed-memory sketch face (membership =
    * [[Decontam.bloomFlag]], frequency = [[cmsCells]], cardinality = this):
    * per group, `m` registers hold the max leading-zero rank of the hashed
    * keys landing in each bucket, and the harmonic-mean estimate reads off
    * distinct-count without ever shuffling the key. The register aggregation
    * key space is groups×m REGARDLESS of key cardinality — map-side partial
    * max absorbs the stream, exactly the shape `count(DISTINCT key)` cannot
    * have (its shuffle carries every distinct key).
    *
    * Replayability: bucket = low log2(m) bits of the shared 60-bit md5
    * ([[TextPrep.hash64]]); rank = leading zeros of the remaining bits + 1,
    * computed via the exact `bin`/`lpad`/`ltrim` string route both engines
    * share. The harmonic sum is kept in INTEGER arithmetic
    * (Σ 2^(p+1−rank), empty registers included) so it is order-independent
    * and bit-exact across engines; only the final α·m²·2^(p+1)/S division
    * (and the standard linear-counting branch for small ranges) is floating
    * point — one IEEE division, deterministic, rounded to 6 decimals like
    * every float the oracle compares. Output per group: exact distinct
    * count, the HLL estimate, and the signed relative error in percent
    * (theoretical σ = 1.04/√m ≈ 13 % at m=64; the spec pins a 3σ envelope).
    */
  def hllCardinality(df: DataFrame, key: org.apache.spark.sql.Column,
                     groupName: String, m: Int = 64): DataFrame = {
    require(m > 0 && Integer.bitCount(m) == 1, "m must be a power of two")
    val b = Integer.numberOfTrailingZeros(m)
    val p = 60 - b // value bit-width after the bucket bits
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1 + 1.079 / m)
    }
    val c = alpha * m * m * math.pow(2.0, p + 1) // scaled alpha*m^2 constant
    val keyed = df.select(col(groupName).as("grp"), key.as("__k"))
    val hv = hash64(col("__k"))
    val v = shiftright(hv, b)
    val rank = lit(p + 1) - length(ltrim(lpad(bin(v), p, "0"), "0"))
    // ONE pass over the keyed stream: buckets partition the key space by
    // hash, so the exact evaluation count is the sum of per-bucket distinct
    // counts — the register max and the exact side share the same
    // (grp, bucket) aggregation instead of scanning the input twice
    val regs = keyed
      .select(col("grp"), pmod(hv, lit(m.toLong)).as("bucket"),
              rank.as("rank"), col("__k"))
      .groupBy("grp", "bucket")
      .agg(max(col("rank")).as("r"), countDistinct(col("__k")).as("nd"))
    val agg = regs.groupBy("grp").agg(
      count(lit(1)).as("nb"),
      sum(call_function("shiftleft", lit(1L),
                        (lit(p + 1) - col("r")).cast(IntegerType))).as("s_present"),
      sum(col("nd")).as("n_exact"))
    agg
      .withColumn("v", lit(m.toLong) - col("nb"))
      .withColumn("s", col("s_present") + col("v") * lit(1L << (p + 1)))
      .withColumn("e",
        when((lit(c) / col("s")) <= lit(2.5 * m) && col("v") > 0,
             lit(m.toDouble) * log(lit(m.toDouble) / col("v")))
          .otherwise(lit(c) / col("s")))
      .select(col("grp").as(groupName), col("n_exact"),
              round(col("e"), 6).as("n_hll"),
              round((col("e") - col("n_exact")) / col("n_exact") * 100, 6)
                .as("err_pct"))
  }

  /** Per-group unigram divergence from the corpus distribution — the
    * domain-shift number a curation dashboard tracks per source/language:
    * cross-entropy H(P_g, P) of the group's unigram distribution under the
    * (add-one-smoothed) corpus distribution, the group's own entropy
    * H(P_g), and their difference KL(P_g ‖ P) ≥ 0. High KL = the source
    * speaks a different language than the corpus (code vs prose, spam,
    * boilerplate); the ranking drives mixture re-weighting decisions.
    *
    * Sums run over each group's OBSERVED vocabulary (the natural sparse
    * (group, word) frame): absent-word smoothing mass is omitted — the
    * full-support sum would need a groups × vocabulary dense frame, which
    * dies at corpus-sized vocabularies; on observed support the frame is
    * exactly the group-vocab relation that already exists. Documented
    * convention, mirrored by the oracle.
    *
    * Scale posture: one token explode, two hash aggregations (group-vocab
    * and corpus-vocab, Zipf skew absorbed map-side), one token-keyed
    * equi-join between them, and a per-group window over the vocab-sized
    * frame. N and V are one scalar action (the [[graft.pipeline
    * .LanguageModel.crossEntropy]] shape). The only floats are ln of
    * integer ratios, summed per group and rounded to 6dp.
    */
  def unigramDivergence(docs: DataFrame, by: String = "source"): DataFrame = {
    val tok = withWs(docs, lower_ = true)
      .select(col(by).as("grp"), explode(col("ws")).as("w"))
    val cg = tok.groupBy("grp", "w").agg(count(lit(1)).as("c_g"))
    val glob = tok.groupBy("w").agg(count(lit(1)).as("c_w"))
    val nv = glob.agg(sum(col("c_w")), count(lit(1))).head()
    val (nTot, vSize) = (nv.getLong(0), nv.getLong(1))
    val wgrp = org.apache.spark.sql.expressions.Window.partitionBy("grp")
    val joined = cg.join(glob, "w")
      .withColumn("n_g", sum(col("c_g")).over(wgrp))
    val pg = col("c_g").cast(DoubleType) / col("n_g")
    val hxTerm = -pg * log((col("c_w") + 1L).cast(DoubleType) /
                           lit((nTot + vSize).toDouble))
    val hTerm = -pg * log(pg)
    joined.groupBy("grp")
      .agg(max(col("n_g")).as("n_tokens"),
           count(lit(1)).as("n_types"),
           round(sum(hxTerm), 6).as("cross_entropy"),
           round(sum(hTerm), 6).as("entropy"),
           round(sum(hxTerm) - sum(hTerm), 6).as("kl"))
      .select(col("grp").as(by), col("n_tokens"), col("n_types"),
              col("cross_entropy"), col("entropy"), col("kl"))
  }

  /** Fixed-bin quantile sketch with exact evaluation — the FOURTH
    * fixed-memory sketch face (membership = [[graft.pipeline.Decontam]]
    * Bloom, frequency = [[cmsCells]], cardinality = [[hllCardinality]],
    * quantiles = this): per group, a `bins`-cell histogram of the value
    * over the fixed range [lo, hi] answers any percentile with one
    * cumulative pass, and the estimate sits next to the exact
    * rank-selected value with the signed error — the same
    * what-the-compression-costs dial as the CMS/HLL evaluations.
    *
    * The aggregation key space is groups × bins REGARDLESS of row count —
    * map-side partials absorb the stream, exactly the shape an exact
    * per-group sort cannot have. Everything is integer arithmetic: bin =
    * clamp((x−lo)·bins div span), target rank = ceil(p·N/100) by integer
    * division, estimate = the selected bin's integer midpoint — so the
    * frame replays bit-for-bit in ANSI SQL. Values outside [lo, hi] clamp
    * into the edge bins (a fixed-range sketch's documented behavior; pick
    * the range from schema knowledge or a prior pass).
    *
    * The EXACT side (row_number rank selection — one per-group sort) is
    * the evaluation harness, not the production path: at 100 TB run the
    * sketch alone, exactly as hllCardinality's scaladoc prescribes for its
    * exact column.
    */
  /** The sketch's cell frame — (grp, bin, n) from a (grp, x) frame: one
    * hash aggregation with a groups×bins key space regardless of row
    * count. Bin = clamp((x−lo)·bins div span) in exact integer arithmetic.
    * Shared by [[quantileSketch]] and the streaming face (the cells are a
    * mergeable monoid — counts add — so Structured Streaming's stateful
    * aggregation maintains them incrementally).
    */
  private[graft] def quantileCellsFrom(keyed: DataFrame, bins: Int,
                                       lo: Long, hi: Long): DataFrame = {
    require(bins > 0 && hi > lo, "need bins > 0 and hi > lo")
    val span = hi - lo + 1
    val bin = least(greatest(expr(s"((x - ${lo}L) * $bins) div ${span}L"),
                             lit(0L)), lit((bins - 1).toLong))
    keyed.groupBy(col("grp"), bin.as("bin")).agg(count(lit(1)).as("n"))
  }

  def quantileSketch(df: DataFrame, value: org.apache.spark.sql.Column,
                     groupName: String, bins: Int, lo: Long, hi: Long,
                     ps: Seq[Int]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100),
            "percentiles must be in [1,100]")
    val span = hi - lo + 1
    val keyed = df.select(col(groupName).as("grp"), value.cast(LongType).as("x"))
    val cells = quantileCellsFrom(keyed, bins, lo, hi)
    val wcum = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("bin")
    val wgrp = org.apache.spark.sql.expressions.Window.partitionBy("grp")
    val cum = cells
      .withColumn("cum", sum(col("n")).over(wcum))
      .withColumn("ntot", sum(col("n")).over(wgrp))
    val est = cum
      .select(col("grp"), col("bin"), col("cum"), col("ntot"),
              explode(lit(ps.toArray)).as("p"))
      .filter(col("cum") >= expr("(ntot * p + 99) div 100"))
      .groupBy("grp", "p").agg(min(col("bin")).as("qbin"))
      .withColumn("est_q",
        lit(lo) + expr(s"((2 * qbin + 1) * ${span}L) div ${2L * bins}L"))
    val wrank = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("x")
    val exact = keyed
      .withColumn("rn", row_number().over(wrank).cast(LongType))
      .withColumn("ntot", count(lit(1)).over(wgrp))
      .select(col("grp"), col("x"), col("rn"), col("ntot"),
              explode(lit(ps.toArray)).as("p"))
      .filter(col("rn") === expr("(ntot * p + 99) div 100"))
      .select(col("grp"), col("p"), col("ntot").as("n"), col("x").as("exact_q"))
    exact.join(est, Seq("grp", "p"))
      .select(col("grp").as(groupName), col("p").cast(LongType).as("p"),
              col("n"), col("exact_q"), col("est_q"),
              (col("est_q") - col("exact_q")).as("err"))
  }

  /** GPT-2-shaped subword pre-tokenization: contractions split off, a
    * word/number/punctuation run (with its leading space) is one piece,
    * residual whitespace runs are one piece. Deliberately RE2-portable —
    * no lookahead (the one construct in the original GPT-2 pattern RE2
    * lacks) — and leftmost-first in both Java regex and RE2, so the DuckDB
    * oracle reproduces piece boundaries exactly.
    */
  val subwordPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Per-document subword statistics: pre-tokenizer piece count and
    * fertility (pieces per whitespace word — the tokenizer-pressure signal
    * a corpus report tracks; high fertility = scriptio continua, code, or
    * junk). One shuffle-free projection, no explode; null text yields null
    * counts (the corpus-reality discipline of tokenStats).
    */
  /** Top-k TF-IDF terms per document (tf × ln(N/df), deterministic rank:
    * rounded score desc, then token asc). The relevance-term surface behind
    * keyword extraction and topic-balance reporting in corpus curation.
    *
    * Scale posture: tf and df are two hash aggregations on the token key
    * (Zipf skew absorbed map-side); the corpus size N is a one-row frame
    * broadcast into the scoring join; the per-document rank window
    * partitions on doc_id, so no global sort. Ranking compares the ROUNDED
    * score — a 1-ulp ln() difference between engines cannot flip a rank.
    */
  def tfidfTopK(docs: DataFrame, topK: Int): DataFrame = {
    val tok = withWs(docs, lower_ = true)
      .select(col("doc_id"), explode(col("ws")).as("token"))
    // materialize: tf feeds both the document-frequency aggregation and
    // the scoring join — without it the tokenize+explode+count subtree
    // executes twice (Catalyst does not share the branches)
    val tf = graft.util.Fixpoint.materialize(
      tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf")))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_corpus"))
    val scored = tf.join(dfreq, "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_corpus").cast(DoubleType) /
                              col("df").cast(DoubleType)), 6))
    scored
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("token"))).cast(LongType))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
              col("tfidf"), col("rank"))
  }

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, MOSS): hash
    * every word k-gram, slide a window of w consecutive gram hashes, keep
    * each window's minimum — the selected set is guaranteed to share a
    * fingerprint with any other document that shares a run of w+k-1 words.
    * Emitted as the distinct (doc_id, fp) value set (position-free form);
    * fingerprint matches join on fp to find local-overlap candidates.
    *
    * Pure per-document array expressions (no explode until the final value
    * set, no shuffle before it) — the hash uses the shared 60-bit md5 so the
    * value set replays exactly in ANSI SQL. Documents shorter than k words
    * have no grams (no rows); with fewer than w grams the single window is
    * the whole gram list, per the original algorithm's boundary case.
    */
  def winnowFingerprints(docs: DataFrame, k: Int, w: Int): DataFrame = {
    // Three rejected shapes, all measured: (a) per-window array lambdas —
    // CollapseProject re-inlines (and re-hashes) the gram array per
    // window, O(len²) md5 per doc; (b) the same with a one-element-array
    // let-binding — fixes the hashing but leaves a doubly-nested
    // higher-order lambda interpreted per (window, element); (c) posexplode
    // of a projected gram-hash ARRAY — InferFiltersFromGenerate copies the
    // whole gram expression into a scan DataFilter with `ws` inlined, so
    // every element_at re-runs split+filter over the full text: O(len²)
    // interpreted work per doc per evaluation site (14-22s at sf0.1).
    // The codegen shape has NO array lambdas past tokenization: explode
    // words once, build each gram with lead() over the doc-keyed window,
    // hash it, and take a sliding rowsBetween min — both window ops share
    // one sort, so the whole operator is ONE doc-keyed shuffle of narrow
    // (long, int, long) rows with every expression whole-stage-generated.
    val byPos = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val gramWords = col("word") +: (1 until k).map(j => lead(col("word"), j).over(byPos))
    val grams = withWs(docs, lower_ = true)
      .select(col("doc_id"), size(col("ws")).as("nw"),
              posexplode(col("ws")).as(Seq("pos", "word")))
      .withColumn("gh", hash64(concat_ws(" ", gramWords: _*)))
      // valid gram starts only (lead past the end is null and concat_ws
      // would silently shorten the gram); docs with < k words vanish here
      .filter(col("pos") <= col("nw") - k)
    val slide = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    grams
      .withColumn("m", min(col("gh")).over(slide))
      // valid window starts only; a doc with fewer than w grams keeps its
      // single whole-list window at pos 0 (the algorithm's boundary case)
      .filter(col("pos") <= greatest(col("nw") - (k - 1) - w, lit(0)))
      .select(col("doc_id"), col("m").as("fp"))
      .distinct()
  }

  /** Gopher-style document quality rules (Rae et al. 2021, Table A1) — the
    * standard rule battery a pretraining corpus is filtered with, as ONE
    * shuffle-free projection (no explode, no shuffle — the plan-guarded
    * claim; the `aggregate`/`filter` array lambdas evaluate interpreted,
    * so the shape, not codegen, is the 100 TB argument — embarrassingly
    * parallel by construction):
    *   - word count within [minWords, maxWords]
    *   - mean word length within [3, 10]
    *   - fraction of words containing an alphabetic character >= 0.8
    *   - symbol-to-word ratio (# and ... occurrences per word) <= 0.1
    *   - at least `minStopHits` hits against the English stopword lexicon
    * Output carries the raw signals (exact counts; ratios rounded to 6dp)
    * next to 0/1 rule flags and the conjunction `gopher_pass`, so a
    * curation report can see WHICH rule rejected a document — the signals,
    * not just the verdict, are the operator's product. Thresholds are
    * parameters; the canonical Gopher bounds (50..100k words) are defaults.
    *
    * The paper's duplicate-text rules (top-n-gram / dup-n-gram fractions)
    * are deliberately NOT repeated here — they are [[repetitionStats]];
    * compose the two frames on doc_id for the full battery.
    */
  def gopherQuality(docs: DataFrame, minWords: Long = 50L,
                    maxWords: Long = 100000L,
                    minStopHits: Long = 2L): DataFrame = {
    val ws = col("ws")
    val n = size(ws).cast(LongType)
    val meanLen = when(n > 0,
      round(aggregate(ws, lit(0L), (acc, w) => acc + length(w))
              .cast(DoubleType) / n, 6))
    val alphaFrac = when(n > 0,
      round(size(filter(ws, w => w.rlike("[a-z]"))).cast(DoubleType) / n, 6))
    // symbols per word: '#' occurrences plus '...' runs (each maximal dot
    // run of length >= 3 counts once, the paper's ellipsis reading)
    val nSym = (length(col("text")) -
                 length(regexp_replace(col("text"), "#", ""))).cast(LongType) +
               size(regexp_extract_all(col("text"), lit("\\.{3,}"), lit(0)))
                 .cast(LongType)
    val symRatio = when(n > 0, round(nSym.cast(DoubleType) / n, 6))
    val stopHits =
      size(filter(ws, w => w.isin(stopwords("en"): _*))).cast(LongType)
    val fWords = (n >= minWords && n <= maxWords).cast(LongType)
    val fMeanLen = (meanLen.isNotNull && meanLen >= 3.0 && meanLen <= 10.0)
      .cast(LongType)
    val fAlpha = (alphaFrac.isNotNull && alphaFrac >= 0.8).cast(LongType)
    val fSymbol = (symRatio.isNotNull && symRatio <= 0.1).cast(LongType)
    val fStop = (stopHits >= minStopHits).cast(LongType)
    withWs(docs, lower_ = true).select(
      col("doc_id"),
      n.as("n_words"), meanLen.as("mean_word_len"),
      alphaFrac.as("alpha_word_frac"), symRatio.as("symbol_ratio"),
      stopHits.as("stop_hits"),
      fWords.as("f_words"), fMeanLen.as("f_mean_len"),
      fAlpha.as("f_alpha"), fSymbol.as("f_symbol"), fStop.as("f_stop"),
      (fWords * fMeanLen * fAlpha * fSymbol * fStop).as("gopher_pass"))
  }

  def subwordStats(docs: DataFrame): DataFrame = {
    val pieces = size(regexp_extract_all(col("text"), lit(subwordPattern), lit(0)))
    val nWords = size(words(col("text")))
    docs.select(
      col("doc_id"),
      when(col("text").isNotNull, pieces.cast(LongType)).as("n_pieces"),
      when(col("text").isNotNull, nWords.cast(LongType)).as("n_words"),
      when(col("text").isNotNull && nWords > 0,
           round(pieces.cast(DoubleType) / nWords, 6)).as("fertility"))
  }
}
