package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dataset-curation sampling — the selection stage of a
  * training-data pipeline (choose what to train on AFTER dedup/quality
  * filtering): stratified samples, per-source weighted subsampling
  * (mixture construction), and train/val/test splits.
  *
  * Everything keys on the shared 60-bit md5 hash ([[TextPrep.hash64]]) so
  * results are (a) reproducible across runs, partitionings, and engines —
  * no `rand()`, which breaks replay and lineage recovery — and (b)
  * bit-checkable by the DuckDB oracle. Each operator salts the hash with
  * its own suffix so sample membership is independent ACROSS operators (a
  * doc in the 10% subsample is not automatically in the first 10% of the
  * train split).
  *
  * Scale posture: `weightedSample` and `split` are pure column projections
  * / filters — zero shuffles, fully codegen'd, pushdown-friendly.
  * `stratifiedTopK` is one shuffle on the stratum key plus a per-stratum
  * sort bounded by the window; at 100 TB a pathological mega-stratum sorts
  * on one reducer — mitigate by pre-filtering with an approximate
  * per-stratum hash threshold when k ≪ stratum size (two-pass), or accept
  * the spill (Spark's window sort spills to disk, it does not OOM).
  */
object Sampling {

  /** Deterministic position of a key on the [0,1) line (salted). */
  private def unit(key: Column, salt: String): Column =
    TextPrep.hash64(concat(key.cast("string"), lit(salt)))
      .cast("double") / lit((1L << 60).toDouble)

  /** The k docs per stratum that sort first by salted hash of their id —
    * a reproducible uniform-without-replacement sample per stratum
    * (language, source, quality band...). Ties broken by the key itself.
    */
  def stratifiedTopK(docs: DataFrame, stratum: String, k: Int,
                     keyCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col(stratum))
      .orderBy(TextPrep.hash64(concat(col(keyCol).cast("string"),
                                      lit(":strat"))), col(keyCol))
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Per-source Bernoulli subsampling at deterministic rates — the mixture
    * construction step ("2 parts wiki to 1 part crawl"): keep a doc iff
    * its hash position is below its source's rate. A pure filter: no
    * shuffle, no state, trivially restartable mid-corpus.
    */
  def weightedSample(docs: DataFrame, rates: Map[String, Double],
                     defaultRate: Double, sourceCol: String = "source",
                     keyCol: String = "doc_id"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (els, (src, r)) =>
      when(col(sourceCol) === src, lit(r)).otherwise(els)
    }
    docs.filter(unit(col(keyCol), ":sample") < rate)
  }

  /** Token-budget sampling: per group, keep documents in salted-hash order
    * until the group's cumulative token count reaches the budget — the
    * "take N tokens of source X" step of training-mixture construction,
    * reproducible across runs and partitionings. A document that would
    * overshoot the budget is dropped (the kept set's total is <= budget).
    *
    * One shuffle on the group key; the running sum is a window over the
    * group's hash order (Spark's window sort spills, it does not OOM). For
    * groups of billions of documents, pre-filter with weightedSample at
    * roughly budget/group-tokens before the exact pass.
    *
    * EventStreams.streamingTokenBudget implements the same cutoff (same
    * salted-hash order, running total includes skipped docs): a single
    * micro-batch admits exactly this operator's sample.
    */
  def tokenBudgetSample(docs: DataFrame, budgetPerGroup: Long,
                        groupCol: String = "source",
                        keyCol: String = "doc_id"): DataFrame = {
    val nTok = size(TextPrep.words(col("text"))).cast("long")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(TextPrep.hash64(concat(col(keyCol).cast("string"),
                                      lit(":budget"))), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("__cum", sum(nTok).over(w))
      .filter(col("__cum") <= budgetPerGroup).drop("__cum")
  }

  /** Deterministic train/val/test split: cumulative hash-range buckets in
    * the given order (fractions should sum to 1; the last label absorbs
    * the remainder). A pure projection — the split column can be computed
    * at read time anywhere, no global coordination.
    */
  def split(docs: DataFrame, fractions: Seq[(String, Double)],
            keyCol: String = "doc_id"): DataFrame = {
    require(fractions.nonEmpty, "split needs at least one labeled fraction")
    val u = unit(col(keyCol), ":split")
    val cum = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    val label = fractions.zip(cum).dropRight(1)
      .foldRight(lit(fractions.last._1): Column) {
        case (((name, _), c), els) => when(u < lit(c), lit(name)).otherwise(els)
      }
    docs.withColumn("split", label)
  }

  /** GROUP-DISJOINT split (scikit-learn's GroupShuffleSplit shape — the
    * leakage-safe evaluation discipline): the hash-range bucket is
    * computed on the GROUP key, so every document of a group
    * (source/site/author/session) lands in the SAME split. Doc-level
    * splitting ([[split]]) lets near-duplicates within a group straddle
    * train and validation — the classic silent eval leak in web-scale
    * corpora, where one site's boilerplate appears thousands of times;
    * group disjointness closes it by construction. Fractions apportion
    * GROUPS by hash range, so realized DOC fractions track group-size
    * distribution, not the requested ratios exactly (inherent to group
    * splits; report realized sizes, as the query entry does).
    *
    * Same scale posture as [[split]]: a pure projection (the split label
    * is a function of the group key alone) — computable at read time
    * anywhere, no shuffle, no coordination.
    */
  def splitByGroup(docs: DataFrame, fractions: Seq[(String, Double)],
                   groupCol: String = "source"): DataFrame = {
    require(fractions.nonEmpty, "split needs at least one labeled fraction")
    val u = unit(col(groupCol), ":gsplit")
    val cum = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    val label = fractions.zip(cum).dropRight(1)
      .foldRight(lit(fractions.last._1): Column) {
        case (((name, _), c), els) => when(u < lit(c), lit(name)).otherwise(els)
      }
    docs.withColumn("split", label)
  }

  /** Domain-mixture construction: given target WEIGHTS per source (the
    * relative proportions of the training mix — "3 parts wiki, 1 part
    * crawl") and a total token budget, derive each source's token budget
    * as its weight-normalized share (`floor(w/Σw · total)`), then admit
    * that source's documents in salted-hash order until the cumulative
    * token count would exceed the share. Sources absent from the weight
    * map contribute nothing (budget 0) — a mixture is a whitelist.
    *
    * This is the step between curation and packing in a training-data
    * pipeline: the upstream filters decide what COULD be trained on, the
    * mixture decides how much of each domain actually IS. Reference
    * analogy: the reference's per-source sampling knobs live outside the
    * engine (harness configs, e.g. `bigdata-perf/CI/govtrack/README.txt`);
    * here the mixture is a first-class relational operator.
    *
    * Scale posture: one shuffle on the source key; the per-source cutoff
    * is a window running sum in salted-hash order (spills, does not OOM).
    * The budget arithmetic is a constant-folded CASE column — no second
    * pass over the corpus, no driver-side collect. A mega-source sorts on
    * one reducer; mitigate exactly as [[tokenBudgetSample]] documents
    * (pre-filter with [[weightedSample]] near the expected rate).
    */
  /** DSIR-shaped importance resampling (Xie et al. 2023, arXiv:2302.03169,
    * "Data Selection via Importance Resampling"): select the source
    * documents whose hashed-unigram distribution looks most like a TARGET
    * corpus. Words hash into `buckets` bins; each bin gets add-one-smoothed
    * counts under both corpora, and a word votes +1/-1/0 for its document
    * by which corpus explains its bin better. A document's score is its
    * exact integer vote sum; the `n` highest-scoring documents (ties →
    * lowest doc_id) are the resample.
    *
    * The paper scores log(p_target/p_source) per feature; the vote is the
    * SIGN of that ratio, compared by exact 128-bit cross-multiplication
    * ((c_t+1)(T_s+B) vs (c_s+1)(T_t+B)) instead of floating logs — the
    * same exactness-preserving discipline as the 60-bit md5 hashes: no
    * libm call whose last ulp could differ across engines, so the oracle
    * replays the ranking bit-for-bit. (Magnitude-weighted scoring is a
    * one-line swap — replace the sign with the log ratio — at the cost of
    * cross-engine exactness.)
    *
    * Scale posture: bucket-count tables are `buckets` rows (broadcast);
    * the corpus is exploded to words once, joined map-side to the
    * broadcast bins, and hash-aggregated back to one row per doc — one
    * corpus shuffle (the doc_id re-aggregation). The target corpus is
    * touched once for its histogram, never joined row-to-row. Top-n is
    * TakeOrdered (per-partition heaps, no global sort).
    */
  def importanceResample(docs: DataFrame, target: DataFrame, buckets: Int,
                         n: Int): DataFrame = {
    require(buckets > 0 && n > 0, "buckets and n must be positive")
    val dec = "decimal(38,0)"
    def bucketCounts(d: DataFrame): DataFrame =
      d.select(explode(TextPrep.words(col("text"))).as("w"))
        .select((TextPrep.hash64(col("w")) % buckets).as("b"))
        .groupBy("b").agg(count(lit(1)).as("c"))
    // bucket-count frames are <= `buckets` rows — checkpoint them and read
    // the corpus word totals off the aggregated frames instead of two
    // separate full-scan sum jobs (every word lands in exactly one bucket,
    // so sum of bucket counts IS the word total): 6 corpus-scale passes
    // over the exploded words become 3 (target once, docs once for counts,
    // docs once for scoring)
    val tc = graft.util.Fixpoint.materialize(
      bucketCounts(target).select(col("b"), col("c").as("c_t")))
    val sc = graft.util.Fixpoint.materialize(
      bucketCounts(docs).select(col("b"), col("c").as("c_s")))
    def tot(df: DataFrame, c: String): Long =
      df.agg(coalesce(sum(col(c)), lit(0L))).head.getLong(0)
    val totT = tot(tc, "c_t")
    val totS = tot(sc, "c_s")
    val bins = tc.join(sc, Seq("b"), "full_outer")
      .select(col("b"),
        ((coalesce(col("c_t"), lit(0L)) + 1).cast(dec) * lit(totS + buckets).cast(dec))
          .as("lhs"),
        ((coalesce(col("c_s"), lit(0L)) + 1).cast(dec) * lit(totT + buckets).cast(dec))
          .as("rhs"))
      .withColumn("vote",
        when(col("lhs") > col("rhs"), 1L)
          .when(col("lhs") < col("rhs"), -1L).otherwise(0L))
      .select("b", "vote")
    docs.select(col("doc_id"), explode(TextPrep.words(col("text"))).as("w"))
      .select(col("doc_id"), (TextPrep.hash64(col("w")) % buckets).as("b"))
      .join(broadcast(bins), "b")
      .groupBy("doc_id").agg(sum(col("vote")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(n)
  }

  def domainMixture(docs: DataFrame, weights: Map[String, Double],
                    totalTokens: Long, sourceCol: String = "source",
                    keyCol: String = "doc_id"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ >= 0),
            "mixture weights must be non-negative")
    val wSum = weights.values.sum
    val budget = weights.foldLeft(lit(0L)) { case (els, (src, w)) =>
      when(col(sourceCol) === src,
           lit(math.floor(w / wSum * totalTokens).toLong)).otherwise(els)
    }
    val nTok = size(TextPrep.words(col("text"))).cast("long")
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(TextPrep.hash64(concat(col(keyCol).cast("string"),
                                      lit(":mix"))), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("__cum", sum(nTok).over(w))
      .filter(col("__cum") <= budget).drop("__cum")
  }

  /** UniMax language allocations (Chung et al. 2023, "UniMax: Fairer and
    * More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): distribute a total token budget as uniformly as
    * possible across languages, capping each language at `maxEpochs`
    * passes over its corpus — the budget a capped language can't absorb
    * waterfills to the rest. Replaces temperature sampling's tuned
    * exponent with one interpretable knob (the epoch cap).
    *
    * Exact integer waterfilling: languages sorted by (capacity, lang);
    * position k is fully satisfiable iff
    * `cap_k <= floor((B - Σ_{i<k} cap_i) / (m - k + 1))` — after the first
    * failure every remaining language gets that position's level, and the
    * division remainder goes +1 each to the first languages in the same
    * order. All arithmetic is on longs, so allocations replay exactly in
    * ANSI SQL (and are partitioning-independent).
    *
    * Scale posture: the allocation frame is language-cardinality (one row
    * per language — thousands at most), so the single-partition windows
    * here are by construction driver-scale; the corpus contributes one
    * map-side-combinable token-count aggregation.
    */
  def unimaxAllocations(docs: DataFrame, totalBudget: Long, maxEpochs: Int,
                        langCol: String = "lang"): DataFrame = {
    require(totalBudget >= 0 && maxEpochs >= 1, "budget >= 0, epochs >= 1")
    val nTok = size(TextPrep.words(col("text"))).cast("long")
    val caps = docs.groupBy(col(langCol).as("lang"))
      .agg(sum(nTok).as("n_tok_lang"))
      .withColumn("cap", col("n_tok_lang") * maxEpochs)
    val order = Window.orderBy(col("cap"), col("lang"))
    val wPrev = order.rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(lit(0))
    val staged = caps
      .withColumn("k", row_number().over(order))
      .withColumn("cumprev", coalesce(sum(col("cap")).over(wPrev), lit(0L)))
      .withColumn("m", count(lit(1)).over(wAll))
      // Long integer division, never double floor: for every k up to the
      // first failing position the numerator is provably non-negative (each
      // fully-satisfied language's cap is <= its level, so cumprev stays
      // <= budget), where truncating division equals floor; beyond it the
      // level only feeds `cap > level`, which any negative value satisfies.
      .withColumn("level",
        expr(s"(${totalBudget}L - cumprev) div (m - k + 1)"))
      .withColumn("fk", min(when(col("cap") > col("level"), col("k"))).over(wAll))
    staged
      .withColumn("flevel", max(when(col("k") === col("fk"), col("level"))).over(wAll))
      .withColumn("frem",
        max(when(col("k") === col("fk"),
                 (lit(totalBudget) - col("cumprev")) % (col("m") - col("k") + 1)))
          .over(wAll))
      .withColumn("alloc",
        when(col("fk").isNull || col("k") < col("fk"), col("cap"))
          .otherwise(col("flevel") +
                     when(col("k") - col("fk") < col("frem"), 1L).otherwise(0L)))
      .select(col("lang"), col("n_tok_lang"), col("cap"), col("alloc"),
              expr("(alloc * 1000000L) div n_tok_lang").as("epochs_micro"))
  }

  /** Exact integer square root as a column: floor(sqrt(x)) for x >= 0.
    * One double sqrt then a ±1 integer fixup — the IEEE estimate is within
    * one of the true root for x < 2^62, and the fixup compares exact
    * integer squares, so the result is exact on every engine regardless of
    * the libm's last ulp (the discipline that keeps allocation oracles
    * bit-replayable).
    */
  private[graft] def isqrt(x: Column): Column = {
    val s0 = floor(sqrt(x.cast("double"))).cast("long")
    val s1 = when(s0 * s0 > x, s0 - 1).otherwise(s0)
    when(x > 0, when((s1 + 1) * (s1 + 1) <= x, s1 + 1).otherwise(s1))
      .otherwise(0L)
  }

  /** Temperature-balanced language allocations (the mC4/mT5 sampling rule,
    * Xue et al. 2021: sample language l with probability ∝ |l|^α) at the
    * common α = 1/2 — the OTHER standard answer to multilingual imbalance
    * next to [[unimaxAllocations]]'s epoch cap: big languages are
    * down-weighted smoothly (∝ √size) instead of capped.
    *
    * α = 1/2 is implemented EXACTLY: weights are integer square roots
    * ([[isqrt]]) and each language's share of the token budget is
    * largest-remainder (Hamilton) apportionment of `budget · w / Σw` —
    * base share by 128-bit integer division, the `budget − Σ base`
    * leftover units going +1 each to the largest remainders (ties: lang
    * asc). Allocations are non-negative longs summing to EXACTLY the
    * budget (spec-pinned) — EXCEPT the one degenerate corpus where every
    * language has zero tokens (Σ weights = 0): there is nothing to
    * allocate a token of, so every allocation is 0 and the budget is
    * deliberately left unspent rather than apportioned over empty
    * languages (spec-pinned too) — and every step replays bit-for-bit in
    * ANSI SQL
    * — no libm pow(), whose last ulp differs across engines. (Other
    * temperatures are this same construction with an exact k-th root;
    * α = 1 is plain proportional apportionment.)
    *
    * Scale posture: identical to [[unimaxAllocations]] — one map-side-
    * combinable corpus aggregation to the language-cardinality frame
    * (thousands of rows at most), where single-partition windows are
    * driver-scale by construction.
    */
  def temperatureAllocations(docs: DataFrame, totalBudget: Long,
                             langCol: String = "lang"): DataFrame = {
    require(totalBudget >= 0, "budget must be non-negative")
    val dec = "decimal(38,0)"
    val nTok = size(TextPrep.words(col("text"))).cast("long")
    val wAll = Window.partitionBy(lit(0))
    val rankW = Window.orderBy(col("rem").desc, col("lang"))
    val weighted = docs.groupBy(col(langCol).as("lang"))
      .agg(sum(nTok).as("n_tok_lang"))
      .withColumn("weight", isqrt(col("n_tok_lang")))
      .withColumn("wsum", sum(col("weight")).over(wAll))
      // budget·w can exceed 2^63 (budget 1e13 × weight 1e7): the share
      // arithmetic runs in decimal(38,0); base and rem are longs again
      .withColumn("base",
        when(col("wsum") > 0,
          ((lit(totalBudget).cast(dec) * col("weight").cast(dec) -
            pmod(lit(totalBudget).cast(dec) * col("weight").cast(dec),
                 col("wsum").cast(dec))) / col("wsum").cast(dec))
            .cast("long")).otherwise(0L))
      .withColumn("rem",
        when(col("wsum") > 0,
          pmod(lit(totalBudget).cast(dec) * col("weight").cast(dec),
               col("wsum").cast(dec)).cast("long")).otherwise(0L))
    weighted
      .withColumn("extras", lit(totalBudget) - sum(col("base")).over(wAll))
      .withColumn("rk", row_number().over(rankW))
      .withColumn("alloc",
        col("base") + when(col("rk") <= col("extras") && col("wsum") > 0, 1L)
          .otherwise(0L))
      .select(col("lang"), col("n_tok_lang"), col("weight"), col("alloc"),
        when(col("n_tok_lang") > 0,
             expr("(alloc * 1000000L) div n_tok_lang")).as("epochs_micro"))
  }

  /** UniMax sampling: admit each language's documents in salted-hash order
    * until the language's waterfilled allocation is reached (same prefix-
    * truncation cutoff as [[tokenBudgetSample]] — a doc that would overshoot
    * is dropped, as is everything after it in hash order). A language whose
    * allocation equals its full `maxEpochs` capacity keeps every document
    * (the `epochs_micro` column — floor(alloc * 1e6 / n_tok_lang), an exact
    * long so the whole output replays bit-for-bit across SQL engines — says
    * how many millionths of a pass training should make).
    *
    * One corpus shuffle on the language key; the allocation frame joins as
    * a broadcast (language-cardinality).
    */
  def unimaxSample(docs: DataFrame, totalBudget: Long, maxEpochs: Int,
                   langCol: String = "lang",
                   keyCol: String = "doc_id"): DataFrame = {
    val alloc = unimaxAllocations(docs, totalBudget, maxEpochs, langCol)
    val nTok = size(TextPrep.words(col("text"))).cast("long")
    val w = Window.partitionBy(col(langCol))
      .orderBy(TextPrep.hash64(concat(col(keyCol).cast("string"),
                                      lit(":unimax"))), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("n_tok", nTok)
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .join(broadcast(alloc.select(col("lang").as(langCol), col("alloc"),
                                   col("epochs_micro"))),
            langCol)
      .filter(col("cum_tok") <= col("alloc"))
      .select(col(keyCol), col(langCol), col("n_tok"), col("cum_tok"),
              col("alloc"), col("epochs_micro"))
  }
}
