package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import TextPrep._

/** Deduplication operators for large-scale training-data curation.
  *
  * The reference engine's only dedup primitive is DISTINCT over solutions
  * (/root/reference/bigdata/src/java/com/bigdata/bop/solutions/
  * JVMDistinctBindingSetsOp.java:61, NativeDistinctFilter.java:79); document
  * near-dedup is new surface required for the training-data pipeline.
  *
  * Scale posture (100 TB): every operator is a pure DataFrame plan —
  *  - exact dedup: one hash-partitioned aggregation on the content key;
  *  - MinHash/LSH: explode-to-shingles → per-doc signature (map-side partial
  *    min) → band-key self-join. The self-join key is the band signature, so
  *    skew only appears if one band bucket is huge (near-identical corpus);
  *    AQE skew-join handles residual skew;
  *  - pairwise verification joins only run on LSH/block candidates, never on
  *    the full cross product.
  */
object Dedup {

  /** Exact-duplicate groups by a content key expression (default: md5 of the
    * full text). Returns one row per duplicate group: canonical (minimum)
    * doc_id, group size, and the key.
    */
  def exactGroups(docs: DataFrame, key: Column): DataFrame =
    docs
      .groupBy(key.as("content_key"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > 1)

  /** Word n-gram Jaccard near-duplicate pairs within a blocking key (e.g.
    * language): explode distinct shingles, join on shingle within block,
    * count shared, compare |A∩B| / (|A|+|B|−|A∩B|) ≥ threshold.
    * Exact (no approximation); cost bounded by pairs sharing ≥1 shingle.
    */
  /** The (doc_id, block, shingle) relation — the raw material of every
    * shingle-based dedup pass. Two-step select: tokenization lands in a
    * real column first, so the shingle lambda's element_at references
    * don't each re-inline (and re-evaluate) the split — that inlining is
    * quadratic in document size.
    */
  def shingleRelation(docs: DataFrame, n: Int,
                      blockCol: String = "lang"): DataFrame =
    docs.repartition(col("doc_id"))
      .select(col("doc_id"), col(blockCol).as("block"), words(col("text")).as("ws"))
      .select(col("doc_id"), col("block"), explode(shingles(col("ws"), n)).as("shingle"))

  def ngramJaccardPairs(docs: DataFrame, n: Int, threshold: Double,
                        blockCol: String = "lang",
                        prebuilt: Option[DataFrame] = None): DataFrame = {
    // materialize: the shingle relation feeds three plan branches (two join
    // sides + sizes); without this Spark recomputes the explode 3x
    val sh = prebuilt.getOrElse(
      graft.util.Fixpoint.materialize(shingleRelation(docs, n, blockCol)))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val shWithSize = sh.join(sizes, "doc_id")
    // J >= t implies the smaller set has at least t x the larger's size:
    // prune cross-size pairs before the expensive shared-count aggregation
    val shared = shWithSize.as("a")
      .join(shWithSize.as("b"),
            col("a.shingle") === col("b.shingle") &&
            col("a.block") === col("b.block") &&
            col("a.doc_id") < col("b.doc_id") &&
            col("a.n_sh") * threshold <= col("b.n_sh") &&
            col("b.n_sh") * threshold <= col("a.n_sh"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
               col("a.n_sh").as("n_a"), col("b.n_sh").as("n_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .withColumn("jaccard",
        round(col("n_shared").cast(DoubleType) /
              (col("n_a") + col("n_b") - col("n_shared")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Wide MinHash signatures: one row per doc with columns m0..m{k-1},
    * m_i = min over shingles s of hash64(i || '|' || s).
    *
    * Computed as k parallel min-aggregates over the shingle relation — no
    * k-way explode, so the shuffle carries one row per (doc, shingle) and
    * the mins combine map-side.
    */
  def minhashSignaturesWide(docs: DataFrame, n: Int, numHashes: Int): DataFrame = {
    // repartition before the k md5s/row: the source table is often a single
    // small parquet file (one input partition), which would serialize the
    // hashing on one core
    val sh = docs.repartition(col("doc_id"))
      .select(col("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"), explode(shingles(col("ws"), n)).as("shingle"))
    val minCols = (0 until numHashes).map(i =>
      min(hash64(concat(lit(i), lit("|"), col("shingle")))).as(s"m$i"))
    sh.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
  }

  /** MinHash signature as a per-row ARRAY column — zero shuffle: m_i =
    * array_min over the doc's own shingles. The groupBy variant above wins
    * when the shingle relation is already exploded (map-side combine);
    * this one wins when each row carries its document whole — notably on
    * STREAMING frames, where it needs no aggregation state at all.
    */
  def minhashSignatureArray(text: Column, n: Int, numHashes: Int): Column = {
    val sh = shingles(words(text), n)
    val mins = (0 until numHashes).map { i =>
      array_min(transform(sh, s => hash64(concat(lit(i), lit("|"), s))))
    }
    array(mins: _*)
  }

  /** MinHash signatures in long form: (doc_id, i, minhash). */
  def minhashSignatures(docs: DataFrame, n: Int, numHashes: Int): DataFrame = {
    val wide = minhashSignaturesWide(docs, n, numHashes)
    val pairs = (0 until numHashes).map(i =>
      struct(lit(i).as("i"), col(s"m$i").as("minhash")))
    wide.select(col("doc_id"), explode(array(pairs: _*)).as("im"))
      .select(col("doc_id"), col("im.i").as("i"), col("im.minhash").as("minhash"))
  }

  /** LSH candidate pairs: split the signature into `bands` bands of
    * numHashes/bands rows each; docs sharing any full band signature are
    * candidates. Output: distinct (id_a, id_b) with id_a < id_b.
    */
  def minhashLshCandidates(docs: DataFrame, n: Int, numHashes: Int,
                           bands: Int): DataFrame =
    minhashLshCandidatesFromSigs(minhashSignaturesWide(docs, n, numHashes),
                                 numHashes, bands)

  /** LSH candidates from a prebuilt wide signature table — the sketch is an
    * index (computed once as documents arrive, like the full-text index),
    * so the banding join is all a dedup pass pays.
    */
  def minhashLshCandidatesFromSigs(sigs: DataFrame, numHashes: Int,
                                   bands: Int): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes, "bands must divide numHashes")
    // band keys slice directly out of the wide signature row (in-band order
    // is positional — no sort needed); materialized because the relation is
    // both sides of the candidate self-join
    val wide = sigs
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
             array((0 until rowsPerBand).map(j => col(s"m${b * rowsPerBand + j}")): _*)
               .as("band_key"))
    }
    val bandSig = graft.util.Fixpoint.materialize(
      wide.select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"), col("bk.band_key").as("band_key")))
    bandSig.as("a")
      .join(bandSig.as("b"),
            col("a.band") === col("b.band") &&
            col("a.band_key") === col("b.band_key") &&
            col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  /** SimHash (32-bit): per document, bit b is set iff the occurrence-weighted
    * vote sum over tokens w of (2·bit_b(hash64(w)) − 1) is positive.
    */
  def simhash(docs: DataFrame, bits: Int = 32): DataFrame =
    docs
      .repartition(col("doc_id"))
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
      .withColumn("h", hash64(col("w")))
      .select(col("doc_id"), col("h"),
              explode(sequence(lit(0), lit(bits - 1))).as("b"))
      // shiftright/shiftleft with a *column* shift amount need the SQL form
      .withColumn("vote", expr("shiftright(h, b)") % 2 * 2 - 1)
      .groupBy("doc_id", "b")
      .agg(sum(col("vote")).as("v"))
      .groupBy("doc_id")
      .agg(sum(when(col("v") > 0, expr("shiftleft(CAST(1 AS BIGINT), b)"))
                 .otherwise(0L)).as("simhash"))

  /** SimHash near-duplicate pairs within a blocking key: Hamming distance of
    * the signatures ≤ maxHamming.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int,
                   blockCol: String = "lang", bits: Int = 32): DataFrame =
    simhashPairsFromSigs(
      simhash(docs, bits)
        .join(docs.select(col("doc_id"), col(blockCol).as("block")), "doc_id"),
      maxHamming, bits)

  /** Hamming-≤k pairs from a prebuilt (doc_id, simhash, block) sketch.
    *
    * Pigeonhole blocking: the signature is split into `maxHamming + 1`
    * contiguous bit chunks; any pair within Hamming distance ≤ maxHamming
    * differs in at most maxHamming chunks, so it agrees EXACTLY on at least
    * one — candidates come from an equi-join on (block, chunk_id,
    * chunk_value) and only those pairs pay the Hamming verification. This
    * replaces the all-pairs-within-block cross product (O(n²) per language
    * block — fatal when one block is most of a 100 TB corpus) with a hash
    * join whose cost tracks the number of genuinely close pairs.
    */
  def simhashPairsFromSigs(sketch: DataFrame, maxHamming: Int,
                           bits: Int = 32): DataFrame = {
    // degenerate layouts silently void the pigeonhole guarantee: more
    // chunks than bits gives zero-width chunks whose mask is 0 (cv = 0 for
    // every doc — the all-pairs cross product again), and a 64-bit single
    // chunk overflows (1L << 64). Results would still verify correct, but
    // the scale contract is the point — fail fast instead.
    require(maxHamming >= 0 && maxHamming + 1 <= bits && bits < 64,
      s"pigeonhole blocking needs 0 <= maxHamming < bits < 64, " +
        s"got maxHamming=$maxHamming bits=$bits")
    val nChunks = maxHamming + 1
    val bounds = (0 to nChunks).map(c => c * bits / nChunks)
    val chunkStructs = (0 until nChunks).map { c =>
      val lo = bounds(c)
      val width = bounds(c + 1) - lo
      struct(lit(c).as("ci"),
             (shiftright(col("simhash"), lo)
               .bitwiseAND(lit((1L << width) - 1))).as("cv"))
    }
    val chunked = graft.util.Fixpoint.materialize(
      sketch.select(col("doc_id"), col("simhash"), col("block"),
                    explode(array(chunkStructs: _*)).as("ch"))
        .select(col("doc_id"), col("simhash"), col("block"),
                col("ch.ci").as("ci"), col("ch.cv").as("cv")))
    chunked.as("a")
      .join(chunked.as("b"),
            col("a.block") === col("b.block") &&
            col("a.ci") === col("b.ci") && col("a.cv") === col("b.cv") &&
            col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming",
        bit_count(col("a.simhash") bitwiseXOR col("b.simhash")).cast(LongType))
      .filter(col("hamming") <= maxHamming)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"), col("hamming"))
      .distinct()
  }

  /** Exact Jaccard for a given candidate-pair set only: shingles are
    * computed just for documents appearing in a pair (semi-join pruned),
    * so verification cost scales with |candidates|, not |corpus|².
    */
  def verifyPairsJaccard(docs: DataFrame, pairs: DataFrame, n: Int,
                         threshold: Double,
                         prebuilt: Option[DataFrame] = None): DataFrame = {
    val members = pairs.select(col("id_a").as("doc_id"))
      .unionByName(pairs.select(col("id_b").as("doc_id"))).distinct()
    val sh = prebuilt match {
      // prebuilt shingle index: semi-join down to candidate members only
      case Some(rel) => rel.select("doc_id", "shingle")
        .join(members, Seq("doc_id"), "left_semi")
      case None => graft.util.Fixpoint.materialize(
        docs.join(members, "doc_id")
          .repartition(col("doc_id"))
          .select(col("doc_id"), words(col("text")).as("ws"))
          .select(col("doc_id"), explode(shingles(col("ws"), n)).as("shingle")))
    }
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val shared = pairs
      .join(sh.select(col("doc_id").as("id_a"), col("shingle").as("sh_a")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("shingle").as("sh_b")), "id_b")
      .filter(col("sh_a") === col("sh_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
    pairs
      .join(shared, Seq("id_a", "id_b"), "left_outer")
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
      .withColumn("jaccard",
        round(coalesce(col("n_shared"), lit(0L)).cast(DoubleType) /
              (col("n_a") + col("n_b") - coalesce(col("n_shared"), lit(0L))), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** The full dedup pipeline: MinHash/LSH candidates → exact-Jaccard
    * verification → connected-component clustering. Returns (doc_id,
    * keep_id) for every document in a duplicate cluster; keep_id is the
    * cluster's minimum doc_id (the canonical survivor).
    */
  def dedupClusters(docs: DataFrame, n: Int = 3, numHashes: Int = 16,
                    bands: Int = 4, threshold: Double = 0.5,
                    sigs: Option[DataFrame] = None,
                    shingleRel: Option[DataFrame] = None): DataFrame = {
    val cand = sigs match {
      case Some(w) => minhashLshCandidatesFromSigs(w, numHashes, bands)
      case None => minhashLshCandidates(docs, n, numHashes, bands)
    }
    val verified = verifyPairsJaccard(docs, cand, n, threshold, shingleRel)
      .select("id_a", "id_b")
    val edges = verified.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(verified.select(col("id_b").as("src"), col("id_a").as("dst")))
    graft.gas.Graphs.connectedComponents(edges)
      .select(col("node").as("doc_id"), col("component").as("keep_id"))
  }

  /** Embedding near-duplicate pairs: cosine similarity ≥ threshold within
    * a blocking key — exact within each block, never an all-pairs product.
    *
    * With no `blockCol`, the block is derived internally from
    * random-hyperplane LSH buckets (`Similarity.lshBuckets`) — the default
    * IS the scale path: candidate pairs come from an equi-join on the
    * bucket id, so the work is Σ_b |bucket_b|², not |corpus|². A caller-
    * supplied column (a label, a shard, an IVF list) blocks on that
    * instead; `planes` trades recall for block size (more planes → smaller
    * buckets, near-dup pairs must agree on every plane's sign).
    */
  def embeddingNearDupPairs(emb: DataFrame, threshold: Double,
                            blockCol: Option[String] = None,
                            planes: Int = 16): DataFrame = {
    val e = blockCol match {
      case Some(c) =>
        emb.select(col("vec_id"), col(c).as("block"),
                   col("embedding").cast(ArrayType(DoubleType)).as("v"))
      case None =>
        emb.select(col("vec_id"),
                   col("embedding").cast(ArrayType(DoubleType)).as("v"))
          .join(Similarity.lshBuckets(emb, planes)
                  .withColumnRenamed("bucket", "block"), "vec_id")
    }
    e.as("a")
      .join(e.as("b"),
            col("a.block") === col("b.block") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", Similarity.cosine(col("a.v"), col("b.v")))
      .filter(col("cos") >= threshold)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"), col("cos"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space, then within each
    * cluster treat any pair with cosine ≥ `threshold` as semantic
    * duplicates and keep the member with the LOWER similarity to the
    * cluster centroid — the paper's diversity-preserving rule (the kept
    * exemplar is the least prototypical of the pair, so the surviving set
    * spreads over the cluster instead of collapsing onto its center).
    *
    * Clusters come from the deterministic seed centroids
    * ([[Similarity.ivfCentroids]]: the `k` lowest vec_ids) so every value
    * is bit-checkable by the DuckDB oracle; swap in
    * [[Similarity.kmeansCentroids]] for refined clusters when oracle
    * parity is not required — the dedup logic is centroid-source-agnostic.
    *
    * Drop rule, made total: x is dropped iff some same-cluster y has
    * pairCos(x,y) ≥ threshold and (centSim_y, vec_id_y) < (centSim_x,
    * vec_id_x) lexicographically — i.e. every duplicate pair keeps its
    * minimum under that order, and the comparison is deterministic even
    * when two members tie on rounded centroid similarity.
    *
    * Scale posture: centroids broadcast (k rows); assignment is one
    * map-side crossJoin + one hash aggregation; candidate pairs come from
    * an equi-join on the cluster id, so the work is Σ_c |cluster_c|² —
    * never all-pairs, and k grows with the corpus to bound cluster size
    * (the paper runs k=50k on LAION). One corpus shuffle on cid, one
    * hash-aggregated loser set joined back as a broadcast-able anti set.
    */
  def semanticDedup(emb: DataFrame, k: Int, threshold: Double): DataFrame = {
    val cent = Similarity.ivfCentroids(emb, k)
    // materialized ONCE: the frame is referenced three times below (both
    // sides of the pair join and the final classification), and Spark
    // re-evaluates an unshared subtree per reference — without this, the
    // corpus would be scanned and centroid-scored 4x
    val assigned = graft.util.Fixpoint.materialize(emb
      .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("v"))
      .join(Similarity.ivfAssign(emb, cent), "vec_id")
      .join(cent.select(col("cid"), col("cv").cast(ArrayType(DoubleType)).as("cv")), "cid")
      .withColumn("cent_sim", Similarity.cosine(col("v"), col("cv")))
      .select("vec_id", "cid", "v", "cent_sim"))
    val losers = assigned.as("a")
      .join(assigned.as("b"),
            col("a.cid") === col("b.cid") && col("a.vec_id") =!= col("b.vec_id") &&
            (col("b.cent_sim") < col("a.cent_sim") ||
             (col("b.cent_sim") === col("a.cent_sim") &&
              col("b.vec_id") < col("a.vec_id"))))
      .filter(Similarity.cosine(col("a.v"), col("b.v")) >= threshold)
      .select(col("a.vec_id")).distinct()
      .withColumn("__dropped", lit(1))
    assigned.join(losers, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cid"), col("cent_sim"),
              when(col("__dropped").isNotNull, lit(0L)).otherwise(lit(1L)).as("kept"))
  }

  /** Cross-document duplicated-span statistics — the exact-substring dedup
    * signal (Lee et al. 2021, "Deduplicating Training Data Makes Language
    * Models Better") at word-n-gram granularity: for each document, how many
    * of its n-gram start positions begin a span that also occurs in ANOTHER
    * document. Corpora curated with ExactSubstr drop or trim documents whose
    * duplicated-span fraction is high; this operator computes that fraction.
    *
    * Scale posture (100 TB): the span relation is never materialized as
    * strings across the shuffle — spans travel as the shared 60-bit md5 hash
    * (deterministic, oracle-reproducible). Three hash aggregations and one
    * equi-join on the hash, all map-side combinable:
    *   (doc, gram_h) multiplicity → gram_h distinct-doc count (the "appears
    *   elsewhere" set) → per-doc duplicated-start sum joined back left_outer
    * (docs with no duplicated span keep 0, not a dropped row). Nothing here
    * is all-pairs, and the gram key is Zipf-skewed only for stock phrases —
    * absorbed by the partial aggregation before the shuffle.
    */
  /** ExactSubstr-style duplicated-span TRIM (Lee et al. 2021 §4.1,
    * "Deduplicating Training Data Makes Language Models Better"): remove
    * from every document the words covered by a duplicated span of >= n
    * words, keeping the corpus-first occurrence of each span. The paper
    * builds a corpus suffix array; the distributed reduction is fixed-n
    * anchor grams — every position inside a duplicated span of length >= n
    * is covered by some duplicated n-gram start, and only such positions
    * are, so marking duplicated n-gram starts and sweeping a width-n
    * coverage window removes EXACTLY the >= n-word duplicated spans
    * (n = the paper's minimum match length).
    *
    * "First occurrence" = the (doc_id, pos)-minimum occurrence of the gram:
    * its words stay; later occurrences (in other docs OR the same doc) are
    * trimmed — the paper's keep-one-copy semantics.
    *
    * Scale posture (100 TB): words explode once and travel as narrow rows;
    * grams are lead()-window hashes (one doc-keyed shuffle), the
    * first-occurrence frame is one map-side-combinable min_by aggregation
    * on the gram hash, the mark-back is a gram-hash equi-join (never
    * all-pairs), and coverage + reassembly ride the SAME doc-keyed
    * partitioning (one more shuffle). Zipf-skewed stock phrases are
    * absorbed by the partial agg; AQE handles residual join skew.
    */
  def exactSubstrTrim(docs: DataFrame, n: Int): DataFrame = {
    val byPos = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val gramWords = col("word") +: (1 until n).map(j => lead(col("word"), j).over(byPos))
    // NOTE: this frame is consumed by BOTH the first-occurrence aggregation
    // and the mark-back join, and Spark recomputes the scan+explode+window
    // pipeline per side. Measured trade: checkpointing it instead is ~2x
    // SLOWER at sf0.1-sf1 (the write of the wide word relation costs more
    // than the recompute) — at true corpus scale, materialize just the
    // narrow (doc_id, pos, gh) gram relation for the aggregation side if
    // the double tokenize ever dominates a profile
    val wordRows = docs
      .select(col("doc_id"), words(lower(col("text"))).as("ws"))
      .select(col("doc_id"), size(col("ws")).as("nw"),
              posexplode(col("ws")).as(Seq("pos", "word")))
      .withColumn("gh",
        when(col("pos") <= col("nw") - n,
             hash64(concat_ws(" ", gramWords: _*))))
    // corpus-first occurrence of each gram (and its multiplicity)
    val first = wordRows.filter(col("gh").isNotNull)
      .groupBy("gh")
      .agg(min_by(struct(col("doc_id"), col("pos")), struct(col("doc_id"), col("pos"))).as("keep"),
           count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2) // unique grams can't be duplicated starts
      .select(col("gh"), col("keep.doc_id").as("kdoc"), col("keep.pos").as("kpos"))
    val flagged = wordRows
      .join(first, Seq("gh"), "left_outer")
      .withColumn("dup",
        when(col("kdoc").isNotNull &&
             !(col("kdoc") === col("doc_id") && col("kpos") === col("pos")), 1)
          .otherwise(0))
    // a word is covered iff any duplicated span STARTS within the previous
    // n-1 positions (inclusive of its own)
    val cover = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos").rowsBetween(-(n - 1), 0)
    flagged
      .withColumn("covered", max(col("dup")).over(cover))
      .groupBy("doc_id")
      .agg(
        concat_ws(" ",
          transform(
            sort_array(collect_list(
              when(col("covered") === 0, struct(col("pos"), col("word"))))),
            e => e.getField("word"))).as("text_trimmed"),
        count(lit(1)).cast(LongType).as("n_words"),
        sum(col("covered")).cast(LongType).as("n_dropped"))
  }

  def dupSpanStats(docs: DataFrame, n: Int): DataFrame = {
    val grams = docs
      .select(col("doc_id"), words(lower(col("text"))).as("ws"))
      .select(col("doc_id"), explode(ngrams(col("ws"), n)).as("gram"))
      .select(col("doc_id"), hash64(col("gram")).as("gram_h"))
    val perDoc = grams.groupBy("doc_id", "gram_h").agg(count(lit(1)).as("c"))
    val shared = perDoc.groupBy("gram_h").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2).select("gram_h")
    val dupPerDoc = perDoc.join(shared, "gram_h")
      .groupBy("doc_id").agg(sum(col("c")).as("dup_spans"))
    docs.select(col("doc_id"),
                greatest(size(words(lower(col("text")))) - (n - 1), lit(0))
                  .cast(LongType).as("n_spans"))
      .join(dupPerDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_spans"),
              coalesce(col("dup_spans"), lit(0L)).as("dup_spans"),
              when(col("n_spans") > 0,
                   round(coalesce(col("dup_spans"), lit(0L)).cast(DoubleType) /
                         col("n_spans"), 6)).as("dup_frac"))
  }

  /** Candidate-recall evaluation of an LSH banding against the exact
    * near-dup pair set — the knob-tuning dial for (numHashes, bands):
    * recall = |candidates ∩ exact| / |exact| (pairs LSH must not miss),
    * with the candidate count alongside (the verification cost the
    * banding buys that recall with). The dedup analogue of the ANN
    * recall@k evaluations. Both inputs carry (id_a, id_b) with
    * id_a < id_b; runs on the pair frames, never the corpus.
    */
  def lshRecall(exact: DataFrame, candidates: DataFrame): DataFrame = {
    val hit = candidates.select(col("id_a"), col("id_b"), lit(1L).as("__hit"))
    exact.select("id_a", "id_b")
      .join(hit, Seq("id_a", "id_b"), "left_outer")
      .agg(count(lit(1)).as("n_exact"),
           sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
      .crossJoin(candidates.agg(count(lit(1)).as("n_candidates")))
      .select(col("n_exact"), col("n_candidates"), col("n_hit"),
              round(col("n_hit").cast(DoubleType) / col("n_exact"), 6)
                .as("recall"))
  }
}
