package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.pipeline.{Decontam, Dedup, LanguageModel, Multimodal, Packing, Redact, Retrieval, Sampling, Similarity, TextAnalysis, TextPrep, TrainingPrep}

/** Training-data-pipeline operator suite over `documents` and `embeddings`,
  * each with a DuckDB oracle (see the md5-hash parity note in
  * graft.pipeline.TextPrep).
  *
  * The shared DuckDB CTE prelude `WS` mirrors graft.pipeline.TextPrep.words/
  * shingles exactly: whitespace split, empty tokens dropped, distinct word
  * 3-grams.
  */
object Pipeline {

  private def docs(s: SparkSession, d: String) = Tables.load(s, d, "documents")
  private def emb(s: SparkSession, d: String) = Tables.load(s, d, "embeddings")

  /** Near-dup sketch indexes: computed once per corpus as documents arrive
    * (the dedup analogue of the full-text inverted index), then every dedup
    * pass joins the sketch instead of re-hashing the corpus.
    */
  def minhashSketch(s: SparkSession, d: String): org.apache.spark.sql.DataFrame =
    Catalog.table(s, d, "minhash_sketch_3_16")(
      Dedup.minhashSignaturesWide(docs(s, d), n = 3, numHashes = 16))

  def simhashSketch(s: SparkSession, d: String): org.apache.spark.sql.DataFrame =
    Catalog.table(s, d, "simhash_sketch_32")(
      Dedup.simhash(docs(s, d), bits = 32)
        .join(docs(s, d).select(col("doc_id"), col("lang").as("block")), "doc_id"))

  /** The 3-gram shingle relation as a load-time artifact. */
  def shingleIndex(s: SparkSession, d: String): org.apache.spark.sql.DataFrame =
    Catalog.table(s, d, "shingles_3")(Dedup.shingleRelation(docs(s, d), n = 3))

  /** The ANN index artifacts — a deployed vector store builds these at
    * ingest (they ARE the IVF-PQ index): the coarse quantizer's centroids,
    * the corpus→list assignment, the PQ codebooks, and the corpus compressed
    * to codes (vec_id, codes, cid). Queries read LUTs and probed lists.
    */
  def ivfCentroids8(s: SparkSession, d: String): org.apache.spark.sql.DataFrame =
    Catalog.table(s, d, "ivf_centroids_8")(Similarity.ivfCentroids(emb(s, d), nlist = 8))

  def ivfAssign8(s: SparkSession, d: String): org.apache.spark.sql.DataFrame =
    Catalog.table(s, d, "ivf_assign_8")(
      Similarity.ivfAssign(emb(s, d), ivfCentroids8(s, d)))

  def pqCodebooks16(s: SparkSession, d: String): org.apache.spark.sql.DataFrame =
    Catalog.table(s, d, "pq_codebooks_8x16")(
      Similarity.pqCodebooks(emb(s, d), m = 8, k = 16))

  /** The trained unigram-LM model as a load-time artifact. */
  def unigramModel(s: SparkSession, d: String): org.apache.spark.sql.DataFrame =
    Catalog.table(s, d, "unigram_model_4_48_2_32")(
      graft.pipeline.Unigram.train(s, docs(s, d), maxLen = 4,
        seedMulti = 48, emIters = 2, keepMulti = 32))

  def pqCodes16(s: SparkSession, d: String): org.apache.spark.sql.DataFrame =
    Catalog.table(s, d, "pq_codes_8x16")(
      Similarity.pqEncode(emb(s, d), m = 8, k = 16, Some(pqCodebooks16(s, d)))
        .join(ivfAssign8(s, d), "vec_id"))

  /** The trained BPE merge table as a load-time artifact — a tokenizer is
    * trained ONCE per corpus (it IS the deployable artifact), then every
    * query that tokenizes reads the table; re-training per query would
    * charge each query the full merge loop.
    */
  def bpeMerges(s: SparkSession, d: String): org.apache.spark.sql.DataFrame =
    Catalog.table(s, d, "bpe_merges_8")(
      graft.pipeline.Bpe.train(s, docs(s, d), merges = 8))

  /** The trained WordPiece merge table, the same load-time-artifact shape. */
  def wordpieceMerges(s: SparkSession, d: String): org.apache.spark.sql.DataFrame =
    Catalog.table(s, d, "wordpiece_merges_8")(
      graft.pipeline.WordPiece.train(s, docs(s, d), merges = 8))

  /** DuckDB: tokens per document (multiplicity preserved). */
  private val wsSql =
    raw"""ws_t AS (SELECT doc_id, lang,
            list_filter(regexp_split_to_array(trim(text), '\s+'), w -> len(w) > 0) AS ws
          FROM documents)"""

  /** DuckDB: distinct word 3-gram shingles per document. */
  private val shSql =
    raw"""sh_t AS (SELECT DISTINCT doc_id, lang,
            unnest(list_transform(range(1, greatest(len(ws) - 1, 1)),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
          FROM ws_t)"""

  /** DuckDB: the shared 60-bit md5 hash (= TextPrep.hash64). */
  private def h64(x: String) = s"CAST('0x' || substr(md5($x), 1, 15) AS BIGINT)"

  /** DuckDB: embeddings as double vectors. */
  private val embSql =
    """e_t AS (SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)"""

  private def cosSql(a: String, b: String) =
    s"""ROUND(list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]))
       / (sqrt(list_sum(list_transform($a, x -> x*x)))
          * sqrt(list_sum(list_transform($b, x -> x*x)))), 6)"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- deduplication ----
    "dedup_exact" -> ((s, d) => {
      Dedup.exactGroups(docs(s, d), md5(substring(col("text"), 1, 50)))
        .orderBy("keep_id")
    }),

    "dedup_ngram_jaccard" -> ((s, d) => {
      Dedup.ngramJaccardPairs(docs(s, d), n = 3, threshold = 0.5,
                              prebuilt = Some(shingleIndex(s, d)))
        .orderBy("id_a", "id_b")
    }),

    "dedup_minhash_lsh" -> ((s, d) => {
      Dedup.minhashLshCandidatesFromSigs(minhashSketch(s, d), numHashes = 16,
                                         bands = 4)
        .orderBy("id_a", "id_b")
    }),

    "dedup_simhash" -> ((s, d) => {
      Dedup.simhashPairsFromSigs(simhashSketch(s, d), maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),

    "dedup_lsh_recall" -> ((s, d) => {
      // candidate recall of the (16 hashes, 4 bands) LSH banding vs the
      // exact Jaccard >= 0.5 pair set — the (numHashes, bands) tuning dial,
      // the dedup analogue of ann_recall_*
      Dedup.lshRecall(
        Dedup.ngramJaccardPairs(docs(s, d), n = 3, threshold = 0.5,
                                prebuilt = Some(shingleIndex(s, d))),
        Dedup.minhashLshCandidatesFromSigs(minhashSketch(s, d),
                                           numHashes = 16, bands = 4))
    }),

    "dedup_embedding_cosine" -> ((s, d) => {
      // label-blocked so the DuckDB oracle can replicate the blocking
      // exactly; the no-block default derives LSH buckets internally
      Dedup.embeddingNearDupPairs(emb(s, d), threshold = 0.35,
                                  blockCol = Some("label"))
        .orderBy("id_a", "id_b")
    }),

    "dedup_pipeline" -> ((s, d) => {
      // end-to-end: LSH candidates -> exact-Jaccard verify -> CC clusters,
      // candidates and verification both reading the load-time indexes
      Dedup.dedupClusters(docs(s, d), sigs = Some(minhashSketch(s, d)),
                          shingleRel = Some(shingleIndex(s, d)))
        .orderBy("doc_id")
    }),

    "dedup_cluster_stats" -> ((s, d) => {
      // duplicate-cluster size distribution — the number a curation run
      // reports ("how duplicated is this corpus?")
      Dedup.dedupClusters(docs(s, d), sigs = Some(minhashSketch(s, d)),
                          shingleRel = Some(shingleIndex(s, d)))
        .groupBy("keep_id").agg(count(lit(1)).as("cluster_size"))
        .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
        .orderBy("cluster_size")
    }),
    "dedup_semantic" -> ((s, d) =>
      // SemDeDup: cluster, then within-cluster near-dups keep the member
      // least similar to the centroid (diversity-preserving)
      Dedup.semanticDedup(emb(s, d), k = 8, threshold = 0.35)
        .orderBy("vec_id")),

    // ---- similarity search ----
    "ann_topk" -> ((s, d) => {
      val e = emb(s, d)
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 5), k = 10)
        .orderBy("q_id", "rank")
    }),

    "ann_hard_negatives" -> ((s, d) => {
      // contrastive-training negative mining: top-10 most-similar vectors
      // whose label DIFFERS from the anchor's (DPR-style hard negatives)
      val e = emb(s, d)
      Similarity.hardNegatives(e, e.filter(col("vec_id") < 5), k = 10)
        .orderBy("q_id", "rank")
    }),

    "ann_hard_negatives_ivf" -> ((s, d) => {
      // the scale path behind ann_hard_negatives: negatives mined from
      // the 2 probed IVF lists (shared load-time centroid/assignment
      // artifacts), never the full corpus scan
      val e = emb(s, d)
      Similarity.hardNegativesIvf(e, e.filter(col("vec_id") < 5), k = 10,
                                  nlist = 8, nProbe = 2,
                                  centroids = Some(ivfCentroids8(s, d)),
                                  assigned = Some(ivfAssign8(s, d)))
        .orderBy("q_id", "rank")
    }),

    "emb_centroid_drift" -> ((s, d) =>
      // per-label exact (quantized-long) centroids + pairwise cosine —
      // the embedding-space corpus-mix drift report
      Similarity.centroidDrift(emb(s, d)).orderBy("grp_a", "grp_b")),

    "ann_lsh_topk" -> ((s, d) => {
      val e = emb(s, d)
      Similarity.lshTopK(e, e.filter(col("vec_id") < 5), planes = 8, k = 10)
        .orderBy("q_id", "rank")
    }),

    "ann_lsh_multiprobe" -> ((s, d) => {
      val e = emb(s, d)
      Similarity.lshTopK(e, e.filter(col("vec_id") < 5), planes = 8, k = 10,
                         probes = 1)
        .orderBy("q_id", "rank")
    }),

    "ann_ivf_pq" -> ((s, d) => {
      // IVF-PQ with ADC: 8 subspaces x 16 codes, 2 probed lists of 8 —
      // the corpus is scanned as codes, queries read their LUTs
      val e = emb(s, d)
      Similarity.ivfPqTopK(e, e.filter(col("vec_id") < 5), nlist = 8,
                           nProbe = 2, m = 8, k = 16, topk = 10,
                           centroids = Some(ivfCentroids8(s, d)),
                           codebooks = Some(pqCodebooks16(s, d)),
                           encoded = Some(pqCodes16(s, d)))
        .orderBy("q_id", "rank")
    }),
    "ann_ivf" -> ((s, d) => {
      val e = emb(s, d)
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 5), nlist = 8,
                         nProbe = 2, k = 10,
                         centroids = Some(ivfCentroids8(s, d)),
                         assigned = Some(ivfAssign8(s, d)))
        .orderBy("q_id", "rank")
    }),

    "ann_recall_pq" -> ((s, d) => {
      // recall@10 of the PQ-compressed IVF index (ADC distances over 8-byte
      // codes) vs the exact ranking — the third dial: what the 64x storage
      // compression costs in recall
      val e = emb(s, d)
      val qs = e.filter(col("vec_id") < 5)
      Similarity.recallAtK(
          Similarity.ivfPqTopK(e, qs, nlist = 8, nProbe = 2, m = 8, k = 16,
                               topk = 10,
                               centroids = Some(ivfCentroids8(s, d)),
                               codebooks = Some(pqCodebooks16(s, d)),
                               encoded = Some(pqCodes16(s, d))),
          Similarity.bruteForceTopK(e, qs, k = 10))
        .orderBy("q_id")
    }),
    "ann_recall_rp" -> ((s, d) => {
      // recall@10 in the 16-dim JL sign projection vs the full 64-dim
      // ranking — the dimension-reduction dial next to PQ's quantization
      // dial: what 4x fewer distance flops cost in recall
      val e = emb(s, d)
      val p = Similarity.randomProjection(e, dOut = 16)
      Similarity.recallAtK(
          Similarity.bruteForceTopK(p, p.filter(col("vec_id") < 5), k = 10),
          Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 5), k = 10))
        .orderBy("q_id")
    }),

    "emb_int8_quant" -> ((s, d) => {
      // per-vector affine uint8 quantization — the STORAGE dial (4x fewer
      // embedding bytes) next to PQ's codebook dial and JL's dimension
      // dial; codes are exact integers, replayed by the oracle
      Similarity.int8QuantStats(emb(s, d)).orderBy("vec_id")
    }),

    "ann_recall_int8" -> ((s, d) => {
      // recall@10 of the int8-dequantized ranking vs the exact one — what
      // the 4x storage cut costs in retrieval quality
      val e = emb(s, d)
      val dq = Similarity.int8Dequantize(Similarity.int8Quantize(e))
      Similarity.recallAtK(
          Similarity.bruteForceTopK(dq, dq.filter(col("vec_id") < 5), k = 10),
          Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 5), k = 10))
        .orderBy("q_id")
    }),

    "ann_hamming_topk" -> ((s, d) => {
      // binary-embedding retrieval: top-10 by exact integer Hamming over
      // packed sign bits (the 32x storage dial; Charikar sign bound)
      val e = emb(s, d)
      Similarity.hammingTopK(e, e.filter(col("vec_id") < 5), k = 10)
        .orderBy("q_id", "rank")
    }),

    "ann_hamming_indexed" -> ((s, d) => {
      // multi-index Hamming (Norouzi MIH): candidates from exact band
      // matches over the 8-band signature table, verified by popcount —
      // the scale path behind ann_hamming_topk's brute scan
      val e = emb(s, d)
      Similarity.hammingTopKIndexed(e, e.filter(col("vec_id") < 5), k = 10,
                                    bands = 8)
        .orderBy("q_id", "rank")
    }),

    "ann_recall_hamming_indexed" -> ((s, d) => {
      // the multi-index pruning dial priced next to ann_recall_hamming:
      // recall@10 of band-filtered Hamming vs the exact cosine ranking
      val e = emb(s, d)
      Similarity.recallAtK(
          Similarity.hammingTopKIndexed(e, e.filter(col("vec_id") < 5),
                                        k = 10, bands = 8),
          Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 5), k = 10))
        .orderBy("q_id")
    }),

    "ann_recall_hamming" -> ((s, d) => {
      // what the 32x binary cut costs in retrieval quality: recall@10 of
      // the Hamming ranking vs the exact cosine ranking
      val e = emb(s, d)
      Similarity.recallAtK(
          Similarity.hammingTopK(e, e.filter(col("vec_id") < 5), k = 10),
          Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 5), k = 10))
        .orderBy("q_id")
    }),

    "ann_recall_matryoshka" -> ((s, d) => {
      // the MRL prefix dial: recall@10 of the 16-dim-prefix ranking vs
      // the full 64-dim exact ranking (cosine self-normalizes)
      val e = emb(s, d)
      val t = Similarity.matryoshkaTruncate(e, dOut = 16)
      Similarity.recallAtK(
          Similarity.bruteForceTopK(t, t.filter(col("vec_id") < 5), k = 10),
          Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 5), k = 10))
        .orderBy("q_id")
    }),

    "search_hybrid_rrf" -> ((s, d) => {
      // hybrid retrieval: BM25 (sparse, over documents) and brute cosine
      // (dense, over embeddings — same id space) fused by reciprocal rank;
      // contributions are scaled integers so the fusion replays exactly
      val (tf, stats, dl) = AnalyticsSuite.tfArtifacts(s, d)
      val sparse = graft.search.FullText
        .searchBm25(tf, Seq("spark", "join", "fast"), maxRank = 20,
                    stats = Some(stats), docLens = Some(dl))
        .select(col("doc").as("id"), col("rank"))
      val e = emb(s, d)
      val dense = Similarity
        .bruteForceTopK(e, e.filter(col("vec_id") === 0L), k = 20)
        .select(col("vec_id").as("id"), col("rank"))
      Retrieval.rrfFuse(Seq(sparse, dense), k = 60, topN = 15)
        .orderBy("rank")
    }),
    "search_mmr" -> ((s, d) => {
      // MMR re-ranking (λ=50%) of the dense top-12 for three queries:
      // relevance traded against redundancy with the already-picked set;
      // micro-unit integer scores make every greedy pick replayable
      val e = emb(s, d)
      val cands = Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 3),
                                            k = 12)
      Retrieval.mmrDiversify(e, cands, select = 6, lambdaPct = 50)
        .orderBy("q_id", "sel_rank")
    }),
    "ann_recall_lsh" -> ((s, d) => {
      // recall@10 of multiprobe LSH (8 planes, Hamming-1 probing) vs the
      // exact ranking — paired with ann_recall_ivf these are the two
      // knob-tuning dials (nProbe vs probe radius)
      val e = emb(s, d)
      val qs = e.filter(col("vec_id") < 5)
      Similarity.recallAtK(
          Similarity.lshTopK(e, qs, planes = 8, k = 10, probes = 1),
          Similarity.bruteForceTopK(e, qs, k = 10))
        .orderBy("q_id")
    }),
    "ann_recall_ivf" -> ((s, d) => {
      // index-quality evaluation: recall@10 of the IVF index (nProbe=2)
      // against the exact ranking, on the standard query sample
      val e = emb(s, d)
      val qs = e.filter(col("vec_id") < 5)
      Similarity.recallAtK(
          Similarity.ivfTopK(e, qs, nlist = 8, nProbe = 2, k = 10,
                             centroids = Some(ivfCentroids8(s, d)),
                             assigned = Some(ivfAssign8(s, d))),
          Similarity.bruteForceTopK(e, qs, k = 10))
        .orderBy("q_id")
    }),
    "ann_kmeans_train" -> ((s, d) =>
      // two Lloyd rounds, k=4: bit-reproducible training (quantized-long
      // centroid sums), exploded to (cid, dim, value) scalar rows
      Similarity.kmeansCentroids(emb(s, d), k = 4, iters = 2)
        .select(col("cid"),
                posexplode(col("cv")).as(Seq("d", "m")))
        .select(col("cid"), col("d").cast("long").as("d"), col("m"))
        .orderBy("cid", "d")),

    // ---- text analysis ----
    "text_token_stats" -> ((s, d) => TextAnalysis.tokenStats(docs(s, d)).orderBy("doc_id")),
    "text_langid" -> ((s, d) => TextAnalysis.langId(docs(s, d)).orderBy("doc_id")),
    "text_quality" -> ((s, d) => TextAnalysis.qualityScore(docs(s, d)).orderBy("doc_id")),
    "quality_gopher" -> ((s, d) =>
      // canonical Gopher rule battery; word-count floor tuned to this
      // corpus's 10-99-word documents so the flag actually splits it
      TextAnalysis.gopherQuality(docs(s, d), minWords = 30L).orderBy("doc_id")),
    "text_fingerprint" -> ((s, d) => TextAnalysis.fingerprint(docs(s, d)).orderBy("doc_id")),
    "text_repetition" -> ((s, d) => TextAnalysis.repetitionStats(docs(s, d)).orderBy("doc_id")),
    "text_perplexity" -> ((s, d) =>
      LanguageModel.crossEntropy(docs(s, d), docs(s, d)).orderBy("doc_id")),
    "sample_ppl_buckets" -> ((s, d) => {
      // CCNet head/middle/tail: per-language cross-entropy tertiles under
      // the every-10th-doc reference model (the held-out stand-in shared
      // with decontam/DSIR)
      val dd = docs(s, d)
      LanguageModel.pplBuckets(dd, dd.filter(col("doc_id") % 10 === 0))
        .orderBy("lang", "bucket")
    }),
    "pipeline_ccnet" -> ((s, d) => {
      // the full CCNet curation recipe (Wenzek et al. 2020) as ONE
      // Catalyst plan: language-ID every document, score it against the
      // reference bigram LM, tertile per DETECTED language, keep
      // head+middle — the per-language selection report a curation run
      // ships. Composes langId + crossEntropy + the distributed
      // pplBuckets; no stage materializes in between.
      val dd = docs(s, d)
      val lid = TextAnalysis.langId(dd).select("doc_id", "pred_lang")
      val cand = dd.join(lid, "doc_id")
      val ref = dd.filter(col("doc_id") % 10 === 0)
      LanguageModel.pplBuckets(cand, ref, buckets = 3, langCol = "pred_lang")
        .groupBy("pred_lang")
        .agg(sum(col("n_docs")).as("n_docs"),
             sum(when(col("bucket") <= 2, col("n_docs")).otherwise(0L))
               .as("n_kept"),
             max(when(col("bucket") <= 2, col("max_ce"))).as("keep_ce_max"),
             sum(when(col("bucket") <= 2, col("id_sum")).otherwise(0L))
               .as("id_sum_kept"))
        .orderBy("pred_lang")
    }),
    "text_subword_stats" -> ((s, d) =>
      TextAnalysis.subwordStats(docs(s, d)).orderBy("doc_id")),
    "text_tfidf" -> ((s, d) =>
      TextAnalysis.tfidfTopK(docs(s, d), topK = 3).orderBy("doc_id", "rank")),
    "text_winnow" -> ((s, d) =>
      TextAnalysis.winnowFingerprints(docs(s, d), k = 4, w = 4)
        .orderBy("doc_id", "fp")),
    "dedup_dupspan" -> ((s, d) =>
      Dedup.dupSpanStats(docs(s, d), n = 5).orderBy("doc_id")),
    "dedup_substr_trim" -> ((s, d) =>
      Dedup.exactSubstrTrim(docs(s, d), n = 5).orderBy("doc_id")),
    "quality_classifier_nb" -> ((s, d) => {
      // seed = even doc_ids labeled "is it src0?"; model + stats are
      // load-time artifacts (trained once per corpus), scoring reads them
      // as broadcasts
      val dd = docs(s, d)
      val labeled = dd.filter(col("doc_id") % 2 === 0)
        .withColumn("label", when(col("source") === "src0", 1).otherwise(0))
      val model = Catalog.table(s, d, "nb_model")(
        graft.pipeline.Classifier.trainNaiveBayes(labeled))
      val stats = Catalog.table(s, d, "nb_stats")(
        graft.pipeline.Classifier.nbStats(labeled, model))
      graft.pipeline.Classifier.scoreNaiveBayes(dd, model, stats)
        .orderBy("doc_id")
    }),
    "pipeline_curation" -> ((s, d) => TextAnalysis.curate(docs(s, d)).orderBy("lang")),

    // ---- multimodal ----
    "multimodal_meta" -> ((s, d) => Multimodal.blobMeta(docs(s, d)).orderBy("doc_id")),
    // exploded to scalar rows: (doc_id, n_bytes, quarter, feature) — array
    // columns would break the driver's sort-then-hash compare, and the
    // integer-exact stub makes every value DuckDB-checkable
    "multimodal_features" -> ((s, d) =>
      Multimodal.extractFeatures(s, docs(s, d))
        .select(col("doc_id"), col("n_bytes"),
                posexplode(col("features")).as(Seq("quarter", "feature")))
        .withColumn("quarter", col("quarter").cast("long"))
        .orderBy("doc_id", "quarter")),
    // real PNG path: synthesize → chunk-walk/inflate/defilter decode →
    // per-quarter mean luminance; width/height come from the parsed IHDR
    "multimodal_image_features" -> ((s, d) =>
      Multimodal.extractImageFeatures(s, docs(s, d))
        .select(col("doc_id"), col("width"), col("height"),
                posexplode(col("features")).as(Seq("quarter", "feature")))
        .withColumn("quarter", col("quarter").cast("long"))
        .orderBy("doc_id", "quarter")),
    // real AVI path: synthesize → RIFF demux (hdrl/strf negotiation, movi
    // walk) → bottom-up DIB decode → mean luminance of every 4th frame
    "multimodal_video_frames" -> ((s, d) =>
      Multimodal.sampleVideoFrames(s, docs(s, d), stride = 4)
        .orderBy("doc_id", "frame_idx")),

    // ---- benchmark decontamination / cross-corpus dedup ----
    // benchmark set = every 10th doc (the synthetic stand-in for a held-out
    // eval set); 5-grams are selective on this corpus where 3-grams are not
    "decontam_overlap" -> ((s, d) => {
      val dd = docs(s, d)
      Decontam.ngramOverlap(dd.filter(col("doc_id") % 10 =!= 0),
                            dd.filter(col("doc_id") % 10 === 0), n = 5)
        .orderBy("doc_id")
    }),
    "decontam_clean" -> ((s, d) => {
      val dd = docs(s, d)
      Decontam.decontaminate(dd.filter(col("doc_id") % 10 =!= 0),
                             dd.filter(col("doc_id") % 10 === 0), n = 5)
        .select("doc_id", "source").orderBy("doc_id")
    }),
    "dedup_cross_corpus" -> ((s, d) => {
      val dd = docs(s, d)
      Decontam.crossCorpusDedup(dd.filter(col("source") =!= "src0"),
                                dd.filter(col("source") === "src0"),
                                md5(substring(col("text"), 1, 30)))
        .select("doc_id", "source").orderBy("doc_id")
    }),
    "dedup_bloom" -> ((s, d) => {
      // fixed-memory face of dedup_cross_corpus: same content key, but the
      // reference corpus collapses to a 1024-bit Bloom filter (k=3); small m
      // chosen to exercise real collisions — the oracle replays the false
      // positives exactly
      val dd = docs(s, d)
      Decontam.bloomFlag(dd.filter(col("source") =!= "src0"),
                         dd.filter(col("source") === "src0"),
                         md5(substring(col("text"), 1, 30)),
                         mBits = 1024, k = 3)
        .select("doc_id", "source", "possibly_dup").orderBy("doc_id")
    }),

    // ---- PII redaction ----
    // the synthetic corpus carries no PII, so the query injects a
    // deterministic trailer (and the oracle injects the identical one) —
    // the operator itself is corpus-agnostic
    "text_pii_redact" -> ((s, d) => {
      val withPii = docs(s, d).withColumn("text", concat(col("text"),
        lit(" contact u"), col("doc_id").cast("string"),
        lit("@example.com ip 10.0.0."), (col("doc_id") % 256).cast("string"),
        lit(" ssn 123-45-678"), (col("doc_id") % 10).cast("string"),
        lit(" tel +15550000"), (col("doc_id") % 100).cast("string")))
      Redact.piiStats(withPii).orderBy("doc_id")
    }),

    // ---- corpus vocabulary / distribution stats ----
    "vocab_topk" -> ((s, d) =>
      TextAnalysis.vocabulary(docs(s, d), topK = 50).orderBy("rank")),
    "vocab_cms" -> ((s, d) =>
      // Count-Min estimates vs exact counts for the top-50 tokens; width=32
      // forces collisions on this corpus so overcount is a real signal
      TextAnalysis.cmsTopKEvaluate(docs(s, d), topK = 50,
                                   depth = 4, width = 32).orderBy("rank")),
    "corpus_distinct_hll" -> ((s, d) => {
      // HLL estimate vs exact distinct 5-gram shingle count per source —
      // 64 registers per group replacing a distinct-key shuffle. Project
      // `ws` BEFORE shingling (the shingleSet discipline): inlining
      // words(text) into the gram lambda re-splits the text per element_at,
      // O(len^2) per doc — measured 16s vs 1s at sf0.1
      val sh = docs(s, d)
        .select(col("source"), TextPrep.words(col("text")).as("ws"))
        .select(col("source"),
                explode(TextPrep.shingles(col("ws"), 5)).as("shingle"))
      TextAnalysis.hllCardinality(sh, col("shingle"), "source", m = 64)
        .orderBy("source")
    }),
    "corpus_length_stats" -> ((s, d) =>
      TextAnalysis.lengthStats(docs(s, d), by = "source").orderBy("source")),
    "corpus_divergence" -> ((s, d) =>
      // per-source domain shift: cross-entropy under the corpus unigram
      // distribution, own entropy, and KL — observed-support convention
      TextAnalysis.unigramDivergence(docs(s, d), by = "source")
        .orderBy("source")),
    "corpus_quantile_sketch" -> ((s, d) =>
      // the fourth sketch face (quantiles): 32-bin fixed-range histogram
      // of n_chars per source, P50/P90/P99 estimates next to the exact
      // rank-selected values with signed error — all-integer, replayable
      TextAnalysis.quantileSketch(docs(s, d), col("n_chars"), "source",
                                  bins = 32, lo = 0L, hi = 1023L,
                                  ps = Seq(50, 90, 99))
        .orderBy("source", "p")),

    // ---- end-to-end training prep: dedup → decontam → quality → budget ----
    "pipeline_training_prep" -> ((s, d) => {
      val dd = docs(s, d)
      TrainingPrep.prepare(dd, dd.filter(col("doc_id") % 10 === 0),
                           n = 5, minQuality = 0.5, budgetPerGroup = 1000L)
        .orderBy("source")
    }),

    // ---- dataset curation: deterministic sampling / mixtures / splits ----
    "sample_stratified" -> ((s, d) =>
      Sampling.stratifiedTopK(docs(s, d), "lang", k = 5)
        .select("doc_id", "lang").orderBy("lang", "doc_id")),
    "sample_weighted" -> ((s, d) =>
      Sampling.weightedSample(docs(s, d),
          Map("src0" -> 1.0, "src1" -> 0.5), defaultRate = 0.1)
        .select("doc_id", "source").orderBy("doc_id")),
    "split_train_val" -> ((s, d) =>
      Sampling.split(docs(s, d),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy("split").agg(count(lit(1)).as("n"),
          sum(col("doc_id")).as("id_sum"))
        .orderBy("split")),
    "pipeline_domain_mix" -> ((s, d) =>
      // mixture construction: 4:2:1:1 over four whitelisted sources
      // (weight sum a power of two, so each share is exact in binary and
      // the oracle's hardcoded budgets can't drift by one ulp of floor)
      Sampling.domainMixture(docs(s, d),
          Map("src0" -> 4.0, "src1" -> 2.0, "src2" -> 1.0, "src3" -> 1.0),
          totalTokens = 4000L)
        .groupBy("source").agg(count(lit(1)).as("n_docs"),
          sum(size(graft.pipeline.TextPrep.words(col("text"))).cast("long"))
            .as("n_tokens"))
        .orderBy("source")),
    "bpe_train_merges" -> ((s, d) => bpeMerges(s, d).orderBy("rank")),
    "wordpiece_train_merges" -> ((s, d) => wordpieceMerges(s, d).orderBy("rank")),
    "wordpiece_tokenize_stats" -> ((s, d) =>
      // the WordPiece train->infer round trip (same artifact shape as BPE's)
      graft.pipeline.WordPiece.tokenizeStats(docs(s, d), wordpieceMerges(s, d))
        .orderBy("doc_id")),
    "tokenizer_unigram_train" -> ((s, d) =>
      // the OTHER tokenizer family (Kudo 2018 / SentencePiece unigram):
      // seed substrings -> 2 exact Baum-Welch rounds -> prune+renorm;
      // the trained model is a load-time Catalog artifact (a tokenizer is
      // trained once per corpus), shared with the round-trip query below
      unigramModel(s, d).orderBy("piece")),
    "tokenizer_unigram_stats" -> ((s, d) =>
      graft.pipeline.Unigram.tokenizeStats(docs(s, d), unigramModel(s, d))
        .orderBy("doc_id")),
    "bpe_tokenize_stats" -> ((s, d) =>
      // the train->infer round trip: tokenize the corpus with the table
      // trained on it (the load-time artifact); pieces computed per
      // DISTINCT word then joined back
      graft.pipeline.Bpe.tokenizeStats(docs(s, d), bpeMerges(s, d))
        .orderBy("doc_id")),
    "split_group_disjoint" -> ((s, d) =>
      // leakage-safe eval split: the hash bucket is computed on the SOURCE
      // key, so no source's near-duplicate boilerplate can straddle
      // train/validation; realized doc counts follow group sizes
      Sampling.splitByGroup(docs(s, d),
          Seq("train" -> 0.6, "val" -> 0.2, "test" -> 0.2))
        .groupBy("split")
        .agg(countDistinct(col("source")).as("n_sources"),
             count(lit(1)).as("n_docs"),
             sum(col("doc_id")).as("id_sum"))
        .orderBy("split")),
    "sample_importance" -> ((s, d) => {
      // DSIR-shaped selection: target distribution = every 10th doc (the
      // synthetic held-out stand-in, as in decontam); 64 hash bins, top 100
      val dd = docs(s, d)
      Sampling.importanceResample(dd, dd.filter(col("doc_id") % 10 === 0),
                                  buckets = 64, n = 100)
    }),
    "sample_token_budget" -> ((s, d) =>
      Sampling.tokenBudgetSample(docs(s, d), budgetPerGroup = 500L)
        .groupBy("source").agg(count(lit(1)).as("n_docs"),
          sum(size(graft.pipeline.TextPrep.words(col("text"))).cast("long"))
            .as("n_tokens"))
        .orderBy("source")),
    "sample_unimax" -> ((s, d) =>
      // budget 40k tokens, epoch cap 2: at sf0.01 the four small languages
      // waterfill to their full 2-epoch capacity and en absorbs the rest
      // truncated — the UniMax shape (at sf0.1 all five truncate uniformly)
      Sampling.unimaxSample(docs(s, d), totalBudget = 40000L, maxEpochs = 2)
        .orderBy("doc_id")),
    "sample_unimax_alloc" -> ((s, d) =>
      // bisect companion for the sample_unimax driver-red (r9-r10): the
      // 5-row waterfill frame alone, so a driver divergence localizes to
      // either the allocation arithmetic or the doc-level truncation
      Sampling.unimaxAllocations(docs(s, d), totalBudget = 40000L,
                                 maxEpochs = 2)
        .orderBy("lang")),
    "sample_temperature" -> ((s, d) =>
      // α=1/2 temperature allocations of the same 40k budget: √-weights
      // upweight small languages smoothly (vs unimax's hard epoch cap)
      Sampling.temperatureAllocations(docs(s, d), totalBudget = 40000L)
        .orderBy("lang")),
    "pipeline_pack_sequences" -> ((s, d) =>
      Packing.packedManifest(docs(s, d), seqLen = 200L)
        .orderBy("source", "seq_id")),
    "text_chunk_windows" -> ((s, d) =>
      // RAG/long-doc chunking: 64-token windows, stride 48 (overlap 16),
      // content-addressed manifest rows
      Packing.chunkWindows(docs(s, d), chunkLen = 64, stride = 48)
        .orderBy("doc_id", "chunk_idx")),
    "pipeline_training_pack" -> ((s, d) => {
      val dd = docs(s, d)
      TrainingPrep.prepareAndPack(dd, dd.filter(col("doc_id") % 10 === 0),
                                  seqLen = 128L)
        .orderBy("source", "seq_id")
    })
  )

  /** DuckDB replay of [[graft.pipeline.Bpe.train]]: the K merge rounds are
    * unrolled as CTE chains (state s0..sK, pair counts p_k, top pick t_k),
    * with the greedy leftmost merge as the same left-to-right list fold the
    * Spark side uses (`list_reduce` over single-symbol lists seeded with an
    * empty accumulator). Deterministic tie-break (count desc, l, r) makes
    * every round a pure function of the corpus, so the replay is exact.
    */
  /** DuckDB replay of [[graft.pipeline.Retrieval.mmrDiversify]]: the greedy
    * rounds unroll as accumulating CTE chains (selected set acc_k, remaining
    * candidates remc_k, max-sim-to-selected ms_k); scores are micro-unit
    * integer arithmetic, so every pick and tie-break replays exactly. The
    * state CTEs are MATERIALIZED — DuckDB inlines CTEs by default and each
    * round references the previous accumulator three times.
    */
  private def mmrOracle(select: Int, lambdaPct: Int): String = {
    val lp = lambdaPct
    val lq = 100 - lambdaPct
    val head = s"""$embSql,
      qset AS (SELECT vec_id AS q_id, v AS qv FROM e_t WHERE vec_id < 3),
      cand AS MATERIALIZED (
        SELECT q_id, vec_id,
          CAST(ROUND(score * 1000000) AS BIGINT) AS rel FROM (
          SELECT q_id, vec_id, score,
            ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY score DESC, vec_id) AS rnk
          FROM (SELECT q.q_id, e.vec_id, ${cosSql("q.qv", "e.v")} AS score
                FROM e_t e CROSS JOIN qset q WHERE e.vec_id <> q.q_id))
        WHERE rnk <= 12),
      cv AS MATERIALIZED (SELECT c.q_id, c.vec_id, e.v
                          FROM cand c JOIN e_t e USING (vec_id)),
      simp AS MATERIALIZED (
        SELECT a.q_id, a.vec_id AS a_id, b.vec_id AS b_id,
          CAST(ROUND(${cosSql("a.v", "b.v")} * 1000000) AS BIGINT) AS sim
        FROM cv a JOIN cv b ON a.q_id = b.q_id AND a.vec_id <> b.vec_id),
      sel1 AS (SELECT q_id, vec_id, rel, mmr FROM (
          SELECT q_id, vec_id, rel, $lp * rel AS mmr,
            ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY $lp * rel DESC, vec_id) AS rn
          FROM cand) WHERE rn = 1),
      acc1 AS MATERIALIZED (SELECT q_id, vec_id, rel, mmr,
        CAST(1 AS BIGINT) AS sel_rank FROM sel1)"""
    val steps = (2 to select).map { k =>
      s"""remc$k AS (SELECT c.* FROM cand c LEFT JOIN acc${k - 1} s
            ON c.q_id = s.q_id AND c.vec_id = s.vec_id WHERE s.vec_id IS NULL),
      ms$k AS (SELECT c.q_id, c.vec_id, c.rel, COALESCE(MAX(ps.sim), 0) AS msim
            FROM remc$k c LEFT JOIN
              (SELECT p.q_id, p.a_id, p.sim FROM simp p
               JOIN acc${k - 1} s ON p.q_id = s.q_id AND p.b_id = s.vec_id) ps
              ON ps.q_id = c.q_id AND ps.a_id = c.vec_id
            GROUP BY 1, 2, 3),
      sel$k AS (SELECT q_id, vec_id, rel, mmr FROM (
          SELECT q_id, vec_id, rel, $lp * rel - $lq * msim AS mmr,
            ROW_NUMBER() OVER (PARTITION BY q_id
              ORDER BY ($lp * rel - $lq * msim) DESC, vec_id) AS rn
          FROM ms$k) WHERE rn = 1),
      acc$k AS MATERIALIZED (SELECT * FROM acc${k - 1} UNION ALL
        SELECT q_id, vec_id, rel, mmr, CAST($k AS BIGINT) FROM sel$k)"""
    }
    "WITH " + (head +: steps).mkString(",\n") +
      s"""
      SELECT q_id, sel_rank, vec_id, rel AS rel_micro, mmr AS mmr_scaled
      FROM acc$select ORDER BY q_id, sel_rank"""
  }

  /** DuckDB replay of [[graft.pipeline.WordPiece.train]] — the same
    * unrolled-round structure as [[bpeOracle]] plus a per-round symbol-count
    * CTE; the quantized likelihood score is HUGEINT arithmetic
    * (`(c · 10^12) // (cl · cr)`, floor of positives = Spark's exact
    * Decimal(38,0) division), so every pick replays bit-for-bit.
    */
  private def wordpieceOracle(rounds: Int): String =
    wordpieceCtes(rounds) + "\n" + (1 to rounds).map { k =>
      s"""SELECT CAST($k AS BIGINT) AS rank, l AS "left", r AS "right",
            merged, c AS pair_count, score_q FROM t$k"""
    }.mkString(" UNION ALL ") + " ORDER BY rank"

  private def wordpieceCtes(rounds: Int): String = {
    val head = raw"""ws_t AS (SELECT doc_id,
        list_filter(regexp_split_to_array(trim(text), '\s+'), w -> len(w) > 0) AS ws
      FROM documents),
      wf AS (SELECT w AS word, COUNT(*) AS freq
             FROM (SELECT unnest(ws) AS w FROM ws_t) GROUP BY 1),
      s0 AS MATERIALIZED (SELECT word, freq,
        list_transform(range(1, len(word) + 1),
          i -> CASE WHEN i = 1 THEN word[i] ELSE '##' || word[i] END) AS st
      FROM wf)"""
    val steps = (1 to rounds).map { k =>
      s"""sym$k AS (SELECT s AS sym, CAST(SUM(freq) AS BIGINT) AS cs
        FROM (SELECT freq, unnest(st) AS s FROM s${k - 1}) GROUP BY 1),
      p$k AS (SELECT p.l AS l, p.r AS r, CAST(SUM(freq) AS BIGINT) AS c
        FROM (SELECT freq, unnest(list_transform(range(1, len(st)),
                i -> {'l': st[i], 'r': st[i+1]})) AS p FROM s${k - 1})
        GROUP BY 1, 2),
      sc$k AS (SELECT p.l AS l, p.r AS r, p.c AS c,
          CAST((CAST(p.c AS HUGEINT) * 1000000000000)
               // (CAST(sl.cs AS HUGEINT) * sr.cs) AS BIGINT) AS score_q
        FROM p$k p JOIN sym$k sl ON p.l = sl.sym JOIN sym$k sr ON p.r = sr.sym),
      t$k AS (SELECT l, r, c, score_q,
          l || CASE WHEN r LIKE '##%' THEN r[3:] ELSE r END AS merged
        FROM sc$k ORDER BY score_q DESC, l, r LIMIT 1),
      s$k AS MATERIALIZED (SELECT word, freq,
        list_reduce(list_prepend(CAST([] AS VARCHAR[]), list_transform(st, s -> [s])),
          (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = t.l AND x[1] = t.r
            THEN list_append(acc[1:len(acc)-1], t.merged)
            ELSE list_append(acc, x[1]) END) AS st
        FROM s${k - 1} CROSS JOIN t$k t)"""
    }
    (head +: steps).mkString("WITH ", ",\n", "")
  }

  private def bpeOracle(rounds: Int): String =
    bpeCtes(rounds) + "\n" + (1 to rounds).map { k =>
      s"""SELECT CAST($k AS BIGINT) AS rank, l AS "left", r AS "right",
            l || r AS merged, c AS pair_count FROM t$k"""
    }.mkString(" UNION ALL ") + " ORDER BY rank"

  /** The shared CTE chain: corpus → (word,freq) → states s0..s_rounds with
    * per-round pair counts p_k and top picks t_k.
    */
  private def bpeCtes(rounds: Int): String = {
    val head = raw"""ws_t AS (SELECT doc_id,
        list_filter(regexp_split_to_array(trim(text), '\s+'), w -> len(w) > 0) AS ws
      FROM documents),
      wf AS (SELECT w AS word, COUNT(*) AS freq
             FROM (SELECT unnest(ws) AS w FROM ws_t) GROUP BY 1),
      s0 AS (SELECT word, freq,
        list_append(list_transform(range(1, len(word) + 1), i -> word[i]), '</w>') AS st
      FROM wf)"""
    val steps = (1 to rounds).map { k =>
      s"""p$k AS (SELECT p.l AS l, p.r AS r, CAST(SUM(freq) AS BIGINT) AS c
        FROM (SELECT freq, unnest(list_transform(range(1, len(st)),
                i -> {'l': st[i], 'r': st[i+1]})) AS p FROM s${k - 1})
        GROUP BY 1, 2),
      t$k AS (SELECT l, r, c FROM p$k ORDER BY c DESC, l, r LIMIT 1),
      s$k AS (SELECT word, freq,
        list_reduce(list_prepend(CAST([] AS VARCHAR[]), list_transform(st, s -> [s])),
          (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = t.l AND x[1] = t.r
            THEN list_append(acc[1:len(acc)-1], t.l || t.r)
            ELSE list_append(acc, x[1]) END) AS st
        FROM s${k - 1} CROSS JOIN t$k t)"""
    }
    (head +: steps).mkString("WITH ", ",\n", "")
  }

  /** DuckDB replay of [[graft.pipeline.Bpe.tokenizeStats]]: train the same
    * `rounds` merges (shared CTE chain), read each word's piece count off
    * the final state, and join back to the exploded corpus.
    */
  private def wordpieceTokenizeOracle(rounds: Int): String =
    s"""${wordpieceCtes(rounds)},
      wp AS (SELECT word, CAST(len(st) AS BIGINT) AS n_p FROM s$rounds),
      d AS (SELECT doc_id, unnest(ws) AS w FROM ws_t)
      SELECT doc_id, COUNT(*) AS n_words, CAST(SUM(wp.n_p) AS BIGINT) AS n_pieces,
        ROUND(CAST(SUM(wp.n_p) AS DOUBLE) / COUNT(*), 6) AS fertility
      FROM d JOIN wp ON wp.word = d.w
      GROUP BY 1 ORDER BY doc_id"""

  private def bpeTokenizeOracle(rounds: Int): String =
    s"""${bpeCtes(rounds)},
      wp AS (SELECT word, CAST(len(st) AS BIGINT) AS n_p FROM s$rounds),
      d AS (SELECT doc_id, unnest(ws) AS w FROM ws_t)
      SELECT doc_id, COUNT(*) AS n_words, CAST(SUM(wp.n_p) AS BIGINT) AS n_pieces,
        ROUND(CAST(SUM(wp.n_p) AS DOUBLE) / COUNT(*), 6) AS fertility
      FROM d JOIN wp ON wp.word = d.w
      GROUP BY 1 ORDER BY doc_id"""

  // shared core of the unigram-LM oracle: seed vocab, two unrolled
  // Baum-Welch rounds (recursive-CTE lattices), prune+renorm -> vf
  private val unigramOracleCore: String = raw"""WITH RECURSIVE
wf AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
    SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
                  x -> len(x) > 0)) AS word
    FROM documents) GROUP BY 1),
sub AS MATERIALIZED (
  SELECT substr(word, j, k) AS piece, CAST(SUM(freq) AS BIGINT) AS tot
  FROM (SELECT word, freq, unnest(range(1, len(word) + 1)) AS j FROM wf)
  CROSS JOIN (SELECT unnest(range(1, 5)) AS k)
  WHERE k <= len(word) - j + 1
  GROUP BY 1),
sel AS MATERIALIZED (
  SELECT piece, tot FROM sub WHERE len(piece) = 1
  UNION ALL
  SELECT piece, tot FROM (
    SELECT piece, tot FROM sub WHERE len(piece) >= 2
    ORDER BY tot DESC, piece LIMIT 48)),
v0 AS MATERIALIZED (
  SELECT piece, ROUND(CAST(tot AS DOUBLE) / (SELECT SUM(tot) FROM sel), 12) AS p
  FROM sel),
-- ============ EM round 1 ============
fwd1 AS (
  SELECT word, freq, 0 AS i, [CAST(1.0 AS DOUBLE)] AS al FROM wf
  UNION ALL
  SELECT f.word, f.freq, f.i + 1,
    list_append(f.al,
      (CASE WHEN 1 <= f.i + 1 THEN COALESCE(f.al[f.i + 1 - 1 + 1] * p1.p, 0.0) ELSE 0.0 END)
    + (CASE WHEN 2 <= f.i + 1 THEN COALESCE(f.al[f.i + 1 - 2 + 1] * p2.p, 0.0) ELSE 0.0 END)
    + (CASE WHEN 3 <= f.i + 1 THEN COALESCE(f.al[f.i + 1 - 3 + 1] * p3.p, 0.0) ELSE 0.0 END)
    + (CASE WHEN 4 <= f.i + 1 THEN COALESCE(f.al[f.i + 1 - 4 + 1] * p4.p, 0.0) ELSE 0.0 END))
  FROM fwd1 f
  LEFT JOIN v0 p1 ON p1.piece = substr(f.word, f.i + 1, 1)
  LEFT JOIN v0 p2 ON p2.piece = substr(f.word, f.i, 2)
  LEFT JOIN v0 p3 ON p3.piece = substr(f.word, f.i - 1, 3)
  LEFT JOIN v0 p4 ON p4.piece = substr(f.word, f.i - 2, 4)
  WHERE f.i + 1 <= len(f.word)),
bwd1 AS (
  SELECT word, 0 AS i, [CAST(1.0 AS DOUBLE)] AS gl FROM wf
  UNION ALL
  SELECT f.word, f.i + 1,
    list_append(f.gl,
      (CASE WHEN 1 <= f.i + 1 THEN COALESCE(p1.p * f.gl[f.i + 1 - 1 + 1], 0.0) ELSE 0.0 END)
    + (CASE WHEN 2 <= f.i + 1 THEN COALESCE(p2.p * f.gl[f.i + 1 - 2 + 1], 0.0) ELSE 0.0 END)
    + (CASE WHEN 3 <= f.i + 1 THEN COALESCE(p3.p * f.gl[f.i + 1 - 3 + 1], 0.0) ELSE 0.0 END)
    + (CASE WHEN 4 <= f.i + 1 THEN COALESCE(p4.p * f.gl[f.i + 1 - 4 + 1], 0.0) ELSE 0.0 END))
  FROM bwd1 f
  LEFT JOIN v0 p1 ON p1.piece = substr(f.word, len(f.word) - f.i, 1)
  LEFT JOIN v0 p2 ON p2.piece = substr(f.word, len(f.word) - f.i, 2)
  LEFT JOIN v0 p3 ON p3.piece = substr(f.word, len(f.word) - f.i, 3)
  LEFT JOIN v0 p4 ON p4.piece = substr(f.word, len(f.word) - f.i, 4)
  WHERE f.i + 1 <= len(f.word)),
lat1 AS MATERIALIZED (
  SELECT w.word, w.freq, fa.al, gb.gl
  FROM wf w
  JOIN (SELECT word, al FROM fwd1 WHERE i = len(word)) fa USING (word)
  JOIN (SELECT word, gl FROM bwd1 WHERE i = len(word)) gb USING (word)),
e1 AS (
  SELECT piece, CAST(ROUND(cnt * 1e10) AS BIGINT) AS cq FROM (
    SELECT substr(l.word, j + 1, k) AS piece,
      ((CAST(l.freq AS DOUBLE) * l.al[j + 1]) * COALESCE(v.p, 0.0))
        * l.gl[len(l.word) - (j + k) + 1] / l.al[len(l.word) + 1] AS cnt
    FROM (SELECT *, unnest(range(0, len(word))) AS j FROM lat1) l
    CROSS JOIN (SELECT unnest(range(1, 5)) AS k)
    LEFT JOIN v0 v ON v.piece = substr(l.word, j + 1, k)
    WHERE k <= len(l.word) - j AND l.al[len(l.word) + 1] > 0)
  WHERE cnt > 0),
c1 AS MATERIALIZED (SELECT piece, SUM(cq) AS cq FROM e1 GROUP BY 1),
v1 AS MATERIALIZED (
  SELECT v0.piece,
    ROUND(CAST(COALESCE(c1.cq, 0) AS DOUBLE) / (SELECT SUM(cq) FROM c1), 12) AS p
  FROM v0 LEFT JOIN c1 USING (piece)),
-- ============ EM round 2 ============
fwd2 AS (
  SELECT word, freq, 0 AS i, [CAST(1.0 AS DOUBLE)] AS al FROM wf
  UNION ALL
  SELECT f.word, f.freq, f.i + 1,
    list_append(f.al,
      (CASE WHEN 1 <= f.i + 1 THEN COALESCE(f.al[f.i + 1 - 1 + 1] * p1.p, 0.0) ELSE 0.0 END)
    + (CASE WHEN 2 <= f.i + 1 THEN COALESCE(f.al[f.i + 1 - 2 + 1] * p2.p, 0.0) ELSE 0.0 END)
    + (CASE WHEN 3 <= f.i + 1 THEN COALESCE(f.al[f.i + 1 - 3 + 1] * p3.p, 0.0) ELSE 0.0 END)
    + (CASE WHEN 4 <= f.i + 1 THEN COALESCE(f.al[f.i + 1 - 4 + 1] * p4.p, 0.0) ELSE 0.0 END))
  FROM fwd2 f
  LEFT JOIN v1 p1 ON p1.piece = substr(f.word, f.i + 1, 1)
  LEFT JOIN v1 p2 ON p2.piece = substr(f.word, f.i, 2)
  LEFT JOIN v1 p3 ON p3.piece = substr(f.word, f.i - 1, 3)
  LEFT JOIN v1 p4 ON p4.piece = substr(f.word, f.i - 2, 4)
  WHERE f.i + 1 <= len(f.word)),
bwd2 AS (
  SELECT word, 0 AS i, [CAST(1.0 AS DOUBLE)] AS gl FROM wf
  UNION ALL
  SELECT f.word, f.i + 1,
    list_append(f.gl,
      (CASE WHEN 1 <= f.i + 1 THEN COALESCE(p1.p * f.gl[f.i + 1 - 1 + 1], 0.0) ELSE 0.0 END)
    + (CASE WHEN 2 <= f.i + 1 THEN COALESCE(p2.p * f.gl[f.i + 1 - 2 + 1], 0.0) ELSE 0.0 END)
    + (CASE WHEN 3 <= f.i + 1 THEN COALESCE(p3.p * f.gl[f.i + 1 - 3 + 1], 0.0) ELSE 0.0 END)
    + (CASE WHEN 4 <= f.i + 1 THEN COALESCE(p4.p * f.gl[f.i + 1 - 4 + 1], 0.0) ELSE 0.0 END))
  FROM bwd2 f
  LEFT JOIN v1 p1 ON p1.piece = substr(f.word, len(f.word) - f.i, 1)
  LEFT JOIN v1 p2 ON p2.piece = substr(f.word, len(f.word) - f.i, 2)
  LEFT JOIN v1 p3 ON p3.piece = substr(f.word, len(f.word) - f.i, 3)
  LEFT JOIN v1 p4 ON p4.piece = substr(f.word, len(f.word) - f.i, 4)
  WHERE f.i + 1 <= len(f.word)),
lat2 AS MATERIALIZED (
  SELECT w.word, w.freq, fa.al, gb.gl
  FROM wf w
  JOIN (SELECT word, al FROM fwd2 WHERE i = len(word)) fa USING (word)
  JOIN (SELECT word, gl FROM bwd2 WHERE i = len(word)) gb USING (word)),
e2 AS (
  SELECT piece, CAST(ROUND(cnt * 1e10) AS BIGINT) AS cq FROM (
    SELECT substr(l.word, j + 1, k) AS piece,
      ((CAST(l.freq AS DOUBLE) * l.al[j + 1]) * COALESCE(v.p, 0.0))
        * l.gl[len(l.word) - (j + k) + 1] / l.al[len(l.word) + 1] AS cnt
    FROM (SELECT *, unnest(range(0, len(word))) AS j FROM lat2) l
    CROSS JOIN (SELECT unnest(range(1, 5)) AS k)
    LEFT JOIN v1 v ON v.piece = substr(l.word, j + 1, k)
    WHERE k <= len(l.word) - j AND l.al[len(l.word) + 1] > 0)
  WHERE cnt > 0),
c2 AS MATERIALIZED (SELECT piece, SUM(cq) AS cq FROM e2 GROUP BY 1),
v2 AS MATERIALIZED (
  SELECT v1.piece,
    ROUND(CAST(COALESCE(c2.cq, 0) AS DOUBLE) / (SELECT SUM(cq) FROM c2), 12) AS p
  FROM v1 LEFT JOIN c2 USING (piece)),
-- ============ prune + renormalize ============
kept AS MATERIALIZED (
  SELECT piece, p FROM v2 WHERE len(piece) = 1
  UNION ALL
  SELECT piece, p FROM (
    SELECT piece, p FROM v2 WHERE len(piece) >= 2
    ORDER BY p DESC, piece LIMIT 32)),
zq AS (SELECT SUM(CAST(ROUND(p * 1e12) AS BIGINT)) AS zq FROM kept),
vf AS MATERIALIZED (
  SELECT piece, ROUND(p / (CAST(zq AS DOUBLE) / 1e12), 12) AS p
  FROM kept CROSS JOIN zq)"""

  private val unigramViterbiSql: String = raw""",
cw AS MATERIALIZED (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
                 x -> len(x) > 0)) AS word
  FROM documents),
vit AS (
  SELECT word, 0 AS i, [CAST(1.0 AS DOUBLE)] AS vl, [CAST(0 AS INT)] AS cl FROM wf
  UNION ALL
  SELECT word, i + 1, list_append(vl, b4v), list_append(cl, b4c) FROM (
   SELECT *,
     CASE WHEN cv4 > b3v OR (cv4 = b3v AND cv4 > 0 AND cc4 < b3c) THEN cv4 ELSE b3v END AS b4v,
     CASE WHEN cv4 > b3v OR (cv4 = b3v AND cv4 > 0 AND cc4 < b3c) THEN cc4 ELSE b3c END AS b4c
   FROM (
    SELECT *,
     CASE WHEN cv3 > b2v OR (cv3 = b2v AND cv3 > 0 AND cc3 < b2c) THEN cv3 ELSE b2v END AS b3v,
     CASE WHEN cv3 > b2v OR (cv3 = b2v AND cv3 > 0 AND cc3 < b2c) THEN cc3 ELSE b2c END AS b3c
    FROM (
     SELECT *,
      CASE WHEN cv2 > b1v OR (cv2 = b1v AND cv2 > 0 AND cc2 < b1c) THEN cv2 ELSE b1v END AS b2v,
      CASE WHEN cv2 > b1v OR (cv2 = b1v AND cv2 > 0 AND cc2 < b1c) THEN cc2 ELSE b1c END AS b2c
     FROM (
      SELECT *,
       CASE WHEN cv1 > 0.0 THEN cv1 ELSE 0.0 END AS b1v,
       CASE WHEN cv1 > 0.0 THEN cc1 ELSE 0 END AS b1c
      FROM (
       SELECT f.word, f.i, f.vl, f.cl,
         CASE WHEN 1 <= f.i + 1 THEN COALESCE(f.vl[f.i + 1] * p1.p, 0.0) ELSE 0.0 END AS cv1,
         COALESCE(f.cl[f.i + 1], 0) + 1 AS cc1,
         CASE WHEN 2 <= f.i + 1 THEN COALESCE(f.vl[f.i] * p2.p, 0.0) ELSE 0.0 END AS cv2,
         COALESCE(f.cl[f.i], 0) + 1 AS cc2,
         CASE WHEN 3 <= f.i + 1 THEN COALESCE(f.vl[f.i - 1] * p3.p, 0.0) ELSE 0.0 END AS cv3,
         COALESCE(f.cl[f.i - 1], 0) + 1 AS cc3,
         CASE WHEN 4 <= f.i + 1 THEN COALESCE(f.vl[f.i - 2] * p4.p, 0.0) ELSE 0.0 END AS cv4,
         COALESCE(f.cl[f.i - 2], 0) + 1 AS cc4
       FROM vit f
       LEFT JOIN vf p1 ON p1.piece = substr(f.word, f.i + 1, 1)
       LEFT JOIN vf p2 ON p2.piece = substr(f.word, f.i, 2)
       LEFT JOIN vf p3 ON p3.piece = substr(f.word, f.i - 1, 3)
       LEFT JOIN vf p4 ON p4.piece = substr(f.word, f.i - 2, 4)
       WHERE f.i + 1 <= len(f.word))))))
)
SELECT cw.doc_id, COUNT(*) AS n_words, CAST(SUM(vp.n_p) AS BIGINT) AS n_pieces,
  ROUND(CAST(SUM(vp.n_p) AS DOUBLE) / COUNT(*), 6) AS fertility
FROM cw JOIN (SELECT word, cl[len(word) + 1] AS n_p
              FROM vit WHERE i = len(word)) vp USING (word)
GROUP BY 1 ORDER BY 1"""

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(substr(text, 1, 50)) AS content_key, MIN(doc_id) AS keep_id,
           COUNT(*) AS n_docs
         FROM documents GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY keep_id""",

    "dedup_ngram_jaccard" ->
      s"""WITH $wsSql, $shSql,
         sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh_t GROUP BY 1),
         shared AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
           FROM sh_t a JOIN sh_t b
             ON a.shingle = b.shingle AND a.lang = b.lang AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT id_a, id_b,
           ROUND(CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared), 6) AS jaccard
         FROM shared
           JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b
         WHERE jaccard >= 0.5 ORDER BY id_a, id_b""",

    "dedup_minhash_lsh" ->
      s"""WITH $wsSql, $shSql,
         mh AS (SELECT doc_id, i,
                  MIN(${h64("concat(i, '|', shingle)")}) AS minhash
                FROM sh_t CROSS JOIN range(16) r(i) GROUP BY 1, 2),
         bands AS (SELECT doc_id, i // 4 AS band, list(minhash ORDER BY i) AS band_key
                   FROM mh GROUP BY 1, 2)
         SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
         ORDER BY id_a, id_b""",

    "dedup_lsh_recall" ->
      s"""WITH $wsSql, $shSql,
         sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh_t GROUP BY 1),
         shared AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
           FROM sh_t a JOIN sh_t b
             ON a.shingle = b.shingle AND a.lang = b.lang AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         exact AS (
           SELECT id_a, id_b FROM shared
             JOIN sizes sa ON sa.doc_id = id_a
             JOIN sizes sb ON sb.doc_id = id_b
           WHERE ROUND(CAST(n_shared AS DOUBLE)
                       / (sa.n_sh + sb.n_sh - n_shared), 6) >= 0.5),
         mh AS (SELECT doc_id, i,
                  MIN(${h64("concat(i, '|', shingle)")}) AS minhash
                FROM sh_t CROSS JOIN range(16) r(i) GROUP BY 1, 2),
         bands AS (SELECT doc_id, i // 4 AS band, list(minhash ORDER BY i) AS band_key
                   FROM mh GROUP BY 1, 2),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.band_key = b.band_key
                       AND a.doc_id < b.doc_id),
         agg AS (SELECT COUNT(*) AS n_exact,
                   CAST(SUM(CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
                 FROM exact e LEFT JOIN cand c
                   ON e.id_a = c.id_a AND e.id_b = c.id_b)
         SELECT n_exact, (SELECT COUNT(*) FROM cand) AS n_candidates, n_hit,
           ROUND(CAST(n_hit AS DOUBLE) / n_exact, 6) AS recall
         FROM agg""",

    "dedup_simhash" ->
      s"""WITH $wsSql,
         w AS (SELECT doc_id, lang, unnest(ws) AS w FROM ws_t),
         h AS (SELECT doc_id, lang, ${h64("w")} AS h FROM w),
         v AS (SELECT doc_id, lang, b, SUM((h >> b) % 2 * 2 - 1) AS v
               FROM h CROSS JOIN range(32) r(b) GROUP BY 1, 2, 3),
         s AS (SELECT doc_id, lang,
                 SUM(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS simhash
               FROM v GROUP BY 1, 2)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
         WHERE hamming <= 3 ORDER BY id_a, id_b""",

    "dedup_pipeline" ->
      s"""WITH RECURSIVE $wsSql, $shSql,
         mh AS (SELECT doc_id, i,
                  MIN(${h64("concat(i, '|', shingle)")}) AS minhash
                FROM sh_t CROSS JOIN range(16) r(i) GROUP BY 1, 2),
         bands AS (SELECT doc_id, i // 4 AS band, list(minhash ORDER BY i) AS band_key
                   FROM mh GROUP BY 1, 2),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.band_key = b.band_key
                       AND a.doc_id < b.doc_id),
         sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh_t GROUP BY 1),
         shared AS (SELECT c.id_a, c.id_b, COUNT(*) AS n_shared
                    FROM cand c
                      JOIN sh_t a ON a.doc_id = c.id_a
                      JOIN sh_t b ON b.doc_id = c.id_b AND a.shingle = b.shingle
                    GROUP BY 1, 2),
         verified AS (SELECT c.id_a, c.id_b FROM cand c
                        JOIN sizes sa ON sa.doc_id = c.id_a
                        JOIN sizes sb ON sb.doc_id = c.id_b
                        LEFT JOIN shared s ON s.id_a = c.id_a AND s.id_b = c.id_b
                      WHERE ROUND(CAST(COALESCE(s.n_shared, 0) AS DOUBLE)
                        / (sa.n_sh + sb.n_sh - COALESCE(s.n_shared, 0)), 6) >= 0.5),
         e AS (SELECT id_a AS src, id_b AS dst FROM verified
               UNION SELECT id_b, id_a FROM verified),
         nodes AS (SELECT DISTINCT src AS node FROM e),
         reach(node, r) AS (
           SELECT node, node FROM nodes
           UNION
           SELECT e.dst, reach.r FROM reach JOIN e ON e.src = reach.node)
         SELECT node AS doc_id, MIN(r) AS keep_id FROM reach
         GROUP BY node ORDER BY doc_id""",

    // same pipeline, rolled up to the cluster-size histogram
    "dedup_cluster_stats" ->
      s"""WITH RECURSIVE $wsSql, $shSql,
         mh AS (SELECT doc_id, i,
                  MIN(${h64("concat(i, '|', shingle)")}) AS minhash
                FROM sh_t CROSS JOIN range(16) r(i) GROUP BY 1, 2),
         bands AS (SELECT doc_id, i // 4 AS band, list(minhash ORDER BY i) AS band_key
                   FROM mh GROUP BY 1, 2),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.band_key = b.band_key
                       AND a.doc_id < b.doc_id),
         sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh_t GROUP BY 1),
         shared AS (SELECT c.id_a, c.id_b, COUNT(*) AS n_shared
                    FROM cand c
                      JOIN sh_t a ON a.doc_id = c.id_a
                      JOIN sh_t b ON b.doc_id = c.id_b AND a.shingle = b.shingle
                    GROUP BY 1, 2),
         verified AS (SELECT c.id_a, c.id_b FROM cand c
                        JOIN sizes sa ON sa.doc_id = c.id_a
                        JOIN sizes sb ON sb.doc_id = c.id_b
                        LEFT JOIN shared s ON s.id_a = c.id_a AND s.id_b = c.id_b
                      WHERE ROUND(CAST(COALESCE(s.n_shared, 0) AS DOUBLE)
                        / (sa.n_sh + sb.n_sh - COALESCE(s.n_shared, 0)), 6) >= 0.5),
         e AS (SELECT id_a AS src, id_b AS dst FROM verified
               UNION SELECT id_b, id_a FROM verified),
         nodes AS (SELECT DISTINCT src AS node FROM e),
         reach(node, r) AS (
           SELECT node, node FROM nodes
           UNION
           SELECT e.dst, reach.r FROM reach JOIN e ON e.src = reach.node)
         SELECT cluster_size, COUNT(*) AS n_clusters FROM (
           SELECT keep_id, COUNT(*) AS cluster_size FROM (
             SELECT node, MIN(r) AS keep_id FROM reach GROUP BY node)
           GROUP BY keep_id)
         GROUP BY 1 ORDER BY 1""",

    "dedup_embedding_cosine" ->
      s"""WITH $embSql
         SELECT a.vec_id AS id_a, b.vec_id AS id_b, ${cosSql("a.v", "b.v")} AS cos
         FROM e_t a JOIN e_t b ON a.label = b.label AND a.vec_id < b.vec_id
         WHERE cos >= 0.35 ORDER BY id_a, id_b""",

    "ann_topk" ->
      s"""WITH $embSql,
         q AS (SELECT vec_id AS q_id, v AS qv FROM e_t WHERE vec_id < 5),
         scored AS (
           SELECT q_id, vec_id, ${cosSql("qv", "v")} AS score
           FROM e_t CROSS JOIN q WHERE vec_id <> q_id)
         SELECT q_id, rank, vec_id, score FROM (
           SELECT q_id, vec_id, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id)
                  AS BIGINT) AS rank
           FROM scored)
         WHERE rank <= 10 ORDER BY q_id, rank""",

    // mirrors Similarity.hardNegatives: ann_topk's shape plus the
    // cross-label filter on the scan side
    "ann_hard_negatives" ->
      s"""WITH $embSql,
         q AS (SELECT vec_id AS q_id, CAST(label AS BIGINT) AS q_label, v AS qv
               FROM e_t WHERE vec_id < 5),
         scored AS (
           SELECT q_id, vec_id, CAST(label AS BIGINT) AS label,
                  ${cosSql("qv", "v")} AS score
           FROM e_t CROSS JOIN q
           WHERE vec_id <> q_id AND CAST(label AS BIGINT) <> q_label)
         SELECT q_id, rank, vec_id, label, score FROM (
           SELECT q_id, vec_id, label, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id)
                  AS BIGINT) AS rank
           FROM scored)
         WHERE rank <= 10 ORDER BY q_id, rank""",

    // mirrors Similarity.hardNegativesIvf: ann_ivf's probe machinery with
    // ann_hard_negatives' cross-label scan filter
    "ann_hard_negatives_ivf" ->
      s"""WITH $embSql,
         cent AS (SELECT vec_id AS cid, v AS cv FROM e_t WHERE vec_id < 8),
         assign AS (
           SELECT vec_id, cid FROM (
             SELECT e_t.vec_id, cent.cid,
               ROW_NUMBER() OVER (PARTITION BY e_t.vec_id
                 ORDER BY ${cosSql("e_t.v", "cent.cv")} DESC, cent.cid) AS rn
             FROM e_t CROSS JOIN cent)
           WHERE rn = 1),
         q AS (SELECT vec_id AS q_id, CAST(label AS BIGINT) AS q_label, v AS qv
               FROM e_t WHERE vec_id < 5),
         probes AS (
           SELECT q_id, qv, q_label, cid FROM (
             SELECT q.q_id, q.qv, q.q_label, cent.cid,
               ROW_NUMBER() OVER (PARTITION BY q.q_id
                 ORDER BY ${cosSql("q.qv", "cent.cv")} DESC, cent.cid) AS rn
             FROM q CROSS JOIN cent)
           WHERE rn <= 2),
         scored AS (
           SELECT p.q_id, e_t.vec_id, CAST(e_t.label AS BIGINT) AS label,
                  ${cosSql("p.qv", "e_t.v")} AS score
           FROM probes p JOIN assign a ON a.cid = p.cid
             JOIN e_t ON e_t.vec_id = a.vec_id
           WHERE e_t.vec_id <> p.q_id
             AND CAST(e_t.label AS BIGINT) <> p.q_label)
         SELECT q_id, rank, vec_id, label, score FROM (
           SELECT q_id, vec_id, label, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id)
                  AS BIGINT) AS rank
           FROM scored)
         WHERE rank <= 10 ORDER BY q_id, rank""",

    // mirrors Similarity.centroidDrift: the kmeans quantized-long exact
    // mean per (label, dim), then the pairwise rounded centroid cosine
    "emb_centroid_drift" ->
      s"""WITH $embSql,
         m AS (SELECT CAST(label AS BIGINT) AS grp, i - 1 AS d,
                 (CAST(SUM(CAST(round(v[CAST(i AS INTEGER)] * 1048576.0)
                                AS BIGINT)) AS DOUBLE)
                  / COUNT(*)) / 1048576.0 AS m,
                 COUNT(*) AS n
               FROM e_t, range(1, 65) t(i) GROUP BY 1, 2),
         g AS (SELECT grp, list(m ORDER BY d) AS gv,
                      CAST(MAX(n) AS BIGINT) AS n_vecs
               FROM m GROUP BY 1)
         SELECT a.grp AS grp_a, b.grp AS grp_b,
           a.n_vecs AS n_a, b.n_vecs AS n_b,
           ${cosSql("a.gv", "b.gv")} AS drift_cos
         FROM g a JOIN g b ON a.grp < b.grp
         ORDER BY grp_a, grp_b""",

    // mirrors Similarity.ivfPqTopK: 8x16 seed codebooks (subvectors of
    // vec_id < 16), per-subspace rounded-L2 argmin encoding, per-query
    // flattened LUT in (j, code) order, ADC score = sum of 8 lut reads
    // over the 2 probed lists, rank ascending (squared L2: lower=nearer)
    "ann_ivf_pq" ->
      s"""WITH $embSql,
         cb AS (SELECT j, CAST(vec_id AS INTEGER) AS code, v[j*8+1 : (j+1)*8] AS cv
                FROM e_t CROSS JOIN range(8) r(j) WHERE vec_id < 16),
         encd AS (SELECT e_t.vec_id, cb.j, cb.code,
                ROUND(list_sum(list_transform(range(1, 9),
                  i -> (e_t.v[j*8+i] - cb.cv[i]) * (e_t.v[j*8+i] - cb.cv[i]))), 6) AS d
              FROM e_t CROSS JOIN cb),
         enc1 AS (SELECT vec_id, j, code FROM (
                SELECT vec_id, j, code,
                  ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, code) AS rn
                FROM encd) WHERE rn = 1),
         codes AS (SELECT vec_id, list(code ORDER BY j) AS codes FROM enc1 GROUP BY 1),
         cent AS (SELECT vec_id AS cid, v AS cv FROM e_t WHERE vec_id < 8),
         assign AS (SELECT vec_id, cid FROM (
                SELECT e_t.vec_id, cent.cid,
                  ROW_NUMBER() OVER (PARTITION BY e_t.vec_id
                    ORDER BY ${cosSql("e_t.v", "cent.cv")} DESC, cent.cid) AS rn
                FROM e_t CROSS JOIN cent) WHERE rn = 1),
         q AS (SELECT vec_id AS q_id, v AS qv FROM e_t WHERE vec_id < 5),
         lutd AS (SELECT q.q_id, cb.j, cb.code,
                ROUND(list_sum(list_transform(range(1, 9),
                  i -> (q.qv[j*8+i] - cb.cv[i]) * (q.qv[j*8+i] - cb.cv[i]))), 6) AS d
              FROM q CROSS JOIN cb),
         luts AS (SELECT q_id, list(d ORDER BY j*16 + code) AS lut FROM lutd GROUP BY 1),
         probes AS (SELECT q_id, cid FROM (
                SELECT q.q_id, cent.cid,
                  ROW_NUMBER() OVER (PARTITION BY q.q_id
                    ORDER BY ${cosSql("q.qv", "cent.cv")} DESC, cent.cid) AS rn
                FROM q CROSS JOIN cent) WHERE rn <= 2),
         scored AS (SELECT p.q_id, c.vec_id,
                ROUND(list_sum(list_transform(range(0, 8),
                  j -> l.lut[j*16 + c.codes[j+1] + 1])), 6) AS score
              FROM probes p
                JOIN assign a ON a.cid = p.cid
                JOIN codes c ON c.vec_id = a.vec_id
                JOIN luts l ON l.q_id = p.q_id
              WHERE c.vec_id <> p.q_id)
         SELECT q_id, rank, vec_id, score FROM (
           SELECT q_id, vec_id, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score, vec_id)
                  AS BIGINT) AS rank
           FROM scored)
         WHERE rank <= 10 ORDER BY q_id, rank""",

    // mirrors Similarity.kmeansCentroids: seeds vec_id<4, two unrolled
    // Lloyd rounds; the per-dim mean is the exact quantized-long form
    // ((Σ round(x·2^20)) / count) / 2^20 so every double replays here
    "ann_kmeans_train" ->
      s"""WITH $embSql,
         c0 AS (SELECT vec_id AS cid, v AS cv FROM e_t WHERE vec_id < 4),
         a1 AS (SELECT vec_id, v, cid FROM (
                 SELECT e_t.vec_id, e_t.v, c0.cid,
                   ROW_NUMBER() OVER (PARTITION BY e_t.vec_id
                     ORDER BY ${cosSql("e_t.v", "c0.cv")} DESC, c0.cid) AS rn
                 FROM e_t CROSS JOIN c0) WHERE rn = 1),
         m1 AS (SELECT cid, i - 1 AS d,
                  (CAST(SUM(CAST(round(v[CAST(i AS INTEGER)] * 1048576.0)
                                 AS BIGINT)) AS DOUBLE)
                   / COUNT(*)) / 1048576.0 AS m
                FROM a1, range(1, 65) t(i) GROUP BY 1, 2),
         n1 AS (SELECT cid, list(m ORDER BY d) AS nv FROM m1 GROUP BY 1),
         c1 AS (SELECT c0.cid, COALESCE(n1.nv, c0.cv) AS cv
                FROM c0 LEFT JOIN n1 USING (cid)),
         a2 AS (SELECT vec_id, v, cid FROM (
                 SELECT e_t.vec_id, e_t.v, c1.cid,
                   ROW_NUMBER() OVER (PARTITION BY e_t.vec_id
                     ORDER BY ${cosSql("e_t.v", "c1.cv")} DESC, c1.cid) AS rn
                 FROM e_t CROSS JOIN c1) WHERE rn = 1),
         m2 AS (SELECT cid, i - 1 AS d,
                  (CAST(SUM(CAST(round(v[CAST(i AS INTEGER)] * 1048576.0)
                                 AS BIGINT)) AS DOUBLE)
                   / COUNT(*)) / 1048576.0 AS m
                FROM a2, range(1, 65) t(i) GROUP BY 1, 2),
         n2 AS (SELECT cid, list(m ORDER BY d) AS nv FROM m2 GROUP BY 1),
         c2 AS (SELECT c1.cid, COALESCE(n2.nv, c1.cv) AS cv
                FROM c1 LEFT JOIN n2 USING (cid))
         SELECT c2.cid, CAST(t.i - 1 AS BIGINT) AS d,
           c2.cv[CAST(t.i AS INTEGER)] AS m
         FROM c2, range(1, 65) t(i) ORDER BY cid, d""",

    // mirrors Similarity.ivfTopK: seed centroids (vec_id < 8), rounded-
    // cosine assignment with cid tiebreak, 2 probes, exact rank inside
    "ann_ivf" ->
      s"""WITH $embSql,
         cent AS (SELECT vec_id AS cid, v AS cv FROM e_t WHERE vec_id < 8),
         assign AS (
           SELECT vec_id, cid FROM (
             SELECT e_t.vec_id, cent.cid,
               ROW_NUMBER() OVER (PARTITION BY e_t.vec_id
                 ORDER BY ${cosSql("e_t.v", "cent.cv")} DESC, cent.cid) AS rn
             FROM e_t CROSS JOIN cent)
           WHERE rn = 1),
         q AS (SELECT vec_id AS q_id, v AS qv FROM e_t WHERE vec_id < 5),
         probes AS (
           SELECT q_id, qv, cid FROM (
             SELECT q.q_id, q.qv, cent.cid,
               ROW_NUMBER() OVER (PARTITION BY q.q_id
                 ORDER BY ${cosSql("q.qv", "cent.cv")} DESC, cent.cid) AS rn
             FROM q CROSS JOIN cent)
           WHERE rn <= 2),
         scored AS (
           SELECT p.q_id, e_t.vec_id, ${cosSql("p.qv", "e_t.v")} AS score
           FROM probes p JOIN assign a ON a.cid = p.cid
             JOIN e_t ON e_t.vec_id = a.vec_id
           WHERE e_t.vec_id <> p.q_id)
         SELECT q_id, rank, vec_id, score FROM (
           SELECT q_id, vec_id, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id)
                  AS BIGINT) AS rank
           FROM scored)
         WHERE rank <= 10 ORDER BY q_id, rank""",

    // recall@10 of the PQ/ADC index vs the exact ranking — composes the
    // ann_ivf_pq and ann_topk oracle bodies
    "ann_recall_pq" ->
      s"""WITH $embSql,
         cb AS (SELECT j, CAST(vec_id AS INTEGER) AS code, v[j*8+1 : (j+1)*8] AS cv
                FROM e_t CROSS JOIN range(8) r(j) WHERE vec_id < 16),
         encd AS (SELECT e_t.vec_id, cb.j, cb.code,
                ROUND(list_sum(list_transform(range(1, 9),
                  i -> (e_t.v[j*8+i] - cb.cv[i]) * (e_t.v[j*8+i] - cb.cv[i]))), 6) AS d
              FROM e_t CROSS JOIN cb),
         enc1 AS (SELECT vec_id, j, code FROM (
                SELECT vec_id, j, code,
                  ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, code) AS rn
                FROM encd) WHERE rn = 1),
         codes AS (SELECT vec_id, list(code ORDER BY j) AS codes FROM enc1 GROUP BY 1),
         cent AS (SELECT vec_id AS cid, v AS cv FROM e_t WHERE vec_id < 8),
         assign AS (SELECT vec_id, cid FROM (
                SELECT e_t.vec_id, cent.cid,
                  ROW_NUMBER() OVER (PARTITION BY e_t.vec_id
                    ORDER BY ${cosSql("e_t.v", "cent.cv")} DESC, cent.cid) AS rn
                FROM e_t CROSS JOIN cent) WHERE rn = 1),
         q AS (SELECT vec_id AS q_id, v AS qv FROM e_t WHERE vec_id < 5),
         lutd AS (SELECT q.q_id, cb.j, cb.code,
                ROUND(list_sum(list_transform(range(1, 9),
                  i -> (q.qv[j*8+i] - cb.cv[i]) * (q.qv[j*8+i] - cb.cv[i]))), 6) AS d
              FROM q CROSS JOIN cb),
         luts AS (SELECT q_id, list(d ORDER BY j*16 + code) AS lut FROM lutd GROUP BY 1),
         probes AS (SELECT q_id, cid FROM (
                SELECT q.q_id, cent.cid,
                  ROW_NUMBER() OVER (PARTITION BY q.q_id
                    ORDER BY ${cosSql("q.qv", "cent.cv")} DESC, cent.cid) AS rn
                FROM q CROSS JOIN cent) WHERE rn <= 2),
         ap AS (SELECT q_id, vec_id FROM (
           SELECT q_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score, vec_id) AS rank
           FROM (SELECT p.q_id, c.vec_id,
                   ROUND(list_sum(list_transform(range(0, 8),
                     j -> l.lut[j*16 + c.codes[j+1] + 1])), 6) AS score
                 FROM probes p
                   JOIN assign a ON a.cid = p.cid
                   JOIN codes c ON c.vec_id = a.vec_id
                   JOIN luts l ON l.q_id = p.q_id
                 WHERE c.vec_id <> p.q_id))
           WHERE rank <= 10),
         ex AS (SELECT q_id, vec_id FROM (
           SELECT q_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
           FROM (SELECT q_id, e_t.vec_id, ${cosSql("qv", "e_t.v")} AS score
                 FROM e_t CROSS JOIN q WHERE e_t.vec_id <> q.q_id))
           WHERE rank <= 10)
         SELECT ex.q_id, COUNT(*) AS n_exact,
           CAST(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           ROUND(CAST(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS recall
         FROM ex LEFT JOIN ap ON ex.q_id = ap.q_id AND ex.vec_id = ap.vec_id
         GROUP BY 1 ORDER BY 1""",

    // recall@10 of the 16-dim JL sign projection vs the full 64-dim ranking:
    // the projection is rebuilt from the same md5 sign matrix, coordinates
    // rounded to 6 decimals like every float the oracle compares
    "ann_recall_rp" ->
      s"""WITH $embSql,
         rp AS (SELECT vec_id,
             list_transform(range(0, 16), j ->
               ROUND(list_sum(list_transform(range(0, 64), i ->
                 (CASE WHEN (${h64("'rp:' || CAST(j AS VARCHAR) || ':' || CAST(i AS VARCHAR)")} % 2) = 0
                       THEN 1.0 ELSE -1.0 END) * v[i + 1]))
                 / sqrt(16.0), 6)) AS pv
           FROM e_t),
         pq AS (SELECT vec_id AS q_id, pv AS qpv FROM rp WHERE vec_id < 5),
         ap AS (SELECT q_id, vec_id FROM (
           SELECT q_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
           FROM (SELECT q_id, rp.vec_id AS vec_id, ${cosSql("qpv", "rp.pv")} AS score
                 FROM rp CROSS JOIN pq WHERE rp.vec_id <> pq.q_id))
           WHERE rank <= 10),
         q AS (SELECT vec_id AS q_id, v AS qv FROM e_t WHERE vec_id < 5),
         ex AS (SELECT q_id, vec_id FROM (
           SELECT q_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
           FROM (SELECT q_id, e_t.vec_id, ${cosSql("qv", "e_t.v")} AS score
                 FROM e_t CROSS JOIN q WHERE e_t.vec_id <> q.q_id))
           WHERE rank <= 10)
         SELECT ex.q_id, COUNT(*) AS n_exact,
           CAST(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           ROUND(CAST(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS recall
         FROM ex LEFT JOIN ap ON ex.q_id = ap.q_id AND ex.vec_id = ap.vec_id
         GROUP BY 1 ORDER BY 1""",

    "emb_int8_quant" ->
      s"""WITH $embSql,
         xm AS (SELECT vec_id,
                  list_transform(v, x -> CAST(ROUND(x * 1000000) AS BIGINT)) AS m
                FROM e_t),
         mm AS (SELECT vec_id, m, list_min(m) AS minm,
                  list_max(m) - list_min(m) AS rng FROM xm),
         qc AS (SELECT vec_id, minm, rng,
                  list_transform(m, x -> CASE WHEN rng > 0
                    THEN ((x - minm) * 255) // rng ELSE 0 END) AS qv
                FROM mm)
         SELECT vec_id, minm AS min_micro, rng AS range_micro,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           CAST(list_sum(list_transform(range(1, len(qv) + 1),
                                        i -> qv[i] * i)) AS BIGINT) AS q_dot,
           CAST(len(qv) AS BIGINT) AS n
         FROM qc ORDER BY vec_id""",

    "ann_recall_int8" ->
      s"""WITH $embSql,
         xm AS (SELECT vec_id,
                  list_transform(v, x -> CAST(ROUND(x * 1000000) AS BIGINT)) AS m
                FROM e_t),
         mm AS (SELECT vec_id, m, list_min(m) AS minm,
                  list_max(m) - list_min(m) AS rng FROM xm),
         dq AS (SELECT vec_id,
                  list_transform(m, x -> CAST(minm + (CASE WHEN rng > 0
                      THEN ((x - minm) * 255) // rng ELSE 0 END * rng) // 255
                    AS DOUBLE) / 1000000.0) AS v
                FROM mm),
         aq AS (SELECT vec_id AS q_id, v AS aqv FROM dq WHERE vec_id < 5),
         ap AS (SELECT q_id, vec_id FROM (
           SELECT q_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
           FROM (SELECT q_id, dq.vec_id AS vec_id, ${cosSql("aqv", "dq.v")} AS score
                 FROM dq CROSS JOIN aq WHERE dq.vec_id <> aq.q_id))
           WHERE rank <= 10),
         q AS (SELECT vec_id AS q_id, v AS qv FROM e_t WHERE vec_id < 5),
         ex AS (SELECT q_id, vec_id FROM (
           SELECT q_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
           FROM (SELECT q_id, e_t.vec_id, ${cosSql("qv", "e_t.v")} AS score
                 FROM e_t CROSS JOIN q WHERE e_t.vec_id <> q.q_id))
           WHERE rank <= 10)
         SELECT ex.q_id, COUNT(*) AS n_exact,
           CAST(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           ROUND(CAST(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS recall
         FROM ex LEFT JOIN ap ON ex.q_id = ap.q_id AND ex.vec_id = ap.vec_id
         GROUP BY 1 ORDER BY 1""",

    // mirrors Similarity.binaryQuantize/hammingTopK: 32-bit packed sign
    // words (CAST keeps DuckDB's HUGEINT sum in BIGINT range), exact
    // integer Hamming via bit_count(xor), rank (hamming asc, vec_id)
    "ann_hamming_topk" ->
      s"""WITH $embSql,
         sig AS (SELECT vec_id,
             list_transform(range(0, CAST(ceil(len(v) / 32.0) AS INTEGER)),
               w -> CAST(list_sum(list_transform(range(0, 32),
                 b -> CASE WHEN w * 32 + b < len(v)
                            AND v[w * 32 + b + 1] > 0
                           THEN CAST(1 AS BIGINT) << b ELSE 0 END))
                 AS BIGINT)) AS sig
           FROM e_t),
         q AS (SELECT vec_id AS q_id, sig AS qsig FROM sig WHERE vec_id < 5),
         scored AS (SELECT q_id, vec_id,
             CAST(list_sum(list_transform(range(1, len(sig) + 1),
               i -> bit_count(xor(sig[i], qsig[i])))) AS BIGINT) AS hamming
           FROM sig CROSS JOIN q WHERE vec_id <> q_id)
         SELECT q_id, rank, vec_id, hamming FROM (
           SELECT q_id, vec_id, hamming,
             CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY hamming, vec_id)
                  AS BIGINT) AS rank
           FROM scored)
         WHERE rank <= 10 ORDER BY q_id, rank""",

    // mirrors Similarity.hammingTopKIndexed: 8 bands of 8 bits over the
    // two 32-bit sign words (64-dim corpus), candidates = exact band
    // matches (pigeonhole-complete within Hamming < 8), popcount verify
    "ann_hamming_indexed" ->
      s"""WITH $embSql,
         sig AS (SELECT vec_id,
             list_transform(range(0, CAST(ceil(len(v) / 32.0) AS INTEGER)),
               w -> CAST(list_sum(list_transform(range(0, 32),
                 b -> CASE WHEN w * 32 + b < len(v)
                            AND v[w * 32 + b + 1] > 0
                           THEN CAST(1 AS BIGINT) << b ELSE 0 END))
                 AS BIGINT)) AS sig
           FROM e_t),
         bnd AS (SELECT vec_id,
             b.band AS band,
             (sig[CAST((b.band * 8) // 32 AS INTEGER) + 1]
                >> CAST((b.band * 8) % 32 AS INTEGER)) & 255 AS bval
           FROM sig CROSS JOIN range(8) b(band)),
         q AS (SELECT vec_id AS q_id, sig AS qsig FROM sig WHERE vec_id < 5),
         qb AS (SELECT vec_id AS q_id, band, bval FROM bnd WHERE vec_id < 5),
         cand AS (SELECT DISTINCT qb.q_id, c.vec_id
           FROM bnd c JOIN qb ON c.band = qb.band AND c.bval = qb.bval
           WHERE c.vec_id <> qb.q_id),
         scored AS (SELECT cand.q_id, cand.vec_id,
             CAST(list_sum(list_transform(range(1, len(s.sig) + 1),
               i -> bit_count(xor(s.sig[i], q.qsig[i])))) AS BIGINT) AS hamming
           FROM cand JOIN sig s ON s.vec_id = cand.vec_id
             JOIN q ON q.q_id = cand.q_id)
         SELECT q_id, rank, vec_id, hamming FROM (
           SELECT q_id, vec_id, hamming,
             CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY hamming, vec_id)
                  AS BIGINT) AS rank
           FROM scored)
         WHERE rank <= 10 ORDER BY q_id, rank""",

    // recall@10 of the band-filtered Hamming ranking vs the exact cosine
    // ranking — composes the ann_hamming_indexed and ann_topk bodies
    "ann_recall_hamming_indexed" ->
      s"""WITH $embSql,
         sig AS (SELECT vec_id,
             list_transform(range(0, CAST(ceil(len(v) / 32.0) AS INTEGER)),
               w -> CAST(list_sum(list_transform(range(0, 32),
                 b -> CASE WHEN w * 32 + b < len(v)
                            AND v[w * 32 + b + 1] > 0
                           THEN CAST(1 AS BIGINT) << b ELSE 0 END))
                 AS BIGINT)) AS sig
           FROM e_t),
         bnd AS (SELECT vec_id,
             b.band AS band,
             (sig[CAST((b.band * 8) // 32 AS INTEGER) + 1]
                >> CAST((b.band * 8) % 32 AS INTEGER)) & 255 AS bval
           FROM sig CROSS JOIN range(8) b(band)),
         hq AS (SELECT vec_id AS q_id, sig AS qsig FROM sig WHERE vec_id < 5),
         qb AS (SELECT vec_id AS q_id, band, bval FROM bnd WHERE vec_id < 5),
         cand AS (SELECT DISTINCT qb.q_id, c.vec_id
           FROM bnd c JOIN qb ON c.band = qb.band AND c.bval = qb.bval
           WHERE c.vec_id <> qb.q_id),
         ap AS (SELECT q_id, vec_id FROM (
           SELECT q_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY hamming, vec_id) AS rank
           FROM (SELECT cand.q_id, cand.vec_id,
                   CAST(list_sum(list_transform(range(1, len(s.sig) + 1),
                     i -> bit_count(xor(s.sig[i], hq.qsig[i])))) AS BIGINT) AS hamming
                 FROM cand JOIN sig s ON s.vec_id = cand.vec_id
                   JOIN hq ON hq.q_id = cand.q_id))
           WHERE rank <= 10),
         q AS (SELECT vec_id AS q_id, v AS qv FROM e_t WHERE vec_id < 5),
         ex AS (SELECT q_id, vec_id FROM (
           SELECT q_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
           FROM (SELECT q_id, e_t.vec_id, ${cosSql("qv", "e_t.v")} AS score
                 FROM e_t CROSS JOIN q WHERE e_t.vec_id <> q.q_id))
           WHERE rank <= 10)
         SELECT ex.q_id, COUNT(*) AS n_exact,
           CAST(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           ROUND(CAST(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS recall
         FROM ex LEFT JOIN ap ON ex.q_id = ap.q_id AND ex.vec_id = ap.vec_id
         GROUP BY 1 ORDER BY 1""",

    "ann_recall_hamming" ->
      s"""WITH $embSql,
         sig AS (SELECT vec_id,
             list_transform(range(0, CAST(ceil(len(v) / 32.0) AS INTEGER)),
               w -> CAST(list_sum(list_transform(range(0, 32),
                 b -> CASE WHEN w * 32 + b < len(v)
                            AND v[w * 32 + b + 1] > 0
                           THEN CAST(1 AS BIGINT) << b ELSE 0 END))
                 AS BIGINT)) AS sig
           FROM e_t),
         hq AS (SELECT vec_id AS q_id, sig AS qsig FROM sig WHERE vec_id < 5),
         ap AS (SELECT q_id, vec_id FROM (
           SELECT q_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY hamming, vec_id) AS rank
           FROM (SELECT q_id, vec_id,
                   CAST(list_sum(list_transform(range(1, len(sig) + 1),
                     i -> bit_count(xor(sig[i], qsig[i])))) AS BIGINT) AS hamming
                 FROM sig CROSS JOIN hq WHERE vec_id <> q_id))
           WHERE rank <= 10),
         q AS (SELECT vec_id AS q_id, v AS qv FROM e_t WHERE vec_id < 5),
         ex AS (SELECT q_id, vec_id FROM (
           SELECT q_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
           FROM (SELECT q_id, e_t.vec_id, ${cosSql("qv", "e_t.v")} AS score
                 FROM e_t CROSS JOIN q WHERE e_t.vec_id <> q.q_id))
           WHERE rank <= 10)
         SELECT ex.q_id, COUNT(*) AS n_exact,
           CAST(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           ROUND(CAST(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS recall
         FROM ex LEFT JOIN ap ON ex.q_id = ap.q_id AND ex.vec_id = ap.vec_id
         GROUP BY 1 ORDER BY 1""",

    // mirrors Similarity.matryoshkaTruncate + recallAtK: 16-dim prefix
    // ranking vs the full exact ranking
    "ann_recall_matryoshka" ->
      s"""WITH $embSql,
         t AS (SELECT vec_id, v[1:16] AS v FROM e_t),
         tq AS (SELECT vec_id AS q_id, v AS qv FROM t WHERE vec_id < 5),
         ap AS (SELECT q_id, vec_id FROM (
           SELECT q_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
           FROM (SELECT q_id, t.vec_id, ${cosSql("qv", "t.v")} AS score
                 FROM t CROSS JOIN tq WHERE t.vec_id <> tq.q_id))
           WHERE rank <= 10),
         q AS (SELECT vec_id AS q_id, v AS qv FROM e_t WHERE vec_id < 5),
         ex AS (SELECT q_id, vec_id FROM (
           SELECT q_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
           FROM (SELECT q_id, e_t.vec_id, ${cosSql("qv", "e_t.v")} AS score
                 FROM e_t CROSS JOIN q WHERE e_t.vec_id <> q.q_id))
           WHERE rank <= 10)
         SELECT ex.q_id, COUNT(*) AS n_exact,
           CAST(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           ROUND(CAST(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS recall
         FROM ex LEFT JOIN ap ON ex.q_id = ap.q_id AND ex.vec_id = ap.vec_id
         GROUP BY 1 ORDER BY 1""",

    "search_hybrid_rrf" ->
      s"""WITH tok AS (SELECT doc_id AS doc,
             unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                    t -> len(t) > 0)) AS term
           FROM documents),
         tf AS (SELECT term, doc, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
         dfr AS (SELECT term, COUNT(DISTINCT doc) AS df FROM tf GROUP BY 1),
         dl AS (SELECT doc, SUM(tf) AS dl FROM tf GROUP BY 1),
         st AS (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
                       COUNT(*) AS n FROM dl),
         sc AS (SELECT m.doc,
                  ROUND(SUM(
                    ln((CAST(st.n AS DOUBLE) - d.df + 0.5) / (d.df + 0.5) + 1.0)
                    * (m.tf * 2.2)
                    / (m.tf + 1.2 * (0.25 + (0.75 * l.dl) / st.avgdl))), 6)
                    AS score
                FROM tf m JOIN dfr d USING (term) JOIN dl l ON m.doc = l.doc
                  CROSS JOIN st
                WHERE m.term IN ('spark', 'join', 'fast')
                GROUP BY 1),
         bm AS (SELECT doc AS id, rank FROM (
             SELECT doc, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc) AS BIGINT) AS rank
             FROM sc) WHERE rank <= 20),
         $embSql,
         qd AS (SELECT v AS qv FROM e_t WHERE vec_id = 0),
         dn AS (SELECT vec_id AS id, rank FROM (
             SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, vec_id) AS BIGINT) AS rank
             FROM (SELECT e_t.vec_id, ${cosSql("qv", "e_t.v")} AS score
                   FROM e_t CROSS JOIN qd WHERE e_t.vec_id <> 0))
           WHERE rank <= 20),
         c AS (SELECT id, 1000000000 // (60 + rank) AS contrib FROM bm
               UNION ALL SELECT id, 1000000000 // (60 + rank) FROM dn),
         f AS (SELECT id, CAST(SUM(contrib) AS BIGINT) AS rrf_scaled,
                      COUNT(*) AS n_systems FROM c GROUP BY 1)
         SELECT id, rrf_scaled, n_systems, rank FROM (
           SELECT id, rrf_scaled, n_systems,
             CAST(ROW_NUMBER() OVER (ORDER BY rrf_scaled DESC, id) AS BIGINT) AS rank
           FROM f)
         WHERE rank <= 15 ORDER BY rank""",

    // recall@10 of multiprobe LSH vs the exact ranking — composes the
    // ann_topk and ann_lsh_multiprobe oracle bodies
    "ann_recall_lsh" ->
      s"""WITH $embSql,
         dots AS (SELECT vec_id, j,
                    SUM(v[d + 1] * ((${h64("concat(j, ',', d)")} % 1000000) / 500000.0 - 1.0)) AS dot
                  FROM e_t CROSS JOIN range(8) r(j) CROSS JOIN range(64) s(d)
                  GROUP BY 1, 2),
         bk AS (SELECT vec_id,
                  SUM(CASE WHEN dot > 0 THEN CAST(1 AS BIGINT) << CAST(j AS INT) ELSE 0 END) AS bucket
                FROM dots GROUP BY 1),
         eb AS (SELECT e_t.vec_id, v, bucket FROM e_t JOIN bk ON e_t.vec_id = bk.vec_id),
         q AS (SELECT vec_id AS q_id, qv, q_bucket FROM (
                 SELECT vec_id, v AS qv, bucket AS q_bucket FROM eb WHERE vec_id < 5)),
         ap AS (SELECT q_id, vec_id FROM (
           SELECT q_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
           FROM (SELECT q_id, eb.vec_id, ${cosSql("qv", "v")} AS score
                 FROM eb JOIN q ON bit_count(xor(eb.bucket, q.q_bucket)) <= 1
                               AND eb.vec_id <> q.q_id))
           WHERE rank <= 10),
         ex AS (SELECT q_id, vec_id FROM (
           SELECT q_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
           FROM (SELECT q_id, e_t.vec_id, ${cosSql("qv", "e_t.v")} AS score
                 FROM e_t CROSS JOIN q WHERE e_t.vec_id <> q.q_id))
           WHERE rank <= 10)
         SELECT ex.q_id, COUNT(*) AS n_exact,
           CAST(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           ROUND(CAST(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS recall
         FROM ex LEFT JOIN ap ON ex.q_id = ap.q_id AND ex.vec_id = ap.vec_id
         GROUP BY 1 ORDER BY 1""",

    // recall@10 of the IVF index vs the exact ranking — composes the
    // ann_topk and ann_ivf oracle bodies and joins their top-k sets
    "ann_recall_ivf" ->
      s"""WITH $embSql,
         q AS (SELECT vec_id AS q_id, v AS qv FROM e_t WHERE vec_id < 5),
         ex AS (SELECT q_id, vec_id FROM (
           SELECT q_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
           FROM (SELECT q_id, vec_id, ${cosSql("qv", "v")} AS score
                 FROM e_t CROSS JOIN q WHERE vec_id <> q_id))
           WHERE rank <= 10),
         cent AS (SELECT vec_id AS cid, v AS cv FROM e_t WHERE vec_id < 8),
         assign AS (
           SELECT vec_id, cid FROM (
             SELECT e_t.vec_id, cent.cid,
               ROW_NUMBER() OVER (PARTITION BY e_t.vec_id
                 ORDER BY ${cosSql("e_t.v", "cent.cv")} DESC, cent.cid) AS rn
             FROM e_t CROSS JOIN cent)
           WHERE rn = 1),
         probes AS (
           SELECT q_id, qv, cid FROM (
             SELECT q.q_id, q.qv, cent.cid,
               ROW_NUMBER() OVER (PARTITION BY q.q_id
                 ORDER BY ${cosSql("q.qv", "cent.cv")} DESC, cent.cid) AS rn
             FROM q CROSS JOIN cent)
           WHERE rn <= 2),
         ap AS (SELECT q_id, vec_id FROM (
           SELECT q_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
           FROM (SELECT p.q_id, e_t.vec_id, ${cosSql("p.qv", "e_t.v")} AS score
                 FROM probes p JOIN assign a ON a.cid = p.cid
                   JOIN e_t ON e_t.vec_id = a.vec_id
                 WHERE e_t.vec_id <> p.q_id))
           WHERE rank <= 10)
         SELECT ex.q_id, COUNT(*) AS n_exact,
           CAST(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           ROUND(CAST(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS recall
         FROM ex LEFT JOIN ap ON ex.q_id = ap.q_id AND ex.vec_id = ap.vec_id
         GROUP BY 1 ORDER BY 1""",

    "ann_lsh_topk" ->
      s"""WITH $embSql,
         dots AS (SELECT vec_id, j,
                    SUM(v[d + 1] * ((${h64("concat(j, ',', d)")} % 1000000) / 500000.0 - 1.0)) AS dot
                  FROM e_t CROSS JOIN range(8) r(j) CROSS JOIN range(64) s(d)
                  GROUP BY 1, 2),
         bk AS (SELECT vec_id,
                  SUM(CASE WHEN dot > 0 THEN CAST(1 AS BIGINT) << CAST(j AS INT) ELSE 0 END) AS bucket
                FROM dots GROUP BY 1),
         eb AS (SELECT e_t.vec_id, v, bucket FROM e_t JOIN bk ON e_t.vec_id = bk.vec_id),
         q AS (SELECT vec_id AS q_id, v AS qv, bucket AS q_bucket FROM eb WHERE vec_id < 5),
         scored AS (
           SELECT q_id, eb.vec_id, ${cosSql("qv", "v")} AS score
           FROM eb JOIN q ON eb.bucket = q.q_bucket AND eb.vec_id <> q.q_id)
         SELECT q_id, rank, vec_id, score FROM (
           SELECT q_id, vec_id, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id)
                  AS BIGINT) AS rank
           FROM scored)
         WHERE rank <= 10 ORDER BY q_id, rank""",

    "ann_lsh_multiprobe" ->
      s"""WITH $embSql,
         dots AS (SELECT vec_id, j,
                    SUM(v[d + 1] * ((${h64("concat(j, ',', d)")} % 1000000) / 500000.0 - 1.0)) AS dot
                  FROM e_t CROSS JOIN range(8) r(j) CROSS JOIN range(64) s(d)
                  GROUP BY 1, 2),
         bk AS (SELECT vec_id,
                  SUM(CASE WHEN dot > 0 THEN CAST(1 AS BIGINT) << CAST(j AS INT) ELSE 0 END) AS bucket
                FROM dots GROUP BY 1),
         eb AS (SELECT e_t.vec_id, v, bucket FROM e_t JOIN bk ON e_t.vec_id = bk.vec_id),
         q AS (SELECT vec_id AS q_id, v AS qv, bucket AS q_bucket FROM eb WHERE vec_id < 5),
         scored AS (
           SELECT q_id, eb.vec_id, ${cosSql("qv", "v")} AS score
           FROM eb JOIN q ON bit_count(xor(eb.bucket, q.q_bucket)) <= 1
                         AND eb.vec_id <> q.q_id)
         SELECT q_id, rank, vec_id, score FROM (
           SELECT q_id, vec_id, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id)
                  AS BIGINT) AS rank
           FROM scored)
         WHERE rank <= 10 ORDER BY q_id, rank""",

    "text_token_stats" ->
      s"""WITH $wsSql
         SELECT doc_id,
           CAST(len(ws) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct,
           ROUND(CAST(len(list_distinct(ws)) AS DOUBLE) / NULLIF(len(ws), 0), 6) AS ttr,
           ROUND(CAST(list_sum(list_transform(ws, w -> len(w))) AS DOUBLE) / NULLIF(len(ws), 0), 6)
             AS mean_token_len
         FROM ws_t ORDER BY doc_id""",

    "text_langid" -> {
      val lex = TextAnalysis.stopwords.toSeq.sortBy(_._1).flatMap {
        case (lang, sw) => sw.map(w => s"('$lang', '$w')")
      }.mkString(", ")
      raw"""WITH lex(lang, word) AS (VALUES $lex),
         w AS (SELECT doc_id,
                 unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                        x -> len(x) > 0)) AS w
               FROM documents),
         votes AS (SELECT w.doc_id, l.lang, COUNT(*) AS votes
                   FROM w JOIN lex l ON w.w = l.word GROUP BY 1, 2),
         best AS (SELECT doc_id, lang, votes,
                    ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY votes DESC, lang) AS rn
                  FROM votes)
         SELECT d.doc_id,
           COALESCE(b.lang, 'und') AS pred_lang,
           CAST(COALESCE(b.votes, 0) AS BIGINT) AS votes
         FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1
         ORDER BY d.doc_id"""
    },

    "text_quality" ->
      s"""WITH $wsSql,
         base AS (
           SELECT w.doc_id,
             CAST(len(ws) AS DOUBLE) AS n_tok,
             CAST(len(regexp_replace(lower(d.text), '[^a-z]', '', 'g')) AS DOUBLE)
               / greatest(len(d.text), 1) AS alpha_ratio,
             CAST(len(list_distinct(ws)) AS DOUBLE) / greatest(len(ws), 1) AS ttr,
             CAST(list_sum(list_transform(ws, x -> len(x))) AS DOUBLE)
               / greatest(len(ws), 1) AS mean_len
           FROM ws_t w JOIN documents d ON w.doc_id = d.doc_id),
         scored AS (
           SELECT doc_id,
             CASE WHEN n_tok >= 20 AND n_tok <= 1000 THEN 1.0
                  WHEN n_tok >= 5 THEN 0.5 ELSE 0.0 END AS len_score,
             alpha_ratio, ttr,
             CASE WHEN mean_len >= 3 AND mean_len <= 10 THEN 1.0 ELSE 0.5 END AS wl
           FROM base)
         SELECT doc_id,
           CAST(ROUND(len_score, 6) AS DOUBLE) AS len_score,
           ROUND(alpha_ratio, 6) AS alpha_ratio,
           ROUND(ttr, 6) AS ttr,
           CAST(ROUND(len_score * 0.3 + alpha_ratio * 0.3 + ttr * 0.2 + wl * 0.2, 6)
                AS DOUBLE) AS quality
         FROM scored ORDER BY doc_id""",

    // Gopher rule battery: raw signals + 0/1 flags + the conjunction;
    // symbols counted on the RAW text ('#' chars + maximal '...' runs),
    // words/stopwords on the lowercased token array; every flag compares
    // the ROUNDED signal (the value in the output row), mirroring Spark
    "quality_gopher" ->
      raw"""WITH w AS (SELECT doc_id, text,
              list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                          x -> len(x) > 0) AS ws
            FROM documents),
         s AS (SELECT doc_id, len(ws) AS n,
             CASE WHEN len(ws) > 0 THEN
               ROUND(CAST(list_sum(list_transform(ws, x -> len(x))) AS DOUBLE)
                     / len(ws), 6) END AS mean_word_len,
             CASE WHEN len(ws) > 0 THEN
               ROUND(CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))
                          AS DOUBLE) / len(ws), 6) END AS alpha_word_frac,
             (len(text) - len(replace(text, '#', '')))
               + len(regexp_extract_all(text, '\.{3,}')) AS n_sym,
             len(list_filter(ws, t -> t IN ('the','a','of','and','to','in',
                                            'is','that','it','for')))
               AS stop_hits
           FROM w),
         f AS (SELECT doc_id, n, mean_word_len, alpha_word_frac,
             CASE WHEN n > 0 THEN ROUND(CAST(n_sym AS DOUBLE) / n, 6) END
               AS symbol_ratio,
             stop_hits
           FROM s),
         g AS (SELECT *,
             CAST(n >= 30 AND n <= 100000 AS BIGINT) AS f_words,
             CAST(mean_word_len IS NOT NULL AND mean_word_len >= 3
                  AND mean_word_len <= 10 AS BIGINT) AS f_mean_len,
             CAST(alpha_word_frac IS NOT NULL AND alpha_word_frac >= 0.8
                  AS BIGINT) AS f_alpha,
             CAST(symbol_ratio IS NOT NULL AND symbol_ratio <= 0.1
                  AS BIGINT) AS f_symbol,
             CAST(stop_hits >= 2 AS BIGINT) AS f_stop
           FROM f)
         SELECT doc_id, CAST(n AS BIGINT) AS n_words, mean_word_len,
           alpha_word_frac, symbol_ratio, CAST(stop_hits AS BIGINT) AS stop_hits,
           f_words, f_mean_len, f_alpha, f_symbol, f_stop,
           f_words * f_mean_len * f_alpha * f_symbol * f_stop AS gopher_pass
         FROM g ORDER BY doc_id""",

    "text_fingerprint" ->
      raw"""WITH lw AS (SELECT doc_id, text,
              list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                     x -> len(x) > 0) AS ws
            FROM documents)
         SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp_md5,
           CAST(COALESCE(list_sum(list_transform(range(1, len(ws) + 1),
             i -> (CAST('0x' || substr(md5(ws[i]), 1, 15) AS BIGINT) % 1000003) * i)), 0)
             AS BIGINT) AS fp_poly
         FROM lw ORDER BY doc_id""",

    // end-to-end curation: exact-dedup survivors -> lowered-token langid +
    // quality + token counts -> per-language rollup (mirrors
    // TextAnalysis.curate's one-pass contract: all analyses over the SAME
    // lowercased token array, quality >= 0.5)
    "pipeline_curation" -> {
      val lex = TextAnalysis.stopwords.toSeq.sortBy(_._1).flatMap {
        case (lang, sw) => sw.map(w => s"('$lang', '$w')")
      }.mkString(", ")
      raw"""WITH lex(lang, word) AS (VALUES $lex),
         keep AS (SELECT MIN(doc_id) AS doc_id
                  FROM documents GROUP BY md5(substr(text, 1, 50))),
         d AS (SELECT doc.doc_id, doc.text
               FROM documents doc JOIN keep ON doc.doc_id = keep.doc_id),
         w AS (SELECT doc_id, text,
                 list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                             x -> len(x) > 0) AS ws
               FROM d),
         m AS (SELECT doc_id, ws,
                 CAST(len(ws) AS DOUBLE) AS n_tok,
                 CAST(len(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
                   / greatest(len(text), 1) AS alpha_ratio,
                 CAST(len(list_distinct(ws)) AS DOUBLE) / greatest(len(ws), 1) AS ttr,
                 CAST(list_sum(list_transform(ws, x -> len(x))) AS DOUBLE)
                   / greatest(len(ws), 1) AS mean_len
               FROM w),
         votes AS (SELECT t.doc_id, l.lang, COUNT(*) AS votes
                   FROM (SELECT doc_id, unnest(ws) AS tok FROM w) t
                   JOIN lex l ON t.tok = l.word GROUP BY 1, 2),
         best AS (SELECT doc_id, lang,
                    ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY votes DESC, lang) AS rn
                  FROM votes),
         q AS (SELECT m.doc_id, COALESCE(b.lang, 'und') AS lang,
                 ROUND((CASE WHEN n_tok >= 20 AND n_tok <= 1000 THEN 1.0
                             WHEN n_tok >= 5 THEN 0.5 ELSE 0.0 END) * 0.3
                       + alpha_ratio * 0.3 + ttr * 0.2
                       + (CASE WHEN mean_len >= 3 AND mean_len <= 10
                               THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS quality,
                 CAST(len(m.ws) AS BIGINT) AS n_tokens
               FROM m LEFT JOIN best b ON b.doc_id = m.doc_id AND b.rn = 1)
         SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           ROUND(AVG(quality), 6) AS avg_quality
         FROM q WHERE quality >= 0.5 GROUP BY 1 ORDER BY lang"""
    },

    "multimodal_meta" ->
      """SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5,
           substr(base64(encode(text)), 1, 8) AS head_b64
         FROM documents ORDER BY doc_id""",

    // mirrors the REAL WAV path exactly: the container is the canonical
    // 44-byte PCM header + 2 bytes/sample (n_bytes = 44 + 2·nb); each text
    // byte b becomes sample b·257 − 32768; per-quarter RMS = floor to 6
    // decimals of sqrt(sumSq // len) — integer-exact up to ONE IEEE sqrt,
    // bit-identical across engines
    "multimodal_features" ->
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
                octet_length(encode(text)) AS nb FROM documents),
         q AS (SELECT doc_id, nb, unnest([0,1,2,3]) AS quarter FROM b),
         bounds AS (SELECT doc_id, nb, quarter,
                 (quarter*nb)//4 AS lo,
                 LEAST(GREATEST((quarter*nb)//4 + 1, ((quarter+1)*nb)//4), nb) AS hi
               FROM q),
         bytes AS (SELECT doc_id, hx, unnest(range(0, nb)) AS i FROM b),
         svals AS (SELECT doc_id, i,
                 CAST(CAST('0x' || substring(hx, CAST(2*i+1 AS BIGINT), 2) AS INTEGER)
                      * 257 - 32768 AS BIGINT) AS v
               FROM bytes),
         feat AS (SELECT bo.doc_id AS doc_id, bo.quarter AS quarter,
                 SUM(v.v * v.v) AS sq, COUNT(*) AS len
               FROM bounds bo JOIN svals v
                 ON v.doc_id = bo.doc_id AND v.i >= bo.lo AND v.i < bo.hi
               GROUP BY 1, 2)
         SELECT bo.doc_id, CAST(44 + 2*bo.nb AS BIGINT) AS n_bytes,
           CAST(bo.quarter AS BIGINT) AS quarter,
           COALESCE(CAST(CAST(floor(sqrt(CAST(f.sq // f.len AS DOUBLE)) * 1000000)
                              AS BIGINT) AS DOUBLE) / 1000000.0, 0.0) AS feature
         FROM bounds bo LEFT JOIN feat f
           ON f.doc_id = bo.doc_id AND f.quarter = bo.quarter
         ORDER BY bo.doc_id, bo.quarter""",

    // mirrors the REAL PNG path: pixel i = text byte i (zero-padded to the
    // 16-wide raster), width 16, height ceil(nb/16); per-quarter mean over
    // ALL n = w·h pixels in integer micro-units (padding zeros dilute the
    // last quarter exactly as the decoder sees them)
    "multimodal_image_features" ->
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
                octet_length(encode(text)) AS nb FROM documents),
         dims AS (SELECT doc_id, hx, nb, 16 AS w,
                GREATEST(1, (nb+15)//16) AS h FROM b),
         q AS (SELECT doc_id, nb, w, h, w*h AS n,
                unnest([0,1,2,3]) AS quarter FROM dims),
         bounds AS (SELECT doc_id, nb, w, h, n, quarter,
                 (quarter*n)//4 AS lo,
                 LEAST(GREATEST((quarter*n)//4 + 1, ((quarter+1)*n)//4), n) AS hi
               FROM q),
         bytes AS (SELECT doc_id, hx, unnest(range(0, nb)) AS i FROM b),
         bvals AS (SELECT doc_id, i,
                 CAST('0x' || substring(hx, CAST(2*i+1 AS BIGINT), 2) AS INTEGER) AS v
               FROM bytes),
         feat AS (SELECT bo.doc_id AS doc_id, bo.quarter AS quarter,
                 SUM(v.v) AS s
               FROM bounds bo JOIN bvals v
                 ON v.doc_id = bo.doc_id AND v.i >= bo.lo AND v.i < bo.hi
               GROUP BY 1, 2)
         SELECT bo.doc_id, CAST(bo.w AS INTEGER) AS width,
           CAST(bo.h AS INTEGER) AS height,
           CAST(bo.quarter AS BIGINT) AS quarter,
           CAST(CAST((COALESCE(f.s, 0) * 1000000) // (bo.hi - bo.lo) AS BIGINT)
                AS DOUBLE) / 1000000.0 AS feature
         FROM bounds bo LEFT JOIN feat f
           ON f.doc_id = bo.doc_id AND f.quarter = bo.quarter
         ORDER BY bo.doc_id, bo.quarter""",

    // mirrors the REAL AVI path: frame f of 16x8 covers text bytes
    // [f*128, (f+1)*128) zero-padded (the encoder pads the last DIB frame),
    // every 4th frame sampled, mean luminance in integer micro-units over
    // the fixed 128-pixel frame
    "multimodal_video_frames" ->
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
                octet_length(encode(text)) AS nb FROM documents),
         f AS (SELECT doc_id, nb,
                unnest(range(0, GREATEST((nb + 127)//128, 1), 4)) AS frame_idx
              FROM b),
         bytes AS (SELECT doc_id, hx, unnest(range(0, nb)) AS i FROM b),
         bv AS (SELECT doc_id, i,
                CAST('0x' || substring(hx, CAST(2*i+1 AS BIGINT), 2) AS INTEGER) AS v
              FROM bytes),
         s AS (SELECT f.doc_id, f.frame_idx, SUM(bv.v) AS bsum
              FROM f LEFT JOIN bv ON bv.doc_id = f.doc_id
                AND bv.i >= f.frame_idx*128 AND bv.i < (f.frame_idx+1)*128
              GROUP BY 1, 2)
         SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(16 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
           CAST(CAST((COALESCE(bsum, 0) * 1000000) // 128 AS BIGINT) AS DOUBLE)
             / 1000000.0 AS frame_mean
         FROM s ORDER BY doc_id, frame_idx""",

    // repetition signals over lowercase tokens and sequential word
    // 2-grams (list comprehensions mirror the Spark higher-order exprs)
    "text_repetition" ->
      raw"""WITH w AS (SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                         x -> len(x) > 0) AS ws
           FROM documents),
         b AS (SELECT doc_id, ws,
             CASE WHEN len(ws) >= 2 THEN
               list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
             ELSE [] END AS bg
           FROM w),
         c AS (SELECT doc_id, ws, bg,
             list_transform(list_distinct(ws),
                            g -> len(list_filter(ws, x -> x = g))) AS wc,
             list_transform(list_distinct(bg),
                            g -> len(list_filter(bg, x -> x = g))) AS bc
           FROM b)
         SELECT doc_id,
           ROUND(CAST(COALESCE(list_max(wc), 0) AS DOUBLE)
                 / GREATEST(len(ws), 1), 6) AS top_word_frac,
           ROUND(CAST(len(ws) - len(list_distinct(ws)) AS DOUBLE)
                 / GREATEST(len(ws), 1), 6) AS dup_word_frac,
           ROUND(CAST(COALESCE(list_max(bc), 0) AS DOUBLE)
                 / GREATEST(len(bg), 1), 6) AS top_bigram_frac,
           ROUND(CAST(COALESCE(list_sum(list_transform(
                   list_filter(bc, x -> x > 1), x -> x)), 0) AS DOUBLE)
                 / GREATEST(len(bg), 1), 6) AS dup_bigram_frac
         FROM c ORDER BY doc_id""",

    // top-3 TF-IDF terms per doc; rank on the ROUNDED score so a 1-ulp
    // ln() divergence between engines cannot flip a rank
    "text_tfidf" ->
      raw"""WITH w AS (SELECT doc_id,
              unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                     x -> len(x) > 0)) AS token
            FROM documents),
         tf_t AS (SELECT doc_id, token, COUNT(*) AS tf FROM w GROUP BY 1, 2),
         df_t AS (SELECT token, COUNT(*) AS df FROM tf_t GROUP BY 1),
         n_t AS (SELECT COUNT(*) AS n_corpus FROM documents),
         sc AS (SELECT tf_t.doc_id, tf_t.token, tf_t.tf, df_t.df,
                  ROUND(tf_t.tf * ln(CAST(n_t.n_corpus AS DOUBLE) / df_t.df), 6)
                    AS tfidf
                FROM tf_t JOIN df_t USING (token) CROSS JOIN n_t),
         r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                 ORDER BY tfidf DESC, token) AS rank FROM sc)
         SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           tfidf, CAST(rank AS BIGINT) AS rank
         FROM r WHERE rank <= 3 ORDER BY doc_id, rank""",

    // winnowing (k=4 word grams, window w=4): distinct per-window minimum
    // gram hashes; boundary case: fewer than w grams -> one whole-list window
    "text_winnow" ->
      raw"""WITH w AS (SELECT doc_id,
              list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                          x -> len(x) > 0) AS ws
            FROM documents),
         g AS (SELECT doc_id,
              list_transform(range(1, greatest(len(ws) - 2, 1)),
                i -> CAST('0x' || substr(md5(ws[i] || ' ' || ws[i+1] || ' ' ||
                          ws[i+2] || ' ' || ws[i+3]), 1, 15) AS BIGINT)) AS gh
            FROM w WHERE len(ws) >= 4),
         m AS (SELECT doc_id,
              list_distinct(list_transform(range(1, greatest(len(gh) - 3, 1) + 1),
                j -> list_min(gh[j:j+3]))) AS fps
            FROM g)
         SELECT doc_id, unnest(fps) AS fp FROM m ORDER BY doc_id, fp""",

    // cross-document duplicated 5-gram spans (multiplicity preserved;
    // "duplicated" = the span text occurs in >= 2 distinct docs)
    "dedup_dupspan" ->
      raw"""WITH w AS (SELECT doc_id,
              list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                          x -> len(x) > 0) AS ws
            FROM documents),
         g AS (SELECT doc_id,
              CAST('0x' || substr(md5(gr), 1, 15) AS BIGINT) AS gram_h
            FROM (SELECT doc_id,
                    unnest(list_transform(range(1, greatest(len(ws) - 3, 1)),
                      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
                           ws[i+3] || ' ' || ws[i+4])) AS gr
                  FROM w)),
         pd AS (SELECT doc_id, gram_h, COUNT(*) AS c FROM g GROUP BY 1, 2),
         sh AS (SELECT gram_h FROM pd GROUP BY 1 HAVING COUNT(*) >= 2),
         dd AS (SELECT pd.doc_id, SUM(pd.c) AS dup_spans
                FROM pd JOIN sh USING (gram_h) GROUP BY 1)
         SELECT w.doc_id,
           CAST(GREATEST(len(ws) - 4, 0) AS BIGINT) AS n_spans,
           CAST(COALESCE(dd.dup_spans, 0) AS BIGINT) AS dup_spans,
           CASE WHEN len(ws) > 4 THEN
             ROUND(CAST(COALESCE(dd.dup_spans, 0) AS DOUBLE) / (len(ws) - 4), 6)
           END AS dup_frac
         FROM w LEFT JOIN dd USING (doc_id) ORDER BY doc_id""",

    // ExactSubstr trim: duplicated >=5-word spans removed, corpus-first
    // occurrence (min doc_id, pos) kept; coverage = any duplicated span
    // start within the previous 4 positions
    "dedup_substr_trim" ->
      raw"""WITH w AS (SELECT doc_id,
              list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                          x -> len(x) > 0) AS ws
            FROM documents),
         e AS (SELECT doc_id, len(ws) AS nw,
                 unnest(range(1, len(ws) + 1)) AS pos, ws
               FROM w WHERE len(ws) > 0),
         t AS (SELECT doc_id, nw, pos, ws[pos] AS word,
                 CASE WHEN pos <= nw - 4 THEN
                   CAST('0x' || substr(md5(ws[pos] || ' ' || ws[pos+1] || ' ' ||
                     ws[pos+2] || ' ' || ws[pos+3] || ' ' || ws[pos+4]), 1, 15)
                     AS BIGINT)
                 END AS gh
               FROM e),
         r AS (SELECT doc_id, pos, word,
                 CASE WHEN gh IS NOT NULL AND
                   ROW_NUMBER() OVER (PARTITION BY gh ORDER BY doc_id, pos) > 1
                 THEN 1 ELSE 0 END AS dup
               FROM t),
         c AS (SELECT doc_id, pos, word,
                 MAX(dup) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                   AS covered
               FROM r)
         SELECT doc_id,
           COALESCE(string_agg(word, ' ' ORDER BY pos)
                      FILTER (WHERE covered = 0), '') AS text_trimmed,
           COUNT(*) AS n_words, CAST(SUM(covered) AS BIGINT) AS n_dropped
         FROM c GROUP BY 1 ORDER BY 1""",

    // Naive Bayes seed classifier: add-one smoothing, denominators factored
    // into the |d| mass term so unseen tokens contribute exactly 0
    "quality_classifier_nb" ->
      raw"""WITH w AS (SELECT doc_id, source,
              list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                          x -> len(x) > 0) AS ws
            FROM documents),
         lab AS (SELECT doc_id, ws,
                   CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS label
                 FROM w WHERE doc_id % 2 = 0),
         ltok AS (SELECT label, unnest(ws) AS token FROM lab),
         model AS (SELECT token,
                     SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS c0,
                     SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS c1
                   FROM ltok GROUP BY 1),
         st AS (SELECT SUM(c0) AS n0, SUM(c1) AS n1, COUNT(*) AS v FROM model),
         dc AS (SELECT SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS d0,
                       SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS d1
                FROM lab),
         tf AS (SELECT doc_id, token, COUNT(*) AS tf
                FROM (SELECT doc_id, unnest(ws) AS token FROM w) GROUP BY 1, 2),
         seen AS (SELECT tf.doc_id,
                    SUM(tf.tf * (ln(m.c1 + 1.0) - ln(m.c0 + 1.0))) AS s
                  FROM tf JOIN model m USING (token) GROUP BY 1),
         sc AS (SELECT w.doc_id, CAST(len(w.ws) AS BIGINT) AS n_tokens,
                  ROUND(ln(CAST(dc.d1 AS DOUBLE) / dc.d0)
                        + COALESCE(seen.s, 0.0)
                        + len(w.ws) * (ln(CAST(st.n0 + st.v AS DOUBLE))
                                       - ln(CAST(st.n1 + st.v AS DOUBLE))), 6)
                    AS score
                FROM w LEFT JOIN seen USING (doc_id) CROSS JOIN st CROSS JOIN dc)
         SELECT doc_id, n_tokens, score,
           CAST(CASE WHEN score > 0 THEN 1 ELSE 0 END AS BIGINT) AS pred
         FROM sc ORDER BY doc_id""",

    // decontamination: distinct word 5-grams; bench = every 10th doc.
    // docs shorter than 5 tokens have no shingles (absent from overlap,
    // always clean)
    "decontam_overlap" ->
      raw"""WITH ws_t AS (SELECT doc_id,
              list_filter(regexp_split_to_array(trim(text), '\s+'), w -> len(w) > 0) AS ws
            FROM documents),
         sh5 AS (SELECT DISTINCT doc_id,
              unnest(list_transform(range(1, greatest(len(ws) - 3, 1)),
                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS shingle
            FROM ws_t WHERE len(ws) >= 5),
         bench AS (SELECT DISTINCT shingle FROM sh5 WHERE doc_id % 10 = 0),
         train AS (SELECT * FROM sh5 WHERE doc_id % 10 <> 0),
         sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM train GROUP BY 1),
         hits AS (SELECT doc_id, COUNT(*) AS n_hit
                  FROM train JOIN bench USING (shingle) GROUP BY 1)
         SELECT s.doc_id, CAST(s.n_sh AS BIGINT) AS n_sh,
           CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
           ROUND(CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / s.n_sh, 6) AS hit_frac
         FROM sizes s LEFT JOIN hits h USING (doc_id) ORDER BY s.doc_id""",

    "decontam_clean" ->
      raw"""WITH ws_t AS (SELECT doc_id,
              list_filter(regexp_split_to_array(trim(text), '\s+'), w -> len(w) > 0) AS ws
            FROM documents),
         sh5 AS (SELECT DISTINCT doc_id,
              unnest(list_transform(range(1, greatest(len(ws) - 3, 1)),
                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS shingle
            FROM ws_t WHERE len(ws) >= 5),
         bench AS (SELECT DISTINCT shingle FROM sh5 WHERE doc_id % 10 = 0),
         contaminated AS (SELECT DISTINCT t.doc_id
                          FROM sh5 t JOIN bench USING (shingle)
                          WHERE t.doc_id % 10 <> 0)
         SELECT doc_id, source FROM documents d
         WHERE doc_id % 10 <> 0
           AND NOT EXISTS (SELECT 1 FROM contaminated c WHERE c.doc_id = d.doc_id)
         ORDER BY doc_id""",

    "dedup_cross_corpus" ->
      """SELECT doc_id, source FROM documents a
         WHERE source <> 'src0'
           AND NOT EXISTS (SELECT 1 FROM documents b WHERE b.source = 'src0'
                           AND md5(substr(b.text, 1, 30)) = md5(substr(a.text, 1, 30)))
         ORDER BY doc_id""",

    // the Bloom filter replayed exactly: b's set bits as a position set,
    // a's k salted probes counted against it (pos IN over a set with no
    // match yields NULL for null keys → excluded by FILTER, matching the
    // Spark side's coalesce(..., false))
    "dedup_bloom" ->
      """WITH bpos AS (
           SELECT DISTINCT (CAST('0x' || substr(md5(CAST(t.i AS VARCHAR) || ':'
                    || md5(substr(b.text, 1, 30))), 1, 15) AS BIGINT) % 1024) AS pos
           FROM documents b, range(3) t(i) WHERE b.source = 'src0'),
         cand AS (
           SELECT a.doc_id, a.source,
             (CAST('0x' || substr(md5(CAST(t.i AS VARCHAR) || ':'
                || md5(substr(a.text, 1, 30))), 1, 15) AS BIGINT) % 1024) AS pos
           FROM documents a, range(3) t(i) WHERE a.source <> 'src0')
         SELECT doc_id, source,
           (COUNT(*) FILTER (WHERE pos IN (SELECT pos FROM bpos)) = 3) AS possibly_dup
         FROM cand GROUP BY doc_id, source ORDER BY doc_id""",

    // PII: identical injected trailer; counts on the progressively redacted
    // text (stage i counts pattern i after patterns < i replaced), mirroring
    // Redact.piiStats' scanLeft
    "text_pii_redact" ->
      raw"""WITH p AS (SELECT doc_id,
              text || ' contact u' || CAST(doc_id AS VARCHAR)
                   || '@example.com ip 10.0.0.' || CAST(doc_id % 256 AS VARCHAR)
                   || ' ssn 123-45-678' || CAST(doc_id % 10 AS VARCHAR)
                   || ' tel +15550000' || CAST(doc_id % 100 AS VARCHAR) AS t0
            FROM documents),
         s0 AS (SELECT doc_id, t0,
              len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
              regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
            FROM p),
         s1 AS (SELECT doc_id, n_email,
              len(regexp_extract_all(t1, '\b\d{3}-\d{2}-\d{4}\b')) AS n_ssn,
              regexp_replace(t1, '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g') AS t2
            FROM s0),
         s2 AS (SELECT doc_id, n_email, n_ssn,
              len(regexp_extract_all(t2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
              regexp_replace(t2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t3
            FROM s1),
         s3 AS (SELECT doc_id, n_email, n_ssn, n_ipv4,
              len(regexp_extract_all(t3, '\+\d{9,15}\b')) AS n_phone,
              regexp_replace(t3, '\+\d{9,15}\b', '<PHONE>', 'g') AS t4
            FROM s2)
         SELECT doc_id, CAST(n_email AS BIGINT) AS n_email,
           CAST(n_ssn AS BIGINT) AS n_ssn, CAST(n_ipv4 AS BIGINT) AS n_ipv4,
           CAST(n_phone AS BIGINT) AS n_phone, md5(t4) AS redacted_md5,
           CAST(n_email + n_ssn + n_ipv4 + n_phone AS BIGINT) AS n_pii
         FROM s3 ORDER BY doc_id""",

    "vocab_topk" ->
      raw"""WITH w AS (SELECT doc_id,
              unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                     x -> len(x) > 0)) AS token
            FROM documents),
         agg AS (SELECT token, COUNT(*) AS n_total, COUNT(DISTINCT doc_id) AS n_docs
                 FROM w GROUP BY 1),
         r AS (SELECT token, n_total, n_docs,
                 ROW_NUMBER() OVER (ORDER BY n_total DESC, token) AS rank
               FROM agg)
         SELECT token, CAST(n_total AS BIGINT) AS n_total,
           CAST(n_docs AS BIGINT) AS n_docs, CAST(rank AS BIGINT) AS rank
         FROM r WHERE rank <= 50 ORDER BY rank""",

    // the Count-Min sketch replayed exactly: one 60-bit md5 per token, row r
    // reads its disjoint 5-bit slice (h >> 5r) % 32; estimates = min over
    // the probed cells
    "vocab_cms" ->
      raw"""WITH w AS (SELECT doc_id,
              unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                     x -> len(x) > 0)) AS token
            FROM documents),
         cells AS (SELECT t.i AS r,
              ((${h64("token")} >> (5 * t.i)) % 32) AS c,
              COUNT(*) AS n
            FROM w, range(4) t(i) GROUP BY 1, 2),
         agg AS (SELECT token, COUNT(*) AS n_total FROM w GROUP BY 1),
         top AS (SELECT token, n_total,
                   ROW_NUMBER() OVER (ORDER BY n_total DESC, token) AS rank
                 FROM agg),
         probes AS (SELECT token, n_total, rank, t.i AS r,
              ((${h64("token")} >> (5 * t.i)) % 32) AS c
            FROM top, range(4) t(i) WHERE rank <= 50)
         SELECT p.token, CAST(p.n_total AS BIGINT) AS n_total,
           CAST(MIN(cells.n) AS BIGINT) AS n_cms,
           CAST(MIN(cells.n) - p.n_total AS BIGINT) AS overcount,
           CAST(p.rank AS BIGINT) AS rank
         FROM probes p JOIN cells ON p.r = cells.r AND p.c = cells.c
         GROUP BY p.token, p.n_total, p.rank ORDER BY rank""",

    // the HLL registers replayed exactly: bucket = low 6 bits of the 60-bit
    // md5, rank via the shared bin/lpad/ltrim leading-zero route, harmonic
    // sum in integer arithmetic (order-independent); the one double division
    // uses the identical scaled-alpha constant on both engines
    "corpus_distinct_hll" -> {
      val c = 0.709 * 64 * 64 * math.pow(2.0, 55) // alpha_64 * m^2 * 2^(p+1)
      raw"""WITH ws_t AS (SELECT source,
              list_filter(regexp_split_to_array(trim(text), '\s+'), w -> len(w) > 0) AS ws
            FROM documents),
         sh AS (SELECT source,
              unnest(list_transform(range(1, greatest(len(ws) - 3, 1)),
                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS shingle
            FROM ws_t WHERE len(ws) >= 5),
         hv AS (SELECT source, shingle, ${h64("shingle")} AS h FROM sh),
         regs AS (SELECT source, h % 64 AS bucket,
              MAX(55 - length(ltrim(lpad(bin(h // 64), 54, '0'), '0'))) AS r
            FROM hv GROUP BY 1, 2),
         agg AS (SELECT source, COUNT(*) AS nb,
              SUM(1::BIGINT << (55 - r)) AS s_present FROM regs GROUP BY 1),
         est AS (SELECT source, (64 - nb) AS v,
              s_present + (64 - nb) * (1::BIGINT << 55) AS s FROM agg),
         fin AS (SELECT source,
              CASE WHEN ($c / s) <= 160.0 AND v > 0
                   THEN 64.0 * ln(64.0 / v) ELSE $c / s END AS e FROM est),
         ex AS (SELECT source, COUNT(DISTINCT shingle) AS n_exact FROM sh GROUP BY 1)
         SELECT f.source, CAST(ex.n_exact AS BIGINT) AS n_exact,
           ROUND(e, 6) AS n_hll,
           ROUND((e - ex.n_exact) / ex.n_exact * 100, 6) AS err_pct
         FROM fin f JOIN ex ON f.source = ex.source ORDER BY f.source"""
    },

    // exact interpolated percentiles: Spark `percentile` and DuckDB
    // `quantile_cont` share the p*(n-1) linear-interpolation definition
    "corpus_length_stats" ->
      """SELECT source, COUNT(*) AS n,
           ROUND(AVG(n_chars), 6) AS mean_chars,
           ROUND(quantile_cont(n_chars, 0.5), 6) AS p50,
           ROUND(quantile_cont(n_chars, 0.9), 6) AS p90,
           ROUND(quantile_cont(n_chars, 0.99), 6) AS p99
         FROM documents GROUP BY 1 ORDER BY 1""",

    // per-source unigram divergence on observed support: ln of integer
    // ratios summed per group, rounded to 6dp (the crossEntropy discipline)
    "corpus_divergence" ->
      raw"""WITH tok AS (SELECT source AS grp,
              unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                     x -> len(x) > 0)) AS w
            FROM documents),
         cg AS (SELECT grp, w, COUNT(*) AS c_g FROM tok GROUP BY 1, 2),
         gl AS (SELECT w, COUNT(*) AS c_w FROM tok GROUP BY 1),
         nv AS (SELECT CAST(SUM(c_w) AS BIGINT) AS n_tot,
                       CAST(COUNT(*) AS BIGINT) AS v FROM gl),
         j AS (SELECT cg.grp, cg.c_g, gl.c_w,
                 SUM(cg.c_g) OVER (PARTITION BY cg.grp) AS n_g
               FROM cg JOIN gl USING (w)),
         t AS (SELECT grp, n_g,
                 -(CAST(c_g AS DOUBLE) / n_g)
                   * ln((c_w + 1) / CAST(nv.n_tot + nv.v AS DOUBLE)) AS hx,
                 -(CAST(c_g AS DOUBLE) / n_g)
                   * ln(CAST(c_g AS DOUBLE) / n_g) AS h
               FROM j CROSS JOIN nv)
         SELECT grp AS source, CAST(MAX(n_g) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_types,
           ROUND(SUM(hx), 6) AS cross_entropy,
           ROUND(SUM(h), 6) AS entropy,
           ROUND(SUM(hx) - SUM(h), 6) AS kl
         FROM t GROUP BY 1 ORDER BY 1""",

    // fixed-bin quantile sketch vs exact rank selection — all integer:
    // bin = clamp((x·32) // 1024), target = ceil(p·N/100) by int division,
    // estimate = selected bin's integer midpoint
    "corpus_quantile_sketch" ->
      """WITH k AS (SELECT source AS grp, n_chars AS x FROM documents),
         c AS (SELECT grp,
             LEAST(GREATEST((x * 32) // 1024, 0), 31) AS bin, COUNT(*) AS n
           FROM k GROUP BY 1, 2),
         cc AS (SELECT grp, bin, n,
             SUM(n) OVER (PARTITION BY grp ORDER BY bin) AS cum,
             SUM(n) OVER (PARTITION BY grp) AS ntot
           FROM c),
         ps AS (SELECT unnest([50, 90, 99]) AS p),
         est AS (SELECT cc.grp, ps.p, MIN(cc.bin) AS qbin
           FROM cc CROSS JOIN ps
           WHERE cc.cum >= (cc.ntot * ps.p + 99) // 100
           GROUP BY 1, 2),
         r AS (SELECT grp, x,
             ROW_NUMBER() OVER (PARTITION BY grp ORDER BY x) AS rn,
             COUNT(*) OVER (PARTITION BY grp) AS ntot
           FROM k),
         ex AS (SELECT r.grp, ps.p, r.ntot AS n, r.x AS exact_q
           FROM r CROSS JOIN ps
           WHERE r.rn = (r.ntot * ps.p + 99) // 100)
         SELECT ex.grp AS source, CAST(ex.p AS BIGINT) AS p,
           CAST(ex.n AS BIGINT) AS n, ex.exact_q,
           ((2 * est.qbin + 1) * 1024) // 64 AS est_q,
           ((2 * est.qbin + 1) * 1024) // 64 - ex.exact_q AS err
         FROM ex JOIN est ON ex.grp = est.grp AND ex.p = est.p
         ORDER BY source, p""",

    // deterministic sampling: the salted 60-bit md5 hash line (see
    // Sampling.scala; 1152921504606846976 = 2^60)
    "sample_stratified" ->
      """SELECT doc_id, lang FROM (
           SELECT doc_id, lang, ROW_NUMBER() OVER (PARTITION BY lang
             ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':strat'), 1, 15) AS BIGINT),
                      doc_id) AS rn
           FROM documents)
         WHERE rn <= 5 ORDER BY lang, doc_id""",

    "sample_weighted" ->
      """SELECT doc_id, source FROM documents
         WHERE CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':sample'), 1, 15) AS BIGINT) AS DOUBLE)
               / 1152921504606846976.0
             < (CASE WHEN source = 'src0' THEN 1.0
                     WHEN source = 'src1' THEN 0.5 ELSE 0.1 END)
         ORDER BY doc_id""",

    // mirrors TrainingPrep.prepare stage for stage: dedup keep-set,
    // 5-gram decontamination vs the %10 bench set, the shared quality
    // formula over lowered tokens, then the per-source budget window
    "pipeline_training_prep" ->
      raw"""WITH keep AS (SELECT MIN(doc_id) AS doc_id
              FROM documents GROUP BY md5(substr(text, 1, 50))),
         d AS (SELECT doc.doc_id, doc.source, doc.text
               FROM documents doc JOIN keep ON doc.doc_id = keep.doc_id),
         ws_all AS (SELECT doc_id,
              list_filter(regexp_split_to_array(trim(text), '\s+'), w -> len(w) > 0) AS ws
            FROM documents),
         sh_b AS (SELECT DISTINCT
              unnest(list_transform(range(1, greatest(len(ws) - 3, 1)),
                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS shingle
            FROM ws_all WHERE len(ws) >= 5 AND doc_id % 10 = 0),
         ws_d AS (SELECT d.doc_id,
              list_filter(regexp_split_to_array(trim(d.text), '\s+'), w -> len(w) > 0) AS ws
            FROM d),
         sh_d AS (SELECT DISTINCT doc_id,
              unnest(list_transform(range(1, greatest(len(ws) - 3, 1)),
                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS shingle
            FROM ws_d WHERE len(ws) >= 5),
         contaminated AS (SELECT DISTINCT doc_id FROM sh_d JOIN sh_b USING (shingle)),
         clean AS (SELECT * FROM d
                   WHERE NOT EXISTS (SELECT 1 FROM contaminated c WHERE c.doc_id = d.doc_id)),
         q AS (SELECT doc_id, source,
              len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                              w -> len(w) > 0)) AS n_tok,
              ROUND((CASE WHEN len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), w -> len(w) > 0)) BETWEEN 20 AND 1000 THEN 1.0
                          WHEN len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), w -> len(w) > 0)) >= 5 THEN 0.5 ELSE 0.0 END) * 0.3
                + (CAST(len(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
                   / greatest(len(text), 1)) * 0.3
                + (CAST(len(list_distinct(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), w -> len(w) > 0))) AS DOUBLE)
                   / greatest(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), w -> len(w) > 0)), 1)) * 0.2
                + (CASE WHEN CAST(list_sum(list_transform(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), w -> len(w) > 0), x -> len(x))) AS DOUBLE)
                        / greatest(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), w -> len(w) > 0)), 1) BETWEEN 3 AND 10
                        THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS quality,
              CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':budget'), 1, 15) AS BIGINT) AS h
            FROM clean),
         f AS (SELECT * FROM q WHERE quality >= 0.5),
         c AS (SELECT doc_id, source, n_tok, quality,
              SUM(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum
            FROM f)
         SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           ROUND(AVG(quality), 6) AS avg_quality
         FROM c WHERE cum <= 1000 GROUP BY 1 ORDER BY 1""",

    "pipeline_training_pack" ->
      raw"""WITH keep AS (SELECT MIN(doc_id) AS doc_id
              FROM documents GROUP BY md5(substr(text, 1, 50))),
         d AS (SELECT doc.doc_id, doc.source, doc.text
               FROM documents doc JOIN keep ON doc.doc_id = keep.doc_id),
         ws_all AS (SELECT doc_id,
              list_filter(regexp_split_to_array(trim(text), '\s+'), w -> len(w) > 0) AS ws
            FROM documents),
         sh_b AS (SELECT DISTINCT
              unnest(list_transform(range(1, greatest(len(ws) - 3, 1)),
                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS shingle
            FROM ws_all WHERE len(ws) >= 5 AND doc_id % 10 = 0),
         ws_d AS (SELECT d.doc_id,
              list_filter(regexp_split_to_array(trim(d.text), '\s+'), w -> len(w) > 0) AS ws
            FROM d),
         sh_d AS (SELECT DISTINCT doc_id,
              unnest(list_transform(range(1, greatest(len(ws) - 3, 1)),
                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS shingle
            FROM ws_d WHERE len(ws) >= 5),
         contaminated AS (SELECT DISTINCT doc_id FROM sh_d JOIN sh_b USING (shingle)),
         clean AS (SELECT * FROM d
                   WHERE NOT EXISTS (SELECT 1 FROM contaminated c WHERE c.doc_id = d.doc_id)),
         q AS (SELECT doc_id, source,
              len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                              w -> len(w) > 0)) AS n_tok,
              ROUND((CASE WHEN len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), w -> len(w) > 0)) BETWEEN 20 AND 1000 THEN 1.0
                          WHEN len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), w -> len(w) > 0)) >= 5 THEN 0.5 ELSE 0.0 END) * 0.3
                + (CAST(len(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
                   / greatest(len(text), 1)) * 0.3
                + (CAST(len(list_distinct(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), w -> len(w) > 0))) AS DOUBLE)
                   / greatest(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), w -> len(w) > 0)), 1)) * 0.2
                + (CASE WHEN CAST(list_sum(list_transform(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), w -> len(w) > 0), x -> len(x))) AS DOUBLE)
                        / greatest(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), w -> len(w) > 0)), 1) BETWEEN 3 AND 10
                        THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS quality,
              CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':budget'), 1, 15) AS BIGINT) AS h
            FROM clean),
         f AS (SELECT * FROM q WHERE quality >= 0.5),
         c AS (SELECT doc_id, source, n_tok,
              SUM(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum
            FROM f),
         kept AS (SELECT doc_id, source, n_tok FROM c WHERE cum <= 1000),
         pk AS (SELECT doc_id, source, n_tok,
              CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':pack'), 1, 15) AS BIGINT) AS ph
            FROM kept WHERE n_tok > 0),
         pc AS (SELECT doc_id, source, n_tok,
              CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY ph, doc_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS e
            FROM pk),
         px AS (SELECT doc_id, source, e, e - n_tok AS st,
              unnest(generate_series((e - n_tok) // 128, (e - 1) // 128)) AS seq_id
            FROM pc)
         SELECT source, seq_id, COUNT(*) AS n_docs,
           CAST(SUM(LEAST(e, (seq_id + 1) * 128) - GREATEST(st, seq_id * 128)) AS BIGINT) AS n_tokens,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
         FROM px GROUP BY 1, 2 ORDER BY 1, 2""",

    // DSIR votes replayed with the same exact cross-multiplication
    // (HUGEINT there, decimal(38,0) in Spark — both exact at this width)
    "sample_importance" ->
      s"""WITH $wsSql,
         tgt AS (SELECT doc_id, ws FROM ws_t WHERE doc_id % 10 = 0),
         tw AS (SELECT ${h64("w")} % 64 AS b
                FROM (SELECT unnest(ws) AS w FROM tgt)),
         tc AS (SELECT b, COUNT(*) AS c_t FROM tw GROUP BY 1),
         sw AS (SELECT doc_id, ${h64("w")} % 64 AS b
                FROM (SELECT doc_id, unnest(ws) AS w FROM ws_t)),
         scn AS (SELECT b, COUNT(*) AS c_s FROM sw GROUP BY 1),
         tot AS (SELECT (SELECT COALESCE(SUM(len(ws)), 0) FROM tgt) AS t_t,
                        (SELECT COALESCE(SUM(len(ws)), 0) FROM ws_t) AS t_s),
         bins AS (SELECT COALESCE(tc.b, scn.b) AS b,
             CASE WHEN CAST(COALESCE(c_t, 0) + 1 AS HUGEINT) * (t_s + 64)
                     > CAST(COALESCE(c_s, 0) + 1 AS HUGEINT) * (t_t + 64) THEN 1
                  WHEN CAST(COALESCE(c_t, 0) + 1 AS HUGEINT) * (t_s + 64)
                     < CAST(COALESCE(c_s, 0) + 1 AS HUGEINT) * (t_t + 64) THEN -1
                  ELSE 0 END AS vote
           FROM tc FULL OUTER JOIN scn ON tc.b = scn.b CROSS JOIN tot),
         scored AS (SELECT doc_id, CAST(SUM(vote) AS BIGINT) AS score
                    FROM sw JOIN bins USING (b) GROUP BY 1)
         SELECT doc_id, score FROM scored
         ORDER BY score DESC, doc_id LIMIT 100""",

    "sample_token_budget" ->
      raw"""WITH t AS (SELECT doc_id, source,
              len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                              w -> len(w) > 0)) AS n_tok,
              CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':budget'), 1, 15) AS BIGINT) AS h
            FROM documents),
         c AS (SELECT doc_id, source, n_tok,
              SUM(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum
            FROM t)
         SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
         FROM c WHERE cum <= 500 GROUP BY 1 ORDER BY 1""",

    // Dialect-hardened (r11): every aggregate is CAST to BIGINT at first
    // use, so no HUGEINT reaches //, %, or the OUTPUT — DuckDB's
    // SUM(BIGINT) promotes to HUGEINT, and the r9/r10 driver-red pattern
    // (rows/schema match, hash mismatch, passes bit-for-bit locally) fits
    // a HUGEINT value-rendering divergence in the driver's compare, not a
    // value difference: the old final SELECT emitted cum_tok as the raw
    // window SUM (HUGEINT), the one uncast aggregate output among all 141
    // oracles. The first-failing-position pull is MIN/MAX(CASE…) OVER ()
    // window reads — the Spark side's own shape (Sampling.scala:246-252) —
    // instead of the `CROSS JOIN f LEFT JOIN fr ON TRUE` fan-out. Bisect
    // companion: sample_unimax_alloc carries the 5-row waterfill alone.
    "sample_unimax" ->
      raw"""WITH t AS (SELECT doc_id, lang,
              CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                              w -> len(w) > 0)) AS BIGINT) AS n_tok,
              CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':unimax'), 1, 15) AS BIGINT) AS h
            FROM documents),
         l AS (SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS n_tok_lang,
                      CAST(SUM(n_tok) AS BIGINT) * 2 AS cap FROM t GROUP BY 1),
         s AS (SELECT *,
                 ROW_NUMBER() OVER (ORDER BY cap, lang) AS k,
                 CAST(COALESCE(SUM(cap) OVER (ORDER BY cap, lang
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cumprev,
                 CAST(COUNT(*) OVER () AS BIGINT) AS m
               FROM l),
         lv AS (SELECT *,
                  CAST((40000 - cumprev) // (m - k + 1) AS BIGINT) AS level
                FROM s),
         fl AS (SELECT *, MIN(CASE WHEN cap > level THEN k END) OVER () AS fk
                FROM lv),
         fr AS (SELECT *,
                  MAX(CASE WHEN k = fk THEN level END) OVER () AS flevel,
                  MAX(CASE WHEN k = fk
                           THEN CAST((40000 - cumprev) % (m - k + 1) AS BIGINT)
                      END) OVER () AS frem
                FROM fl),
         a AS (SELECT lang, n_tok_lang,
                 CAST(CASE WHEN fk IS NULL OR k < fk THEN cap
                      ELSE flevel +
                           CASE WHEN k - fk < frem THEN 1 ELSE 0 END
                 END AS BIGINT) AS alloc
               FROM fr),
         c AS (SELECT t.doc_id, t.lang, t.n_tok,
                 CAST(SUM(t.n_tok) OVER (PARTITION BY t.lang ORDER BY t.h, t.doc_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok,
                 a.alloc,
                 CAST((a.alloc * 1000000) // a.n_tok_lang AS BIGINT) AS epochs_micro
               FROM t JOIN a USING (lang))
         SELECT doc_id, lang, n_tok, cum_tok, alloc, epochs_micro
         FROM c WHERE cum_tok <= alloc ORDER BY doc_id""",

    // The waterfill frame alone (one row per language): if sample_unimax
    // goes red in the driver while this stays green, the divergence is in
    // the doc-level prefix-truncation stage; if this goes red too, the
    // culprit column is named by the 5-row diff. Same hardened dialect.
    "sample_unimax_alloc" ->
      raw"""WITH t AS (SELECT lang,
              CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                              w -> len(w) > 0)) AS BIGINT) AS n_tok
            FROM documents),
         l AS (SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS n_tok_lang,
                      CAST(SUM(n_tok) AS BIGINT) * 2 AS cap FROM t GROUP BY 1),
         s AS (SELECT *,
                 ROW_NUMBER() OVER (ORDER BY cap, lang) AS k,
                 CAST(COALESCE(SUM(cap) OVER (ORDER BY cap, lang
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cumprev,
                 CAST(COUNT(*) OVER () AS BIGINT) AS m
               FROM l),
         lv AS (SELECT *,
                  CAST((40000 - cumprev) // (m - k + 1) AS BIGINT) AS level
                FROM s),
         fl AS (SELECT *, MIN(CASE WHEN cap > level THEN k END) OVER () AS fk
                FROM lv),
         fr AS (SELECT *,
                  MAX(CASE WHEN k = fk THEN level END) OVER () AS flevel,
                  MAX(CASE WHEN k = fk
                           THEN CAST((40000 - cumprev) % (m - k + 1) AS BIGINT)
                      END) OVER () AS frem
                FROM fl),
         a AS (SELECT lang, n_tok_lang, cap,
                 CAST(CASE WHEN fk IS NULL OR k < fk THEN cap
                      ELSE flevel +
                           CASE WHEN k - fk < frem THEN 1 ELSE 0 END
                 END AS BIGINT) AS alloc
               FROM fr)
         SELECT lang, n_tok_lang, cap, alloc,
           CAST((alloc * 1000000) // n_tok_lang AS BIGINT) AS epochs_micro
         FROM a ORDER BY lang""",

    // α=1/2 temperature allocations: exact isqrt (double estimate + ±1
    // integer fixup), HUGEINT share arithmetic, largest-remainder +1s —
    // every step integer, so the apportionment replays bit-for-bit
    "sample_temperature" ->
      raw"""WITH w AS (SELECT lang,
              len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                              x -> len(x) > 0)) AS n_tok
            FROM documents),
         c AS (SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS n_tok_lang
               FROM w GROUP BY 1),
         s0 AS (SELECT lang, n_tok_lang,
             CAST(FLOOR(SQRT(CAST(n_tok_lang AS DOUBLE))) AS BIGINT) AS r0
           FROM c),
         s1 AS (SELECT lang, n_tok_lang,
             CASE WHEN r0 * r0 > n_tok_lang THEN r0 - 1 ELSE r0 END AS r1
           FROM s0),
         wt AS (SELECT lang, n_tok_lang,
             CASE WHEN n_tok_lang > 0 THEN
               CASE WHEN (r1 + 1) * (r1 + 1) <= n_tok_lang THEN r1 + 1 ELSE r1 END
             ELSE 0 END AS weight
           FROM s1),
         t AS (SELECT *, SUM(weight) OVER () AS wsum FROM wt),
         b AS (SELECT *,
             CASE WHEN wsum > 0 THEN
               CAST((CAST(40000 AS HUGEINT) * weight) // wsum AS BIGINT)
             ELSE 0 END AS base,
             CASE WHEN wsum > 0 THEN
               CAST((CAST(40000 AS HUGEINT) * weight) % wsum AS BIGINT)
             ELSE 0 END AS rem
           FROM t),
         e AS (SELECT *, 40000 - SUM(base) OVER () AS extras,
             ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS rk
           FROM b),
         a AS (SELECT lang, n_tok_lang, weight,
             base + CASE WHEN rk <= extras AND wsum > 0 THEN 1 ELSE 0 END
               AS alloc
           FROM e)
         SELECT lang, n_tok_lang, weight, CAST(alloc AS BIGINT) AS alloc,
           CASE WHEN n_tok_lang > 0 THEN
             CAST((alloc * 1000000) // n_tok_lang AS BIGINT) END AS epochs_micro
         FROM a ORDER BY lang""",

    // mirrors Sampling.splitByGroup: the unit hash on the SOURCE key, so
    // every doc of a source shares a split label
    "split_group_disjoint" ->
      """WITH u AS (SELECT doc_id, source,
             CAST(CAST('0x' || substr(md5(source || ':gsplit'), 1, 15) AS BIGINT) AS DOUBLE)
               / 1152921504606846976.0 AS pos
           FROM documents)
         SELECT CASE WHEN pos < 0.6 THEN 'train'
                     WHEN pos < 0.8 THEN 'val' ELSE 'test' END AS split,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS id_sum
         FROM u GROUP BY 1 ORDER BY 1""",

    "split_train_val" ->
      """WITH u AS (SELECT doc_id,
             CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 15) AS BIGINT) AS DOUBLE)
               / 1152921504606846976.0 AS pos
           FROM documents)
         SELECT CASE WHEN pos < 0.8 THEN 'train'
                     WHEN pos < 0.9 THEN 'val' ELSE 'test' END AS split,
           COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum
         FROM u GROUP BY 1 ORDER BY 1""",

    "pipeline_domain_mix" ->
      raw"""WITH t AS (SELECT doc_id, source,
              len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                              w -> len(w) > 0)) AS n_tok,
              CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 15) AS BIGINT) AS h,
              CASE source WHEN 'src0' THEN 2000 WHEN 'src1' THEN 1000
                          WHEN 'src2' THEN 500 WHEN 'src3' THEN 500
                          ELSE 0 END AS b
            FROM documents),
         c AS (SELECT doc_id, source, n_tok, b,
              SUM(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum
            FROM t)
         SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
         FROM c WHERE cum <= b GROUP BY 1 ORDER BY 1""",

    "dedup_semantic" ->
      s"""WITH $embSql,
         cent AS (SELECT vec_id AS cid, v AS cv FROM e_t WHERE vec_id < 8),
         assign AS (
           SELECT vec_id, cid FROM (
             SELECT e_t.vec_id, cent.cid,
               ROW_NUMBER() OVER (PARTITION BY e_t.vec_id
                 ORDER BY ${cosSql("e_t.v", "cent.cv")} DESC, cent.cid) AS rn
             FROM e_t CROSS JOIN cent)
           WHERE rn = 1),
         assigned AS (
           SELECT e_t.vec_id, a.cid, e_t.v, ${cosSql("e_t.v", "cent.cv")} AS cent_sim
           FROM e_t JOIN assign a ON a.vec_id = e_t.vec_id
             JOIN cent ON cent.cid = a.cid),
         losers AS (
           SELECT DISTINCT a.vec_id
           FROM assigned a JOIN assigned b
             ON a.cid = b.cid AND a.vec_id <> b.vec_id
            AND (b.cent_sim < a.cent_sim
                 OR (b.cent_sim = a.cent_sim AND b.vec_id < a.vec_id))
           WHERE ${cosSql("a.v", "b.v")} >= 0.35)
         SELECT a.vec_id, a.cid, a.cent_sim,
           CASE WHEN l.vec_id IS NOT NULL THEN CAST(0 AS BIGINT)
                ELSE CAST(1 AS BIGINT) END AS kept
         FROM assigned a LEFT JOIN losers l ON l.vec_id = a.vec_id
         ORDER BY a.vec_id""",

    "bpe_train_merges" -> bpeOracle(8),
    "wordpiece_train_merges" -> wordpieceOracle(8),
    "search_mmr" -> mmrOracle(6, 50),
    "wordpiece_tokenize_stats" -> wordpieceTokenizeOracle(8),

    // unigram-LM trainer (Kudo 2018): seed -> 2 unrolled Baum-Welch rounds
    // (forward/backward lattices as recursive CTEs carrying the prefix
    // arrays; MATERIALIZED so recursion does not re-inline upstream CTEs)
    // -> prune+renorm; every sum is quantized-long so the replay is exact
    "tokenizer_unigram_train" ->
      (unigramOracleCore + "\nSELECT piece, p FROM vf ORDER BY piece"),

    // the unigram round trip: Viterbi piece counts per word (sequential
    // best-of-k fold unrolled as CASE chains, same tie policy as
    // Unigram.viterbiPieces), aggregated per document
    "tokenizer_unigram_stats" ->
      (unigramOracleCore + unigramViterbiSql),

    "bpe_tokenize_stats" -> bpeTokenizeOracle(8),

    "pipeline_pack_sequences" ->
      raw"""WITH t AS (SELECT doc_id, source,
              len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                              w -> len(w) > 0)) AS n_tok,
              CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':pack'), 1, 15) AS BIGINT) AS h
            FROM documents),
         c AS (SELECT doc_id, source, n_tok,
              CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS e
            FROM t WHERE n_tok > 0),
         x AS (SELECT doc_id, source, n_tok, e, e - n_tok AS st,
              unnest(generate_series((e - n_tok) // 200, (e - 1) // 200)) AS seq_id
            FROM c)
         SELECT source, seq_id, COUNT(*) AS n_docs,
           CAST(SUM(LEAST(e, (seq_id + 1) * 200) - GREATEST(st, seq_id * 200)) AS BIGINT) AS n_tokens,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
         FROM x GROUP BY 1, 2 ORDER BY 1, 2""",

    // chunk windows replayed exactly: starts = range(0, greatest(n-16, 1),
    // 48) (emit only windows adding unseen tokens; overlap = 64-48 = 16),
    // 1-based inclusive list slice, md5 of the space-joined window
    "text_chunk_windows" ->
      raw"""WITH t AS (SELECT doc_id,
              list_filter(regexp_split_to_array(trim(text), '\s+'),
                          w -> len(w) > 0) AS ws
            FROM documents),
         x AS (SELECT doc_id, ws, len(ws) AS n,
              unnest(range(0, greatest(len(ws) - 16, 1), 48)) AS tok_start
            FROM t WHERE len(ws) > 0)
         SELECT doc_id, CAST(tok_start // 48 AS BIGINT) AS chunk_idx,
           CAST(tok_start AS BIGINT) AS tok_start,
           CAST(LEAST(64, n - tok_start) AS BIGINT) AS n_tok,
           md5(array_to_string(ws[tok_start + 1 : tok_start + 64], ' ')) AS chunk_md5
         FROM x ORDER BY doc_id, chunk_idx""",

    "text_perplexity" ->
      raw"""WITH tok AS (SELECT doc_id,
              list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                          w -> len(w) > 0) AS ws
            FROM documents),
         idx AS (SELECT doc_id, ws,
              unnest(generate_series(1, len(ws) - 1)) AS i
            FROM tok WHERE len(ws) >= 2),
         pairs AS (SELECT doc_id, ws[i] AS a, ws[i + 1] AS b FROM idx),
         uni AS (SELECT w, COUNT(*) AS c_w
            FROM (SELECT unnest(ws) AS w FROM tok) GROUP BY 1),
         voc AS (SELECT COUNT(*) AS v FROM uni),
         big AS (SELECT a, b, COUNT(*) AS c_ab FROM pairs GROUP BY 1, 2),
         sc AS (SELECT p.doc_id,
              ln(CAST(COALESCE(big.c_ab, 0) + 1 AS DOUBLE) /
                 CAST(COALESCE(uni.c_w, 0) + (SELECT v FROM voc) AS DOUBLE)) AS lp
            FROM pairs p
            LEFT JOIN big ON big.a = p.a AND big.b = p.b
            LEFT JOIN uni ON uni.w = p.a)
         SELECT doc_id, COUNT(*) AS n_bigrams,
           ROUND(-AVG(lp), 6) AS cross_entropy
         FROM sc GROUP BY 1 ORDER BY 1""",

    // mirrors LanguageModel.pplBuckets: the text_perplexity replay with the
    // reference model trained on every 10th doc, then per-language NTILE
    // over (rounded cross-entropy, doc_id) — front-loaded-remainder tile
    // semantics are identical in Spark and DuckDB
    "sample_ppl_buckets" ->
      raw"""WITH tok AS (SELECT doc_id,
              list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                          w -> len(w) > 0) AS ws
            FROM documents),
         rtok AS (SELECT ws FROM tok WHERE doc_id % 10 = 0),
         idx AS (SELECT doc_id, ws,
              unnest(generate_series(1, len(ws) - 1)) AS i
            FROM tok WHERE len(ws) >= 2),
         pairs AS (SELECT doc_id, ws[i] AS a, ws[i + 1] AS b FROM idx),
         ridx AS (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
            FROM rtok WHERE len(ws) >= 2),
         uni AS (SELECT w, COUNT(*) AS c_w
            FROM (SELECT unnest(ws) AS w FROM rtok) GROUP BY 1),
         voc AS (SELECT COUNT(*) AS v FROM uni),
         big AS (SELECT ws[i] AS a, ws[i + 1] AS b, COUNT(*) AS c_ab
            FROM ridx GROUP BY 1, 2),
         sc AS (SELECT p.doc_id,
              ln(CAST(COALESCE(big.c_ab, 0) + 1 AS DOUBLE) /
                 CAST(COALESCE(uni.c_w, 0) + (SELECT v FROM voc) AS DOUBLE)) AS lp
            FROM pairs p
            LEFT JOIN big ON big.a = p.a AND big.b = p.b
            LEFT JOIN uni ON uni.w = p.a),
         ce AS (SELECT doc_id, ROUND(-AVG(lp), 6) AS cross_entropy
            FROM sc GROUP BY 1),
         l AS (SELECT d.lang, ce.doc_id, ce.cross_entropy,
              NTILE(3) OVER (PARTITION BY d.lang
                             ORDER BY ce.cross_entropy, ce.doc_id) AS bucket
            FROM ce JOIN documents d USING (doc_id))
         SELECT lang, CAST(bucket AS BIGINT) AS bucket,
           COUNT(*) AS n_docs,
           MIN(cross_entropy) AS min_ce, MAX(cross_entropy) AS max_ce,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
         FROM l GROUP BY 1, 2 ORDER BY 1, 2""",

    // mirrors the pipeline_ccnet composition: text_langid's detected
    // language feeds sample_ppl_buckets' NTILE, then head+middle (bucket
    // <= 2) selection aggregates per detected language
    "pipeline_ccnet" -> {
      val lex = TextAnalysis.stopwords.toSeq.sortBy(_._1).flatMap {
        case (lang, sw) => sw.map(w => s"('$lang', '$w')")
      }.mkString(", ")
      raw"""WITH lex(lang, word) AS (VALUES $lex),
         w AS (SELECT doc_id,
                 unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                        x -> len(x) > 0)) AS w
               FROM documents),
         votes AS (SELECT w.doc_id, l.lang, COUNT(*) AS votes
                   FROM w JOIN lex l ON w.w = l.word GROUP BY 1, 2),
         best AS (SELECT doc_id, lang,
                    ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY votes DESC, lang) AS rn
                  FROM votes),
         lid AS (SELECT d.doc_id, COALESCE(b.lang, 'und') AS pred_lang
                 FROM documents d
                 LEFT JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1),
         tok AS (SELECT doc_id,
              list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                          w -> len(w) > 0) AS ws
            FROM documents),
         rtok AS (SELECT ws FROM tok WHERE doc_id % 10 = 0),
         idx AS (SELECT doc_id, ws,
              unnest(generate_series(1, len(ws) - 1)) AS i
            FROM tok WHERE len(ws) >= 2),
         pairs AS (SELECT doc_id, ws[i] AS a, ws[i + 1] AS b FROM idx),
         ridx AS (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
            FROM rtok WHERE len(ws) >= 2),
         uni AS (SELECT w, COUNT(*) AS c_w
            FROM (SELECT unnest(ws) AS w FROM rtok) GROUP BY 1),
         voc AS (SELECT COUNT(*) AS v FROM uni),
         big AS (SELECT ws[i] AS a, ws[i + 1] AS b, COUNT(*) AS c_ab
            FROM ridx GROUP BY 1, 2),
         sc AS (SELECT p.doc_id,
              ln(CAST(COALESCE(big.c_ab, 0) + 1 AS DOUBLE) /
                 CAST(COALESCE(uni.c_w, 0) + (SELECT v FROM voc) AS DOUBLE)) AS lp
            FROM pairs p
            LEFT JOIN big ON big.a = p.a AND big.b = p.b
            LEFT JOIN uni ON uni.w = p.a),
         ce AS (SELECT doc_id, ROUND(-AVG(lp), 6) AS cross_entropy
            FROM sc GROUP BY 1),
         l AS (SELECT lid.pred_lang, ce.doc_id, ce.cross_entropy,
              NTILE(3) OVER (PARTITION BY lid.pred_lang
                             ORDER BY ce.cross_entropy, ce.doc_id) AS bucket
            FROM ce JOIN lid USING (doc_id)),
         pb AS (SELECT pred_lang, bucket, COUNT(*) AS n_docs,
                  MAX(cross_entropy) AS max_ce,
                  CAST(SUM(doc_id) AS BIGINT) AS id_sum
                FROM l GROUP BY 1, 2)
         SELECT pred_lang,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN bucket <= 2 THEN n_docs ELSE 0 END) AS BIGINT)
             AS n_kept,
           MAX(CASE WHEN bucket <= 2 THEN max_ce END) AS keep_ce_max,
           CAST(SUM(CASE WHEN bucket <= 2 THEN id_sum ELSE 0 END) AS BIGINT)
             AS id_sum_kept
         FROM pb GROUP BY 1 ORDER BY 1"""
    },

    "text_subword_stats" ->
      raw"""WITH s AS (SELECT doc_id,
              CASE WHEN text IS NULL THEN NULL
                   ELSE CAST(len(regexp_extract_all(text,
                     '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'))
                     AS BIGINT) END AS n_pieces,
              CASE WHEN text IS NULL THEN NULL
                   ELSE CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                             w -> len(w) > 0)) AS BIGINT) END AS n_words
            FROM documents)
         SELECT doc_id, n_pieces, n_words,
           CASE WHEN n_words > 0
                THEN ROUND(CAST(n_pieces AS DOUBLE) / n_words, 6) END AS fertility
         FROM s ORDER BY doc_id"""
  )
}
