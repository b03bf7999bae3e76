package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import TextPrep.hash64

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * New surface for the training-data pipeline (the reference's only ranked
  * retrieval is the full-text cosine index,
  * /root/reference/bigdata/src/java/com/bigdata/search/FullTextIndex.java:892).
  *
  * Scale posture (100 TB):
  *  - brute force is the correctness baseline: a broadcast of the (small)
  *    query set against the corpus — one scan, no shuffle of the corpus;
  *  - the LSH path buckets the corpus by random-hyperplane sign bits, so the
  *    join key is the bucket id: the corpus shuffles once by bucket and each
  *    query probes one bucket. Planes are derived from a reproducible hash,
  *    not RNG state, so replays/retries see identical plans.
  */
object Similarity {

  /** Cosine similarity of two array<double> columns, rounded to 6 decimals
    * (rounding makes the value reproducible across engines that may differ
    * in the last ulp of the accumulation).
    *
    * The inner products use the native codegen'd `DotProduct` expression
    * (graft.functions) instead of `aggregate(zip_with(...))` — higher-order
    * functions run their lambdas interpreted per element; the custom
    * expression is one fused primitive loop with identical left-to-right
    * summation (bit-identical results, so oracle parity is unchanged).
    */
  def cosine(a: Column, b: Column): Column = {
    import graft.functions.DotProduct.dot
    round(dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b))), 6)
  }

  private def asDouble(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("v"))

  /** Brute-force top-k cosine neighbors for each query vector (excluding the
    * query itself). Ties broken by ascending vec_id — fully deterministic.
    */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val corpus = asDouble(emb)
    val q = asDouble(queries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val scored = corpus.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("score", cosine(col("qv"), col("v")))
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "vec_id", "score")
  }

  /** Hard-negative mining for contrastive training (the standard upgrade
    * from in-batch negatives in dense-retrieval training — Karpukhin et
    * al. 2020 (DPR) take top BM25/ANN hits that are NOT positives; the
    * embedding-space form mines the top-k most-similar corpus vectors
    * carrying a DIFFERENT label): similar enough to confuse the current
    * model, labeled differently, therefore the most informative negatives
    * a triplet/contrastive loss can see. Output per anchor: (q_id, rank,
    * vec_id, label, score), rank 1 = hardest.
    *
    * Same scale posture as [[bruteForceTopK]]: the anchor set broadcasts
    * against one corpus scan (an ANN index replaces the scan at corpus
    * scale — compose with [[ivfTopK]]'s probe machinery by feeding its
    * candidates in as the corpus); label inequality is a scan-side filter,
    * so the per-anchor window ranks only cross-label rows. Deterministic:
    * rounded cosine, ties by ascending vec_id.
    */
  def hardNegatives(emb: DataFrame, anchors: DataFrame, k: Int,
                    labelCol: String = "label"): DataFrame = {
    // NULL-label policy, explicit: an unlabeled corpus row cannot be
    // certified a negative (its class is unknown) and an unlabeled anchor
    // has no positive class to contrast against — both are EXCLUDED, by
    // filter rather than by the null-rejecting `=!=` below, so a
    // partially-labeled corpus reads as a deliberate choice, not a
    // silent three-valued-logic artifact
    val corpus = asDouble(emb)
      .join(emb.select(col("vec_id"), col(labelCol).cast(LongType).as("label")),
            "vec_id")
      .filter(col("label").isNotNull)
    val q = asDouble(anchors)
      .join(anchors.select(col("vec_id"),
                           col(labelCol).cast(LongType).as("q_label")),
            "vec_id")
      .filter(col("q_label").isNotNull)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("q_label"))
    val scored = corpus.join(broadcast(q),
        col("vec_id") =!= col("q_id") && col("label") =!= col("q_label"))
      .withColumn("score", cosine(col("qv"), col("v")))
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "vec_id", "label", "score")
  }

  /** Per-group embedding centroids and their pairwise cosine — the corpus
    * drift/mix report an embedding-curation pipeline tracks (are two
    * sources/shards/snapshots drifting together or apart in embedding
    * space?). Output: one row per unordered group pair (grp_a < grp_b)
    * with both group sizes and the centroid cosine.
    *
    * The centroid mean is EXACT and partitioning-independent — the
    * [[kmeansCentroids]] quantized-long discipline (float→double exact,
    * ×2^20 exponent shift, HALF_UP to long, order-free long sums, two IEEE
    * divisions) — so the report replays bit-for-bit in ANSI SQL and is
    * stable across cluster layouts. Scale posture: one map-side-combined
    * aggregation of the corpus to a groups×dim frame; the pair join runs
    * on group cardinality (hundreds at most), never the corpus.
    */
  def centroidDrift(emb: DataFrame, groupCol: String = "label"): DataFrame = {
    val means = groupCentroids(emb, groupCol)
    val a = means.select(col("grp").as("grp_a"), col("gv").as("av"),
                         col("n_vecs").as("n_a"))
    val b = means.select(col("grp").as("grp_b"), col("gv").as("bv"),
                         col("n_vecs").as("n_b"))
    a.join(b, col("grp_a") < col("grp_b"))
      .select(col("grp_a"), col("grp_b"), col("n_a"), col("n_b"),
              cosine(col("av"), col("bv")).as("drift_cos"))
  }

  /** [[centroidDrift]]'s centroid stage on its own: (grp, n_vecs, gv) per
    * group, gv the exact quantized-long mean vector. Public because the
    * per-group (count, Σ quantized-long) pair is a MONOID — the streaming
    * face ([[graft.streaming.EventStreams.streamingGroupCentroids]])
    * accumulates the same sums incrementally and is spec-pinned
    * bit-identical to this frame over the same rows.
    */
  def groupCentroids(emb: DataFrame, groupCol: String = "label"): DataFrame =
    emb
      .select(col(groupCol).cast(LongType).as("grp"),
              posexplode(col("embedding").cast(ArrayType(DoubleType)))
                .as(Seq("d", "x")))
      .groupBy("grp", "d")
      .agg(((sum(round(col("x") * 1048576.0).cast(LongType)).cast(DoubleType) /
             count(lit(1))) / 1048576.0).as("m"),
           count(lit(1)).as("n"))
      .groupBy("grp")
      .agg(transform(sort_array(collect_list(struct(col("d"), col("m")))),
                     e => e.getField("m")).as("gv"),
           max(col("n")).as("n_vecs"), min(col("n")).as("__n_min"))
      // ragged-dimension guard: mixed dims in one group would make the
      // higher dimensions average over FEWER rows — a silently malformed
      // mean. The streaming face raises on a dim mismatch at update time;
      // this keeps the batch face's contract identical (loud, not wrong),
      // so the spec-pinned batch/streaming bit-parity cannot silently
      // diverge on malformed input
      .select(col("grp"), col("n_vecs"),
        when(col("__n_min") === col("n_vecs"), col("gv"))
          .otherwise(raise_error(concat(
            lit("groupCentroids: inconsistent embedding dimensions in group "),
            col("grp"), lit(" (per-dim counts "), col("__n_min"),
            lit(".."), col("n_vecs"), lit(")")))).as("gv"))

  /** Sign-bit binary quantization: one bit per dimension (`v[d] > 0`),
    * packed 32 bits per long word — the 32× storage dial below int8's 4×
    * (the binary-embedding regime: Hamming distance over packed sign bits
    * approximates angular distance, the classic sign-random-projection
    * bound of Charikar 2002 applied at identity projection). 32-bit words
    * keep every packed value in non-negative int range, so the signatures
    * replay exactly through engines whose integer SUM widens (DuckDB →
    * HUGEINT). Output: (vec_id, sig array<long> of ceil(dim/32) words).
    *
    * Scale posture: a pure per-row projection (one explode + two
    * fixed-key aggregations per vector), zero corpus shuffles beyond the
    * vec_id regroup — and the signature frame is 32× smaller than the
    * embeddings it replaces.
    */
  def binaryQuantize(emb: DataFrame): DataFrame =
    asDouble(emb)
      .select(col("vec_id"), posexplode(col("v")).as(Seq("d", "x")))
      .withColumn("w", expr("d div 32"))
      .groupBy("vec_id", "w")
      .agg(sum(when(col("x") > 0,
                    expr("shiftleft(CAST(1 AS BIGINT), d % 32)"))
                 .otherwise(0L)).as("word"))
      .groupBy("vec_id")
      .agg(transform(sort_array(collect_list(struct(col("w"), col("word")))),
                     e => e.getField("word")).as("sig"))

  /** Hamming top-k over sign-bit signatures: for each anchor, the k
    * corpus vectors with the fewest differing sign bits (ties by
    * ascending vec_id; the anchor itself excluded). Distances are exact
    * integers — popcount of XORed words — so rankings replay bit-for-bit
    * in ANSI SQL. Pair with [[recallAtK]] against [[bruteForceTopK]] to
    * price the 32× storage cut in retrieval quality.
    *
    * Scale posture: [[bruteForceTopK]]'s shape over the 32×-smaller
    * signature frame — anchors broadcast, one corpus scan; at corpus
    * scale, bucket by a signature prefix (multi-index Hamming) exactly as
    * [[lshBuckets]] buckets hyperplane signs.
    */
  def hammingTopK(emb: DataFrame, anchors: DataFrame, k: Int): DataFrame = {
    val sig = binaryQuantize(emb)
    val q = binaryQuantize(anchors)
      .select(col("vec_id").as("q_id"), col("sig").as("qsig"))
    val scored = sig.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("hamming",
        aggregate(zip_with(col("sig"), col("qsig"),
                           (a, b) => bit_count(a.bitwiseXOR(b)).cast(LongType)),
                  lit(0L), (acc, x) => acc + x))
    val w = Window.partitionBy("q_id").orderBy(col("hamming"), col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "vec_id", "hamming")
  }

  /** Multi-index Hamming band table (Norouzi/Punjani/Fleet, "Fast Search
    * in Hamming Space with Multi-Index Hashing", CVPR 2012): the B-bit
    * sign signature splits into `bands` disjoint substrings; by
    * pigeonhole, any code within Hamming distance r < bands of a query
    * matches the query EXACTLY in at least one band — so exact band
    * equality is a complete candidate filter for all neighbors nearer
    * than `bands` bits, and a recall dial beyond. Output: (vec_id, band,
    * bval) — the inverted index a deployed store builds ONCE at load
    * time, exactly as [[lshBuckets]] materializes hyperplane buckets.
    *
    * Bands must align to the 32-bit packed words: bits-per-band divides
    * 32 (or the band ends exactly at a word boundary) — enforced per row
    * with raise_error, since dimension is data. Scale posture: a pure
    * per-row explode to `bands` rows; the table shuffles once on
    * (band, bval) when bucketed for probing.
    */
  def hammingBuckets(emb: DataFrame, bands: Int): DataFrame = {
    require(bands >= 2, "multi-index hashing needs at least 2 bands")
    sigBands(binaryQuantize(emb), bands)
  }

  /** (id, band, bval) decomposition of a (id, sig) signature frame. */
  private def sigBands(sig: DataFrame, bands: Int): DataFrame = {
    val idCol = sig.columns(0)
    val withBits = sig
      .withColumn("__bits", size(col("sig")) * 32)
      .withColumn("__bb", (col("__bits") / bands).cast(IntegerType))
    // each band must sit inside ONE packed word: total bits divide evenly
    // into bands, and the per-band width divides 32 (a generator cannot
    // nest in a conditional, so the guard wraps the band VALUE instead)
    val ok = (col("__bits") % bands === 0) &&
      (col("__bb") <= 32) && (lit(32) % col("__bb") === 0)
    withBits
      .select(col(idCol), col("sig"), col("__bb"), ok.as("__ok"),
              explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bval",
        when(col("__ok"),
          expr("shiftright(element_at(sig, CAST((band * __bb) DIV 32 AS INT) + 1), " +
               "CAST((band * __bb) % 32 AS INT)) & " +
               "(shiftleft(CAST(1 AS BIGINT), __bb) - 1)"))
        .otherwise(raise_error(concat(
          lit(s"hammingBuckets: $bands bands do not align to "),
          size(col("sig")) * 32, lit("-bit signatures packed in 32-bit words")))))
      .select(col(idCol), col("band"), col("bval"))
  }

  /** Multi-index Hamming top-k: [[hammingTopK]]'s ranking restricted to
    * candidates that share at least one exact band with the anchor —
    * COMPLETE for every neighbor within Hamming distance < `bands`
    * (pigeonhole over [[hammingBuckets]]); farther neighbors may be
    * pruned, which is the recall dial ann_recall_hamming_indexed prices.
    * Verification is the exact integer popcount, so returned distances
    * and order are identical to the brute ranking wherever candidates
    * survive.
    *
    * Scale posture: the scale path [[hammingTopK]]'s scaladoc promises —
    * the corpus never cross-joins the anchors; candidates come from a
    * (band, bval) EQUI-join of the band table against the anchors' bands
    * (bucketed, skew-free for non-degenerate sign distributions), then
    * one popcount verify per distinct candidate pair. At 100 TB the band
    * table is a load-time artifact; a probe touches only its ~bands
    * matching buckets.
    */
  def hammingTopKIndexed(emb: DataFrame, anchors: DataFrame, k: Int,
                         bands: Int = 8): DataFrame = {
    val csig = binaryQuantize(emb)
    val qsig = binaryQuantize(anchors)
      .select(col("vec_id").as("q_id"), col("sig").as("qsig"))
    val cband = sigBands(csig, bands)
    val qband = sigBands(
      qsig.select(col("q_id"), col("qsig").as("sig")), bands)
    val cand = cband.join(broadcast(qband), Seq("band", "bval"))
      .filter(col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id").distinct()
    val scored = cand.join(csig, "vec_id").join(broadcast(qsig), "q_id")
      .withColumn("hamming",
        aggregate(zip_with(col("sig"), col("qsig"),
                           (a, b) => bit_count(a.bitwiseXOR(b)).cast(LongType)),
                  lit(0L), (acc, x) => acc + x))
    val w = Window.partitionBy("q_id").orderBy(col("hamming"), col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "vec_id", "hamming")
  }

  /** Matryoshka-representation truncation (Kusupati et al. 2022: MRL
    * embeddings are trained so every prefix is itself a valid embedding —
    * the third storage/compute dial next to int8 and PQ): keep the first
    * `dOut` dimensions. Cosine self-normalizes, so no renormalization is
    * needed for retrieval; pair with [[recallAtK]] to price the prefix
    * length. A pure per-row slice — zero shuffles.
    */
  def matryoshkaTruncate(emb: DataFrame, dOut: Int): DataFrame = {
    require(dOut >= 1, "matryoshka prefix must be at least 1 dimension")
    emb.withColumn("embedding", slice(col("embedding"), 1, dOut))
  }

  /** Pseudo-random hyperplane component for (plane j, dimension d): uniform
    * in [-1, 1), derived from the shared md5-based hash so an external oracle
    * can rebuild the identical planes.
    */
  def planeComponent(j: Column, d: Column): Column =
    (hash64(concat(j, lit(","), d)) % 1000000L).cast(DoubleType) / 500000.0 - 1.0

  /** Random-hyperplane LSH bucket id: for planes j in [0, planes), bit j is
    * the sign of dot(v, plane_j). Output: (vec_id, bucket).
    */
  def lshBuckets(emb: DataFrame, planes: Int): DataFrame = {
    val e = asDouble(emb)
    // dot(v, plane_j) = Σ_d v[d] · plane(j, d)
    val dots = e
      .select(col("vec_id"), posexplode(col("v")).as(Seq("d", "x")))
      .select(col("vec_id"), col("d"), col("x"),
              explode(sequence(lit(0), lit(planes - 1))).as("j"))
      .withColumn("contrib", col("x") * planeComponent(col("j"), col("d")))
      .groupBy("vec_id", "j")
      .agg(sum(col("contrib")).as("dot"))
    dots
      .groupBy("vec_id")
      .agg(sum(when(col("dot") > 0, expr("shiftleft(CAST(1 AS BIGINT), j)"))
                 .otherwise(0L)).as("bucket"))
  }

  /** IVF (inverted-file) coarse quantizer: assign every corpus vector to
    * its nearest centroid by rounded cosine (ties → lowest centroid id).
    * Centroids here are deterministic seed vectors (the lowest `nlist`
    * vec_ids) rather than trained k-means — the partition/probe machinery
    * (the part that matters at scale) is identical, and the assignment
    * stays exactly reproducible by an external oracle. Swapping in k-means
    * centroids changes only the `centroids` frame.
    */
  def ivfCentroids(emb: DataFrame, nlist: Int): DataFrame =
    asDouble(emb).filter(col("vec_id") < nlist)
      .select(col("vec_id").as("cid"), col("v").as("cv"))

  /** (vec_id, cid) assignment of each corpus vector to its centroid list. */
  def ivfAssign(emb: DataFrame, centroids: DataFrame): DataFrame =
    ivfAssignFrom(asDouble(emb), centroids)

  /** Lloyd's k-means refinement of the IVF quantizer: deterministic seeds
    * (lowest k vec_ids) → assign by rounded cosine (ties → lowest cid) →
    * per-dimension mean → repeat. Empty clusters keep their previous
    * centroid. Each iteration is one broadcast-assign plus one
    * groupBy-mean — the standard distributed Lloyd step; the result plugs
    * straight into `ivfTopK`'s centroid frame.
    *
    * The per-dimension mean is EXACT and partitioning-independent: each
    * component is quantized once to a 2^20-scaled long (float → double is
    * exact, ×2^20 shifts the exponent without rounding, HALF_UP round to
    * integer), the longs sum order-free, and the mean is two IEEE
    * divisions — so the trained centroids are bit-reproducible on any
    * cluster layout AND by an external ANSI-SQL oracle. A naive avg() over
    * doubles would drift with Spark's aggregation order, making training
    * non-replayable (a silent model-versioning hazard at scale).
    */
  def kmeansCentroids(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    val corpus = asDouble(emb)
    var cent = graft.util.Fixpoint.materialize(ivfCentroids(emb, k))
    for (_ <- 1 to iters) {
      val assign = ivfAssignFrom(corpus, cent)
      val means = corpus.join(assign, "vec_id")
        .select(col("cid"), posexplode(col("v")).as(Seq("d", "x")))
        .groupBy("cid", "d")
        .agg(((sum(round(col("x") * 1048576.0).cast(LongType)).cast(DoubleType) /
               count(lit(1))) / 1048576.0).as("m"))
        .groupBy("cid")
        .agg(transform(sort_array(collect_list(struct(col("d"), col("m")))),
                       e => e.getField("m")).as("nv"))
      cent = graft.util.Fixpoint.materialize(
        cent.join(means, Seq("cid"), "left_outer")
          .select(col("cid"), coalesce(col("nv"), col("cv")).as("cv")))
    }
    cent
  }

  /** Rank-1 centroid per vector as ONE hash aggregation: `max_by` over the
    * ordering struct (sim desc, then lowest cid on ties via negated id) —
    * partial maxes combine map-side, so no per-key sort and no window
    * shuffle of the corpus×nlist scored relation.
    */
  private def ivfAssignFrom(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = corpus.crossJoin(broadcast(centroids))
      .withColumn("sim", cosine(col("v"), col("cv")))
    scored.groupBy("vec_id")
      .agg(max_by(col("cid"), struct(col("sim"), (-col("cid")).as("nc"))).as("cid"))
      .select("vec_id", "cid")
  }

  /** IVF top-k: each query ranks only the vectors in its `nProbe` nearest
    * centroid lists. The corpus shuffles ONCE by centroid id (the inverted
    * file); a query touches nProbe/nlist of the data — the standard
    * recall/cost knob, and the reason IVF scans survive 100 TB corpora.
    */
  def ivfTopK(emb: DataFrame, queries: DataFrame, nlist: Int, nProbe: Int,
              k: Int, centroids: Option[DataFrame] = None,
              assigned: Option[DataFrame] = None): DataFrame = {
    val cent = centroids.getOrElse(ivfCentroids(emb, nlist))
    val assign = assigned.getOrElse(ivfAssign(emb, cent))
    val corpus = asDouble(emb).join(assign, "vec_id")
    val q = asDouble(queries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val wq = Window.partitionBy("q_id").orderBy(col("sim").desc, col("cid"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nProbe)
      .select("q_id", "qv", "cid")
    val scored = corpus.join(broadcast(probes),
        corpus("cid") === probes("cid") && col("vec_id") =!= col("q_id"))
      .withColumn("score", cosine(col("qv"), col("v")))
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "vec_id", "score")
  }

  /** ANN-backed hard-negative mining: [[hardNegatives]]' semantics served
    * by [[ivfTopK]]'s probe machinery — each anchor mines its negatives
    * from its `nProbe` nearest centroid LISTS instead of the full corpus,
    * the composition the brute-force face's scaladoc promises. Same
    * NULL-label policy (unlabeled rows excluded, explicitly), same
    * deterministic ranking (rounded cosine desc, vec_id asc); recall vs
    * the exact miner is priced by ann_hard_negatives (they share oracle
    * data), and rises with nProbe.
    *
    * Scale posture: the corpus shuffles ONCE by centroid id (the shared
    * inverted file — pass `centroids`/`assigned` to reuse the load-time
    * artifacts); an anchor batch touches nProbe/nlist of the data. This
    * is the shape that survives mining negatives for millions of anchors
    * over a 100 TB corpus — the full-scan face stays as the correctness
    * baseline.
    */
  def hardNegativesIvf(emb: DataFrame, anchors: DataFrame, k: Int,
                       nlist: Int, nProbe: Int, labelCol: String = "label",
                       centroids: Option[DataFrame] = None,
                       assigned: Option[DataFrame] = None): DataFrame = {
    val cent = centroids.getOrElse(ivfCentroids(emb, nlist))
    val assign = assigned.getOrElse(ivfAssign(emb, cent))
    val corpus = asDouble(emb)
      .join(emb.select(col("vec_id"), col(labelCol).cast(LongType).as("label")),
            "vec_id")
      .filter(col("label").isNotNull)
      .join(assign, "vec_id")
    val q = asDouble(anchors)
      .join(anchors.select(col("vec_id"),
                           col(labelCol).cast(LongType).as("q_label")),
            "vec_id")
      .filter(col("q_label").isNotNull)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("q_label"))
    val wq = Window.partitionBy("q_id").orderBy(col("sim").desc, col("cid"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nProbe)
      .select("q_id", "qv", "q_label", "cid")
    val scored = corpus.join(broadcast(probes),
        corpus("cid") === probes("cid") && col("vec_id") =!= col("q_id") &&
          col("label") =!= col("q_label"))
      .withColumn("score", cosine(col("qv"), col("v")))
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "vec_id", "label", "score")
  }

  // ---- product quantization (IVF-PQ — the billion-scale ANN design) ----

  /** Squared L2 between two equal-length vectors, rounded to 6 decimals:
    * a left-to-right fold of squared diffs, bit-reproducible by DuckDB's
    * `list_sum(list_transform(...))` (same op sequence — the cosSql
    * precedent). Subvectors here are `dim/m` wide, so the interpreted
    * higher-order fold is cheap; swap in a native Expression (the
    * DotProduct pattern) if PQ distances ever dominate a profile.
    */
  private def l2sq(a: Column, b: Column): Column =
    round(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
                    lit(0.0), (acc, v) => acc + v), 6)

  /** PQ codebooks: the vector space splits into `m` subspaces of dim/m
    * contiguous dimensions; subspace j's `k` centroids are the j-th
    * subvectors of the k lowest vec_ids — deterministic seeds, the same
    * discipline as [[ivfCentroids]] (swap in per-subspace k-means for
    * trained codebooks; the encode/score machinery is codebook-agnostic).
    * Output (j, code, cv): m·k rows — always broadcastable.
    */
  def pqCodebooks(emb: DataFrame, m: Int, k: Int): DataFrame =
    asDouble(emb).filter(col("vec_id") < k)
      .select(col("vec_id").cast(IntegerType).as("code"),
              explode(sequence(lit(0), lit(m - 1))).as("j"), col("v"))
      .withColumn("cv", expr(s"slice(v, j * (size(v) div $m) + 1, size(v) div $m)"))
      .select("j", "code", "cv")

  /** PQ encoding: each vector compresses to `m` one-byte codes — the
    * nearest codebook centroid per subspace (rounded L2, ties → lowest
    * code). One broadcast join against the m·k codebook rows and two hash
    * aggregations; the corpus never shuffles by anything but vec_id. At
    * 100 TB this is THE storage story: 64 doubles (512 B) become m bytes,
    * and the scan side of ANN reads codes, not vectors.
    */
  def pqEncode(emb: DataFrame, m: Int, k: Int,
               codebooks: Option[DataFrame] = None): DataFrame = {
    val cb = codebooks.getOrElse(pqCodebooks(emb, m, k))
    asDouble(emb)
      .select(col("vec_id"), explode(sequence(lit(0), lit(m - 1))).as("j"), col("v"))
      .withColumn("sv", expr(s"slice(v, j * (size(v) div $m) + 1, size(v) div $m)"))
      .join(broadcast(cb), "j")
      .withColumn("d", l2sq(col("sv"), col("cv")))
      .groupBy("vec_id", "j")
      .agg(min_by(col("code"), struct(col("d"), col("code"))).as("code"))
      .groupBy("vec_id")
      .agg(transform(sort_array(collect_list(struct(col("j"), col("code")))),
                     x => x.getField("code")).as("codes"))
  }

  /** IVF-PQ top-k with asymmetric distance computation (ADC), the
    * Jégou/Douze/Schmid design: queries stay exact, the corpus is its PQ
    * codes, and each query precomputes an m·k lookup table of
    * subspace distances so scoring a corpus vector is m table reads — no
    * vector arithmetic on the scan side. IVF restricts scoring to the
    * `nProbe` nearest centroid lists.
    *
    * Scale posture: codebooks and per-query LUTs broadcast (m·k rows and
    * #queries·m·k doubles); the corpus shuffles ONCE by centroid list and
    * is scanned as codes. score = Σ_j lut[j·k + code_j], an approximate
    * squared L2 (ascending = nearest). Every distance rounds to 6
    * decimals, so ranking replays exactly in DuckDB.
    */
  def ivfPqTopK(emb: DataFrame, queries: DataFrame, nlist: Int, nProbe: Int,
                m: Int, k: Int, topk: Int,
                centroids: Option[DataFrame] = None,
                codebooks: Option[DataFrame] = None,
                encoded: Option[DataFrame] = None): DataFrame = {
    // a deployed index builds centroids/codebooks/codes at LOAD time (the
    // IVF-PQ index IS those artifacts); pass them in to keep query-time
    // cost at LUT-build + probed-list scan
    val cent = centroids.getOrElse(ivfCentroids(emb, nlist))
    val cb = codebooks.getOrElse(pqCodebooks(emb, m, k))
    val enc = encoded.getOrElse {
      pqEncode(emb, m, k, Some(cb)).join(ivfAssign(emb, cent), "vec_id")
    }
    val q = asDouble(queries).select(col("vec_id").as("q_id"), col("v").as("qv"))
    // per-query LUT: d(q's j-th subvector, codebook (j, code)), flattened
    // in (j, code) order so lut[j*k + code + 1] is the distance
    val luts = q
      .select(col("q_id"), col("qv"), explode(sequence(lit(0), lit(m - 1))).as("j"))
      .withColumn("sv", expr(s"slice(qv, j * (size(qv) div $m) + 1, size(qv) div $m)"))
      .join(broadcast(cb), "j")
      .withColumn("d", l2sq(col("sv"), col("cv")))
      .groupBy("q_id")
      .agg(transform(sort_array(collect_list(struct(
             (col("j") * k + col("code")).as("idx"), col("d")))),
           x => x.getField("d")).as("lut"))
    val wq = Window.partitionBy("q_id").orderBy(col("sim").desc, col("cid"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nProbe)
      .select("q_id", "cid")
    val qside = probes.join(luts, "q_id")
    val scored = enc.join(broadcast(qside),
        enc("cid") === qside("cid") && col("vec_id") =!= col("q_id"))
      .withColumn("score", round(
        aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
          (acc, j) => acc + element_at(col("lut"),
            (j * k + element_at(col("codes"), j + 1) + 1).cast(IntegerType))), 6))
    val w = Window.partitionBy("q_id").orderBy(col("score").asc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= topk)
      .select("q_id", "rank", "vec_id", "score")
  }

  /** LSH-bucketed top-k: exact ranking restricted to buckets within
    * Hamming distance `probes` of the query's bucket (0 = the query bucket
    * only; 1 = multiprobe over all single-bit-flip neighbors — the standard
    * recall/cost knob: each extra bit of probing multiplies candidates
    * ~(planes+1)× and recovers neighbors that fell across one hyperplane).
    */
  /** Recall@k of an approximate ANN result against the exact ranking —
    * the index-quality metric a deployed vector store tracks when tuning
    * its nProbe/planes/probes knobs. Both inputs are (q_id, vec_id, ...)
    * top-k frames; per query: |approx ∩ exact| / |exact|.
    *
    * Scale posture: runs on the two top-k frames (#queries × k rows),
    * never the corpus — one equi-join on (q_id, vec_id) and one
    * aggregation; evaluating recall on a query SAMPLE is how index
    * quality is monitored at 100 TB.
    */
  /** Johnson–Lindenstrauss sign random projection (Achlioptas 2003 / JL
    * 1984): compress d-dim embeddings to `dOut` dims with a deterministic
    * ±1 matrix — `sign(j,i) = +1` iff `hash64("rp:j:i")` is even, built
    * driver-side with the bit-identical JVM md5 replica
    * ([[TextPrep.hash64Jvm]]) and shipped as a dOut×d plan literal —
    * scaled by 1/√dOut. Each projected coordinate is an in-order fold
    * over the source vector rounded to 6 decimals (the [[cosine]] float
    * discipline), so the DuckDB oracle rebuilds the identical projection
    * from the same md5s. Output keeps the embedding-table schema
    * (vec_id, embedding as array<double>), so every ANN operator runs
    * unchanged on the compressed vectors.
    *
    * Scale posture: the complement to PQ (quantization) — projection is a
    * pure per-row map (dOut·d multiply-adds, no hashing at row time since
    * the matrix is a literal), cutting every downstream distance
    * computation and shuffle byte count by d/dOut. recall@k vs the
    * full-dimension ranking is the evaluation dial (ann_recall_rp).
    */
  def randomProjection(emb: DataFrame, dOut: Int, dIn: Int = 64): DataFrame = {
    require(dOut > 0 && dIn > 0)
    val signs: Seq[Seq[Double]] = (0 until dOut).map { j =>
      (0 until dIn).map { i =>
        if (TextPrep.hash64Jvm(s"rp:$j:$i") % 2 == 0) 1.0 else -1.0
      }
    }
    val s = typedLit(signs)
    val scale = math.sqrt(dOut.toDouble)
    val e = asDouble(emb)
    val proj = transform(sequence(lit(0), lit(dOut - 1)), j =>
      round(
        aggregate(sequence(lit(0), lit(dIn - 1)), lit(0.0),
          (acc, i) => acc + element_at(element_at(s, (j + 1).cast(IntegerType)),
                                       (i + 1).cast(IntegerType)) *
            element_at(col("v"), (i + 1).cast(IntegerType)))
          / lit(scale), 6))
    // dimension mismatch must fail, not silently null out (short vectors)
    // or truncate (long ones): element_at past the end returns null and the
    // fold would propagate it through every projected coordinate
    val checked = when(size(col("v")) === dIn, proj)
      .otherwise(raise_error(concat(
        lit(s"randomProjection: embedding dimension "), size(col("v")),
        lit(s" != dIn=$dIn"))))
    e.select(col("vec_id"), checked.as("embedding"))
  }

  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    val ap = approx.select(col("q_id"), col("vec_id"), lit(1L).as("__hit"))
    exact.select(col("q_id"), col("vec_id"))
      .join(ap, Seq("q_id", "vec_id"), "left_outer")
      .groupBy("q_id")
      .agg(count(lit(1)).as("n_exact"),
           sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
      .select(col("q_id"), col("n_exact"), col("n_hit"),
              round(col("n_hit").cast(DoubleType) / col("n_exact"), 6)
                .as("recall"))
  }

  def lshTopK(emb: DataFrame, queries: DataFrame, planes: Int, k: Int,
              probes: Int = 0): DataFrame = {
    val buckets = lshBuckets(emb, planes)
    val corpus = asDouble(emb).join(buckets, "vec_id")
    // True multiprobe: enumerate every bucket within Hamming distance
    // `probes` of the query's bucket (XOR with each ≤probes-bit mask) and
    // EQUI-join the corpus on the exploded bucket key. A bit_count(xor)<=p
    // predicate is non-equi and would plan as a BroadcastNestedLoopJoin —
    // O(corpus × queries) predicate evaluations; the explode keeps it a hash
    // join at Σ_{i≤p} C(planes,i) keys per query (planes+1 for probes=1).
    val probeMasks: Seq[Long] = (0 to probes).flatMap(r =>
      (0 until planes).combinations(r).map(_.foldLeft(0L)((m, j) => m | (1L << j))))
    val q = asDouble(queries).join(buckets, "vec_id")
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
              explode(array(probeMasks.map(m =>
                col("bucket").bitwiseXOR(lit(m))): _*)).as("bucket"))
    val scored = corpus.join(broadcast(q),
        Seq("bucket"), "inner")
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("score", cosine(col("qv"), col("v")))
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "vec_id", "score")
  }

  // ---- int8 affine quantization -----------------------------------------
  // The STORAGE dial next to PQ's codebook dial and JL's dimension dial:
  // per-vector affine uint8 quantization (the ONNX/FAISS scalar-quantizer
  // shape) cuts embedding bytes 4x (float32 -> int8) with no index
  // structure at all. All arithmetic is exact integers in micro-units
  // (round(x*1e6)), so the DuckDB oracle replays the codes bit-for-bit;
  // the only divisions have non-negative numerators and quotients far from
  // integer boundaries relative to double precision, so floor(double-div)
  // equals exact integer floor on both engines.

  /** Per-coordinate micro-units: round(x * 1e6) as long (the repo's shared
    * float discipline — exact, engine-portable).
    */
  private def microArr(v: Column): Column =
    transform(v, x => round(x * 1e6).cast(LongType))

  /** Quantize each vector to uint8 codes: q_i = floor(255 * (x_i - min) /
    * (max - min)) per vector (all-equal vectors quantize to all-zero).
    * Pure per-row projection — zero shuffles at any corpus size. Output:
    * (vec_id, min_micro, range_micro, qvec array<int>).
    */
  def int8Quantize(emb: DataFrame): DataFrame = {
    val e = asDouble(emb)
    e.select(col("vec_id"), microArr(col("v")).as("xm"))
      .withColumn("min_micro", array_min(col("xm")))
      .withColumn("range_micro", array_max(col("xm")) - col("min_micro"))
      .withColumn("qvec",
        transform(col("xm"), x =>
          when(col("range_micro") > 0L,
               floor(((x - col("min_micro")) * 255L).cast(DoubleType) /
                     col("range_micro").cast(DoubleType)).cast(IntegerType))
            .otherwise(lit(0))))
      .select("vec_id", "min_micro", "range_micro", "qvec")
  }

  /** Reconstruct micro-unit doubles from the codes: x'_i = (min +
    * floor(q_i * range / 255)) / 1e6 — the dequantized embedding table,
    * schema-compatible with every ANN operator (vec_id, embedding).
    */
  def int8Dequantize(quantized: DataFrame): DataFrame =
    quantized.select(col("vec_id"),
      transform(col("qvec"), q =>
        (col("min_micro") +
          floor((q.cast(LongType) * col("range_micro")).cast(DoubleType) / 255.0)
            .cast(LongType)).cast(DoubleType) / 1e6)
        .as("embedding"))

  /** Oracle face: exact per-vector quantization stats — the code sum and a
    * position-weighted code sum (an order-sensitive checksum), all longs.
    */
  def int8QuantStats(emb: DataFrame): DataFrame =
    int8Quantize(emb).select(
      col("vec_id"), col("min_micro"), col("range_micro"),
      aggregate(col("qvec"), lit(0L), (acc, q) => acc + q.cast(LongType))
        .as("q_sum"),
      aggregate(zip_with(col("qvec"), sequence(lit(1), size(col("qvec"))),
                         (q, i) => q.cast(LongType) * i.cast(LongType)),
                lit(0L), (acc, x) => acc + x).as("q_dot"),
      size(col("qvec")).cast(LongType).as("n"))
}
