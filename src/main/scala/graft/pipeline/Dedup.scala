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
  def ngramJaccardPairs(docs: DataFrame, n: Int, threshold: Double,
                        blockCol: String = "lang"): DataFrame = {
    val sh = docs
      .select(col("doc_id"), col(blockCol).as("block"),
              explode(shingles(words(col("text")), n)).as("shingle"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val shared = sh.as("a")
      .join(sh.as("b"),
            col("a.shingle") === col("b.shingle") &&
            col("a.block") === col("b.block") &&
            col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
      .withColumn("jaccard",
        round(col("n_shared").cast(DoubleType) /
              (col("n_a") + col("n_b") - col("n_shared")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash signatures: for hash function i in [0, numHashes), the signature
    * is min over shingles s of hash64(i || '|' || s).
    * Output: (doc_id, i, minhash).
    */
  def minhashSignatures(docs: DataFrame, n: Int, numHashes: Int): DataFrame =
    docs
      .select(col("doc_id"), explode(shingles(words(col("text")), n)).as("shingle"))
      .select(col("doc_id"), col("shingle"),
              explode(sequence(lit(0), lit(numHashes - 1))).as("i"))
      .groupBy("doc_id", "i")
      .agg(min(hash64(concat(col("i"), lit("|"), col("shingle")))).as("minhash"))

  /** LSH candidate pairs: split the signature into `bands` bands of
    * numHashes/bands rows each; docs sharing any full band signature are
    * candidates. Output: distinct (id_a, id_b) with id_a < id_b.
    */
  def minhashLshCandidates(docs: DataFrame, n: Int, numHashes: Int,
                           bands: Int): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes, "bands must divide numHashes")
    val bandSig = minhashSignatures(docs, n, numHashes)
      .withColumn("band", (col("i") / rowsPerBand).cast(IntegerType))
      .groupBy("doc_id", "band")
      // array_agg ordered by i: sort_array of (i, minhash) structs keeps the
      // in-band order deterministic regardless of shuffle order
      .agg(sort_array(collect_list(struct(col("i"), col("minhash")))).as("sig"))
      .withColumn("band_key", transform(col("sig"), s => s.getField("minhash")))
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
                   blockCol: String = "lang", bits: Int = 32): DataFrame = {
    val sigs = simhash(docs, bits)
      .join(docs.select(col("doc_id"), col(blockCol).as("block")), "doc_id")
    sigs.as("a")
      .join(sigs.as("b"),
            col("a.block") === col("b.block") && col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming",
        bit_count(col("a.simhash") bitwiseXOR col("b.simhash")).cast(LongType))
      .filter(col("hamming") <= maxHamming)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"), col("hamming"))
  }

  /** Embedding near-duplicate pairs: cosine similarity ≥ threshold within a
    * blocking key (label). Exact within block; at scale the block comes from
    * an ANN bucketing pass (Similarity.lshBuckets).
    */
  def embeddingNearDupPairs(emb: DataFrame, threshold: Double,
                            blockCol: String = "label"): DataFrame = {
    val e = emb.select(col("vec_id"), col(blockCol).as("block"),
                       col("embedding").cast(ArrayType(DoubleType)).as("v"))
    e.as("a")
      .join(e.as("b"),
            col("a.block") === col("b.block") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", Similarity.cosine(col("a.v"), col("b.v")))
      .filter(col("cos") >= threshold)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"), col("cos"))
  }
}
