package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import TextPrep._

/** End-to-end training-corpus preparation: exact dedup → benchmark
  * decontamination → quality filter → per-source token budget, composed as
  * ONE declarative plan (every stage is a DataFrame transform, so Catalyst
  * sees — and can pipeline — the whole thing; nothing materializes between
  * stages unless a stage itself checkpoints).
  *
  * Scale shape, stage by stage (100 TB corpus):
  *  1. exact dedup: one hash aggregation on the content key + an equi-join
  *     back on doc_id;
  *  2. decontamination: broadcast bench n-gram set, semi-join + distinct on
  *     contaminated ids, left-anti back — the corpus is never shuffled;
  *  3. quality: pure column math over one shared token array;
  *  4. token budget: one shuffle on the source key + a windowed running sum.
  * Total: two corpus shuffles (dedup key, budget group), same as `curate`.
  */
object TrainingPrep {

  /** The prepared corpus itself — the document frame surviving every
    * stage (dedup → decontam → quality → budget), still carrying text,
    * quality, and the shared token array, so downstream stages (packing,
    * mixture sampling, export) compose onto the same single plan.
    */
  def prepareDocs(docs: DataFrame, bench: DataFrame, n: Int = 5,
                  minQuality: Double = 0.5,
                  budgetPerGroup: Long = 1000L): DataFrame = {
    val keep = docs
      .groupBy(md5(substring(col("text"), 1, 50)).as("ck"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val deduped = docs.join(keep, "doc_id")
    val clean = Decontam.decontaminate(deduped, bench, n)
    val scored = clean
      .withColumn("ws", words(lower(col("text"))))
      .withColumn("quality", TextAnalysis.qualityExpr(col("text"), col("ws")))
      .filter(col("quality") >= minQuality)
    Sampling.tokenBudgetSample(scored, budgetPerGroup)
  }

  /** Returns the per-source rollup of the prepared corpus: documents kept,
    * tokens kept, mean quality. `bench` documents themselves are always
    * dropped (their n-grams self-hit the bench set).
    */
  def prepare(docs: DataFrame, bench: DataFrame, n: Int = 5,
              minQuality: Double = 0.5, budgetPerGroup: Long = 1000L): DataFrame =
    prepareDocs(docs, bench, n, minQuality, budgetPerGroup)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           sum(size(col("ws")).cast(LongType)).as("n_tokens"),
           round(avg(col("quality")), 6).as("avg_quality"))

  /** The full deliverable: prepared corpus laid out as fixed-length packed
    * training sequences ([[Packing.packedManifest]] over [[prepareDocs]]) —
    * curation and packing as ONE Catalyst plan, three corpus shuffles total
    * (dedup key, budget group, pack group).
    */
  def prepareAndPack(docs: DataFrame, bench: DataFrame, seqLen: Long,
                     n: Int = 5, minQuality: Double = 0.5,
                     budgetPerGroup: Long = 1000L): DataFrame =
    Packing.packedManifest(
      prepareDocs(docs, bench, n, minQuality, budgetPerGroup), seqLen)
}
