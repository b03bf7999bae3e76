package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval rank fusion — the glue between the engine's sparse
  * (BM25/tf-cosine full-text) and dense (ANN cosine) rankings.
  *
  * Reciprocal Rank Fusion (Cormack, Clarke & Buettcher 2009): each system
  * contributes 1/(k + rank) per retrieved id; ids are ranked by the summed
  * contribution. RRF needs no score calibration between systems — ranks
  * are the only input — which is why it is the standard first fusion in
  * retrieval-augmented pipelines.
  *
  * Contributions are scaled integers (`1e9 div (k + rank)`), never
  * floating-point reciprocals, so fused scores replay bit-for-bit in ANSI
  * SQL and ties break identically everywhere.
  *
  * Scale posture: inputs are TOP-K LISTS by construction (Σ systems × k
  * rows, thousands at most), so the one aggregation and the global rank
  * window here run on a frame that is bounded by the query's k, not the
  * corpus — the corpus-sized work already happened inside each system's
  * own (scan-efficient) ranking.
  */
object Retrieval {

  /** Fuse rank-bounded retrieval lists. Each input frame carries
    * (id, rank) with rank 1-based; returns (id, rrf_scaled, n_systems,
    * rank) — top `topN` by fused score, ties by ascending id.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int = 60, topN: Int = 10)
      : DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k >= 0 && topN > 0)
    val contribs = rankings.map(_.select(col("id"),
      expr(s"cast(1000000000 as bigint) div (cast($k as bigint) + rank)")
        .as("contrib")))
    val fused = contribs.reduce(_ unionByName _)
      .groupBy("id")
      .agg(sum(col("contrib")).as("rrf_scaled"),
           count(lit(1)).as("n_systems"))
    // global window over the k-bounded fused frame (see scale posture)
    val w = Window.orderBy(col("rrf_scaled").desc, col("id"))
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topN)
      .select("id", "rrf_scaled", "n_systems", "rank")
  }
}
