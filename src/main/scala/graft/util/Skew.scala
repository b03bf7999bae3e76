package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join utilities.
  *
  * AQE's skew-join handling (on by default in Spark 4) covers sort-merge
  * joins; explicit salting remains the tool when a *broadcast-ineligible*
  * join has a handful of hot keys and the small side is replicable — the
  * classic hot-entity shape in both RDF stores (celebrity subjects) and
  * training corpora (boilerplate documents).
  */
object Skew {

  /** Salted equi-join: the large (skewed) side gets a random salt in
    * [0, buckets); the smaller right side is replicated once per salt
    * value. Output equals `left.join(right, leftKey === rightKey, "inner")`
    * but the shuffle distributes each hot key over `buckets` partitions.
    *
    * The salt is derived from a hash of the whole left row (deterministic,
    * replay-safe) rather than rand().
    */
  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: Column, rightKey: Column, buckets: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(hash(left.columns.toIndexedSeq.map(col): _*), lit(buckets)))
    val replicated = right
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    salted
      .join(replicated, salted("__salt") === replicated("__salt") && leftKey === rightKey)
      .drop("__salt")
  }
}
