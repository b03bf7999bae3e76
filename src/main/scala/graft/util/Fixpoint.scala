package graft.util

import org.apache.spark.sql.DataFrame

/** Shared machinery for iterative (fixpoint) DataFrame computations:
  * property-path closure, inference closure, graph analytics.
  *
  * Scale posture: every round materializes via localCheckpoint — lineage
  * stays O(1) instead of O(rounds), so 30-round closures don't build
  * kilometer-deep plans; rebuilding from the checkpointed RDD issues fresh
  * attribute ids so self-unions/self-joins across rounds stay resolvable
  * (Catalyst's union constraint rewrite fails on shared ids).
  */
object Fixpoint {

  /** Materialize a frame, truncate lineage, re-issue attribute ids.
    * Conversion-free: reuses the checkpointed InternalRow RDD
    * (org.apache.spark.sql.graft.Internal).
    */
  def materialize(df: DataFrame): DataFrame =
    org.apache.spark.sql.graft.Internal.freshIdCheckpoint(df)

  /** Materialize like [[materialize]] but KEEP the frame's physical output
    * partitioning (and attribute ids): `Dataset.localCheckpoint` records
    * `executedPlan.outputPartitioning` in the resulting LogicalRDD, so a
    * downstream join/aggregation keyed the same way skips its exchange —
    * the freshIdCheckpoint route erases that metadata (fresh ids cannot
    * reference the old partitioning expressions) and every loop round
    * re-shuffles the invariant frame (guide §2.4: two operations keyed the
    * same way should share one exchange).
    *
    * Use for loop-INVARIANT relations (edge sets, degree tables) that are
    * joined on their partitioning key each round. Because attribute ids
    * are preserved, do NOT use it for frames that self-union or self-join
    * across rounds — that is exactly the shared-id hazard freshIdCheckpoint
    * exists for.
    */
  def materializeKeyed(df: DataFrame): DataFrame = {
    val reliable = df.sparkSession.conf
      .getOption(org.apache.spark.sql.graft.Internal.ReliableCheckpointsConf)
      .exists(_.toBoolean)
    if (reliable) df.checkpoint(eager = true) else df.localCheckpoint(eager = true)
  }

  /** Convergence fingerprint for monotone label frames (SSSP distances,
    * CC/sameAs canon labels): (XOR of per-row xxhash64, row count) in ONE
    * cheap aggregate, replacing a per-round except() shuffle.
    *
    * The paired count eliminates every cancellation class where the row
    * cardinality changes (offsetting insert/remove pairs cannot slip
    * through). With counts equal, declaring convergence early requires the
    * XORed 64-bit hash deltas of the rows that DID change to cancel
    * exactly — ~2^-64 per round on hash-random inputs, and the monotone
    * label discipline (values only decrease) rules out value swaps
    * re-creating the same multiset. Callers accept that residual risk in
    * exchange for one aggregate per round; the oracle gates re-verify
    * end results exactly.
    */
  def fingerprint(df: DataFrame,
                  cols: org.apache.spark.sql.Column*): (Long, Long) = {
    import org.apache.spark.sql.functions.{bit_xor, count, lit, xxhash64}
    val row = df.agg(bit_xor(xxhash64(cols: _*)), count(lit(1))).head()
    (if (row.isNullAt(0)) 0L else row.getLong(0), row.getLong(1))
  }

  /** Semi-naive iteration: `all` accumulates, `step(all, delta)` produces
    * candidate new rows; loop ends when no new rows appear (or maxIters).
    */
  def semiNaive(init: DataFrame, maxIters: Int)
               (step: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val m = materialize(init)
    semiNaiveFrom(m, m, maxIters)(step)
  }

  /** Semi-naive iteration seeded with an existing closed set plus a delta —
    * the incremental-maintenance entry point: only consequences of `delta`
    * are derived, never the full closure.
    */
  def semiNaiveFrom(closed: DataFrame, delta0: DataFrame, maxIters: Int)
                   (step: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    var all = materialize(closed.unionByName(delta0).distinct())
    var delta = materialize(delta0)
    var i = 0
    while (i < maxIters) {
      val fresh = materialize(step(all, delta).except(all))
      if (fresh.isEmpty) return all
      // the accumulator IS re-checkpointed here, unlike Paths.closureLoop's
      // shallow union: rule steps scan `all` once per rule branch (~20x a
      // round for the OWL set), so a K-leaf union would be re-read K*20
      // times — measured slower than paying one checkpoint write per round
      all = materialize(all.unionByName(fresh))
      delta = fresh
      i += 1
    }
    all
  }

  /** Like semiNaiveFrom, but ALSO returns the rows genuinely new relative
    * to `closed` (delta0 minus closed, plus every fresh round). The loop
    * already pays the dedup shuffles, so tracking is free — and the
    * returned delta frames are materialized checkpoints, so a downstream
    * consumer (change listeners) reads O(delta), never re-diffing the
    * store. `closed` must be duplicate-free (a store/closure invariant).
    */
  def semiNaiveFromTracked(closed: DataFrame, delta0: DataFrame,
                           maxIters: Int)
                          (step: (DataFrame, DataFrame) => DataFrame)
      : (DataFrame, DataFrame) = {
    val base = materialize(closed)
    var delta = materialize(delta0.except(base))
    val news = Vector.newBuilder[DataFrame]
    news += delta
    var all = materialize(base.unionByName(delta))
    var i = 0
    var done = delta.isEmpty
    while (!done && i < maxIters) {
      val fresh = materialize(step(all, delta).except(all))
      if (fresh.isEmpty) done = true
      else {
        news += fresh
        all = materialize(all.unionByName(fresh)) // see semiNaiveFrom note
        delta = fresh
        i += 1
      }
    }
    (all, news.result().reduce(_ unionByName _))
  }
}
