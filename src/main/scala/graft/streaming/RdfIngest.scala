package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{StructField, StructType}
import graft.rdf.{NTriples, QuadStore, Term}
import graft.rules.RDFS

/** Streaming RDF ingestion with incremental inference — the streaming
  * composition of the reference's load path (StatementBuffer) and assert-
  * side truth maintenance (TruthMaintenance.java:110): each micro-batch of
  * N-Triples lines parses, derives ONLY the new consequences against the
  * already-closed store (semi-naive assert), and publishes a new store
  * version with an atomic commit. Readers always see a complete closed
  * snapshot; a crashed batch leaves the pointer untouched.
  *
  * Scale posture: per-batch work is proportional to the delta (the
  * incremental closure never recomputes), and the commit is one immutable
  * version directory — the same shape a 1000-executor cluster writing to
  * object storage uses.
  */
object RdfIngest {

  private val quadSchema = StructType(Seq(
    StructField("s", Term.schema), StructField("p", Term.schema),
    StructField("o", Term.schema), StructField("c", Term.schema)))

  private def emptyStore(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], quadSchema)

  /** One ingestion step (also the foreachBatch body): parse the lines,
    * extend the closed store, commit. Returns the new version.
    */
  def ingestBatch(spark: SparkSession, lines: DataFrame, root: String): Long = {
    import org.apache.spark.sql.functions.col
    val triples = NTriples.parseLines(spark, lines)
    val current =
      if (QuadStore.currentVersion(root) >= 0)
        QuadStore.open(spark, root).drop("p_bucket")
      else emptyStore(spark)
    // the closure already derives exactly this batch's new default-graph
    // quads — thread them (plus the batch's new named-graph quads) into
    // the commit so change listeners read O(delta) checkpointed frames
    // instead of a full snapshot diff
    val (closed, defaultDelta) =
      RDFS.incrementalClosureWithDelta(current, triples)
    // keep explicitly named graphs from the delta (closure covers the
    // default graph; quads with a context pass through unchanged)
    val named = triples.filter(col("c").isNotNull)
    val namedDelta = graft.util.Fixpoint.materialize(
      named.select("s", "p", "o", "c").except(current.select("s", "p", "o", "c")))
    val withNamed = closed.unionByName(named)
    val asserted = defaultDelta.unionByName(namedDelta)
    val retracted = asserted.limit(0)
    QuadStore.commit(withNamed.distinct(), root,
                     knownDelta = Some((asserted, retracted)))
  }

  /** Start the streaming ingestion over a DataFrame of N-Triples lines
    * (column `value`) — file stream, socket, or MemoryStream in tests.
    *
    * Exactly-once across retries: foreachBatch may replay a batch after a
    * failure, so each committed version records the batch id that produced
    * it; a replayed batch id is skipped instead of double-committed (the
    * sink-side idempotence Structured Streaming asks of foreachBatch).
    */
  def startIngest(lines: DataFrame, root: String): StreamingQuery =
    lines.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val marker = new java.io.File(s"$root/_batch_$batchId")
        if (!marker.exists()) {
          ingestBatch(batch.sparkSession, batch, root)
          marker.createNewFile()
        }
        ()
      }
      .start()
}
