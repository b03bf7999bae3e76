package graft.gas

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.graphx.lib.ShortestPaths
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** GraphX-backed analytics — the Pregel-model execution of the same GAS
  * programs (reference: bigdata-gas engine,
  * /root/reference/bigdata-gas/src/java/com/bigdata/rdf/graph/impl/
  * GASEngine.java:73; BASELINE.json names GraphX as the intended vehicle).
  *
  * Two backends coexist deliberately: `Graphs` (DataFrame-iterative) keeps
  * everything in Catalyst/AQE land and is the default; this backend runs on
  * GraphX's Pregel machinery — vertex-partitioned RDDs — which wins when the
  * algorithm is long-running and vertex state is hot (no per-round plan
  * re-derivation).
  */
object GraphXBackend {

  private def toEdgeRdd(edges: DataFrame) =
    // queryExecution.toRdd hands over InternalRows directly — no
    // InternalRow→Row conversion per edge (the rows are reused buffers,
    // but the longs are extracted immediately, so no reference escapes)
    edges.select("src", "dst").queryExecution.toRdd
      .map(r => Edge(r.getLong(0), r.getLong(1), 1))

  private def toDf(spark: SparkSession, rows: org.apache.spark.rdd.RDD[Row],
                   schema: StructType): DataFrame =
    spark.createDataFrame(rows, schema)

  /** Connected components: component = lowest vertex id (same contract as
    * Graphs.connectedComponents).
    */
  def connectedComponents(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    val g = Graph.fromEdges(toEdgeRdd(edges), defaultValue = 0)
    val cc = g.connectedComponents().vertices.map { case (v, c) => Row(v, c) }
    toDf(spark, cc, StructType(Seq(
      StructField("node", LongType), StructField("component", LongType))))
  }

  /** Unweighted shortest-hop distances from one landmark (BFS contract). */
  def hopDistances(edges: DataFrame, source: Long): DataFrame = {
    val spark = edges.sparkSession
    val g = Graph.fromEdges(toEdgeRdd(edges), defaultValue = 0)
    val sp = ShortestPaths.run(g, Seq(source)).vertices
      .flatMap { case (v, m) => m.get(source).map(d => Row(v, d.toLong)) }
    toDf(spark, sp, StructType(Seq(
      StructField("node", LongType), StructField("depth", LongType))))
  }

  /** Static PageRank (GraphX's float implementation; for the bit-exact
    * cross-engine variant use Graphs.pagerank).
    */
  def pagerank(edges: DataFrame, iters: Int): DataFrame = {
    val spark = edges.sparkSession
    val g = Graph.fromEdges(toEdgeRdd(edges), defaultValue = 0)
    val pr = g.staticPageRank(iters).vertices.map { case (v, r) => Row(v, r) }
    toDf(spark, pr, StructType(Seq(
      StructField("node", LongType), StructField("rank", DoubleType))))
  }
}
