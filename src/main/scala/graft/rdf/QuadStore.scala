package graft.rdf

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Quad-store construction and SPARQL-UPDATE-style mutation as DataFrame
  * transformations (reference: SPORelation + AST2BOpUpdate under
  * /root/reference/ — bigdata-rdf/src/java/com/bigdata/rdf/spo/
  * SPORelation.java:128, sparql/ast/eval/AST2BOpUpdate.java:385-417).
  *
  * Scale posture: a persisted store is a parquet table partitioned by a
  * predicate bucket (quads cluster naturally by `p` — the POS covering
  * index's insight) so pattern scans with a bound predicate prune files; the
  * in-memory form used by tests is the same DataFrame, unpartitioned.
  */
object QuadStore {

  /** Assemble a quads DataFrame from (s,p,o[,c]) term columns. */
  def fromTriples(dfs: Seq[DataFrame]): DataFrame =
    dfs.map(_.select(col("s"), col("p"), col("o"),
              if (dfs.head.columns.contains("c")) col("c") else Term.unbound.as("c")))
      .reduce(_ unionByName _)

  /** One relational row set → triples: for each (predicate, object column)
    * pair, emit (subjectIri, predIri, obj). Null objects are skipped.
    */
  def tripleize(rows: DataFrame, subject: Column,
                pos: Seq[(String, Column)], graph: Option[Column] = None): DataFrame = {
    val c = graph.getOrElse(Term.unbound)
    pos.map { case (p, o) =>
      rows.select(subject.as("s"), Term.iri(p).as("p"), o.as("o"), c.as("c"))
        .filter(col("o").isNotNull)
    }.reduce(_ unionByName _)
  }

  // ---- SPARQL UPDATE data operations (InsertStatementsOp /
  //      RemoveStatementsOp analogues) ----

  /** INSERT DATA / INSERT WHERE: append, bag-dedup against existing. */
  def insert(store: DataFrame, triples: DataFrame): DataFrame =
    store.unionByName(triples.select("s", "p", "o", "c")).distinct()

  /** DELETE DATA / DELETE WHERE: anti-join removal. */
  def delete(store: DataFrame, triples: DataFrame): DataFrame =
    store.join(triples.select(col("s").as("ds"), col("p").as("dp"),
                              col("o").as("do"), col("c").as("dc")),
      col("s") === col("ds") && col("p") === col("dp") &&
      col("o") === col("do") && col("c") <=> col("dc"),
      "left_anti")

  /** CLEAR GRAPH <g> / DROP GRAPH: partition-level delete on context. */
  def clearGraph(store: DataFrame, g: Column): DataFrame =
    store.filter(!(col("c") <=> g))

  /** ADD/COPY graph-to-graph. */
  def copyGraph(store: DataFrame, from: Column, to: Column): DataFrame =
    insert(store, store.filter(col("c") <=> from).withColumn("c", to))

  /** Fast cardinality estimate for an as-bound pattern (the REST API's
    * ESTCARD, /root/reference/bigdata-sails/src/java/com/bigdata/rdf/sail/
    * webapp/QueryServlet.java:116; backed there by B+Tree range counts,
    * here by a pruned parquet count — parquet stats + pushdown make it a
    * metadata-mostly scan for selective patterns).
    */
  def estcard(store: DataFrame, s: Option[Column] = None,
              p: Option[Column] = None, o: Option[Column] = None,
              c: Option[Column] = None): Long = {
    var df = store
    s.foreach(t => df = df.filter(col("s") === t))
    p.foreach(t => df = df.filter(col("p") === t))
    o.foreach(t => df = df.filter(col("o") === t))
    c.foreach(t => df = df.filter(col("c") <=> t))
    df.count()
  }

  /** Enumerate named graphs (the REST API's CONTEXTS,
    * QueryServlet.java:122): distinct non-null contexts.
    */
  def contexts(store: DataFrame): DataFrame =
    store.filter(col("c").isNotNull).select(col("c")).distinct()

  /** Bucket count for predicate partitioning — fixed so readers can derive
    * the partition filter from a constant predicate (Translator adds it).
    */
  val PBuckets = 64

  /** Persist partitioned for predicate pruning at scale: quads cluster by a
    * hash bucket of the predicate (the POS covering index's locality,
    * SPOKeyOrder.java:89-127, reborn as partition pruning).
    */
  def save(quads: DataFrame, path: String): Unit =
    quads
      .withColumn("p_bucket", pmod(hash(col("p.lex")), lit(PBuckets)))
      .write.mode("overwrite").partitionBy("p_bucket").parquet(path)

  /** Load a persisted store; keeps `p_bucket` so bound-predicate patterns
    * prune partitions (Translator.translateTp consumes and drops it).
    */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
