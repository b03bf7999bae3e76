package graft.rules

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.rdf.Term
import graft.util.Fixpoint

/** owl:sameAs reasoning (reference: RuleOwlSameAs1/2/3 under
  * /root/reference/bigdata-rdf/src/java/com/bigdata/rdf/rules/ and the
  * read-time backchainer inf/BackchainOwlSameAsIterator.java).
  *
  * Strategy: compute sameAs equivalence classes (connected components over
  * the symmetric closure — each term maps to a canonical representative),
  * then either rewrite the store onto canonical ids (`canonicalize`, the
  * scalable choice: no statement blow-up) or expand statements across all
  * members (`expand`, the reference's materialization semantics).
  */
object OwlSameAs {

  val SameAs = "http://www.w3.org/2002/07/owl#sameAs"

  /** (term, canon) mapping for every term in a sameAs clique (canonical =
    * minimum by the term total order's lexical form; deterministic).
    */
  def canonicalMap(quads: DataFrame): DataFrame = {
    val sa = quads.filter(col("c").isNull && col("p") === Term.iri(SameAs))
    val edges = sa.select(col("s").as("src"), col("o").as("dst"))
      .unionByName(sa.select(col("o").as("src"), col("s").as("dst")))
      .distinct()
    // min-label propagation on term lex (terms in sameAs cliques are IRIs)
    var labels = Fixpoint.materialize(
      edges.select(col("src").as("node")).unionByName(edges.select(col("dst").as("node")))
        .distinct().withColumn("canon", col("node")))
    // convergence by (XOR-of-row-hashes, count) fingerprint: canon labels
    // only decrease under min_by and the node set is fixed, so an unchanged
    // fingerprint means no label changed — one cheap aggregate per round
    // instead of an except() shuffle; see Fixpoint.fingerprint for the
    // residual 2^-64 collision bound
    def checksum(df: DataFrame): (Long, Long) =
      Fixpoint.fingerprint(df, col("node"), col("canon"))
    var sum0 = checksum(labels)
    var done = false
    var i = 0
    while (!done && i < 50) {
      val viaEdge = labels.join(edges, labels("node") === edges("src"))
        .select(edges("dst").as("node"), labels("canon"))
      val jump = labels.as("a").join(labels.as("b"), col("a.canon") === col("b.node"))
        .select(col("a.node").as("node"), col("b.canon").as("canon"))
      val next = Fixpoint.materialize(
        labels.unionByName(viaEdge).unionByName(jump)
          .groupBy("node")
          .agg(min_by(col("canon"), col("canon.lex")).as("canon")))
      val sum1 = checksum(next)
      if (sum1 == sum0) done = true
      sum0 = sum1
      labels = next
      i += 1
    }
    labels
  }

  /** Rewrite s/p/o onto canonical representatives (query-time semantics
    * equivalent to sameAs expansion, without materializing the cross
    * product).
    */
  def canonicalize(quads: DataFrame): DataFrame = {
    val m = canonicalMap(quads)
    def canon(df: DataFrame, pos: String) =
      df.join(m.withColumnRenamed("node", s"__n_$pos").withColumnRenamed("canon", s"__c_$pos"),
              col(pos) === col(s"__n_$pos"), "left_outer")
        .withColumn(pos, coalesce(col(s"__c_$pos"), col(pos)))
        .drop(s"__n_$pos", s"__c_$pos")
    Seq("s", "p", "o").foldLeft(quads)(canon)
      .filter(col("p") =!= Term.iri(SameAs))
      .distinct()
  }

  /** Materialize sameAs-expanded statements (RuleOwlSameAs2/3 semantics):
    * every statement holds with any clique member substituted for s or o.
    */
  def expand(quads: DataFrame): DataFrame = {
    val m = canonicalMap(quads)
    // members: canon -> each node (incl. itself)
    val members = m.select(col("canon"), col("node"))
    val base = quads.filter(col("c").isNull)
    val sExp = base.join(m.withColumnRenamed("node", "s"), Seq("s"))
      .join(members.withColumnRenamed("node", "s2"), "canon")
      .select(col("s2").as("s"), col("p"), col("o"), col("c"))
    val oExp = base.join(m.withColumnRenamed("node", "o"), Seq("o"))
      .join(members.withColumnRenamed("node", "o2"), "canon")
      .select(col("s"), col("p"), col("o2").as("o"), col("c"))
    base.unionByName(sExp).unionByName(oExp).distinct()
  }
}
