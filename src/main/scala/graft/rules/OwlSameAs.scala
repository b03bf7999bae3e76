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
    // owl:sameAs edges are EXPLICIT assertions — node-sized, not
    // store-sized. Under a size guard, a driver union-find replaces the
    // distributed fixpoint entirely (no per-round checkpoint/fingerprint
    // overhead — measured 8.6s -> ~3s of the sf0.1 load); past the guard
    // the min-label-propagation loop below handles pathological
    // million-edge clique sets. Ordered union (larger root under smaller)
    // makes each root its component's minimum, and the comparison is
    // UTF-8 byte order — the same binary ordering min_by(canon, canon.lex)
    // uses — so both paths produce the identical map.
    val nEdges = edges.count()
    if (nEdges <= 100000L) {
      val rows = edges.collect()
      val utf8 = java.nio.charset.StandardCharsets.UTF_8
      // nodes key by (kind, lex), NOT lex alone: malformed sameAs data can
      // put an IRI and a bnode/literal with the same lex in one store, and
      // a lex-only key would silently merge them — diverging from the
      // distributed fixpoint, which keys by the full term struct. Root
      // ordering stays UTF-8 byte order on lex (the distributed path's
      // min_by(canon, canon.lex) ordering), kind as tiebreak.
      type K = (Byte, String)
      def keyOf(t: org.apache.spark.sql.Row): K = (t.getByte(0), t.getString(1))
      def lt(a: K, b: K): Boolean = {
        val c = java.util.Arrays.compare(a._2.getBytes(utf8), b._2.getBytes(utf8))
        if (c != 0) c < 0 else a._1 < b._1
      }
      val term = scala.collection.mutable.Map.empty[K, org.apache.spark.sql.Row]
      val parent = scala.collection.mutable.Map.empty[K, K]
      def find(x: K): K = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      rows.foreach { e =>
        val (a, b) = (e.getStruct(0), e.getStruct(1))
        Seq(a, b).foreach { t =>
          val k = keyOf(t)
          term.getOrElseUpdate(k, t)
          parent.getOrElseUpdate(k, k)
        }
        val (ra, rb) = (find(keyOf(a)), find(keyOf(b)))
        if (ra != rb) {
          if (lt(ra, rb)) parent(rb) = ra else parent(ra) = rb
        }
      }
      val out = parent.keys.toSeq.sortWith(lt).map { k =>
        org.apache.spark.sql.Row(term(k), term(find(k)))
      }
      val spark = quads.sparkSession
      return spark.createDataFrame(
        spark.sparkContext.parallelize(out, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("node", Term.schema),
          org.apache.spark.sql.types.StructField("canon", Term.schema))))
    }
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
          // lex-first ordering, kind tiebreak: deterministic even when
          // malformed data puts two term kinds on one lex (mirrors the
          // driver union-find's (kind, lex) keying)
          .agg(min_by(col("canon"),
                      struct(col("canon.lex"), col("canon.kind"))).as("canon")))
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
    val m0 = canonicalMap(quads)
    // the map is node-sized (only terms in sameAs cliques) — usually tiny
    // next to the store. The fixpoint's localCheckpoint leaves Catalyst
    // without size stats, so unhinted the three rewrite joins fall back to
    // sort-merge over the full store; broadcast under the same size guard
    // seededClosure uses (count is node-sized and already cheap), keep the
    // shuffle plan for pathological million-member clique sets
    val m = if (m0.count() <= 1000000L) broadcast(m0) else m0
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
