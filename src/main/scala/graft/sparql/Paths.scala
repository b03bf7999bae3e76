package graft.sparql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.rdf.Term
import Algebra._

/** Property-path compilation and fixpoint evaluation.
  *
  * Fixed-length connectives (`/`, `|`, `^`, `!(...)`) rewrite to
  * joins/unions at compile time, mirroring ASTPropertyPathOptimizer
  * (/root/reference/bigdata-rdf/src/java/com/bigdata/rdf/sparql/ast/
  * optimizers/ASTPropertyPathOptimizer.java). Arbitrary-length paths run a
  * **semi-naive** transitive-closure loop — the frontier (new pairs only)
  * joins the edge set each round — replacing ArbitraryLengthPathOp's
  * solution re-circulation (bigdata/src/java/com/bigdata/bop/paths/
  * ArbitraryLengthPathOp.java:58-84).
  *
  * Scale posture: each round is a shuffle join on `dst`; the frontier is
  * localCheckpoint()ed to truncate lineage, and dedup against `seen` keeps
  * the frontier minimal (cycles terminate). The driver only sees counts.
  */
object Paths {

  /** Compile a path over the quad store into a distinct (src, dst) pair
    * DataFrame of term structs. Default-graph rows only (c IS NULL).
    */
  def compile(quads: DataFrame, path: Path): DataFrame = path match {
    case Link(iri) =>
      quads.filter(col("c").isNull && col("p") === Term.iri(iri))
        .select(col("s").as("src"), col("o").as("dst"))
    case Inv(p) =>
      compile(quads, p).select(col("dst").as("src"), col("src").as("dst"))
    case PSeq(a, b) =>
      val l = compile(quads, a)
      val r = compile(quads, b).withColumnRenamed("src", "mid")
      l.join(r, l("dst") === r("mid")).select(l("src"), r("dst")).distinct()
    case Alt(a, b) =>
      compile(quads, a).unionByName(compile(quads, b)).distinct()
    case ZeroOrOne(p) =>
      compile(quads, p).unionByName(identityPairs(quads)).distinct()
    case OneOrMore(p) =>
      transitiveClosure(compile(quads, p))
    case ZeroOrMore(p) =>
      transitiveClosure(compile(quads, p)).unionByName(identityPairs(quads)).distinct()
    case NegatedSet(iris) =>
      val excluded = iris.foldLeft(lit(false))((acc, i) => acc || col("p") === Term.iri(i))
      quads.filter(col("c").isNull && !excluded)
        .select(col("s").as("src"), col("o").as("dst")).distinct()
  }

  /** All graph nodes paired with themselves (zero-length path endpoints:
    * ZeroLengthPathOp.java:53 binds right = left over the node domain).
    */
  private def identityPairs(quads: DataFrame): DataFrame = {
    val nodes = quads.filter(col("c").isNull).select(col("s").as("n"))
      .unionByName(quads.filter(col("c").isNull).select(col("o").as("n")))
      .distinct()
    nodes.select(col("n").as("src"), col("n").as("dst"))
  }

  import graft.util.Fixpoint.materialize

  /** Incremental closure maintenance on edge insert: given an existing
    * closure and newly added edges, derive only the pairs the new edges
    * enable — closure ∪ (closure? · new · closure?) via delta-seeded
    * iteration, never recomputing from scratch.
    */
  def closureWithDelta(closure: DataFrame, newEdges: DataFrame,
                       maxIters: Int = 64): DataFrame = {
    val delta0 = materialize(newEdges.distinct())
    graft.util.Fixpoint.semiNaiveFrom(closure, delta0, maxIters) { (all, delta) =>
      // new pairs extend through the delta in either direction
      val fwd = delta.as("d").join(all.as("a"), col("d.dst") === col("a.src"))
        .select(col("d.src").as("src"), col("a.dst").as("dst"))
      val bwd = all.as("a").join(delta.as("d"), col("a.dst") === col("d.src"))
        .select(col("a.src").as("src"), col("d.dst").as("dst"))
      fwd.unionByName(bwd).distinct()
    }
  }

  /** Semi-naive transitive closure of a distinct (src, dst) edge set. */
  def transitiveClosure(edges: DataFrame, maxIters: Int = 64): DataFrame = {
    val e = materialize(edges.distinct())
    var all = e
    var frontier = e
    var i = 0
    while (i < maxIters) {
      val grown = frontier.as("f")
        .join(e.as("e"), col("f.dst") === col("e.src"))
        .select(col("f.src").as("src"), col("e.dst").as("dst"))
        .distinct()
      frontier = materialize(grown.except(all))
      if (frontier.isEmpty) return all
      all = materialize(all.unionByName(frontier))
      i += 1
    }
    all
  }
}
