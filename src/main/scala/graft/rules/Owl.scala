package graft.rules

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.rdf.Term
import graft.util.Fixpoint

/** OWL property-axiom rules on top of the RDFS rule set — the subset the
  * reference's full-closure program covers beyond RDFS
  * (/root/reference/bigdata-rdf/src/java/com/bigdata/rdf/inf/ — rules
  * RuleOwlInverseOf, RuleOwlTransitiveProperty1/2, RuleOwlSymmetricProperty;
  * owl:sameAs lives separately in `OwlSameAs`):
  *
  *   owl:inverseOf          (p owl:inverseOf q), (s p o) → (o q s)   [both ways]
  *   owl:SymmetricProperty  (p a owl:SymmetricProperty), (s p o) → (o p s)
  *   owl:TransitiveProperty (p a owl:TransitiveProperty), (s p o), (o p u) → (s p u)
  *
  * These rules feed each other AND the RDFS rules (an inverse edge can
  * trigger domain typing, a subPropertyOf edge can create transitive
  * facts), so the combined closure runs as one semi-naive fixpoint over
  * the union of both rule rounds — exactly why the reference's fast
  * closure defers these to its fixpoint section.
  *
  * Scale posture: schema premises (inverseOf pairs, property typings) are
  * broadcast; per-round work is delta-proportional; transitive chains
  * close in O(closure-size) rounds of hash joins, and every round is
  * checkpointed via `Fixpoint` so lineage stays O(1).
  */
object Owl {

  private val OwlNs = "http://www.w3.org/2002/07/owl#"
  val InverseOf = OwlNs + "inverseOf"
  val TransitiveProperty = OwlNs + "TransitiveProperty"
  val SymmetricProperty = OwlNs + "SymmetricProperty"

  private def p(name: String) = Term.iri(name)

  /** One OWL rule round: consequences with ≥1 premise in `delta`. */
  private[rules] def round(all: DataFrame, delta: DataFrame): DataFrame = {
    def sel(df: DataFrame, pred: String) = df.filter(col("p") === p(pred))
    def typedProps(df: DataFrame, cls: String) =
      df.filter(col("p") === p(RDFS.RdfType) && col("o") === p(cls))
        .select(col("s").as("prop"))

    // owl:inverseOf, applied in both directions of the axiom
    def invApply(facts: DataFrame, schema: DataFrame) = {
      val h = sel(schema, InverseOf).select(col("s").as("hp"), col("o").as("hq"))
      val fwd = facts.as("f")
        .join(broadcast(h), col("f.p") === col("hp"))
        .select(col("f.o").as("s"), col("hq").as("p"), col("f.s").as("o"))
      val bwd = facts.as("f")
        .join(broadcast(h), col("f.p") === col("hq"))
        .select(col("f.o").as("s"), col("hp").as("p"), col("f.s").as("o"))
      fwd.unionByName(bwd)
    }

    def symApply(facts: DataFrame, schema: DataFrame) =
      facts.as("f")
        .join(broadcast(typedProps(schema, SymmetricProperty)),
              col("f.p") === col("prop"))
        .select(col("f.o").as("s"), col("f.p").as("p"), col("f.s").as("o"))

    // transitivity: one variant per premise position carrying the delta
    def transApply(l: DataFrame, r: DataFrame, schema: DataFrame) = {
      val props = typedProps(schema, TransitiveProperty)
      l.as("a")
        .join(broadcast(props), col("a.p") === col("prop"))
        .join(r.as("b"), col("a.p") === col("b.p") && col("a.o") === col("b.s"))
        .select(col("a.s").as("s"), col("a.p").as("p"), col("b.o").as("o"))
    }

    Seq(
      invApply(delta, all), invApply(all, delta),
      symApply(delta, all), symApply(all, delta),
      transApply(delta, all, all), transApply(all, delta, all),
      transApply(all, all, delta)
    ).reduce(_ unionByName _).distinct()
  }

  /** Combined RDFS + OWL-property closure of the default graph. */
  def closure(quads: DataFrame, maxIters: Int = 32): DataFrame = {
    val triples = quads.filter(col("c").isNull).select("s", "p", "o").distinct()
    Fixpoint.semiNaive(triples, maxIters) { (all, delta) =>
      RDFS.round(all, delta).unionByName(round(all, delta)).distinct()
    }.withColumn("c", Term.unbound)
  }
}
