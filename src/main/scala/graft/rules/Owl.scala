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
  val FunctionalProperty = OwlNs + "FunctionalProperty"
  val InverseFunctionalProperty = OwlNs + "InverseFunctionalProperty"
  val EquivalentClass = OwlNs + "equivalentClass"
  val EquivalentProperty = OwlNs + "equivalentProperty"
  val Restriction = OwlNs + "Restriction"
  val OnProperty = OwlNs + "onProperty"
  val HasValue = OwlNs + "hasValue"

  private def p(name: String) = Term.iri(name)

  private def sel(df: DataFrame, pred: String) = df.filter(col("p") === p(pred))
  private def typedProps(df: DataFrame, cls: String) =
    df.filter(col("p") === p(RDFS.RdfType) && col("o") === p(cls))
      .select(col("s").as("prop"))

  /** owl:inverseOf round, applied in both directions of the axiom. */
  private def invRound(all: DataFrame, delta: DataFrame): DataFrame = {
    def apply1(facts: DataFrame, schema: DataFrame) = {
      val h = sel(schema, InverseOf).select(col("s").as("hp"), col("o").as("hq"))
      val fwd = facts.as("f")
        .join(broadcast(h), col("f.p") === col("hp"))
        .select(col("f.o").as("s"), col("hq").as("p"), col("f.s").as("o"))
      val bwd = facts.as("f")
        .join(broadcast(h), col("f.p") === col("hq"))
        .select(col("f.o").as("s"), col("hp").as("p"), col("f.s").as("o"))
      fwd.unionByName(bwd)
    }
    apply1(delta, all).unionByName(apply1(all, delta))
  }

  /** owl:SymmetricProperty round. */
  private def symRound(all: DataFrame, delta: DataFrame): DataFrame = {
    def apply1(facts: DataFrame, schema: DataFrame) =
      facts.as("f")
        .join(broadcast(typedProps(schema, SymmetricProperty)),
              col("f.p") === col("prop"))
        .select(col("f.o").as("s"), col("f.p").as("p"), col("f.s").as("o"))
    apply1(delta, all).unionByName(apply1(all, delta))
  }

  /** owl:TransitiveProperty round: one variant per premise position. */
  private def transRound(all: DataFrame, delta: DataFrame): DataFrame = {
    def apply1(l: DataFrame, r: DataFrame, schema: DataFrame) = {
      val props = typedProps(schema, TransitiveProperty)
      l.as("a")
        .join(broadcast(props), col("a.p") === col("prop"))
        .join(r.as("b"), col("a.p") === col("b.p") && col("a.o") === col("b.s"))
        .select(col("a.s").as("s"), col("a.p").as("p"), col("b.o").as("o"))
    }
    apply1(delta, all, all).unionByName(apply1(all, delta, all))
      .unionByName(apply1(all, all, delta))
  }

  /** owl:FunctionalProperty / owl:InverseFunctionalProperty → owl:sameAs:
    * (p a FunctionalProperty), (s p o1), (s p o2) → (o1 sameAs o2);
    * the inverse-functional form equates SUBJECTS sharing (p, o). Emitted
    * sameAs triples then feed `OwlSameAs.canonicalMap/canonicalize`.
    */
  private def funcRound(all: DataFrame, delta: DataFrame): DataFrame = {
    def pairs(facts1: DataFrame, facts2: DataFrame, schema: DataFrame,
              cls: String, bySubject: Boolean) = {
      val (key, out) = if (bySubject) ("s", "o") else ("o", "s")
      facts1.as("a")
        .join(broadcast(typedProps(schema, cls)), col("a.p") === col("prop"))
        .join(facts2.as("b"),
              col("a.p") === col("b.p") && col(s"a.$key") === col(s"b.$key") &&
              !(col(s"a.$out") <=> col(s"b.$out")))
        .select(col(s"a.$out").as("s"), p(SameAsIri).as("p"), col(s"b.$out").as("o"))
    }
    Seq(
      pairs(delta, all, all, FunctionalProperty, bySubject = true),
      pairs(all, delta, all, FunctionalProperty, bySubject = true),
      pairs(all, all, delta, FunctionalProperty, bySubject = true),
      pairs(delta, all, all, InverseFunctionalProperty, bySubject = false),
      pairs(all, delta, all, InverseFunctionalProperty, bySubject = false),
      pairs(all, all, delta, InverseFunctionalProperty, bySubject = false)
    ).reduce(_ unionByName _)
  }

  /** owl:equivalentClass / owl:equivalentProperty round: symmetry (the
    * reference's RuleOwlEquivalentClass/Property heads) plus membership /
    * statement propagation (OWL-RL cax-eqc1/2, prp-eqp1/2 — what makes the
    * axioms observable in query answers):
    *
    *   (a eqc b) → (b eqc a);  (x type a), (a eqc b) → (x type b)
    *   (p eqp q) → (q eqp p);  (s p o), (p eqp q) → (s q o)
    */
  private def equivRound(all: DataFrame, delta: DataFrame): DataFrame = {
    def symm(facts: DataFrame, pred: String) =
      sel(facts, pred).select(col("o").as("s"), col("p"), col("s").as("o"))
    def member(facts: DataFrame, schema: DataFrame) = {
      val eq = sel(schema, EquivalentClass)
        .select(col("s").as("c1"), col("o").as("c2"))
      facts.filter(col("p") === p(RDFS.RdfType)).as("f")
        .join(broadcast(eq), col("f.o") === col("c1"))
        .select(col("f.s").as("s"), p(RDFS.RdfType).as("p"), col("c2").as("o"))
    }
    def stmt(facts: DataFrame, schema: DataFrame) = {
      val eq = sel(schema, EquivalentProperty)
        .select(col("s").as("p1"), col("o").as("p2"))
      facts.as("f")
        .join(broadcast(eq), col("f.p") === col("p1"))
        .select(col("f.s").as("s"), col("p2").as("p"), col("f.o").as("o"))
    }
    Seq(symm(delta, EquivalentClass), symm(delta, EquivalentProperty),
        member(delta, all), member(all, delta),
        stmt(delta, all), stmt(all, delta))
      .reduce(_ unionByName _)
  }

  /** owl:hasValue round (the reference's RuleOwlHasValue direction):
    *   (x type a), (a type Restriction), (a onProperty p'), (a hasValue v)
    *   → (x p' v)
    */
  private def hasValueRound(all: DataFrame, delta: DataFrame): DataFrame = {
    def restr(onProp: DataFrame, hasVal: DataFrame, typeR: DataFrame) = {
      val r1 = sel(onProp, OnProperty).select(col("s").as("r"), col("o").as("rp"))
      val r2 = sel(hasVal, HasValue).select(col("s").as("r2"), col("o").as("rv"))
      val r3 = typeR.filter(col("p") === p(RDFS.RdfType) && col("o") === p(Restriction))
        .select(col("s").as("r3"))
      r1.join(r2, col("r") === col("r2")).join(r3, col("r") === col("r3"))
        .select(col("r"), col("rp"), col("rv"))
    }
    def fwd(facts: DataFrame, schema: DataFrame) =
      facts.filter(col("p") === p(RDFS.RdfType)).as("f")
        .join(broadcast(schema), col("f.o") === col("r"))
        .select(col("f.s").as("s"), col("rp").as("p"), col("rv").as("o"))
    Seq(
      fwd(delta, restr(all, all, all)),
      fwd(all, restr(delta, all, all)),
      fwd(all, restr(all, delta, all)),
      fwd(all, restr(all, all, delta))
    ).reduce(_ unionByName _)
  }

  private val SameAsIri = OwlSameAs.SameAs

  /** One OWL rule round: consequences with ≥1 premise in `delta`. */
  private[rules] def round(all: DataFrame, delta: DataFrame): DataFrame =
    Seq(invRound(all, delta), symRound(all, delta), transRound(all, delta),
        funcRound(all, delta), equivRound(all, delta), hasValueRound(all, delta))
      .reduce(_ unionByName _).distinct()

  /** Combined RDFS + OWL-property closure of the default graph.
    *
    * The rule program is COMPILED against the axioms actually present
    * (one count aggregation up front): rules whose schema premise is empty
    * never enter the fixpoint — the reference's closure program does the
    * same (its rule list depends on the ontology), and with e.g. only a
    * TransitiveProperty axiom the round shrinks from 19 join branches to 3.
    */
  def closure(quads: DataFrame, maxIters: Int = 32): DataFrame = {
    val triples = quads.filter(col("c").isNull).select("s", "p", "o").distinct()
    def cnt(cond: org.apache.spark.sql.Column) =
      sum(when(cond, 1L).otherwise(0L))
    val isType = col("p") === p(RDFS.RdfType)
    val present = triples.agg(
      cnt(col("p") === p(InverseOf)).as("inv"),
      cnt(isType && col("o") === p(SymmetricProperty)).as("sym"),
      cnt(isType && col("o") === p(TransitiveProperty)).as("trans"),
      cnt(col("p") === p(RDFS.SubPropertyOf) || col("p") === p(RDFS.SubClassOf) ||
          col("p") === p(RDFS.Domain) || col("p") === p(RDFS.Range)).as("rdfs"),
      cnt(isType && (col("o") === p(FunctionalProperty) ||
                     col("o") === p(InverseFunctionalProperty))).as("func"),
      cnt(col("p") === p(EquivalentClass) ||
          col("p") === p(EquivalentProperty)).as("equiv"),
      cnt(col("p") === p(HasValue)).as("hasval")
    ).head()
    val rounds: Seq[(DataFrame, DataFrame) => DataFrame] =
      (if (present.getLong(3) > 0) Seq(RDFS.round _) else Nil) ++
      (if (present.getLong(0) > 0) Seq(invRound _) else Nil) ++
      (if (present.getLong(1) > 0) Seq(symRound _) else Nil) ++
      (if (present.getLong(2) > 0) Seq(transRound _) else Nil) ++
      (if (present.getLong(4) > 0) Seq(funcRound _) else Nil) ++
      (if (present.getLong(5) > 0) Seq(equivRound _) else Nil) ++
      (if (present.getLong(6) > 0) Seq(hasValueRound _) else Nil)
    if (rounds.isEmpty) return triples.withColumn("c", Term.unbound)
    def fix(facts: DataFrame): DataFrame =
      Fixpoint.semiNaive(facts, maxIters) { (all, delta) =>
        rounds.map(r => r(all, delta)).reduce(_ unionByName _).distinct()
      }
    // Narrow the fixpoint to the ACTIVE subset — facts that can ever fire
    // a compiled premise. Without the RDFS round (whose domain/range rules
    // make every statement a premise), those are: rdf:type facts, schema
    // statements, and facts whose predicate an axiom names. Everything
    // else is inert and unions back after the fixpoint, instead of paying
    // the per-round distinct/except shuffles over the whole store (at
    // sf0.1 this cut the equivalence-closure build from 129s to the cost
    // of the ~10x-smaller active set). The reference's rule programs scope
    // the same way: each rule's access paths bind to its axiom constants.
    val rdfsOn = present.getLong(3) > 0
    if (rdfsOn) return fix(triples).withColumn("c", Term.unbound)
    // Size guard (count-then-choose, like the sameAs union-find guard):
    // the axiom-property set is schema-sized by assumption, but an
    // adversarial store could make it store-sized — return None past the
    // guard instead of OOMing the driver, and the caller falls back to the
    // unfiltered fixpoint (a semantically-identical superset active set).
    val axiomGuard = 100000
    def axiomProps(df: DataFrame): Option[Set[String]] = {
      val fromPairs = df
        .filter(col("p") === p(InverseOf) || col("p") === p(EquivalentProperty))
      val lexes = fromPairs.select(Term.lex(col("s")).as("l"))
        .unionByName(fromPairs.select(Term.lex(col("o")).as("l")))
        .unionByName(df.filter(isType &&
            (col("o") === p(SymmetricProperty) || col("o") === p(TransitiveProperty) ||
             col("o") === p(FunctionalProperty) || col("o") === p(InverseFunctionalProperty)))
          .select(Term.lex(col("s")).as("l")))
        .unionByName(df.filter(col("p") === p(OnProperty))
          .select(Term.lex(col("o")).as("l")))
      val rows = lexes.distinct().limit(axiomGuard + 1).collect()
      if (rows.length > axiomGuard) None
      else Some(rows.map(_.getString(0)).toSet)
    }
    val propsOpt = axiomProps(triples)
    if (propsOpt.isEmpty) return fix(triples).withColumn("c", Term.unbound)
    val props = propsOpt.get
    val isSchema = col("p") === p(InverseOf) || col("p") === p(EquivalentClass) ||
      col("p") === p(EquivalentProperty) || col("p") === p(OnProperty) ||
      col("p") === p(HasValue) || col("p") === p(RDFS.SubPropertyOf) ||
      col("p") === p(RDFS.SubClassOf) || col("p") === p(RDFS.Domain) ||
      col("p") === p(RDFS.Range)
    val isActive = isSchema || isType ||
      (if (props.isEmpty) lit(false) else Term.lex(col("p")).isin(props.toSeq: _*))
    val closedActive = fix(triples.filter(isActive))
    // metamodeling safety: if the fixpoint derived an axiom over a property
    // the static scope missed (e.g. a property equivalent to owl:
    // equivalentProperty deriving new schema), previously-inert facts could
    // become premises — redo unfiltered. Never fires on real ontologies.
    // one final distinct (a derived fact can coincide with an inert base
    // fact, e.g. an asserted sameAs the functional rule re-derives) —
    // one full-store shuffle instead of one per round
    val out =
      if (axiomProps(closedActive).exists(_.subsetOf(props)))
        triples.filter(!isActive).unionByName(closedActive).distinct()
      else fix(triples)
    out.withColumn("c", Term.unbound)
  }
}
