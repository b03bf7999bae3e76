package graft.rules

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.rdf.Term
import graft.util.Fixpoint

/** RDFS forward-chaining inference: materialize the closure of the core
  * entailment rules over the statement relation.
  *
  * Reference: the datalog-style closure programs in
  * /root/reference/bigdata-rdf/src/java/com/bigdata/rdf/rules/ —
  * InferenceEngine.java:69 orchestrates FastClosure.java:28 /
  * FullClosure.java:17 over one-class-per-rule implementations
  * (RuleRdfs02/03/05/07/09/11). Here each rule is a DataFrame self-join and
  * the program is a single semi-naive loop: each round joins only the
  * *delta* against the accumulated store, the same work-avoidance the
  * reference gets from its "new vs old" focus sets.
  *
  * Scale posture: rule joins shuffle on the join term; the schema-level
  * relations (subClassOf/subPropertyOf/domain/range) are typically tiny and
  * broadcast; the closure loop checkpoints per round (Fixpoint).
  */
object RDFS {

  val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  val RdfsNs = "http://www.w3.org/2000/01/rdf-schema#"
  val RdfType: String = RdfNs + "type"
  val SubClassOf: String = RdfsNs + "subClassOf"
  val SubPropertyOf: String = RdfsNs + "subPropertyOf"
  val Domain: String = RdfsNs + "domain"
  val Range: String = RdfsNs + "range"

  private def p(name: String): Column = Term.iri(name)

  /** One inference round: candidate triples derivable with at least one
    * premise in `delta`. Works on (s,p,o) triples (default graph).
    */
  private[rules] def round(all: DataFrame, delta: DataFrame): DataFrame = {
    def sel(df: DataFrame, pred: String) = df.filter(col("p") === p(pred))

    // rdfs5: subPropertyOf transitivity
    def spoTrans(l: DataFrame, r: DataFrame) =
      sel(l, SubPropertyOf).as("a")
        .join(sel(r, SubPropertyOf).as("b"), col("a.o") === col("b.s"))
        .select(col("a.s").as("s"), p(SubPropertyOf).as("p"), col("b.o").as("o"))

    // rdfs7: (s p o), (p subPropertyOf q) -> (s q o)
    def spoApply(facts: DataFrame, schema: DataFrame) =
      facts.as("f")
        .join(broadcast(sel(schema, SubPropertyOf).as("h")), col("f.p") === col("h.s"))
        .select(col("f.s").as("s"), col("h.o").as("p"), col("f.o").as("o"))

    // rdfs2: (p domain c), (s p o) -> (s type c)
    def domApply(facts: DataFrame, schema: DataFrame) =
      facts.as("f")
        .join(broadcast(sel(schema, Domain).as("h")), col("f.p") === col("h.s"))
        .select(col("f.s").as("s"), p(RdfType).as("p"), col("h.o").as("o"))

    // rdfs3: (p range c), (s p o) -> (o type c)
    def rngApply(facts: DataFrame, schema: DataFrame) =
      facts.as("f")
        .join(broadcast(sel(schema, Range).as("h")), col("f.p") === col("h.s"))
        .select(col("f.o").as("s"), p(RdfType).as("p"), col("h.o").as("o"))

    // rdfs11: subClassOf transitivity
    def scoTrans(l: DataFrame, r: DataFrame) =
      sel(l, SubClassOf).as("a")
        .join(sel(r, SubClassOf).as("b"), col("a.o") === col("b.s"))
        .select(col("a.s").as("s"), p(SubClassOf).as("p"), col("b.o").as("o"))

    // rdfs9: (s type c1), (c1 subClassOf c2) -> (s type c2)
    def scoApply(facts: DataFrame, schema: DataFrame) =
      sel(facts, RdfType).as("f")
        .join(broadcast(sel(schema, SubClassOf).as("h")), col("f.o") === col("h.s"))
        .select(col("f.s").as("s"), p(RdfType).as("p"), col("h.o").as("o"))

    Seq(
      spoTrans(delta, all), spoTrans(all, delta),
      spoApply(delta, all), spoApply(all, delta),
      domApply(delta, all), domApply(all, delta),
      rngApply(delta, all), rngApply(all, delta),
      scoTrans(delta, all), scoTrans(all, delta),
      scoApply(delta, all), scoApply(all, delta)
    ).reduce(_ unionByName _).distinct()
  }

  /** Materialized RDFS closure of the default graph. Returns the input store
    * plus inferred triples (c NULL).
    *
    * Strategy: the reference's FastClosure insight (FastClosure.java:28) —
    * order the rules so one pass suffices instead of a global fixpoint:
    *   1. transitively close subPropertyOf (rdfs5),
    *   2. apply property inheritance (rdfs7),
    *   3. apply domain/range typing (rdfs2/rdfs3) on all facts,
    *   4. transitively close subClassOf (rdfs11),
    *   5. inherit types up the class hierarchy (rdfs9).
    * Each schema closure is a log-round Paths.transitiveClosure; every rule
    * application is a single broadcast join. `closureFixpoint` remains for
    * rule sets that genuinely need it.
    */
  def closure(quads: DataFrame, maxIters: Int = 32): DataFrame = {
    import graft.sparql.Paths
    val triples = Fixpoint.materialize(
      quads.filter(col("c").isNull).select("s", "p", "o").distinct())
    def edges(pred: String) =
      triples.filter(col("p") === p(pred))
        .select(col("s").as("src"), col("o").as("dst"))
    def asTriples(pairs: DataFrame, pred: String) =
      pairs.select(col("src").as("s"), p(pred).as("p"), col("dst").as("o"))

    // 1. + 2.: property hierarchy, then inherit facts along it
    val spoClosed = Paths.transitiveClosure(edges(SubPropertyOf))
    val inherited = triples.as("f")
      .join(broadcast(spoClosed.as("h")), col("f.p") === col("h.src"))
      .select(col("f.s").as("s"), col("h.dst").as("p"), col("f.o").as("o"))
    val withInherited = Fixpoint.materialize(
      triples.unionByName(asTriples(spoClosed, SubPropertyOf))
        .unionByName(inherited).distinct())

    // 3.: domain/range typing over all facts
    def applySchema(pred: String, subjectSide: Boolean) = {
      val schema = withInherited.filter(col("p") === p(pred))
        .select(col("s").as("sp"), col("o").as("cls"))
      withInherited.as("f")
        .join(broadcast(schema), col("f.p") === col("sp"))
        .select((if (subjectSide) col("f.s") else col("f.o")).as("s"),
                p(RdfType).as("p"), col("cls").as("o"))
    }
    val typed = withInherited
      .unionByName(applySchema(Domain, subjectSide = true))
      .unionByName(applySchema(Range, subjectSide = false))

    // 4. + 5.: class hierarchy, then inherit types up it
    val scoClosed = Paths.transitiveClosure(
      typed.filter(col("p") === p(SubClassOf))
        .select(col("s").as("src"), col("o").as("dst")))
    val typedAll = Fixpoint.materialize(typed.distinct())
    val superTypes = typedAll.filter(col("p") === p(RdfType)).as("f")
      .join(broadcast(scoClosed.as("h")), col("f.o") === col("h.src"))
      .select(col("f.s").as("s"), p(RdfType).as("p"), col("h.dst").as("o"))

    typedAll
      .unionByName(asTriples(scoClosed, SubClassOf))
      .unionByName(superTypes)
      .distinct()
      .withColumn("c", Term.unbound)
  }

  /** The axiomatic RDFS rules the reference treats as optional/backchained
    * (rdf1, rdfs4a/4b, rdfs6, rdfs8, rdfs10, rdfs12, rdfs13 — rules/
    * RuleRdf01.java, RuleRdfs04a.java …): every predicate is a
    * rdf:Property, every term a rdfs:Resource, reflexive sub-axioms, etc.
    * Materialized only on request — they inflate the store (one triple per
    * distinct term) without changing join results, which is why the
    * reference backchains rdfs4 instead of storing it.
    */
  def axiomaticClosure(closed: DataFrame): DataFrame = {
    val RdfProperty = RdfNs + "Property"
    val RdfsResource = RdfsNs + "Resource"
    val RdfsClass = RdfsNs + "Class"
    val RdfsLiteral = RdfsNs + "Literal"
    val RdfsDatatype = RdfsNs + "Datatype"
    val RdfsCMP = RdfsNs + "ContainerMembershipProperty"
    val RdfsMember = RdfsNs + "member"
    val t = closed.select("s", "p", "o")
    def tri(s: Column, pred: String, o: Column) =
      Seq(s.as("s"), p(pred).as("p"), o.as("o"))
    // rdf1: (s p o) → (p a rdf:Property)
    val rdf1 = t.select(tri(col("p"), RdfType, p(RdfProperty)): _*).distinct()
    // rdfs4a/4b: every subject/object is a rdfs:Resource
    val res = t.select(col("s").as("n")).unionByName(t.select(col("o").as("n")))
      .distinct().select(tri(col("n"), RdfType, p(RdfsResource)): _*)
    // rdfs6: (p a Property) → (p subPropertyOf p)
    val rdfs6 = rdf1.select(tri(col("s"), SubPropertyOf, col("s")): _*)
    // rdfs8 + rdfs10: (c a Class) → (c subClassOf Resource), (c subClassOf c)
    val classes = t.filter(col("p") === p(RdfType) && col("o") === p(RdfsClass))
      .select(col("s").as("n")).distinct()
    val rdfs8 = classes.select(tri(col("n"), SubClassOf, p(RdfsResource)): _*)
    val rdfs10 = classes.select(tri(col("n"), SubClassOf, col("n")): _*)
    // rdfs12: (p a ContainerMembershipProperty) → (p subPropertyOf member)
    val rdfs12 = t.filter(col("p") === p(RdfType) && col("o") === p(RdfsCMP))
      .select(tri(col("s"), SubPropertyOf, p(RdfsMember)): _*)
    // rdfs13: (d a Datatype) → (d subClassOf Literal)
    val rdfs13 = t.filter(col("p") === p(RdfType) && col("o") === p(RdfsDatatype))
      .select(tri(col("s"), SubClassOf, p(RdfsLiteral)): _*)
    val axioms = Seq(rdf1, res, rdfs6, rdfs8, rdfs10, rdfs12, rdfs13)
      .reduce(_ unionByName _).withColumn("c", Term.unbound)
    // new subPropertyOf/subClassOf axioms can fire the core rules once more
    closure(closed.unionByName(axioms))
  }

  /** General fixpoint closure (FullClosure analogue) — for rule sets whose
    * derivations feed each other in cycles the ordered pass can't cover.
    */
  def closureFixpoint(quads: DataFrame, maxIters: Int = 32): DataFrame = {
    val triples = quads.filter(col("c").isNull).select("s", "p", "o").distinct()
    val closed = Fixpoint.semiNaive(triples, maxIters)(round)
    closed.withColumn("c", Term.unbound)
  }

  /** Incremental closure maintenance on ASSERT (TruthMaintenance.java:110's
    * assert path): given an already-closed store and newly inserted
    * triples, derive only the consequences of the delta — no full
    * recomputation.
    */
  def incrementalClosure(closedQuads: DataFrame, inserted: DataFrame): DataFrame =
    incrementalClosureWithDelta(closedQuads, inserted)._1

  /** incrementalClosure that ALSO returns the asserted delta (inserted
    * triples new to the store plus every inferred consequence) as a
    * materialized checkpoint — the O(delta) feed for change listeners; the
    * tracking rides the dedup shuffles the fixpoint pays anyway.
    */
  def incrementalClosureWithDelta(closedQuads: DataFrame,
                                  inserted: DataFrame)
      : (DataFrame, DataFrame) = {
    val closed = closedQuads.filter(col("c").isNull).select("s", "p", "o")
    val delta = inserted.filter(col("c").isNull).select("s", "p", "o").distinct()
    val (all, news) = Fixpoint.semiNaiveFromTracked(closed, delta, 32)(round)
    (all.withColumn("c", Term.unbound), news.withColumn("c", Term.unbound))
  }

  /** Incremental retraction via delete-and-rederive (DRed — Gupta, Mumick
    * & Subrahmanian's classic maintenance algorithm; the set-at-a-time
    * answer to the reference's per-statement justification chains,
    * TruthMaintenance.java:110's retract path):
    *
    *   1. OVERDELETE — semi-naive sweep collecting every consequence with
    *      at least one premise in the deleted set (transitively);
    *   2. DELETE — drop the overdeleted set from the closure, keeping the
    *      surviving explicit base;
    *   3. REDERIVE — overdeleted triples still derivable in one step from
    *      the remainder re-enter and propagate to fixpoint.
    *
    * No justification index is stored: at 100 TB a per-triple proof table
    * rivals the store itself, while DRed's sweeps are the same shuffle
    * shape as closure maintenance. `base` is the explicitly-asserted store
    * (the closure alone cannot distinguish asserted from inferred).
    */
  def retractClosure(closedQuads: DataFrame, base: DataFrame,
                     deleted: DataFrame, maxIters: Int = 32): DataFrame = {
    val closed = closedQuads.filter(col("c").isNull).select("s", "p", "o")
    val baseT = base.filter(col("c").isNull).select("s", "p", "o").distinct()
    val del0 = deleted.filter(col("c").isNull).select("s", "p", "o").distinct()

    // 1. overdelete: fixpoint of "derivable using >=1 overdeleted premise"
    var od = Fixpoint.materialize(del0)
    var frontier = od
    var i = 0
    var growing = true
    while (growing && i < maxIters) {
      val fresh = Fixpoint.materialize(round(closed, frontier).except(od))
      if (fresh.isEmpty) growing = false
      else { od = Fixpoint.materialize(od.unionByName(fresh)); frontier = fresh; i += 1 }
    }

    // 2. delete, restoring base triples that were not explicitly removed
    val remaining = Fixpoint.materialize(
      closed.except(od).unionByName(baseT.except(del0)).distinct())

    // 3. rederive: overdeleted triples with a surviving one-step derivation
    val seeds = round(remaining, remaining).intersect(od)
    Fixpoint.semiNaiveFrom(remaining, seeds, maxIters)(round)
      .withColumn("c", Term.unbound)
  }

  /** Backward-chaining rewrite for queries that only need inferred `type`
    * facts (BackchainTypeResourceIterator analogue): expands a type pattern
    * to direct + subclass-inherited types without materializing the closure.
    */
  def typesWithInference(quads: DataFrame): DataFrame = {
    val triples = quads.filter(col("c").isNull)
    val direct = triples.filter(col("p") === p(RdfType)).select("s", "o")
    val sco = graft.sparql.Paths.transitiveClosure(
      triples.filter(col("p") === p(SubClassOf))
        .select(col("s").as("src"), col("o").as("dst")))
    direct.unionByName(
        direct.as("d").join(sco.as("h"), col("d.o") === col("h.src"))
          .select(col("d.s").as("s"), col("h.dst").as("o")))
      .distinct()
  }
}
