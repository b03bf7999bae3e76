package graft.sparql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.rdf.Term
import Algebra._
import Translator.Result

/** SELECT / ASK / CONSTRUCT / DESCRIBE query forms
  * (reference: QueryType.java:8-10, ASTConstructIterator, CBD.java under
  * /root/reference/bigdata-rdf/src/java/com/bigdata/rdf/sparql/ast/).
  */
object QueryForms {

  /** ASK: does at least one solution exist? */
  def ask(quads: DataFrame, node: Node): Boolean =
    !Translator.translate(quads, node).df.isEmpty

  /** A CONSTRUCT template triple: each position is a variable name, a
    * constant term column, or a fresh-per-solution blank node label.
    */
  sealed trait TPos
  final case class TVar(name: String) extends TPos
  final case class TConst(term: Column) extends TPos
  final case class TBnode(label: String) extends TPos

  /** CONSTRUCT: instantiate the template once per solution; rows with any
    * unbound position are dropped (per spec); output distinct triples.
    *
    * Blank-node scoping: a fresh bnode per (solution, label) — realized as a
    * content-addressed label (md5 of the solution's projected values), which
    * is deterministic across retries/replays, unlike a counter
    * (ASTConstructIterator uses per-solution fresh bnodes; determinism is our
    * addition for replay safety).
    */
  def construct(quads: DataFrame, node: Node,
                template: Seq[(TPos, TPos, TPos)]): DataFrame =
    constructQuads(quads, node, template, template.map(_ => None)).drop("c")

  /** Quads-template CONSTRUCT — the reference's TriG-style template
    * extension (`CONSTRUCT { GRAPH ?g { ... } }`, ASTConstructIterator's
    * quads handling, exercised by its govtrack CI queries). `graphs` is
    * parallel to `template`; None = default graph (c null).
    */
  def constructQuads(quads: DataFrame, node: Node,
                     template: Seq[(TPos, TPos, TPos)],
                     graphs: Seq[Option[TPos]]): DataFrame = {
    val res = Translator.translate(quads, node)
    // an empty WHERE {} yields one zero-column solution — struct() of no
    // fields is invalid, so key on a constant
    val solutionKey =
      if (res.df.columns.isEmpty) md5(lit(""))
      else md5(to_json(struct(res.df.columns.sorted.toIndexedSeq.map(col): _*)))
    def materialize(p: TPos): Column = p match {
      case TVar(n) => if (res.vars(n)) col(n) else Term.unbound
      case TConst(t) => t
      case TBnode(l) => Term.bnode(concat(lit(l), lit("-"), solutionKey))
    }
    template.zip(graphs).map { case ((s, p, o), g) =>
      res.df.select(materialize(s).as("s"), materialize(p).as("p"),
                    materialize(o).as("o"),
                    g.map(materialize).getOrElse(Term.unbound).as("c"))
        .filter(col("s").isNotNull && col("p").isNotNull && col("o").isNotNull &&
                // a GRAPH-templated triple with unbound graph is dropped
                (if (g.isDefined) col("c").isNotNull else lit(true)))
    }.reduce(_ unionByName _).distinct()
  }

  /** DESCRIBE ForwardOneStep (the reference's DescribeModeEnum option):
    * only the nodes' OUTGOING statements, one step, no bnode closure.
    */
  def describeForward(quads: DataFrame, nodes: DataFrame): DataFrame = {
    val dflt = quads.filter(col("c").isNull).select("s", "p", "o")
    dflt.join(nodes.select(col("n")).distinct(), dflt("s") === col("n"))
      .select("s", "p", "o").distinct()
  }

  /** DESCRIBE via symmetric Concise Bounded Description: statements where
    * the node is subject or object, expanding through blank nodes up to
    * `maxSteps` (CBD.java semantics, simplified: bnode closure).
    */
  def describe(quads: DataFrame, nodes: DataFrame, maxSteps: Int = 8): DataFrame = {
    val dflt = quads.filter(col("c").isNull).select("s", "p", "o")
    var frontier = nodes.select(col("n")).distinct()
    var triples: DataFrame = null
    var seenNodes = frontier
    var i = 0
    var done = false
    while (i < maxSteps && !done) {
      val out = dflt.join(frontier, dflt("s") === frontier("n")).select("s", "p", "o")
      val in = dflt.join(frontier, dflt("o") === frontier("n")).select("s", "p", "o")
      val step = out.unionByName(in).distinct()
      triples = if (triples == null) step else triples.unionByName(step).distinct()
      // continue only through blank nodes reached as objects/subjects
      val newNodes = step.select(col("o").as("n")).filter(Term.isBnode(col("n")))
        .unionByName(step.select(col("s").as("n")).filter(Term.isBnode(col("n"))))
        .distinct()
        .except(seenNodes)
        .localCheckpoint(true)
      if (newNodes.isEmpty) done = true
      else { seenNodes = seenNodes.unionByName(newNodes); frontier = newNodes }
      i += 1
    }
    if (triples == null) dflt.limit(0) else triples
  }

  /** DESCRIBE via the W3C Concise Bounded Description proper (the
    * reference's DescribeModeEnum.CBD; CBD.java): OUTGOING statements only,
    * closed over blank-node objects, plus the CBD of every reification of a
    * statement already in the description (r rdf:subject s; rdf:predicate p;
    * rdf:object o matching an included (s,p,o)).
    */
  def describeCbd(quads: DataFrame, nodes: DataFrame, maxSteps: Int = 8): DataFrame = {
    val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    val dflt = quads.filter(col("c").isNull).select("s", "p", "o")
    def forwardClosure(start: DataFrame): DataFrame = {
      var frontier = start.select(col("n")).distinct()
      var triples: DataFrame = null
      var seenNodes = frontier
      var i = 0
      var done = false
      while (i < maxSteps && !done) {
        val step = dflt.join(frontier, dflt("s") === frontier("n"))
          .select("s", "p", "o").distinct()
        triples = if (triples == null) step else triples.unionByName(step).distinct()
        val newNodes = step.select(col("o").as("n")).filter(Term.isBnode(col("n")))
          .distinct()
          .except(seenNodes)
          .localCheckpoint(true)
        if (newNodes.isEmpty) done = true
        else { seenNodes = seenNodes.unionByName(newNodes); frontier = newNodes }
        i += 1
      }
      if (triples == null) dflt.limit(0) else triples
    }
    val base = forwardClosure(nodes)
    val reifiers = reifiersOf(dflt, base)
    if (reifiers.isEmpty) base
    else base.unionByName(forwardClosure(reifiers)).distinct()
  }

  /** Symmetric Concise Bounded Description (the reference's
    * DescribeModeEnum.SCBD, CBD.java:162): the symmetric closure (both
    * directions through blank nodes) PLUS the SCBD of every reification of
    * a statement already in the description.
    */
  def describeScbd(quads: DataFrame, nodes: DataFrame, maxSteps: Int = 8): DataFrame = {
    val dflt = quads.filter(col("c").isNull).select("s", "p", "o")
    val base = describe(quads, nodes, maxSteps)
    val reifiers = reifiersOf(dflt, base)
    if (reifiers.isEmpty) base
    else base.unionByName(describe(quads, reifiers, maxSteps)).distinct()
  }

  /** Reification closure support: nodes r whose (rdf:subject,
    * rdf:predicate, rdf:object) triple matches a statement already in the
    * description `base`. Returned as a one-column `n` frame.
    */
  private def reifiersOf(dflt: DataFrame, base: DataFrame): DataFrame = {
    val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    val rs = dflt.filter(col("p") === Term.iri(RdfNs + "subject"))
      .select(col("s").as("r"), col("o").as("rs"))
    val rp = dflt.filter(col("p") === Term.iri(RdfNs + "predicate"))
      .select(col("s").as("r2"), col("o").as("rp"))
    val ro = dflt.filter(col("p") === Term.iri(RdfNs + "object"))
      .select(col("s").as("r3"), col("o").as("ro"))
    rs.join(rp, col("r") === col("r2")).join(ro, col("r") === col("r3"))
      .join(base, col("rs") === base("s") && col("rp") === base("p") &&
                  col("ro") === base("o"))
      .select(col("r").as("n")).distinct()
  }

  /** SELECT result projected to plain (lex or numeric) columns — the bridge
    * from term structs to a relational result surface.
    */
  def selectLex(res: Result, vars: Seq[String]): DataFrame =
    res.df.select(vars.map(v => Term.lex(col(v)).as(v)): _*)
}
