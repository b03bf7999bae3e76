package graft.sparql

import org.apache.spark.sql.{Column, DataFrame}

/** SPARQL algebra IR.
  *
  * The analogue of the reference's AST (QueryRoot and friends,
  * /root/reference/bigdata-rdf/src/java/com/bigdata/rdf/sparql/ast/), reduced
  * to the algebraic core; the translator (Translator.scala) plays the role of
  * AST2BOpUtility.convert (sparql/ast/eval/AST2BOpUtility.java:205), emitting
  * a declarative DataFrame plan instead of a BOp pipeline.
  *
  * Value expressions are represented as resolver functions
  * `(String => Column) => Column`: given a variable resolver they produce a
  * Column over term structs. A text parser producing these closures from
  * SPARQL expression syntax layers on top without changing the IR.
  */
object Algebra {

  /** An expression over the in-scope variables. */
  type Expr = (String => Column) => Column

  /** Aggregate expression: applied inside groupBy().agg(...). */
  type AggExpr = (String => Column) => Column

  sealed trait Pat
  /** A variable position. */
  final case class V(name: String) extends Pat
  /** A constant term (built with graft.rdf.Term constructors). */
  final case class C(term: Column) extends Pat

  /** Triple/quad pattern; `g` None = default graph (c IS NULL). */
  final case class TriplePattern(s: Pat, p: Pat, o: Pat, g: Option[Pat] = None)

  /** Property path between two patterns (compiled by Paths). */
  sealed trait Path
  final case class Link(iri: String) extends Path
  final case class Inv(p: Path) extends Path
  final case class PSeq(a: Path, b: Path) extends Path
  final case class Alt(a: Path, b: Path) extends Path
  final case class ZeroOrMore(p: Path) extends Path
  final case class OneOrMore(p: Path) extends Path
  final case class ZeroOrOne(p: Path) extends Path
  /** Exactly zero steps — `p{0}` (quantifier desugaring); matches every
    * node of the zero-length domain with itself. `p` only scopes the
    * reference dialect's vertex domain.
    */
  final case class ZeroLength(p: Path) extends Path
  /** Negated property set: any predicate not in `iris`. */
  final case class NegatedSet(iris: Seq[String]) extends Path

  sealed trait Node
  /** `fixedOrder` pins the written pattern order (the reference's
    * `hint:Query hint:optimizer "None"` — QueryHints.java:92,
    * QueryOptimizerEnum.None): the translator skips its static/sampled
    * join-order heuristics and evaluates patterns exactly as authored.
    */
  final case class Bgp(tps: Seq[TriplePattern],
                       fixedOrder: Boolean = false) extends Node
  /** Arbitrary-length path pattern (ArbitraryLengthPathOp.java:87).
    * `g` is the enclosing GRAPH context (None = default graph); a variable
    * context evaluates the path per named graph and binds the variable.
    */
  final case class PathPattern(s: Pat, path: Path, o: Pat,
                               g: Option[Pat] = None) extends Node
  final case class Filter(cond: Expr, child: Node) extends Node
  final case class Join(l: Node, r: Node) extends Node
  /** OPTIONAL; `cond` participates in the join per SPARQL LeftJoin.
    * `existsBinds` carries EXISTS{} patterns hoisted from the optional
    * group's FILTERs when they reference left-side variables: the markers
    * bind over the MERGED candidate solutions (18.2's LeftJoin(P1, P2, F)
    * evaluates F over merge(mu1, mu2)) and `cond` reads them.
    */
  final case class LeftJoin(l: Node, r: Node, cond: Option[Expr] = None,
                            existsBinds: Seq[(String, Node)] = Nil) extends Node
  final case class Union(l: Node, r: Node) extends Node
  /** SPARQL MINUS (NotExists solution-set hash join w/ shared-var rule,
    * AST2BOpUtility.java:3393-3399). */
  final case class Minus(l: Node, r: Node) extends Node
  /** FILTER EXISTS / NOT EXISTS (ASTExistsOptimizer). */
  final case class ExistsFilter(child: Node, sub: Node, negated: Boolean) extends Node
  /** A FILTER whose expression embeds EXISTS{} operands (e.g.
    * `FILTER(?a = ?b || NOT EXISTS {...})`): each (marker, pattern) bind
    * evaluates to a boolean column the condition reads, dropped after the
    * filter applies (the reference's askVar form, ASTExistsOptimizer). */
  final case class FilterExists(cond: Expr, binds: Seq[(String, Node)],
                                child: Node) extends Node
  /** A value-binding expression (BIND / SELECT expression / ORDER BY key /
    * GROUP BY key) that embeds EXISTS{} operands: like [[FilterExists]] but
    * the condition's value binds to `v` instead of filtering — the
    * reference's askVar rewrite applies in EVERY expression position
    * (ASTExistsOptimizer.java). */
  final case class ExtendExists(v: String, expr: Expr,
                                binds: Seq[(String, Node)],
                                child: Node) extends Node
  /** BIND(expr AS ?v). */
  final case class Extend(v: String, expr: Expr, child: Node) extends Node
  final case class Project(vars: Seq[String], child: Node) extends Node
  final case class Distinct(child: Node) extends Node
  final case class OrderBy(keys: Seq[(String, Boolean)], child: Node) extends Node
  final case class Slice(offset: Long, limit: Long, child: Node) extends Node
  /** GROUP BY + aggregates; empty keys = single global group. */
  final case class Group(keys: Seq[String], aggs: Seq[(String, AggExpr)],
                         child: Node) extends Node
  /** Inline solution sequence (VALUES): a pre-built DataFrame of term
    * structs, one column per variable. */
  final case class Values(df: DataFrame, certain: Set[String]) extends Node
  /** GRAPH ?g / GRAPH <iri> group: rewrites child patterns' graph position. */
  final case class GraphNode(g: Pat, child: Node) extends Node

  /** RDF-star / SIDs-mode quoted-triple pattern `<< s p o >>`: matches the
    * ASSERTED statement (s,p,o) and binds `sidVar` to its statement
    * identifier, so meta-statements join on the SID (reference:
    * STATEMENT_IDENTIFIERS mode, AbstractTripleStore.java:787).
    */
  final case class SidPattern(s: Pat, p: Pat, o: Pat, sidVar: String) extends Node
  /** SERVICE <iri> { config BGP }: evaluated by a registered internal
    * service (Services.scala), result joined into the group. */
  /** SERVICE group: `config` feeds internal (graft://) services; for
    * http(s) endpoints `remoteQuery` carries the full SPARQL text
    * (prefixes + SELECT * over the group) shipped to the remote server.
    */
  final case class ServiceNode(iri: String, config: Seq[TriplePattern],
                               remoteQuery: Option[String] = None,
                               silent: Boolean = false) extends Node

  /** `SERVICE ?v { ... }` — endpoint bound at runtime by sibling patterns
    * (the reference's ServiceCallJoin with a variable service ref,
    * bigdata/src/java/com/bigdata/bop/controller/ServiceCallJoin.java:103).
    * Translated by the enclosing Join: distinct IRI bindings of `v` from
    * the partner side select the endpoints to contact.
    */
  final case class ServiceVarNode(v: String, remoteQuery: String,
                                  silent: Boolean = false) extends Node

  /** Structural map over every Bgp in the tree (query-hint application:
    * the parser rewrites Bgps when `hint:optimizer "None"` pins order).
    * Values/ServiceNode/SidPattern/PathPattern are leaves here.
    */
  /** Syntactic in-scope variables of a pattern (SPARQL 18.2.1) — the vars
    * a node can bind. MINUS's right side and EXISTS subpatterns bind
    * nothing outward; Project limits to its projection.
    */
  def inScopeVars(n: Node): Set[String] = n match {
    case Bgp(tps, _) => tps.flatMap(tp =>
      Seq(tp.s, tp.p, tp.o) ++ tp.g.toSeq).collect { case V(v) => v }.toSet
    case PathPattern(s, _, o, g) =>
      (Seq(s, o) ++ g.toSeq).collect { case V(v) => v }.toSet
    case Filter(_, ch) => inScopeVars(ch)
    case Join(l, r) => inScopeVars(l) ++ inScopeVars(r)
    case LeftJoin(l, r, _, _) => inScopeVars(l) ++ inScopeVars(r)
    case Union(l, r) => inScopeVars(l) ++ inScopeVars(r)
    case Minus(l, _) => inScopeVars(l)
    case ExistsFilter(ch, _, _) => inScopeVars(ch)
    case FilterExists(_, _, ch) => inScopeVars(ch)
    case ExtendExists(v, _, _, ch) => inScopeVars(ch) + v
    case Extend(v, _, ch) => inScopeVars(ch) + v
    case Project(vs, _) => vs.toSet
    case Distinct(ch) => inScopeVars(ch)
    case OrderBy(_, ch) => inScopeVars(ch)
    case Slice(_, _, ch) => inScopeVars(ch)
    case Group(keys, aggs, _) => keys.toSet ++ aggs.map(_._1)
    case Values(df, _) => df.columns.toSet
    case GraphNode(g, ch) =>
      inScopeVars(ch) ++ (g match { case V(v) => Set(v); case _ => Set.empty })
    case SidPattern(s, p, o, sidVar) =>
      Seq(s, p, o).collect { case V(v) => v }.toSet + sidVar
    case ServiceNode(_, config, _, _) => config.flatMap(tp =>
      Seq(tp.s, tp.p, tp.o) ++ tp.g.toSeq).collect { case V(v) => v }.toSet
    case ServiceVarNode(v, _, _) => Set(v)
  }

  def transformBgps(n: Node)(f: Bgp => Bgp): Node = n match {
    case b: Bgp => f(b)
    case Filter(c, ch) => Filter(c, transformBgps(ch)(f))
    case Join(l, r) => Join(transformBgps(l)(f), transformBgps(r)(f))
    case LeftJoin(l, r, c, ex) =>
      LeftJoin(transformBgps(l)(f), transformBgps(r)(f), c,
               ex.map { case (v, s) => (v, transformBgps(s)(f)) })
    case Union(l, r) => Union(transformBgps(l)(f), transformBgps(r)(f))
    case Minus(l, r) => Minus(transformBgps(l)(f), transformBgps(r)(f))
    case ExistsFilter(ch, s, neg) =>
      ExistsFilter(transformBgps(ch)(f), transformBgps(s)(f), neg)
    case FilterExists(c, binds, ch) =>
      FilterExists(c, binds.map { case (v, s) => (v, transformBgps(s)(f)) },
                   transformBgps(ch)(f))
    case ExtendExists(v, e, binds, ch) =>
      ExtendExists(v, e, binds.map { case (mv, s) => (mv, transformBgps(s)(f)) },
                   transformBgps(ch)(f))
    case Extend(v, e, ch) => Extend(v, e, transformBgps(ch)(f))
    case Project(vs, ch) => Project(vs, transformBgps(ch)(f))
    case Distinct(ch) => Distinct(transformBgps(ch)(f))
    case OrderBy(ks, ch) => OrderBy(ks, transformBgps(ch)(f))
    case Slice(o, l, ch) => Slice(o, l, transformBgps(ch)(f))
    case Group(ks, as, ch) => Group(ks, as, transformBgps(ch)(f))
    case GraphNode(g, ch) => GraphNode(g, transformBgps(ch)(f))
    case leaf => leaf
  }
}
