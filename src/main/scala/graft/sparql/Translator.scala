package graft.sparql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.rdf.Term
import Algebra._

/** Algebra → DataFrame translator (the analogue of AST2BOpUtility.convert,
  * /root/reference/bigdata-rdf/src/java/com/bigdata/rdf/sparql/ast/eval/
  * AST2BOpUtility.java:205).
  *
  * A solution set is a DataFrame with one term-struct column per variable;
  * unbound = NULL (IBindingSet with absent key,
  * /root/reference/bigdata/src/java/com/bigdata/bop/IBindingSet.java).
  *
  * Variable-scope tracking: each translated node carries `certain` (bound in
  * every solution) and `maybe` (possibly unbound — introduced under OPTIONAL
  * or a one-sided UNION arm). Joins use plain equality on certainly-bound
  * shared vars — Catalyst then picks broadcast/SMJ/SHJ freely — and fall back
  * to SPARQL *compatibility* semantics (unbound matches anything, values
  * merge) only where a var may be unbound, mirroring the solution-set hash
  * join's treatment (JVMHashJoinUtility.java:73; see SURVEY.md §7.4).
  *
  * Scale posture: everything here is declarative — no collect, no driver
  * loops (property paths excepted, see Paths). BGP joins shuffle on shared
  * variables; filters/constants reach the parquet scan via pushdown.
  */
object Translator {

  private val gvCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  final case class Result(df: DataFrame, certain: Set[String], maybe: Set[String]) {
    def vars: Set[String] = certain ++ maybe
  }

  /** Entry point: translate `node` against the quad store (columns s,p,o,c
    * as term structs; c NULL = default graph).
    */
  def translate(quads: DataFrame, node: Node): Result = node match {

    case Bgp(tps, fixedOrder) =>
      require(tps.nonEmpty, "empty BGP")
      val ordered = if (fixedOrder) tps else orderPatterns(tps)
      ordered.map(tp => translateTp(quads, tp))
        .reduce((l, r) => join(l, r, "inner", None))

    case PathPattern(s, path, o, g) =>
      // a top-level closure with a constant endpoint evaluates SEEDED
      // (frontier expansion from the bound term, ALP-style) — never the
      // whole-graph closure filtered after the fact; zero-length rows come
      // from the constant-identity supplement below, which makes the two
      // plans return identical pair sets in every dialect
      val closureInner = path match {
        case OneOrMore(p) => Some(p)
        case ZeroOrMore(p) => Some(p)
        case _ => None
      }
      val flatGraph = !g.exists(_.isInstanceOf[V])
      var pairs = (closureInner, s, o) match {
        case (Some(p), C(t), _) if flatGraph =>
          Paths.seededClosure(quads, p, g, t, fromSrc = true)
        case (Some(p), _, C(t)) if flatGraph =>
          Paths.seededClosure(quads, p, g, t, fromSrc = false)
        case _ => Paths.compile(quads, path, g) // (src, dst[, g]) term structs
      }
      // a zero-length-capable path from a BOUND endpoint always matches the
      // endpoint itself, even if it never occurs in the path's relation —
      // supplement the pair set with the constant's identity pair
      if (Paths.admitsZeroLength(path) && !g.exists(_.isInstanceOf[V])) {
        val consts = Seq(s, o).collect { case C(t) => t }
        consts.foreach { t =>
          val idRow = quads.sparkSession.range(1)
            .select(t.as("src"), t.as("dst"))
          // add the identity pair only when absent — a global distinct()
          // here would collapse the bag multiplicity of fixed-length
          // alternation paths (pp27: :p{,3} keeps duplicate solutions)
          val missing = idRow.join(pairs,
            idRow("src") <=> pairs("src") && idRow("dst") <=> pairs("dst"),
            "left_anti")
          pairs = pairs.unionByName(missing)
        }
      }
      bindEnds(pairs, s, o, g)

    case Filter(cond, child) =>
      val c = translate(quads, child)
      // SPARQL: filter error (NULL) counts as false
      c.copy(df = c.df.filter(coalesce(cond(resolver(c)), lit(false))))

    // gearing (ALP-style): a zero-length-capable path whose endpoint vars
    // the join partner binds must also match values OUTSIDE the path's own
    // relation — the partner-bound value paired with itself. The regular
    // pair set covers in-relation identities; supplement the rest.
    case Join(p @ PathPattern(V(_), path, V(_), None), r)
        if Paths.admitsZeroLength(path) && !r.isInstanceOf[PathPattern] =>
      translate(quads, Join(r, p)) // inner join commutes; put the path right

    // re-associate so a zero-length-capable path nested deeper in the join
    // tree still sees every partner that binds its endpoints (the
    // reference's ticket-739 shape: BIND . ?X part? ?part . ?part ?p ?Z —
    // the path must gear against ?part bindings from the LATER pattern)
    case Join(Join(a, p @ PathPattern(V(_), path, V(_), None)), r)
        if Paths.admitsZeroLength(path) && !r.isInstanceOf[PathPattern] =>
      translate(quads, Join(Join(a, r), p))

    case Join(l, p @ PathPattern(V(a), path, V(b), None))
        if Paths.admitsZeroLength(path) =>
      val lr = translate(quads, l)
      if (!lr.vars(a) && !lr.vars(b))
        join(lr, translate(quads, p), "inner", None)
      else {
        val regular = join(lr, translate(quads, p), "inner", None)
        // an UNBOUND endpoint contributes no zero-length identity (the
        // regular compat join already covers unbound rows)
        val zl: Result =
          if (lr.vars(a) && lr.vars(b))
            lr.copy(df = lr.df.filter(col(a) === col(b)))
          else if (lr.vars(a))
            Result(lr.df.filter(col(a).isNotNull).withColumn(b, col(a)),
                   lr.certain, lr.maybe + b)
          else
            Result(lr.df.filter(col(b).isNotNull).withColumn(a, col(b)),
                   lr.certain, lr.maybe + a)
        // only values outside the relation's vertex domain (in-domain
        // identity pairs already joined above — avoids double counting)
        val pairs = Paths.compile(quads, path, None)
        val nodes = pairs.select(col("src").as("__pn"))
          .unionByName(pairs.select(col("dst").as("__pn"))).distinct()
        val probe = if (lr.vars(a)) a else b
        val zlOut = zl.df.join(nodes, col(probe) === col("__pn"), "left_anti")
        val allVars = (regular.vars ++ zl.vars).toSeq.sorted
        def pad(df: DataFrame, vars: Set[String]) =
          allVars.foldLeft(df)((d, v) =>
            if (vars(v)) d else d.withColumn(v, Term.unbound))
        Result(
          pad(regular.df, regular.vars).select(allVars.map(col): _*)
            .unionByName(pad(zlOut, zl.vars).select(allVars.map(col): _*)),
          regular.certain intersect (zl.certain ++ Seq(a, b)),
          (regular.vars ++ zl.vars) --
            (regular.certain intersect (zl.certain ++ Seq(a, b))))
      }

    // SERVICE ?v: endpoints come from the partner side's bindings of ?v —
    // evaluate the partner first, contact each distinct endpoint IRI, and
    // join the union of their solutions (tagged with ?v) back in. The
    // endpoint list is collected on the driver: it is a set of service
    // URLs, inherently small, and each contact is a driver-side protocol
    // call anyway (ServiceCallJoin does the same vectored dispatch).
    case Join(l, s: ServiceVarNode) =>
      serviceVarJoin(quads, translate(quads, l), s)
    case Join(s: ServiceVarNode, r) =>
      serviceVarJoin(quads, translate(quads, r), s)
    case s: ServiceVarNode =>
      throw new IllegalArgumentException(
        s"SERVICE ?${s.v} has no sibling patterns binding the endpoint")

    case Join(l, r) =>
      join(translate(quads, l), translate(quads, r), "inner", None)

    case LeftJoin(l, r, cond, binds) if binds.isEmpty =>
      join(translate(quads, l), translate(quads, r), "left_outer", cond)

    case LeftJoin(l, r, cond, binds) =>
      // EXISTS markers in the LeftJoin condition evaluate over the MERGED
      // candidate solutions (18.2): inner-join the candidates, bind the
      // markers with one outer join each (bindMarkers), filter, then
      // re-add the left rows with no surviving partner. The complement anti-joins on
      // the left row's VALUES — sound because value-identical left rows
      // pass or fail identically.
      val lc = translate(quads, l); val rc = translate(quads, r)
      val shared = (lc.vars intersect rc.vars).toSeq.sorted
      val rdf = rc.vars.toSeq.foldLeft(rc.df)((d, v) => d.withColumnRenamed(v, ren(v)))
      val eqs = shared.map { v =>
        if (lc.certain(v) && rc.certain(v)) col(v) === col(ren(v))
        else compatCond(col(v), col(ren(v)))
      }
      var cands = lc.df.join(rdf, eqs.reduceOption(_ && _).getOrElse(lit(true)), "inner")
      // snapshot the left row before merging shared columns, for the
      // unmatched-complement join below
      val lvars = lc.vars.toSeq.sorted
      lvars.foreach(v => cands = cands.withColumn(s"__lj_$v", col(v)))
      shared.foreach(v => cands = cands
        .withColumn(v, coalesce(col(v), col(ren(v)))).drop(ren(v)))
      (rc.vars -- lc.vars).toSeq.foreach(v =>
        cands = cands.withColumnRenamed(ren(v), v))
      val candsRes = Result(cands, lc.certain ++ rc.certain,
                            (lc.vars ++ rc.vars) -- (lc.certain ++ rc.certain))
      val df = bindMarkers(quads, candsRes, binds, cands)
      val markers = binds.map(_._1).toSet
      val res: String => Column = v =>
        if (markers(v)) col(v) else resolver(candsRes)(v)
      val kept = df.filter(cond.map(c => coalesce(c(res), lit(false)))
                               .getOrElse(lit(true)))
        .drop(binds.map(_._1): _*)
      val allVars = (lc.vars ++ rc.vars).toSeq.sorted
      val keptL = kept.select(lvars.map(v => col(s"__lj_$v").as(ren(v))): _*)
      val unmatched = lc.df.join(keptL,
        lvars.map(v => col(v) <=> col(ren(v))).reduceOption(_ && _)
          .getOrElse(lit(true)), "left_anti")
      val padded = (rc.vars -- lc.vars).toSeq
        .foldLeft(unmatched)((d, v) => d.withColumn(v, Term.unbound))
      Result(kept.select(allVars.map(col): _*)
               .unionByName(padded.select(allVars.map(col): _*)),
             lc.certain, (lc.vars ++ rc.vars) -- lc.certain)

    case Union(l, r) =>
      val (lr, rr) = (translate(quads, l), translate(quads, r))
      val allVars = (lr.vars ++ rr.vars).toSeq.sorted
      def pad(x: Result) = allVars.foldLeft(x.df)((d, v) =>
        if (x.vars(v)) d else d.withColumn(v, Term.unbound))
      Result(pad(lr).select(allVars.map(col): _*)
               .unionByName(pad(rr).select(allVars.map(col): _*)),
             lr.certain intersect rr.certain,
             (lr.vars ++ rr.vars) -- (lr.certain intersect rr.certain))

    case Minus(l, r) =>
      val (lr, rr) = (translate(quads, l), translate(quads, r))
      val shared = (lr.vars intersect rr.vars).toSeq.sorted
      if (shared.isEmpty) lr // disjoint domains: MINUS removes nothing
      else {
        val rdf = renameAll(rr.df)
        // vars certain on BOTH sides are never null there, so plain `===`
        // is equivalent to compatCond — and gives Catalyst equi-join keys
        // (hash anti join) instead of a nested-loop join
        val (certBoth, maybeShared) =
          shared.partition(v => lr.certain(v) && rr.certain(v))
        val conds = certBoth.map(v => col(v) === col(ren(v))) ++
          maybeShared.map(v => compatCond(col(v), col(ren(v))))
        // at least one shared var bound on both sides, else incompatible-by-
        // definition rows would be removed (SPARQL MINUS corner case);
        // any both-certain var satisfies this by construction
        val oneBound =
          if (certBoth.nonEmpty) lit(true)
          else shared.map(v => col(v).isNotNull && col(ren(v)).isNotNull)
            .reduce(_ || _)
        lr.copy(df = lr.df.join(rdf, conds.reduce(_ && _) && oneBound, "left_anti"))
      }

    case ExistsFilter(child, sub, negated) =>
      val c = translate(quads, child)
      val (sdf, cond, _) = existsJoin(quads, c, sub)
      c.copy(df = c.df.join(sdf, cond, if (negated) "left_anti" else "left_semi"))

    case FilterExists(cond, binds, child) =>
      val c = translate(quads, child)
      // each marker binds via ONE outer join on the child's value tuple
      // (bindMarkers) — no row duplication, no union fan-out, and the
      // non-equi parts of the witness condition stay inside the semi-join
      val df = bindMarkers(quads, c, binds, c.df)
      val markers = binds.map(_._1).toSet
      val res: String => Column = v =>
        if (markers(v)) col(v) else resolver(c)(v)
      val filtered = df.filter(coalesce(cond(res), lit(false)))
      Result(filtered.drop(binds.map(_._1): _*), c.certain, c.maybe)

    case ExtendExists(v, expr, binds, child) =>
      val c = translate(quads, child)
      // same marker machinery as FilterExists, but the condition's value
      // binds to `v` (BIND/SELECT/ORDER BY/GROUP BY expression positions)
      val df = bindMarkers(quads, c, binds, c.df)
      val markers = binds.map(_._1).toSet
      val res: String => Column = x =>
        if (markers(x)) col(x) else resolver(c)(x)
      Result(df.withColumn(v, expr(res)).drop(binds.map(_._1): _*),
             c.certain, c.maybe + v)

    case Extend(v, expr, child) =>
      val c = translate(quads, child)
      Result(c.df.withColumn(v, expr(resolver(c))), c.certain, c.maybe + v)

    case Project(vars, child) =>
      val c = translate(quads, child)
      Result(c.df.select(vars.map(v =>
               (if (c.vars(v)) col(v) else Term.unbound).as(v)): _*),
             c.certain intersect vars.toSet, vars.toSet -- c.certain)

    case Distinct(child) =>
      val c = translate(quads, child)
      c.copy(df = c.df.dropDuplicates())

    case OrderBy(keys, child) =>
      val c = translate(quads, child)
      val sortCols = keys.flatMap { case (v, asc) =>
        // a key over a variable the pattern never binds sorts as unbound
        // (every row equal) instead of failing analysis (ticket 737's
        // ORDER BY over an empty group)
        val kc = if (c.vars(v)) col(v) else Term.unbound
        TermOps.sortKeys(kc).map(k => if (asc) k.asc else k.desc)
      }
      // internal ORDER-BY-expression columns have served their purpose
      // once the sort is applied; SELECT * must not surface them
      val ords = keys.map(_._1).filter(_.startsWith("__ord_"))
      Result(c.df.orderBy(sortCols: _*).drop(ords: _*),
             c.certain -- ords, c.maybe -- ords)

    case Slice(off, lim, child) =>
      val c = translate(quads, child)
      val d0 = if (off > 0) c.df.offset(off.toInt) else c.df
      c.copy(df = if (lim >= 0) d0.limit(lim.toInt) else d0)

    case Group(keys, aggs, child) =>
      val c = translate(quads, child)
      val res = resolver(c)
      val aggCols = aggs.map { case (name, a) => a(res).as(name) }
      val grouped =
        if (aggs.isEmpty) c.df.select(keys.map(col): _*).dropDuplicates()
        else if (keys.isEmpty) c.df.agg(aggCols.head, aggCols.tail: _*)
        else c.df.groupBy(keys.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
      Result(grouped, keys.toSet ++ aggs.map(_._1), Set.empty)

    case Values(df, certain) =>
      Result(df, certain, df.columns.toSet -- certain)

    // GRAPH g {} — empty group: enumerate/probe the named-graph set
    // (the reference's GRAPH-with-empty-group conformance behavior)
    case GraphNode(g, Values(df, _)) if df.columns.isEmpty =>
      g match {
        case V(n) =>
          Result(quads.filter(col("c").isNotNull)
                   .select(col("c").as(n)).distinct(),
                 Set(n), Set.empty)
        case C(t) =>
          Result(quads.filter(col("c") === t).limit(1).select(), Set.empty, Set.empty)
      }

    case GraphNode(g, child) =>
      translate(quads, rewriteGraph(child, g))

    case SidPattern(s, p, o, sidVar) =>
      // like a triple pattern, but the statement's SID is also bound —
      // computed from the full (s,p,o) before projection, so meta-statement
      // joins on the SID are plain equi-joins over the same store
      var df = quads
      if (df.columns.contains("p_bucket")) df = df.drop("p_bucket")
      df = df.filter(col("c").isNull)
      val positions = Seq("s" -> s, "p" -> p, "o" -> o)
      positions.foreach {
        case (pos, C(term)) => df = df.filter(col(pos) === term)
        case _ =>
      }
      val varPos = positions.collect { case (pos, V(n)) => (pos, n) }
      varPos.groupBy(_._2).values.filter(_.size > 1).foreach { dup =>
        dup.map(_._1).sliding(2).foreach {
          case Seq(p1, p2) => df = df.filter(col(p1) === col(p2))
          case _ =>
        }
      }
      val sid = graft.rdf.QuadStore.sidOf(col("s"), col("p"), col("o"))
      val proj = varPos.distinctBy(_._2).map { case (pos, n) => col(pos).as(n) } :+
        sid.as(sidVar)
      Result(df.select(proj: _*), varPos.map(_._2).toSet + sidVar, Set.empty)

    case ServiceNode(iri, config, remote, silent) =>
      // internally-registered services win regardless of scheme (the
      // reference's ServiceRegistry also resolves registered http IRIs to
      // in-process ServiceFactories — ServiceRegistry.java toServiceCall);
      // unregistered http(s) endpoints federate over the SPARQL protocol.
      // SILENT: a failing endpoint contributes exactly one empty solution
      // (SPARQL 1.1 Federation §4), so the enclosing join is a no-op.
      def run(): Result =
        if (Services.isRegistered(iri))
          Services.lookup(iri)(quads, config)
        else if (iri.startsWith("http://") || iri.startsWith("https://"))
          Services.callRemote(quads.sparkSession, iri,
            remote.getOrElse(throw new IllegalArgumentException(
              s"SERVICE <$iri> has no remote query text")))
        else Services.lookup(iri)(quads, config)
      if (!silent) run()
      else
        try run()
        catch {
          case scala.util.control.NonFatal(_) =>
            Result(quads.sparkSession.range(1).toDF("__unit").drop("__unit"),
                   Set.empty, Set.empty)
        }
  }

  // ---- helpers ----

  /** Endpoint-count cap for `SERVICE ?v` vectored dispatch: the endpoint
    * set is collected on the driver and each endpoint is one HTTP call, so
    * an unbounded binding set would serialize the query behind thousands
    * of protocol round-trips. Endpoint sets are small by construction
    * (they name servers, not data); anything larger is almost certainly a
    * query bug — fail loudly instead of grinding.
    */
  val MaxServiceEndpoints = 64

  /** Vectored dispatch for `SERVICE ?v`: the partner result's distinct IRI
    * bindings of `v` name the endpoints; each is contacted once (internal
    * registry first, then the SPARQL protocol, concurrently across
    * endpoints) and the union of their solutions — tagged with the
    * endpoint under `v` — joins back in.
    *
    * SILENT (SPARQL 1.1 Federation §4): a FAILED endpoint contributes one
    * empty solution — the join is an identity for partner rows bound to
    * it — rather than vanishing from the union (which would inner-join
    * away its partner rows). All endpoints failing leaves `lr` unchanged.
    */
  private def serviceVarJoin(quads: DataFrame, lr: Result,
                             s: ServiceVarNode): Result = {
    val ServiceVarNode(v, remoteText, silent) = s
    require(lr.vars(v),
      s"SERVICE ?$v has no sibling patterns binding the endpoint")
    val spark = quads.sparkSession
    val endpoints = lr.df
      .filter(col(v).isNotNull && Term.isIri(col(v)))
      .select(Term.lex(col(v)).as("__ep")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    require(endpoints.size <= MaxServiceEndpoints,
      s"SERVICE ?$v binds ${endpoints.size} distinct endpoints " +
        s"(cap $MaxServiceEndpoints): refusing the serialized dispatch")
    def call(ep: String): Result =
      if (Services.isRegistered(ep)) Services.lookup(ep)(quads, Nil)
      else Services.callRemote(spark, ep, remoteText)
    // contact endpoints concurrently — each call is driver-side protocol
    // latency, not compute, so they overlap freely
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val attempts: Seq[(String, scala.util.Try[Result])] =
      Await.result(
        Future.sequence(endpoints.map(ep =>
          Future(ep -> scala.util.Try(call(ep))))),
        Duration.Inf)
    attempts.collectFirst {
      case (ep, scala.util.Failure(e)) if !silent =>
        throw new IllegalStateException(s"SERVICE <$ep> failed", e)
    }
    val ok = attempts.collect { case (ep, scala.util.Success(r)) => ep -> r }
    val failed = attempts.collect { case (ep, scala.util.Failure(_)) => ep }
    // no IRI endpoints at all: every solution's call errors — SILENT turns
    // each error into the identity (lr unchanged), loud drops every row
    if (ok.isEmpty && failed.isEmpty)
      if (silent) lr else lr.copy(df = lr.df.limit(0))
    else if (ok.isEmpty) lr // SILENT, every endpoint failed: identity
    else {
      val allVars = (ok.flatMap(_._2.vars).toSet + v).toSeq.sorted
      def pad(df: DataFrame, vars: Set[String]) =
        allVars.foldLeft(df)((d, x) =>
          if (vars(x)) d else d.withColumn(x, Term.unbound))
      val unioned = (
        ok.map { case (ep, r) =>
          pad(r.df.withColumn(v, Term.iri(ep)), r.vars + v)
            .select(allVars.map(col): _*)
        } ++
        // SILENT failures: one all-unbound solution tagged with the
        // endpoint, so its partner rows survive the join untouched
        failed.map { ep =>
          pad(spark.range(1).select(Term.iri(ep).as(v)), Set(v))
            .select(allVars.map(col): _*)
        }
      ).reduce(_ unionByName _)
      val okCertain = ok.map(_._2.certain).reduce(_ intersect _)
      val certain = (if (failed.isEmpty) okCertain else Set.empty[String]) + v
      join(lr, Result(unioned, certain, allVars.toSet -- certain),
           "inner", None)
    }
  }

  /** Greedy BGP join ordering (ASTStaticJoinOptimizer's heuristic,
    * /root/reference/bigdata-rdf/src/java/com/bigdata/rdf/sparql/ast/
    * optimizers/StaticOptimizer.java:27, without the range counts): start
    * from the most-bound pattern, then repeatedly take the pattern sharing
    * the most variables with what's bound so far (most-bound as tiebreak) —
    * selective patterns run first and cartesian intermediates are avoided.
    * Catalyst/AQE then picks physical join strategies per step.
    */
  /** When set (via translateSampled), BGP join ordering uses sampled
    * cardinalities instead of the static boundness heuristic.
    */
  private val rtoContext =
    new scala.util.DynamicVariable[Option[(DataFrame, Double)]](None)

  /** Runtime-optimizer entry point (the reference's RTO,
    * /root/reference/bigdata/src/java/com/bigdata/bop/joinGraph/rto/
    * JGraph.java: sample the join graph, then order by observed
    * cardinality): BGPs under this call order patterns by cardinalities
    * measured on a seeded sample of the store, cheapest first, still
    * connectivity-constrained. One extra aggregation job per BGP — worth it
    * exactly when the static heuristic's mis-ordering would dwarf that cost
    * (large stores, correlated predicates).
    */
  def translateSampled(quads: DataFrame, node: Node,
                       fraction: Double = 0.01): Result =
    rtoContext.withValue(Some((quads, fraction))) {
      translate(quads, node)
    }

  /** Evaluate `body` with the sampled runtime optimizer active for every
    * BGP translated inside it — the `hint:Query hint:optimizer "Runtime"`
    * surface (QueryHints.java:108-145, the RTO enable switch), usable
    * around whole query forms (ASK/CONSTRUCT/DESCRIBE), not just SELECT.
    */
  def withRuntimeSampling[T](quads: DataFrame, fraction: Double = 0.01)(body: => T): T =
    rtoContext.withValue(Some((quads, fraction)))(body)

  /** One RTO ordering decision, surfaced by EXPLAIN: the chosen pattern
    * order and each position's SAMPLED cardinality — for searched positions
    * the cardinality of the join PREFIX through that pattern, for greedy
    * tail positions the pattern's own sampled count (cutoff-truncated
    * counts on the seeded sample, not full-store estimates).
    */
  final case class RtoDecision(order: Seq[String], prefixCards: Seq[Long],
                               searched: Int)
  private val rtoDecisionTL =
    new ThreadLocal[Option[RtoDecision]] { override def initialValue() = None }
  /** The most recent BGP ordering decision made by the sampled optimizer on
    * this thread (last BGP wins — the EXPLAIN surface).
    */
  def lastRtoDecision: Option[RtoDecision] = rtoDecisionTL.get()

  private val RtoSearchLimit = 6   // exhaustive subset-DP width
  private val RtoSampleCap = 50000 // sample rows fed to pattern matching
  private val RtoCutoff = 50000    // intermediate truncation (cutoff sampling)

  /** Bounded runtime join-order SEARCH over sampled binding tables — the
    * RTO proper (the reference explores join orderings with cutoff
    * sampling at runtime, /root/reference/bigdata/src/java/com/bigdata/bop/
    * joinGraph/rto/JGraph.java:268), replacing greedy cheapest-first:
    * per-pattern matches against a seeded capped sample are collected once
    * (one tiny job per pattern on the cached sample), then a
    * Selinger-style subset DP over up to RtoSearchLimit patterns picks the
    * order minimizing the SUM of intermediate cardinalities as MEASURED by
    * in-memory joins on those sample tables (cutoff-truncated, the
    * reference's limit-step sampling); any remaining patterns append
    * greedily cheapest-connected-first. The search itself is driver-side
    * arithmetic over ≤2^6 subsets — no Spark jobs.
    *
    * Greedy cheapest-first goes wrong exactly on skewed mid-joins: a
    * low-cardinality pattern with high join fan-out beats a slightly
    * larger pattern whose join collapses the intermediate; measuring
    * prefix cardinalities on the sample catches that (HintsSpec pins a
    * fixture where the orders differ and the searched one is cheaper).
    */
  private def orderPatternsSampled(quads: DataFrame, fraction: Double,
                                   tps: Seq[TriplePattern]): Seq[TriplePattern] = {
    val sample = graft.util.Fixpoint.materialize(
      (if (fraction >= 1.0) quads else quads.sample(fraction, seed = 42L))
        .limit(RtoSampleCap))
    def pred(tp: TriplePattern): Column = {
      val posCond = Seq("s" -> tp.s, "p" -> tp.p, "o" -> tp.o).collect {
        case (pos, C(t)) => col(pos) === t
      }
      val gCond = tp.g match {
        case None => Seq(col("c").isNull)
        case Some(C(t)) => Seq(col("c") === t)
        case Some(V(_)) => Seq(col("c").isNotNull)
      }
      (posCond ++ gCond).reduce(_ && _)
    }
    def varPositions(tp: TriplePattern): Seq[(String, String)] =
      (Seq("s" -> tp.s, "p" -> tp.p, "o" -> tp.o) ++ tp.g.map("c" -> _))
        .collect { case (pos, V(n)) => (n, pos) }
    def varsOf(tp: TriplePattern): Set[String] = varPositions(tp).map(_._1).toSet

    // sampled binding table of one pattern: vars + matched rows (capped)
    final case class Table(vars: Seq[String], rows: Array[Seq[Any]], card: Long)
    def tableOf(tp: TriplePattern): Table = {
      val byVar = varPositions(tp).groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (n, ps) => (n, ps.map(_._2)) }
      // a variable repeated across positions constrains the sample match too
      val eqConds = byVar.collect { case (_, ps) if ps.size > 1 =>
        ps.sliding(2).map(w => col(w(0)) <=> col(w(1))).reduce(_ && _) }
      val cond = (Seq(pred(tp)) ++ eqConds).reduce(_ && _)
      val df =
        if (byVar.isEmpty) sample.filter(cond).select(lit(1L).as("__k"))
        else sample.filter(cond).select(byVar.map { case (n, ps) => col(ps.head).as(n) }: _*)
      val rows = df.limit(RtoCutoff).collect()
        .map(r => (0 until r.length).map(r.get): IndexedSeq[Any])
      Table(byVar.map(_._1),
            rows.map(_.toSeq), rows.length.toLong)
    }
    // in-memory hash join; rows truncate at the cutoff, card stays the
    // true (lower-bound-under-upstream-truncation) sample join count
    def joinT(a: Table, b: Table): Table = {
      val shared = a.vars.filter(b.vars.contains)
      val aIdx = shared.map(a.vars.indexOf)
      val bIdx = shared.map(b.vars.indexOf)
      val bKeep = b.vars.zipWithIndex.filterNot { case (v, _) => shared.contains(v) }
      val bMap = b.rows.groupBy(r => bIdx.map(r))
      val out = Array.newBuilder[Seq[Any]]
      var n = 0L
      var kept = 0
      a.rows.foreach { ar =>
        val ms = bMap.getOrElse(aIdx.map(ar), Array.empty[Seq[Any]])
        n += ms.length
        ms.foreach { br =>
          if (kept < RtoCutoff) { out += (ar ++ bKeep.map(k => br(k._2))); kept += 1 }
        }
      }
      Table(a.vars ++ bKeep.map(_._1), out.result(), n)
    }

    val tables0 = tps.map(tableOf)
    val byCard = tps.indices.sortBy(i => (tables0(i).card, i))
    val local = byCard.take(math.min(tps.size, RtoSearchLimit)).toArray
    val tailIdx = byCard.drop(local.length)
    val nS = local.length
    val full = (1 << nS) - 1
    val tableBy = new Array[Table](full + 1)
    val costBy = Array.fill(full + 1)(Long.MaxValue)
    val orderArr = new Array[List[Int]](full + 1)
    for (j <- 0 until nS) {
      val m = 1 << j
      tableBy(m) = tables0(local(j))
      costBy(m) = tableBy(m).card
      orderArr(m) = List(j)
    }
    val varsByLocal = local.map(i => varsOf(tps(i)))
    for (m <- 3 to full if Integer.bitCount(m) >= 2) {
      // subset join content is split-independent; compute it once from the
      // canonical lowest-bit split
      val lb = Integer.numberOfTrailingZeros(m)
      tableBy(m) = joinT(tableBy(m & ~(1 << lb)), tableBy(1 << lb))
      // best LAST pattern: connected preferred, then min accumulated cost
      var bestJ = -1; var bestCost = Long.MaxValue; var bestConn = false
      for (j <- 0 until nS if (m & (1 << j)) != 0) {
        val prev = m & ~(1 << j)
        if (costBy(prev) != Long.MaxValue) {
          val prevVars = orderArr(prev).iterator.flatMap(varsByLocal).toSet
          val conn = varsByLocal(j).exists(prevVars) || prevVars.isEmpty
          if ((conn && !bestConn) ||
              (conn == bestConn && costBy(prev) < bestCost)) {
            bestJ = j; bestCost = costBy(prev); bestConn = conn
          }
        }
      }
      costBy(m) = bestCost + tableBy(m).card
      orderArr(m) = orderArr(m & ~(1 << bestJ)) :+ bestJ
    }
    val dpOrder = if (full >= 1) orderArr(full).map(local) else Nil

    // greedy tail for BGPs wider than the search limit
    var bound = dpOrder.flatMap(i => varsOf(tps(i))).toSet
    val rem = scala.collection.mutable.LinkedHashSet(tailIdx: _*)
    val tail = Vector.newBuilder[Int]
    while (rem.nonEmpty) {
      val conn = rem.filter(i => varsOf(tps(i)).exists(bound))
      val pool = if (conn.nonEmpty) conn else rem
      val pick = pool.minBy(i => (tables0(i).card, i))
      rem -= pick; tail += pick; bound ++= varsOf(tps(pick))
    }
    val order = dpOrder ++ tail.result()

    def fmtPat(p: Pat): String = p match {
      case V(n) => "?" + n
      case C(t) =>
        "(\\S+) AS lex".r.findFirstMatchIn(t.toString)
          .map(m => "<" + m.group(1) + ">").getOrElse("<const>")
    }
    def label(tp: TriplePattern): String =
      s"{${fmtPat(tp.s)} ${fmtPat(tp.p)} ${fmtPat(tp.o)}}"
    val prefixCards =
      dpOrder.indices.map { k =>
        tableBy(dpOrder.take(k + 1).map(i => 1 << local.indexOf(i)).sum).card
      } ++ tail.result().map(i => tables0(i).card)
    rtoDecisionTL.set(Some(RtoDecision(order.map(i => label(tps(i))),
                                       prefixCards, dpOrder.length)))
    order.map(tps)
  }

  private def orderPatterns(tps: Seq[TriplePattern]): Seq[TriplePattern] = {
    rtoContext.value match {
      case Some((quads, fraction)) if tps.size > 2 =>
        return orderPatternsSampled(quads, fraction, tps)
      case _ =>
    }
    if (tps.size <= 2) return tps
    def pats(tp: TriplePattern): Seq[Pat] = Seq(tp.s, tp.p, tp.o) ++ tp.g.toSeq
    def boundness(tp: TriplePattern): Int = pats(tp).count(_.isInstanceOf[C])
    def vars(tp: TriplePattern): Set[String] = pats(tp).collect { case V(n) => n }.toSet
    val remaining = scala.collection.mutable.ArrayBuffer(tps: _*)
    val ordered = Vector.newBuilder[TriplePattern]
    var bound = Set.empty[String]
    val first = remaining.maxBy(tp => (boundness(tp), -remaining.indexOf(tp)))
    remaining -= first
    ordered += first
    bound ++= vars(first)
    while (remaining.nonEmpty) {
      val next = remaining.maxBy(tp =>
        ((vars(tp) intersect bound).size, boundness(tp), -remaining.indexOf(tp)))
      remaining -= next
      ordered += next
      bound ++= vars(next)
    }
    ordered.result()
  }

  private def ren(v: String): String = s"__r_$v"

  private def renameAll(df: DataFrame): DataFrame =
    df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, ren(c)))

  /** SPARQL compatibility: unbound on either side matches. */
  private def compatCond(l: Column, r: Column): Column =
    l.isNull || r.isNull || l === r

  private def resolver(c: Result): String => Column =
    v => if (c.vars(v)) col(v) else Term.unbound

  /** Bind every EXISTS marker variable in `binds` onto `df0` as a boolean
    * column — ONE left_outer join per marker, never a semi/anti union pair.
    * The pair construction (union of `df semi sdf` and `df anti sdf`)
    * re-reads the accumulated frame on BOTH branches, so K markers build
    * 2^K leaf scans of the child; here each marker costs one semi-join of
    * the ORIGINAL child (markers are mutually independent — every
    * `existsJoin` correlates against `c`, not the accumulated frame) plus
    * one equi-join on the child's full variable tuple: K+1 linear scans.
    *
    * Soundness: EXISTS is a function of the outer solution's VALUES
    * (SPARQL §8.1.1 substitution), so value-identical rows pass or fail
    * identically — joining the marker on the null-safe value tuple binds
    * the right answer to every duplicate. The hit frame is `distinct()` on
    * exactly the join key, so the left_outer join matches each outer row
    * at most once and bag multiplicity is preserved.
    */
  private def bindMarkers(quads: DataFrame, c: Result,
                          binds: Seq[(String, Node)],
                          df0: DataFrame): DataFrame = {
    def mk(v: String) = s"__mk_$v"
    var df = df0
    binds.foreach { case (mv, subNode) =>
      val (sdf, jc, corr) = existsJoin(quads, c, subNode)
      // the witness condition depends ONLY on the correlation vars
      // (shared equi/compat vars + outer vars the correlated filters
      // read), so the hit frame keys on exactly those — at scale its
      // distinct state is correlation-width, not whole-row-width
      val key = corr.toSeq.sorted
      val hits = c.df.join(sdf, jc, "left_semi")
        .select(key.map(col): _*).distinct()
        .select(key.map(v => col(v).as(mk(v))) :+ lit(true).as(mv): _*)
      val cond = key.map(v => col(v) <=> col(mk(v)))
        .reduceOption(_ && _).getOrElse(lit(true))
      df = df.join(hits, cond, "left_outer")
        .withColumn(mv, coalesce(col(mv), lit(false)))
        .drop(key.map(mk): _*)
    }
    df
  }

  /** The (renamed inner frame, join condition, correlation vars) for an
    * EXISTS sub-pattern against the outer result `c`. EXISTS is
    * *correlated*: filters at the top of the inner group see the outer
    * solution's bindings (SPARQL §8.1.1 substitution; the reference
    * evaluates EXISTS as a hash join feeding the outer bindings in) —
    * peel them off and evaluate over the merged row. Shared certain-both
    * vars equi-join (hash join); the rest use unbound-compatible
    * comparison. The returned var set is every OUTER var the condition
    * reads (shared vars + filter-referenced outer vars) — the condition
    * is a function of exactly these, so marker state may key on them.
    */
  private def existsJoin(quads: DataFrame, c: Result,
                         sub: Node): (DataFrame, Column, Set[String]) = {
    def peel(n: Node, acc: Vector[Expr]): (Node, Vector[Expr]) = n match {
      case Filter(cond, ch) => peel(ch, acc :+ cond)
      case other => (other, acc)
    }
    val (core, innerFilters) = peel(sub, Vector.empty)
    val s = translate(quads, core)
    val shared = (c.vars intersect s.vars).toSeq.sorted
    val sdf = renameAll(s.df)
    val eqs = shared.map { v =>
      if (c.certain(v) && s.certain(v)) col(v) === col(ren(v))
      else compatCond(col(v), col(ren(v)))
    }
    // inner vars resolve to the (renamed) inner side, outer-only vars to
    // the outer row — the correlated-filter environment. Expression
    // building is pure Column construction, so the resolver doubles as
    // the recorder of which outer-only vars the filters actually read.
    val outerRefs = scala.collection.mutable.Set.empty[String]
    val mergedResolver: String => Column = v =>
      if (s.vars(v)) col(ren(v))
      else if (c.vars(v)) { outerRefs += v; col(v) }
      else graft.rdf.Term.unbound
    val fconds = innerFilters.map(f => coalesce(f(mergedResolver), lit(false)))
    val all = eqs ++ fconds
    (sdf, if (all.isEmpty) lit(true) else all.reduce(_ && _),
     shared.toSet ++ outerRefs)
  }

  // package-visible: the bd:sample / bd:slice registry services evaluate
  // a single access-path pattern through the same translation
  private[sparql] def translateTp(quads: DataFrame, tp: TriplePattern): Result = {
    val positions: Seq[(String, Pat)] = Seq(
      "s" -> tp.s, "p" -> tp.p, "o" -> tp.o,
      "c" -> tp.g.getOrElse(null)).filter(_._2 != null)
    var df = quads
    // persisted stores carry p_bucket: a constant predicate derives the
    // partition filter (partition pruning ≈ choosing the POS index)
    tp.p match {
      case C(term) if df.columns.contains("p_bucket") =>
        df = df.filter(col("p_bucket") ===
          pmod(hash(graft.rdf.Term.lex(term)), lit(graft.rdf.QuadStore.PBuckets)))
      case _ =>
    }
    if (df.columns.contains("p_bucket")) df = df.drop("p_bucket")
    // default graph = rows with NULL context; GRAPH ?g ranges over *named*
    // graphs only, so a variable graph position excludes the default graph
    tp.g match {
      case None => df = df.filter(col("c").isNull)
      case Some(V(_)) => df = df.filter(col("c").isNotNull)
      case _ =>
    }
    // constants filter the scan
    positions.foreach {
      case (pos, C(term)) => df = df.filter(col(pos) === term)
      case _ =>
    }
    // repeated variables add intra-pattern equality
    val varPos = positions.collect { case (pos, V(n)) => (pos, n) }
    varPos.groupBy(_._2).values.filter(_.size > 1).foreach { dup =>
      dup.map(_._1).sliding(2).foreach {
        case Seq(p1, p2) => df = df.filter(col(p1) === col(p2))
        case _ =>
      }
    }
    val selected = varPos.map(_._2).distinct
    val proj = varPos.distinctBy(_._2).map { case (pos, n) => col(pos).as(n) }
    Result(df.select(proj: _*), selected.toSet, Set.empty)
  }

  /** Generic solution join with SPARQL semantics (inner / left_outer). */
  private def join(l: Result, r: Result, joinType: String,
                   extraCond: Option[Expr]): Result = {
    val shared = (l.vars intersect r.vars).toSeq.sorted
    val bothCertain = shared.filter(v => l.certain(v) && r.certain(v))
    val rdf = shared.foldLeft(r.df)((d, v) => d.withColumnRenamed(v, ren(v)))
    val eqConds = shared.map { v =>
      if (l.certain(v) && r.certain(v)) col(v) === col(ren(v))
      else compatCond(col(v), col(ren(v)))
    }
    // the LeftJoin filter evaluates over the merged solution
    val mergedResolver: String => Column = v =>
      if (shared.contains(v)) coalesce(col(v), col(ren(v)))
      else if (l.vars(v) || r.vars(v)) col(v)
      else Term.unbound
    val allConds = eqConds ++ extraCond.map(e => coalesce(e(mergedResolver), lit(false)))
    val cond = if (allConds.isEmpty) lit(true) else allConds.reduce(_ && _)
    var joined = l.df.join(rdf, cond, joinType)
    // merge shared vars: both-certain sides are equal, keep left; otherwise
    // take whichever side is bound
    shared.foreach { v =>
      joined =
        if (bothCertain.contains(v)) joined.drop(ren(v))
        else joined.withColumn(v, coalesce(col(v), col(ren(v)))).drop(ren(v))
    }
    val certain = joinType match {
      case "inner" => l.certain ++ r.certain
      case "left_outer" => l.certain
      case _ => l.certain
    }
    Result(joined, certain, (l.vars ++ r.vars) -- certain)
  }

  /** Bind the endpoints of a compiled path-pair DataFrame (src, dst). */
  private def bindEnds(pairs: DataFrame, s: Pat, o: Pat,
                       g: Option[Pat] = None): Result = {
    var df = pairs
    var vars = Vector.empty[String]
    s match {
      case C(t) => df = df.filter(col("src") === t)
      case V(n) => df = df.withColumnRenamed("src", n); vars :+= n
    }
    o match {
      case C(t) => df = df.filter(col("dst") === t)
      case V(n) =>
        if (vars.contains(n)) df = df.filter(col("dst") === col(n))
        else { df = df.withColumnRenamed("dst", n); vars :+= n }
    }
    // a variable GRAPH context arrives as a `g` column (Paths.compile
    // per-graph mode) and binds like any other position
    g match {
      case Some(V(n)) if df.columns.contains("g") =>
        if (vars.contains(n)) df = df.filter(col("g") === col(n))
        else { df = df.withColumnRenamed("g", n); vars :+= n }
      case _ =>
    }
    val keep = vars.distinct
    // NO row dedup here: fixed-length paths are BGP-equivalent and keep
    // bag semantics (two routes through different mids = two solutions,
    // W3C pp11/pp20); the closure forms (*, +, ?) are set-based and their
    // compile() already returns distinct pairs
    Result(df.select(keep.map(col): _*), keep.toSet, Set.empty)
  }

  /** Push a GRAPH context onto every pattern in scope lacking one. A nested
    * GRAPH block keeps its own (inner) context; VALUES and SERVICE carry no
    * graph scope by definition.
    */
  private def rewriteGraph(n: Node, g: Pat): Node = n match {
    case Bgp(tps, fixed) =>
      Bgp(tps.map(tp => if (tp.g.isEmpty) tp.copy(g = Some(g)) else tp), fixed)
    case p: PathPattern => if (p.g.isEmpty) p.copy(g = Some(g)) else p
    case Filter(c, ch) => Filter(c, rewriteGraph(ch, g))
    case Join(l, r) => Join(rewriteGraph(l, g), rewriteGraph(r, g))
    case LeftJoin(l, r, c, ex) =>
      LeftJoin(rewriteGraph(l, g), rewriteGraph(r, g), c,
               ex.map { case (v, s) => (v, rewriteGraph(s, g)) })
    case Union(l, r) => Union(rewriteGraph(l, g), rewriteGraph(r, g))
    case Minus(l, r) => Minus(rewriteGraph(l, g), rewriteGraph(r, g))
    case ExistsFilter(ch, sub, neg) =>
      ExistsFilter(rewriteGraph(ch, g), rewriteGraph(sub, g), neg)
    case FilterExists(c, binds, ch) =>
      FilterExists(c, binds.map { case (v, s) => (v, rewriteGraph(s, g)) },
                   rewriteGraph(ch, g))
    case ExtendExists(v, e, binds, ch) =>
      ExtendExists(v, e, binds.map { case (mv, s) => (mv, rewriteGraph(s, g)) },
                   rewriteGraph(ch, g))
    case Extend(v, e, ch) => Extend(v, e, rewriteGraph(ch, g))
    case Project(vs, ch) => g match {
      // a sub-select that does NOT project the outer graph variable: its
      // inner use of that name (if any) is a DIFFERENT variable (18.2.1
      // in-scope rules, sq03). Scope the inner patterns with a fresh graph
      // variable and surface it under the outer name after the projection.
      case V(gn) if !vs.contains(gn) =>
        val gv = s"__gv_${gvCounter.incrementAndGet()}"
        Project(vs :+ gn,
          Extend(gn, (r: String => Column) => r(gv),
            Project(vs :+ gv, rewriteGraph(ch, V(gv)))))
      case _ => Project(vs, rewriteGraph(ch, g))
    }
    case Distinct(ch) => Distinct(rewriteGraph(ch, g))
    case OrderBy(ks, ch) => OrderBy(ks, rewriteGraph(ch, g))
    case Slice(off, lim, ch) => Slice(off, lim, rewriteGraph(ch, g))
    case Group(ks, aggs, ch) => Group(ks, aggs, rewriteGraph(ch, g))
    case gn: GraphNode => gn
    // the search service respects the active graph (the reference's
    // named-graph search, search-named-graphs golden suite): thread the
    // GRAPH pat in as a synthetic #graph config triple — the service binds
    // a variable graph from the matched literal's occurrences, or
    // restricts matching to a constant graph
    case ServiceNode(Services.SearchIri, config, remote, _) =>
      ServiceNode(Services.SearchIri,
        config :+ TriplePattern(g, C(Services.graphConfigPred), g), remote)
    case other => other
  }
}
