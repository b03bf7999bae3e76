package graft.rdf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sparql.Algebra.{C, Pat, TriplePattern, V}

/** Dictionary-encoded quad store — the two-table design of §1.3
  * (reference: TERM2ID/ID2TERM lexicon indices,
  * /root/reference/bigdata-rdf/src/java/com/bigdata/rdf/lexicon/
  * LexiconRelation.java:392-410; TermId.java:48).
  *
  * Ids are **deterministic content hashes** (xxhash64 of the canonical term
  * serialization), not sequence numbers: encoding needs NO dictionary join
  * or global coordination (the reference's Term2IdWriteTask round-trip
  * disappears), ids are stable across loads/replays, and constant terms in
  * queries fold to literal ids at plan time. Collision odds over 64 bits
  * are negligible at 100 TB term counts (~2^-24 for a trillion terms).
  *
  * Scale rationale: BGP joins shuffle 8-byte longs instead of 5-field
  * structs; the lexicon is touched once at the end to decode only the
  * projected variables (ChunkedMaterializationOp's lazy-decode insight,
  * bigdata-rdf/src/java/com/bigdata/bop/rdf/join/
  * ChunkedMaterializationOp.java:69).
  */
object Dict {

  /** Canonical serialization of a term (kind/lex/dt/lang; `num` is derived
    * from lex+dt, so it is excluded). Fields join on a \\u0001 separator so
    * shifted field boundaries can't collide ("ab"@cd vs "a"@bcd); NULL
    * fields coalesce to "" first because concat_ws would *skip* them and
    * shift the remaining fields onto the wrong positions.
    */
  def termKey(t: Column): Column =
    concat_ws("\u0001",
      Term.kind(t).cast(StringType), coalesce(Term.lex(t), lit("")),
      coalesce(Term.dt(t), lit("")), coalesce(Term.lang(t), lit("")))

  /** Deterministic 64-bit term id; NULL for unbound. */
  def termId(t: Column): Column =
    when(t.isNull, lit(null).cast(LongType)).otherwise(xxhash64(termKey(t)))

  final case class Store(quads: DataFrame, lexicon: DataFrame)

  /** Encode a term-struct quad store: id quads + (id, term) lexicon. */
  def encode(structQuads: DataFrame): Store = {
    val idQuads = structQuads.select(
      termId(col("s")).as("s"), termId(col("p")).as("p"),
      termId(col("o")).as("o"), termId(col("c")).as("c"))
    val lexicon = Seq("s", "p", "o", "c")
      .map(p => structQuads.select(col(p).as("term")).filter(col("term").isNotNull))
      .reduce(_ unionByName _)
      .distinct()
      .select(termId(col("term")).as("id"), col("term"))
    Store(idQuads, lexicon)
  }

  /** Evaluate a BGP over the id quads (default graph), decoding only the
    * requested variables back to term structs via the lexicon.
    */
  def bgp(store: Store, tps: Seq[TriplePattern], project: Seq[String]): DataFrame =
    // decode projected vars: one lexicon join per var (only at the end)
    decode(store, bgpIds(store, tps), project).select(project.map(col): _*)

  /** Replace each named id column with its decoded term struct. */
  private def decode(store: Store, df0: DataFrame, vars: Seq[String]): DataFrame =
    vars.foldLeft(df0) { (df, v) =>
      df.join(store.lexicon.select(col("id").as(s"__id_$v"), col("term").as(s"__t_$v")),
              col(v) === col(s"__id_$v"))
        .drop(v, s"__id_$v")
        .withColumnRenamed(s"__t_$v", v)
    }

  /** BGP + FILTER with lazy materialization (ChunkedMaterializationOp's
    * placement, bigdata-rdf ChunkedMaterializationOp.java:69): the BGP
    * joins run entirely on 8-byte ids; ONLY the variables a filter
    * inspects decode through the lexicon — as late as possible, right
    * before that filter — then the projection decodes at the very end.
    * Variables in both a filter and the projection decode once.
    *
    * `filters` maps a variable name to a term-struct predicate (the same
    * expression vocabulary as the main translator's `Expr`).
    */
  def bgpFilter(store: Store, tps: Seq[TriplePattern],
                filters: Seq[(String, Column => Column)],
                project: Seq[String]): DataFrame = {
    val filterVars = filters.map(_._1).distinct
    val joined = bgpIds(store, tps)
    val decoded = decode(store, joined, (filterVars ++ project).distinct)
    val filtered = filters.foldLeft(decoded) { case (df, (v, pred)) =>
      df.filter(coalesce(pred(col(v)), lit(false)))
    }
    filtered.select(project.map(col): _*)
  }

  // ---------------------------------------------------------------------
  // Full-algebra id-space translation: OPTIONAL / UNION / MINUS /
  // aggregates run entirely on 8-byte ids; the lexicon is consulted only
  // for variables a filter inspects (lazily, right before that filter)
  // and for the final projection. The id-space mirror of the main
  // Translator's node set (reference: the ids-only join pipeline with
  // ChunkedMaterializationOp placed by the materialization planner,
  // ChunkedMaterializationOp.java:69).
  //
  // Filters name the variable they inspect (`DFilter(v, pred)`) — that's
  // what makes lazy decode *plannable*, the same reason the reference's
  // INeedsMaterialization contract names its variables.
  // ---------------------------------------------------------------------

  sealed trait DNode
  final case class DBgp(tps: Seq[TriplePattern]) extends DNode
  final case class DFilter(v: String, pred: Column => Column, child: DNode) extends DNode
  final case class DJoin(l: DNode, r: DNode) extends DNode
  final case class DLeftJoin(l: DNode, r: DNode) extends DNode
  final case class DUnion(l: DNode, r: DNode) extends DNode
  final case class DMinus(l: DNode, r: DNode) extends DNode
  final case class DDistinct(child: DNode) extends DNode
  final case class DGroup(keys: Seq[String], aggs: Seq[(String, DAgg)],
                          child: DNode) extends DNode

  /** Id-space aggregates: counts run on raw ids; value aggregates name
    * their variable so exactly that column decodes pre-aggregation.
    */
  sealed trait DAgg
  case object DCountStar extends DAgg
  final case class DCountVar(v: String) extends DAgg
  final case class DCountDistinct(v: String) extends DAgg
  final case class DSumNum(v: String) extends DAgg
  final case class DAvgNum(v: String) extends DAgg

  /** Solution in id space: one LONG column per variable; `decoded` vars
    * additionally carry a `<v>__term` struct column. `certain`/`maybe`
    * mirror the main translator's scope tracking. Aggregate outputs are
    * term structs directly (they left id space) — tracked in `structs`.
    */
  final case class IdResult(df: DataFrame, certain: Set[String],
                            maybe: Set[String], decoded: Set[String],
                            structs: Set[String]) {
    def vars: Set[String] = certain ++ maybe
  }

  private def tcol(v: String): String = s"${v}__term"

  /** Decode `v` beside its id column (keeps the id for later joins). */
  private def decodeVar(store: Store, r: IdResult, v: String): IdResult = {
    if (r.decoded(v) || r.structs(v)) return r
    val lex = store.lexicon.select(col("id").as(s"__id_$v"), col("term").as(tcol(v)))
    // left join: unbound (NULL id) rows keep an unbound term
    IdResult(r.df.join(lex, col(v) === col(s"__id_$v"), "left").drop(s"__id_$v"),
             r.certain, r.maybe, r.decoded + v, r.structs)
  }

  /** Translate an id-space algebra node over the store. */
  def translate(store: Store, node: DNode): IdResult = node match {
    case DBgp(tps) =>
      val df = bgpIds(store, tps)
      IdResult(df, df.columns.toSet, Set.empty, Set.empty, Set.empty)

    case DFilter(v, pred, child) =>
      val c = decodeVar(store, translate(store, child), v)
      val in = if (c.structs(v)) col(v) else col(tcol(v))
      c.copy(df = c.df.filter(coalesce(pred(in), lit(false))))

    case DJoin(l, r) => idJoin(store, translate(store, l), translate(store, r), "inner")

    case DLeftJoin(l, r) => idJoin(store, translate(store, l), translate(store, r), "left_outer")

    case DUnion(l, r) =>
      // union runs on bare ids: drop decoded terms (re-decoded later if a
      // filter or the projection needs them), pad missing vars with NULL
      val (lr, rr) = (strip(translate(store, l)), strip(translate(store, r)))
      val allVars = (lr.vars ++ rr.vars).toSeq.sorted
      def pad(x: IdResult) = allVars.foldLeft(x.df)((d, v) =>
        if (x.vars(v)) d else d.withColumn(v, lit(null).cast(LongType)))
      IdResult(pad(lr).select(allVars.map(col): _*)
                 .unionByName(pad(rr).select(allVars.map(col): _*)),
               lr.certain intersect rr.certain,
               (lr.vars ++ rr.vars) -- (lr.certain intersect rr.certain),
               Set.empty, Set.empty)

    case DMinus(l, r) =>
      val lr = translate(store, l)
      val rr = strip(translate(store, r))
      val shared = (lr.vars intersect rr.vars).toSeq.sorted
      if (shared.isEmpty) lr
      else {
        val rdf = shared.foldLeft(rr.df.select(shared.map(col): _*))(
          (d, v) => d.withColumnRenamed(v, s"__r_$v"))
        val (certBoth, maybeShared) =
          shared.partition(v => lr.certain(v) && rr.certain(v))
        val conds = certBoth.map(v => col(v) === col(s"__r_$v")) ++
          maybeShared.map(v => col(v).isNull || col(s"__r_$v").isNull ||
                               col(v) === col(s"__r_$v"))
        val oneBound =
          if (certBoth.nonEmpty) lit(true)
          else shared.map(v => col(v).isNotNull && col(s"__r_$v").isNotNull)
            .reduce(_ || _)
        lr.copy(df = lr.df.join(rdf, conds.reduce(_ && _) && oneBound, "left_anti"))
      }

    case DDistinct(child) =>
      val c = strip(translate(store, child))
      c.copy(df = c.df.dropDuplicates())

    case DGroup(keys, aggs, child) =>
      // grouping keys stay 8-byte ids (id equality = term equality by
      // construction); only value-aggregated vars decode first
      val valueVars = aggs.collect {
        case (_, DSumNum(v)) => v
        case (_, DAvgNum(v)) => v
      }.distinct
      val c0 = translate(store, child)
      val c = valueVars.foldLeft(c0)((r, v) => decodeVar(store, r, v))
      def aggCol(a: DAgg): Column = a match {
        case DCountStar => Term.num(count(lit(1)).cast(Term.numType), Term.XsdInteger)
        case DCountVar(v) => Term.num(count(col(v)).cast(Term.numType), Term.XsdInteger)
        case DCountDistinct(v) =>
          Term.num(count_distinct(col(v)).cast(Term.numType), Term.XsdInteger)
        case DSumNum(v) =>
          Term.num(coalesce(sum(Term.numVal(col(tcol(v)))),
                            lit(0).cast(Term.numType)))
        case DAvgNum(v) => Term.num(avg(Term.numVal(col(tcol(v)))).cast(Term.numType))
      }
      val aggCols = aggs.map { case (name, a) => aggCol(a).as(name) }
      val grouped =
        if (keys.isEmpty) c.df.agg(aggCols.head, aggCols.tail: _*)
        else c.df.groupBy(keys.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
      IdResult(grouped, keys.toSet ++ aggs.map(_._1), Set.empty, Set.empty,
               aggs.map(_._1).toSet)
  }

  /** Decode the projection and return term-struct columns only. */
  def run(store: Store, node: DNode, project: Seq[String]): DataFrame = {
    val r0 = translate(store, node)
    val r = project.filterNot(r0.structs).foldLeft(r0)((x, v) => decodeVar(store, x, v))
    r.df.select(project.map(v =>
      (if (r.structs(v)) col(v) else col(tcol(v))).as(v)): _*)
  }

  /** Drop decoded term columns (before union/minus/distinct realignment). */
  private def strip(r: IdResult): IdResult =
    r.copy(df = r.decoded.foldLeft(r.df)((d, v) => d.drop(tcol(v))),
           decoded = Set.empty)

  /** Id-space solution join: equi on certain-both shared vars, SPARQL
    * compatibility (NULL matches) where a side may be unbound. Decoded
    * term columns survive on the left; right-side duplicates are dropped.
    */
  private def idJoin(store: Store, l: IdResult, r0: IdResult,
                     joinType: String): IdResult = {
    val r = strip(r0)
    val shared = (l.vars intersect r.vars).toSeq.sorted
    val bothCertain = shared.filter(v => l.certain(v) && r.certain(v))
    val rdf = shared.foldLeft(r.df)((d, v) => d.withColumnRenamed(v, s"__r_$v"))
    val conds = shared.map { v =>
      if (l.certain(v) && r.certain(v)) col(v) === col(s"__r_$v")
      else col(v).isNull || col(s"__r_$v").isNull || col(v) === col(s"__r_$v")
    }
    var joined = l.df.join(rdf, conds.foldLeft(lit(true))(_ && _), joinType)
    shared.foreach { v =>
      joined =
        if (bothCertain.contains(v)) joined.drop(s"__r_$v")
        else joined.withColumn(v, coalesce(col(v), col(s"__r_$v"))).drop(s"__r_$v")
    }
    val certain = if (joinType == "inner") l.certain ++ r.certain else l.certain
    IdResult(joined, certain, (l.vars ++ r.vars) -- certain, l.decoded, l.structs)
  }

  /** The id-space BGP join (no decode) — shared by bgp/bgpFilter. */
  private def bgpIds(store: Store, tps: Seq[TriplePattern]): DataFrame = {
    def one(tp: TriplePattern): DataFrame = {
      var df = store.quads.filter(col("c").isNull)
      val positions = Seq("s" -> tp.s, "p" -> tp.p, "o" -> tp.o)
      positions.foreach {
        case (pos, C(term)) => df = df.filter(col(pos) === termId(term))
        case _ =>
      }
      val varPos = positions.collect { case (pos, V(n)) => (pos, n) }
      varPos.groupBy(_._2).values.filter(_.size > 1).foreach { dup =>
        dup.map(_._1).sliding(2).foreach {
          case Seq(a, b) => df = df.filter(col(a) === col(b))
          case _ =>
        }
      }
      df.select(varPos.distinctBy(_._2).map { case (p, n) => col(p).as(n) }: _*)
    }
    tps.map(one).reduce { (l, r) =>
      val shared = l.columns.toSet intersect r.columns.toSet
      if (shared.isEmpty) l.crossJoin(r)
      else l.join(r, shared.toSeq)
    }
  }
}
