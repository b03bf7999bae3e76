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
