package graft.sparql

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.rdf.Term
import Algebra.AggExpr

/** SPARQL aggregate functions as term-struct-valued Spark aggregates
  * (reference: bigdata-rdf/src/java/com/bigdata/bop/rdf/aggregate/ — COUNT,
  * SUM, AVERAGE, MIN, MAX, SAMPLE, GROUP_CONCAT under /root/reference/).
  *
  * SPARQL error semantics: aggregates ignore unbound inputs (COUNT) or go
  * unbound when a non-numeric value appears (SUM/AVG) — expressed here as
  * "any null num among bound inputs poisons the aggregate", matching the
  * sticky-error contract of IAggregate.java:11.
  */
object Aggs {

  /** COUNT(*) — counts solutions. */
  def countStar: AggExpr = _ => Term.num(count(lit(1)).cast(Term.numType), Term.XsdInteger)

  /** COUNT(?v) — counts bound values. */
  def countVar(v: String): AggExpr =
    r => Term.num(count(r(v)).cast(Term.numType), Term.XsdInteger)

  /** COUNT(DISTINCT ?v). */
  def countDistinctVar(v: String): AggExpr =
    r => Term.num(count_distinct(r(v)).cast(Term.numType), Term.XsdInteger)

  /** SUM with sticky type errors: unbound result if any bound input is
    * non-numeric.
    */
  def sumVar(v: String): AggExpr = r => {
    val t = r(v)
    val poisoned = max(when(t.isNotNull && Term.numVal(t).isNull, 1).otherwise(0))
    val s = sum(Term.numVal(t))
    // XPath numeric promotion (op:numeric-add), same ladder as the binary
    // ops (TermOps.scala): double > float > decimal > integer — a float
    // input only reaches double when a double is ALSO present. SUM({}) = 0
    // integer. Arithmetic itself stays exact decimal: float32 accumulation
    // is order-dependent, so a distributed sum would not be reproducible
    // across partitionings — only the TAG follows the promotion ladder.
    val rank = max(
      when(Term.dt(t) === Term.XsdDouble, 3)
        .when(Term.dt(t) === Term.XsdNs + "float", 2)
        .when(Term.dt(t) === Term.XsdDecimal, 1).otherwise(0))
    val dt = when(rank === 3, Term.XsdDouble)
      .when(rank === 2, Term.XsdNs + "float")
      .when(rank === 1, Term.XsdDecimal)
      .otherwise(Term.XsdInteger)
    when(poisoned === 1, Term.unbound)
      .otherwise(Term.numDt(coalesce(s, lit(0).cast(Term.numType)), dt))
  }

  /** AVG with sticky type errors and op:numeric promotion (the same
    * double > float > decimal ladder as SUM; integer ÷ count divides into
    * decimal, so the floor is decimal).
    */
  def avgVar(v: String): AggExpr = r => {
    val t = r(v)
    val poisoned = max(when(t.isNotNull && Term.numVal(t).isNull, 1).otherwise(0))
    val s = avg(Term.numVal(t))
    val rank = max(
      when(Term.dt(t) === Term.XsdDouble, 3)
        .when(Term.dt(t) === Term.XsdNs + "float", 2).otherwise(1))
    val dt = when(rank === 3, Term.XsdDouble)
      .when(rank === 2, Term.XsdNs + "float")
      .otherwise(Term.XsdDecimal)
    when(poisoned === 1 || s.isNull, Term.unbound)
      .otherwise(Term.numDt(s.cast(Term.numType), dt))
  }

  /** MIN/MAX per the SPARQL ORDER BY total order (IVComparator rules), via
    * min_by/max_by on the composite sort key.
    */
  def minVar(v: String): AggExpr = r => min_by(r(v), sortKeyStruct(r(v)))
  def maxVar(v: String): AggExpr = r => max_by(r(v), sortKeyStruct(r(v)))

  private def sortKeyStruct(t: Column): Column = {
    val ks = TermOps.sortKeys(t)
    struct(ks.head.as("k0"), ks(1).as("k1"), ks(2).as("k2"), ks(3).as("k3"))
  }

  /** SAMPLE: an arbitrary but deterministic bound value (smallest by the
    * total order, so replays agree).
    */
  def sampleVar(v: String): AggExpr = minVar(v)

  /** GROUP_CONCAT(?v; SEPARATOR=sep) over the lexical forms, input sorted by
    * the total order for determinism.
    */
  def groupConcatVar(v: String, sep: String = " "): AggExpr = r =>
    Term.str(concat_ws(sep,
      transform(
        sort_array(collect_list(struct(sortKeyStruct(r(v)).as("k"),
                                       Term.lex(r(v)).as("l")))),
        s => s.getField("l"))))
}
