package graft.sparql

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.rdf.Term

/** SPARQL value semantics over term-struct columns.
  *
  * Three cross-cutting rules (reference pointers, /root/reference/):
  *  - SPARQL type errors map to SQL NULL, and a NULL filter condition drops
  *    the row — matching "type error counts as false" in
  *    bigdata-rdf/src/java/com/bigdata/rdf/internal/constraints/
  *    SPARQLConstraint.java.
  *  - Value comparison (CompareBOp.java:55): numeric across datatypes via
  *    the normalized `num` field, else same-datatype lexical compare;
  *    incomparable pairs → NULL (error).
  *  - ORDER BY total order (IVComparator.java:91-130): unbound < bnodes <
  *    IRIs < literals, numerics by value, others by lexical form.
  */
object TermOps {

  /** Effective boolean value (EBVBOp.java:45): booleans by value, numerics
    * non-zero, strings non-empty; anything else is a type error (NULL).
    */
  def ebv(t: Column): Column =
    when(t.isNull, lit(null).cast(BooleanType))
      .when(Term.dt(t) === Term.XsdBoolean, Term.lex(t) === "true" || Term.lex(t) === "1")
      .when(Term.numVal(t).isNotNull, Term.numVal(t) =!= 0)
      .when(Term.isLiteral(t) && (Term.dt(t) === Term.XsdString || Term.dt(t).isNull),
            length(Term.lex(t)) > 0)
      .otherwise(lit(null).cast(BooleanType))

  /** RDF term identity (SameTermBOp.java:44): null-safe struct equality. */
  def sameTerm(a: Column, b: Column): Column = a <=> b

  /** SPARQL `=` value equality: numeric by value, else identical term when
    * both are comparable kinds; literal-vs-literal with different
    * non-numeric datatypes is a type error (NULL).
    */
  def valueEq(a: Column, b: Column): Column =
    when(a.isNull || b.isNull, lit(null).cast(BooleanType))
      .when(Term.numVal(a).isNotNull && Term.numVal(b).isNotNull, Term.numVal(a) === Term.numVal(b))
      .when(Term.isIri(a) || Term.isBnode(a) || Term.isIri(b) || Term.isBnode(b), a === b)
      // language-tagged literals are DECIDABLY (un)equal: tags compare
      // case-insensitively (BCP47), and a tagged literal never equals an
      // untagged one (the reference's open-eq fixtures encode this; strict
      // minimal-conformance would error instead)
      .when(Term.lang(a).isNotNull && Term.lang(b).isNotNull,
            lower(Term.lang(a)) === lower(Term.lang(b)) &&
              Term.lex(a) === Term.lex(b))
      .when(Term.lang(a).isNotNull || Term.lang(b).isNotNull, lit(false))
      // dateTimes compare as instants (lexicals keep their original
      // timezone offset, so lexical equality is NOT value equality)
      .when(Term.dt(a) === Term.XsdDateTime && Term.dt(b) === Term.XsdDateTime,
            tsVal(a) === tsVal(b))
      // same KNOWN string-valued datatype → decidable lexical compare
      .when((Term.dt(a) <=> Term.dt(b)) &&
              (Term.dt(a).isNull || Term.dt(a) === Term.XsdString),
            Term.lex(a) === Term.lex(b))
      // same opaque datatype: identical lexical form is the same term →
      // true; different forms might still denote the same value →
      // type error (open-world, open-eq-06/10)
      .when(Term.dt(a) <=> Term.dt(b),
            when(Term.lex(a) === Term.lex(b), lit(true))
              .otherwise(lit(null).cast(BooleanType)))
      .otherwise(lit(null).cast(BooleanType))

  /** The instant value of a dateTime literal (offset-aware; zoneless
    * lexicals read in the session zone, which this engine pins to UTC).
    */
  private def tsVal(t: Column): Column = to_timestamp(Term.lex(t))

  /** SPARQL `<`-family comparison; returns -1/0/1 or NULL on type error. */
  private def cmp(a: Column, b: Column): Column =
    when(a.isNull || b.isNull, lit(null).cast(IntegerType))
      .when(Term.numVal(a).isNotNull && Term.numVal(b).isNotNull,
        when(Term.numVal(a) < Term.numVal(b), -1).when(Term.numVal(a) > Term.numVal(b), 1).otherwise(0))
      .when(Term.dt(a) === Term.XsdDateTime && Term.dt(b) === Term.XsdDateTime,
        when(tsVal(a) < tsVal(b), -1).when(tsVal(a) > tsVal(b), 1)
          .when(tsVal(a) === tsVal(b), 0).otherwise(lit(null).cast(IntegerType)))
      .when(Term.isLiteral(a) && Term.isLiteral(b) &&
            (Term.dt(a) <=> Term.dt(b)) && (Term.lang(a) <=> Term.lang(b)),
        when(Term.lex(a) < Term.lex(b), -1).when(Term.lex(a) > Term.lex(b), 1).otherwise(0))
      .otherwise(lit(null).cast(IntegerType))

  def lt(a: Column, b: Column): Column = cmp(a, b) < 0
  def le(a: Column, b: Column): Column = cmp(a, b) <= 0
  def gt(a: Column, b: Column): Column = cmp(a, b) > 0
  def ge(a: Column, b: Column): Column = cmp(a, b) >= 0

  /** Numeric arithmetic with XPath promotion collapsed onto the decimal
    * `num` view (MathBOp.java:58); non-numeric operand → NULL result term.
    */
  def arith(a: Column, b: Column, op: (Column, Column) => Column,
            divide: Boolean = false): Column = {
    val r = op(Term.numVal(a), Term.numVal(b)).cast(Term.numType)
    // XPath numeric promotion: double > float > decimal > integer (the
    // integer-derived types promote through their base — tP-short-float
    // wants short+float = float, short+short = integer).
    def rank(t: Column) =
      when(Term.dt(t) === Term.XsdDouble, 3)
        .when(Term.dt(t) === Term.XsdNs + "float", 2)
        .when(Term.dt(t) === Term.XsdDecimal, 1).otherwise(0)
    val rk = greatest(rank(a), rank(b))
    val dt = when(rk === 3, Term.XsdDouble)
      .when(rk === 2, Term.XsdNs + "float")
      .when(rk === 1 || lit(divide), Term.XsdDecimal)
      .otherwise(Term.XsdInteger)
    when(Term.numVal(a).isNotNull && Term.numVal(b).isNotNull && r.isNotNull,
         Term.numDt(r, dt)).otherwise(Term.unbound)
  }

  /** SPARQL ORDER BY total-order sort keys (ascending). Use all four columns
    * as consecutive sort keys.
    */
  def sortKeys(t: Column): Seq[Column] = Seq(
    // kind rank: unbound(0) < bnode(1) < iri(2) < literal(3)
    when(t.isNull, 0)
      .when(Term.isBnode(t), 1)
      .when(Term.isIri(t), 2)
      .otherwise(3),
    // literal class per Sesame's ValueComparator, which the reference's
    // ORDER BY / MIN / MAX comparator wraps verbatim (IVComparator.java:
    // 206-268 compareLiterals + compareDatatypes): plain & lang-tagged
    // literals (no datatype) sort below every datatyped literal, numeric
    // datatypes below calendar datatypes below all others — so
    // MAX{1.5, 3, "x"@en} = 3 (the aggregate-max golden cases)
    when(Term.lang(t).isNotNull || Term.dt(t).isNull, 0)
      .when(Term.numVal(t).isNotNull, 1)
      .when(Term.dt(t).isin(Term.XsdDateTime,
                            Term.XsdNs + "date", Term.XsdNs + "time"), 2)
      .otherwise(3),
    // numerics order by value (the comparator's '<'-operator fast path);
    // dateTimes by instant (lexicals keep their offsets); ties fall
    // through to the datatype/lang/label key below
    coalesce(Term.numVal(t),
      when(Term.dt(t) === Term.XsdDateTime,
           tsVal(t).cast(DoubleType).cast(Term.numType)).otherwise(lit(null)),
      lit(0).cast(Term.numType)),
    concat_ws("\u0001",
      coalesce(Term.dt(t), lit("")),
      // simple literals before lang-tagged ones, then by tag, then label
      when(Term.lang(t).isNotNull, "1").otherwise("0"),
      coalesce(Term.lang(t), lit("")),
      coalesce(Term.lex(t), lit(""))))

  /** STR(), LANG(), DATATYPE() accessors per SPARQL. */
  def strFn(t: Column): Column = Term.str(Term.lex(t))
  /** LANG(): "" for untagged literals, a type error on IRIs/bnodes
    * (17.4.2.4 — dawg-lang-1/2 drop IRI and bnode rows).
    */
  def langFn(t: Column): Column =
    when(Term.isLiteral(t), Term.str(coalesce(Term.lang(t), lit(""))))
  def datatypeFn(t: Column): Column =
    when(Term.isLiteral(t),
         Term.iri(coalesce(Term.dt(t),
           when(Term.lang(t).isNotNull,
                lit("http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"))
             .otherwise(lit(Term.XsdString)))))
      .otherwise(Term.unbound)

  /** BOUND(?v). */
  def bound(t: Column): Column = t.isNotNull
}
