package graft.rdf

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** RDF term representation: a self-describing struct column.
  *
  * Mirrors the reference's IV design (reference: IV.java —
  * /root/reference/bigdata-rdf/src/java/com/bigdata/rdf/internal/IV.java:53;
  * term kinds VTE.java:42-54; datatypes DTE.java:92-226) but replaces the
  * order-preserving key encoding + lexicon dictionary with a struct column:
  *
  *   term = STRUCT<kind TINYINT, lex STRING, dt STRING, lang STRING,
  *                 num DECIMAL(38,18)>
  *
  * kind: 0=IRI, 1=BNODE, 2=LITERAL. `num` is the normalized numeric value
  * when `dt` is a numeric XSD type — it makes cross-datatype numeric
  * comparison (xsd:int vs xsd:double) one codegen'd decimal compare, the
  * role the reference's inline numeric IVs play.
  *
  * The two-table dictionary design (lexicon + id quads,
  * LexiconRelation.java:392-410) is an optimization this engine defers until
  * benchmarks demand it; the struct form is semantics-complete.
  */
object Term {

  val KindIri: Int = 0
  val KindBnode: Int = 1
  val KindLiteral: Int = 2

  val XsdString = "http://www.w3.org/2001/XMLSchema#string"
  val XsdInteger = "http://www.w3.org/2001/XMLSchema#integer"
  val XsdDecimal = "http://www.w3.org/2001/XMLSchema#decimal"
  val XsdDouble = "http://www.w3.org/2001/XMLSchema#double"
  val XsdBoolean = "http://www.w3.org/2001/XMLSchema#boolean"
  val XsdDateTime = "http://www.w3.org/2001/XMLSchema#dateTime"

  val numType: DecimalType = DecimalType(38, 18)

  val schema: StructType = StructType(Seq(
    StructField("kind", ByteType),
    StructField("lex", StringType),
    StructField("dt", StringType),
    StructField("lang", StringType),
    StructField("num", numType)))

  private def nullS: Column = lit(null).cast(StringType)
  private def nullN: Column = lit(null).cast(numType)

  private def mk(kind: Int, lex: Column, dt: Column, lang: Column, num: Column): Column =
    struct(lit(kind).cast(ByteType).as("kind"), lex.as("lex"), dt.as("dt"),
           lang.as("lang"), num.as("num"))

  /** IRI term from a string column. */
  def iri(lex: Column): Column = mk(KindIri, lex, nullS, nullS, nullN)
  def iri(s: String): Column = iri(lit(s))

  /** Blank node with the given label. */
  def bnode(label: Column): Column = mk(KindBnode, label, nullS, nullS, nullN)

  /** Plain (xsd:string) literal. */
  def str(lex: Column): Column = mk(KindLiteral, lex, lit(XsdString), nullS, nullN)
  def str(s: String): Column = str(lit(s))

  /** Language-tagged literal. */
  def langStr(lex: Column, lang: Column): Column =
    mk(KindLiteral, lex, nullS, lang, nullN)

  /** Numeric literal: canonical lexical form + normalized numeric value. */
  def num(value: Column, dt: String = XsdDecimal): Column =
    mk(KindLiteral, value.cast(StringType), lit(dt), nullS, value.cast(numType))

  /** Boolean literal. */
  def bool(value: Column): Column =
    mk(KindLiteral, value.cast(StringType), lit(XsdBoolean), nullS,
       when(value, lit(1)).otherwise(lit(0)).cast(numType))

  /** Typed literal with an arbitrary datatype IRI (no numeric view). */
  def typed(lex: Column, dt: Column): Column = mk(KindLiteral, lex, dt, nullS, nullN)

  /** A null (unbound) term of the right struct type. */
  def unbound: Column = lit(null).cast(schema)

  // ---- accessors ----
  def kind(t: Column): Column = t.getField("kind")
  def lex(t: Column): Column = t.getField("lex")
  def dt(t: Column): Column = t.getField("dt")
  def lang(t: Column): Column = t.getField("lang")
  def numVal(t: Column): Column = t.getField("num")

  def isIri(t: Column): Column = kind(t) === KindIri
  def isBnode(t: Column): Column = kind(t) === KindBnode
  def isLiteral(t: Column): Column = kind(t) === KindLiteral
  def isNumeric(t: Column): Column = numVal(t).isNotNull
}
