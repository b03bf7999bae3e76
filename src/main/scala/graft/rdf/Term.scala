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

  val XsdNs = "http://www.w3.org/2001/XMLSchema#"
  val XsdString = XsdNs + "string"
  val XsdInteger = XsdNs + "integer"
  val XsdDecimal = XsdNs + "decimal"
  val XsdDouble = XsdNs + "double"
  val XsdBoolean = XsdNs + "boolean"
  val XsdDateTime = XsdNs + "dateTime"

  /** XSD datatypes with numeric value space — literals of these types carry
    * a normalized `num` so cross-datatype comparison is one decimal compare
    * (the reference's inline numeric IV promotion, DTE.java:92-226 covers
    * the same derived types).
    */
  val numericDatatypes: Set[String] =
    Set("integer", "decimal", "double", "float", "int", "long", "short",
        "byte", "nonNegativeInteger", "nonPositiveInteger",
        "negativeInteger", "positiveInteger", "unsignedLong", "unsignedInt",
        "unsignedShort", "unsignedByte").map(XsdNs + _)

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

  /** Language-tagged literal. Tags normalize to lowercase at construction
    * (RDF 1.1 Concepts §3.3 value space; Sesame's LiteralImpl does the
    * same, so loaded data and computed terms stay row-identical).
    */
  def langStr(lex: Column, lang: Column): Column =
    mk(KindLiteral, lex, nullS, lower(lang), nullN)

  /** Numeric literal: canonical lexical form + normalized numeric value.
    * Canonicalization strips a decimal cast's trailing fractional zeros
    * ("5.000000000000000000" → "5") so computed numbers render in XSD
    * canonical form.
    */
  def num(value: Column, dt: String = XsdDecimal): Column =
    numDt(value, lit(dt))

  /** Numeric literal whose datatype is itself computed (aggregate type
    * promotion: SUM over integers is xsd:integer, over decimals decimal).
    */
  def numDt(value: Column, dt: Column): Column =
    mk(KindLiteral, canonLexCol(value), dt, nullS, value.cast(numType))

  /** Canonical numeric lexical form of a numeric column ("5.000…0" → "5"). */
  private def canonLexCol(value: Column): Column = {
    val raw = value.cast(StringType)
    regexp_replace(regexp_replace(raw, "(\\.\\d*?)0+$", "$1"), "\\.$", "")
  }

  /** Numeric cast that yields NULL on malformed input instead of an ANSI
    * runtime error (SPARQL type errors are expression-local).
    */
  def safeNum(lex: Column): Column =
    when(lex.rlike("^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$"),
         lex.cast(numType)).otherwise(lit(null).cast(numType))

  /** Normalized `num` slot for a loaded literal: numeric XSD types carry
    * their decimal value; xsd:boolean carries 1/0 so loaded booleans are
    * row-identical to query-constant `Term.bool` terms (BGP matching
    * compares the full struct).
    */
  def litNumSlot(lex: String, dt: String): java.math.BigDecimal =
    if (dt == null) null
    else if (numericDatatypes(dt))
      try new java.math.BigDecimal(lex).setScale(18, java.math.RoundingMode.HALF_UP)
      catch { case _: Exception => null }
    else if (dt == XsdBoolean)
      java.math.BigDecimal.valueOf(if (lex == "true" || lex == "1") 1L else 0L)
        .setScale(18)
    else null

  /** Boolean literal. */
  def bool(value: Column): Column =
    mk(KindLiteral, value.cast(StringType), lit(XsdBoolean), nullS,
       when(value, lit(1)).otherwise(lit(0)).cast(numType))

  /** Typed literal with an arbitrary datatype IRI (no numeric view). */
  def typed(lex: Column, dt: Column): Column = mk(KindLiteral, lex, dt, nullS, nullN)

  /** Typed literal whose COLUMN-valued datatype may be numeric/boolean:
    * fills the `num` slot exactly like the loaders do, so an
    * STRDT-constructed "5"^^xsd:integer is row-identical to a loaded one.
    */
  def typedWithNum(lex: Column, dt: Column): Column = {
    val numDts = numericDatatypes.toSeq
    val num =
      when(dt.isin(numDts: _*), safeNum(lex))
        .when(dt === XsdBoolean,
              when(lex === "true" || lex === "1", 1)
                .when(lex === "false" || lex === "0", 0).cast(numType))
        .otherwise(nullN)
    mk(KindLiteral, lex, dt, nullS, num)
  }

  /** Numeric-typed literal keeping its ORIGINAL lexical form (SPARQL keeps
    * lexical forms; only the `num` view is normalized).
    */
  def numTyped(lex: Column, dt: Column, num: Column): Column =
    mk(KindLiteral, lex, dt, nullS, num.cast(numType))

  /** A null (unbound) term of the right struct type. */
  def unbound: Column = lit(null).cast(schema)

  /** Driver-side term struct Row → literal Column — the REST access-path
    * parameters (a parsed s=/p=/o=/c= term becomes a filter constant).
    */
  def fromRow(r: org.apache.spark.sql.Row): Column =
    struct(lit(r.getByte(0)).cast(ByteType).as("kind"),
           lit(r.getString(1)).as("lex"),
           lit(r.getString(2)).cast(StringType).as("dt"),
           lit(r.getString(3)).cast(StringType).as("lang"),
           lit(r.getDecimal(4)).cast(numType).as("num")).cast(schema)

  /** Parse-side canonical numeric lexical form ("3.0" → "3", "0.50" →
    * "0.5") — the reference's inline numeric IVs canonicalize at load
    * (its own golden fixtures note "Sesame expects 3.0, but we deliver 3").
    */
  def canonicalNumLex(lex: String): String =
    try new java.math.BigDecimal(lex).stripTrailingZeros.toPlainString
    catch { case _: NumberFormatException => lex }

  /** Normalize xsd:dateTime lexical forms the way the reference's
    * DateTimeExtension does (it stores dateTime as UTC epoch millis and
    * re-renders in UTC):
    *   - a bare date becomes the UTC midnight instant
    *     ("1996-05-30" → "1996-05-30T00:00:00.000Z");
    *   - an explicit non-Z zone offset converts to the UTC instant
    *     ("2008-07-28T08:53:25-04:00" → "2008-07-28T12:53:25.000Z",
    *     the reference's materialization-extensions golden rendering).
    * Zoneless and already-Z lexicals pass through untouched, matching the
    * reference's other fixture renderings.
    */
  def canonicalDateTimeLex(lex: String): String = {
    import java.time._
    val utc = format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
      .withZone(ZoneOffset.UTC)
    if (lex.matches("\\d{4}-\\d{2}-\\d{2}"))
      try utc.format(LocalDate.parse(lex).atStartOfDay(ZoneOffset.UTC).toInstant)
      catch { case _: Exception => lex }
    else if (lex.matches(".*T.*[+-]\\d{2}:\\d{2}"))
      try utc.format(OffsetDateTime.parse(lex).toInstant)
      catch { case _: Exception => lex }
    else lex
  }

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
