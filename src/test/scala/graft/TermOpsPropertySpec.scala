package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.rdf.Term
import graft.sparql.TermOps

/** Property tests for the SPARQL value-semantics layer: the total order is
  * a total order, comparison agrees with it on numerics, EBV and equality
  * behave per spec. ScalaCheck generators drive the cases; evaluation is
  * batched through Spark (one pass per property, not per case).
  */
class TermOpsPropertySpec extends SparkSpecBase {

  // generators: terms across all kinds
  private val genIri = Gen.alphaNumStr.suchThat(_.nonEmpty).map(s => ("iri", s"http://x/$s", null, null))
  private val genBnode = Gen.alphaNumStr.suchThat(_.nonEmpty).map(s => ("bnode", s, null, null))
  private val genStr = Gen.alphaNumStr.map(s => ("str", s, null, null))
  private val genLang = for {
    s <- Gen.alphaNumStr; l <- Gen.oneOf("en", "de", "fr")
  } yield ("lang", s, null, l)
  private val genNum = Gen.chooseNum(-1000000L, 1000000L).map(n => ("num", n.toString, null, null))
  private val genTerm = Gen.oneOf(genIri, genBnode, genStr, genLang, genNum)

  private def toCol(t: (String, String, String, String)): Column = t._1 match {
    case "iri" => Term.iri(t._2)
    case "bnode" => Term.bnode(lit(t._2))
    case "str" => Term.str(t._2)
    case "lang" => Term.langStr(lit(t._2), lit(t._4))
    case "num" => Term.num(lit(t._2.toLong), Term.XsdInteger)
  }

  /** Evaluate boolean expressions for a batch of term pairs in one job. */
  private def evalPairs(pairs: Seq[((String, String, String, String), (String, String, String, String))],
                        f: (Column, Column) => Column): Seq[Option[Boolean]] = {
    if (pairs.isEmpty) return Nil
    val cols = pairs.zipWithIndex.map { case ((a, b), i) => f(toCol(a), toCol(b)).as(s"r$i") }
    val row = spark.range(1).select(cols: _*).head()
    pairs.indices.map(i => if (row.isNullAt(i)) None else Some(row.getBoolean(i)))
  }

  test("total order: sortKeys ranks kinds bnode < iri < literal; numerics by value") {
    val terms = Seq(
      ("bnode", "z", null, null), ("iri", "http://x/a", null, null),
      ("num", "-5", null, null), ("num", "10", null, null),
      ("str", "apple", null, null), ("str", "zebra", null, null))
    val cols = terms.zipWithIndex.map { case (t, i) => toCol(t).as(s"t$i") }
    val df = spark.range(1).select(cols: _*)
    val long = terms.indices.map(i => df.select(col(s"t$i").as("v"))).reduce(_ unionByName _)
    val sorted = long.orderBy(TermOps.sortKeys(col("v")).map(_.asc): _*)
      .select(Term.lex(col("v"))).collect().map(_.getString(0)).toSeq
    assert(sorted == Seq("z", "http://x/a", "-5", "10", "apple", "zebra"))
  }

  test("lt is irreflexive and asymmetric over random term pairs") {
    val pairs = Gen.listOfN(60, Gen.zip(genTerm, genTerm)).sample.get
    val ltAB = evalPairs(pairs, TermOps.lt)
    val ltBA = evalPairs(pairs, (a, b) => TermOps.lt(b, a))
    val eqAB = evalPairs(pairs, TermOps.valueEq)
    pairs.indices.foreach { i =>
      // asymmetry: not (a<b and b<a)
      assert(!(ltAB(i).contains(true) && ltBA(i).contains(true)),
        s"asymmetry violated for ${pairs(i)}")
      // trichotomy where comparable: a<b, b<a, or a=b
      if (ltAB(i).isDefined && ltBA(i).isDefined && eqAB(i).isDefined)
        assert(ltAB(i).contains(true) || ltBA(i).contains(true) || eqAB(i).contains(true),
          s"trichotomy violated for ${pairs(i)}")
    }
    // irreflexivity: a<a never holds
    val self = pairs.map(p => (p._1, p._1))
    evalPairs(self, TermOps.lt).zip(self).foreach { case (r, p) =>
      assert(!r.contains(true), s"irreflexivity violated for $p")
    }
  }

  test("valueEq is reflexive for bound terms and symmetric") {
    val terms = Gen.listOfN(40, genTerm).sample.get
    val self = terms.map(t => (t, t))
    evalPairs(self, TermOps.valueEq).zip(terms).foreach { case (r, t) =>
      assert(r.contains(true), s"reflexivity violated for $t")
    }
    val pairs = Gen.listOfN(40, Gen.zip(genTerm, genTerm)).sample.get
    val ab = evalPairs(pairs, TermOps.valueEq)
    val ba = evalPairs(pairs, (a, b) => TermOps.valueEq(b, a))
    pairs.indices.foreach(i => assert(ab(i) == ba(i), s"symmetry violated for ${pairs(i)}"))
  }

  test("EBV: booleans by value, numbers by non-zero, strings by non-empty, IRIs error") {
    val cases: Seq[(Column, Option[Boolean])] = Seq(
      Term.bool(lit(true)) -> Some(true),
      Term.bool(lit(false)) -> Some(false),
      Term.num(lit(0), Term.XsdInteger) -> Some(false),
      Term.num(lit(7), Term.XsdInteger) -> Some(true),
      Term.str("") -> Some(false),
      Term.str("x") -> Some(true),
      Term.iri("http://x/a") -> None,
      Term.unbound -> None)
    val row = spark.range(1)
      .select(cases.zipWithIndex.map { case ((c, _), i) => TermOps.ebv(c).as(s"r$i") }: _*)
      .head()
    cases.zipWithIndex.foreach { case ((_, expected), i) =>
      val got = if (row.isNullAt(i)) None else Some(row.getBoolean(i))
      assert(got == expected, s"EBV case $i: got $got, want $expected")
    }
  }

  test("numeric comparison agrees with long comparison across datatypes") {
    val pairs = Gen.listOfN(50, Gen.zip(Gen.chooseNum(-100L, 100L), Gen.chooseNum(-100L, 100L)))
      .sample.get
    val cols = pairs.zipWithIndex.map { case ((a, b), i) =>
      TermOps.lt(Term.num(lit(a), Term.XsdInteger),
                 Term.num(lit(b.toDouble), Term.XsdDouble)).as(s"r$i") }
    val row = spark.range(1).select(cols: _*).head()
    pairs.zipWithIndex.foreach { case ((a, b), i) =>
      assert(row.getBoolean(i) == (a < b), s"cross-datatype compare wrong for ($a, $b)")
    }
  }
}
