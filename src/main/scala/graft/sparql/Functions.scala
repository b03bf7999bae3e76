package graft.sparql

import org.apache.spark.sql.Column

/** IRI-keyed scalar-function registry — the user extension point the
  * reference exposes as `FunctionRegistry.add(uri, factory)`
  * (bigdata-rdf/src/java/com/bigdata/rdf/sparql/ast/FunctionRegistry.java;
  * exercised by TestCustomFunction.java:84).
  *
  * A registered function receives its argument columns as evaluated term
  * structs (see [[graft.rdf.Term]]) and returns a term struct. SPARQL
  * type-error discipline is the function's contract: return `Term.unbound`
  * (null struct) for an error so enclosing FILTERs treat it as false.
  * Because the function is an ordinary Column→Column combinator it stays
  * inside Catalyst codegen — no UDF boundary, executors never see the
  * registry itself.
  *
  * Registration is process-wide (the reference's registry is a static
  * map); tests register/remove around each case.
  */
object Functions {
  type ScalarFn = Seq[Column] => Column

  @volatile private var registry = Map.empty[String, ScalarFn]

  def register(iri: String, fn: ScalarFn): Unit =
    synchronized { registry += iri -> fn }

  def remove(iri: String): Unit =
    synchronized { registry -= iri }

  def contains(iri: String): Boolean = registry.contains(iri)

  def apply(iri: String): ScalarFn = registry(iri)
}
