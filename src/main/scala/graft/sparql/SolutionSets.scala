package graft.sparql

import org.apache.spark.sql.DataFrame

/** Durable named solution sets — the reference's solution-set-manager
  * surface (bigdata-rdf/src/java/com/bigdata/rdf/sparql/ast/ssets/
  * ISolutionSetManager.java, exercised by TestInclude.java:140 which
  * `putSolutions` a set and then queries `INCLUDE %solutionSet1`).
  *
  * A solution set is a DataFrame of term-struct columns (one column per
  * variable, null struct = unbound). `INCLUDE %name` that does not match
  * an in-query `WITH {...} AS %name` subquery resolves here and joins the
  * set into the group exactly like an inline VALUES block — which on the
  * Spark side means the set participates in join planning as an ordinary
  * relation (broadcast when small, shuffle hash otherwise).
  */
object SolutionSets {
  @volatile private var registry = Map.empty[String, DataFrame]

  def put(name: String, df: DataFrame): Unit =
    synchronized { registry += normalize(name) -> df }

  def remove(name: String): Unit =
    synchronized { registry -= normalize(name) }

  def get(name: String): Option[DataFrame] = registry.get(normalize(name))

  /** Accept both `%name` (query surface) and bare `name`. */
  private def normalize(n: String): String = n.stripPrefix("%")
}
