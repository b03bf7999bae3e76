package graft.sparql

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.rdf.{QuadStore, Term}
import Algebra._
import Translator.Result

/** The `bd:history` SPARQL service — the reference's change-log-as-a-
  * relation face (ServiceRegistry.java:103-110 registers
  * HistoryServiceFactory; sparql/ast/service/history/
  * HistoryChangeRecord.java = statement + ChangeAction + revision time).
  * A user asks "what changed since revision R / time T" in a SERVICE
  * clause instead of application code:
  *
  *   SERVICE <graft://history> {            # alias: SERVICE bd:history
  *     ?rev <graft://history#subject>   ?s .    # optional binds
  *     ?rev <graft://history#predicate> ?p .
  *     ?rev <graft://history#object>    ?o .
  *     ?rev <graft://history#graph>     ?g .    # null for default graph
  *     ?rev <graft://history#action>    ?a .    # "INSERTED" | "REMOVED"
  *     ?rev <graft://history#timestamp> ?t .    # commit wall time, millis
  *     ?rev <graft://history#sinceRevision> "2" .   # optional filters
  *     ?rev <graft://history#untilRevision> "5" .
  *     ?rev <graft://history#sinceTime> "1700000000000" .
  *   }
  *
  * `?rev` binds each change record's revision number (xsd:integer).
  * Constants in the s/p/o/graph/action positions filter instead of bind.
  *
  * The history RELATION is provided per store: [[QuadStore.enableHistory]]
  * maintains a parquet index under a directory-rooted store (one immutable
  * `_history/rev=<n>` partition per commit — the HistoryChangeLogListener
  * analogue), and the HTTP server binds its in-memory commit diffs. Either
  * way the service resolves the queried store frame to its history via a
  * plan-keyed binding (the bds artifact-cache pattern), so `SERVICE
  * bd:history` composes with the rest of the query like any other group.
  */
object History {

  val HistoryIri = "graft://history"
  val BdHistoryIri = "http://www.bigdata.com/rdf#history"
  private val NS = HistoryIri + "#"

  /** (s,p,o,c, action, rev, revtime) — the change-record schema. */
  val schema: StructType = StructType(Seq(
    StructField("s", Term.schema), StructField("p", Term.schema),
    StructField("o", Term.schema), StructField("c", Term.schema),
    StructField("action", StringType), StructField("rev", LongType),
    StructField("revtime", LongType)))

  def emptyRelation(spark: SparkSession): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[Row](), schema)

  /** Change records for one commit's delta frames. */
  def records(asserted: DataFrame, retracted: DataFrame,
              rev: Long, revtime: Long): DataFrame = {
    def tag(df: DataFrame, action: String) = df
      .select(col("s"), col("p"), col("o"),
        (if (df.columns.contains("c")) col("c") else Term.unbound).as("c"))
      .withColumn("action", lit(action))
      .withColumn("rev", lit(rev)).withColumn("revtime", lit(revtime))
    tag(asserted, "INSERTED").unionByName(tag(retracted, "REMOVED"))
  }

  // ---- store-frame -> history-relation binding --------------------------
  // LRU-bounded like Services.storeKeys: a long-lived server rebinds on
  // every commit, and each superseded store plan must eventually drop.
  private val MaxBindings = 16
  private val bindings = new java.util.LinkedHashMap[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, DataFrame](
      16, 0.75f, /* accessOrder = */ true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[
          org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, DataFrame])
        : Boolean = size > MaxBindings
  }

  /** Bind a store frame to its history relation (idempotent; latest wins). */
  def bind(store: DataFrame, history: DataFrame): Unit =
    bindings.synchronized {
      bindings.put(store.queryExecution.analyzed.canonicalized, history)
    }

  private def resolve(store: DataFrame): DataFrame =
    bindings.synchronized {
      Option(bindings.get(store.queryExecution.analyzed.canonicalized))
    }.getOrElse(throw new IllegalArgumentException(
      "history service: this store has no bound change log — enable it " +
        "with QuadStore.enableHistory(root) / History.bind(store, relation)"))

  // ---- the service -------------------------------------------------------

  def service(quads: DataFrame, config: Seq[TriplePattern]): Result = {
    require(config.nonEmpty, "history service needs at least one config triple")
    val entries: Seq[(String, Pat, Pat)] = config.map {
      case TriplePattern(s, C(pc), o, _) => (Services.constLex(pc), s, o)
      case other => throw new IllegalArgumentException(
        s"history service config must use constant predicates: $other")
    }
    entries.foreach { case (p, _, _) =>
      require(p.startsWith(NS), s"history service: unknown predicate <$p>") }
    // the shared subject variable binds the revision number
    val recVar = entries.map(_._2).map {
      case V(n) => n
      case _ => throw new IllegalArgumentException(
        "history service subject must be a variable")
    }.distinct match {
      case Seq(one) => one
      case many => throw new IllegalArgumentException(
        s"history service config must share one subject variable, got $many")
    }
    def find(suffix: String): Option[Pat] =
      entries.collectFirst { case (p, _, o) if p == NS + suffix => o }
    def constFilter(suffix: String): Option[String] = find(suffix).map {
      case C(t) => Services.constLex(t)
      case other => throw new IllegalArgumentException(
        s"history #$suffix must be a constant: $other")
    }

    var hist = resolve(quads)
    constFilter("sinceRevision").foreach(n => hist = hist.filter(col("rev") >= n.toLong))
    constFilter("untilRevision").foreach(n => hist = hist.filter(col("rev") <= n.toLong))
    constFilter("sinceTime").foreach(t => hist = hist.filter(col("revtime") >= t.toLong))

    var outCols = Seq(
      Term.num(col("rev").cast(Term.numType), Term.XsdInteger).as(recVar))
    var certain = Set(recVar)
    var maybe = Set.empty[String]
    def position(suffix: String, column: String, defaultMaybe: Boolean): Unit =
      find(suffix).foreach {
        case V(n) =>
          outCols :+= col(column).as(n)
          if (defaultMaybe) maybe += n else certain += n
        case C(t) => hist = hist.filter(col(column) === t)
      }
    position("subject", "s", defaultMaybe = false)
    position("predicate", "p", defaultMaybe = false)
    position("object", "o", defaultMaybe = false)
    // a default-graph change has a null graph — the variable may stay unbound
    position("graph", "c", defaultMaybe = true)
    find("action").foreach {
      case V(n) =>
        outCols :+= Term.str(col("action")).as(n); certain += n
      case C(t) =>
        hist = hist.filter(col("action") === Services.constLex(t))
    }
    find("timestamp").foreach {
      case V(n) =>
        outCols :+= Term.num(col("revtime").cast(Term.numType), Term.XsdInteger).as(n)
        certain += n
      case C(t) =>
        hist = hist.filter(col("revtime") === Services.constLex(t).toLong)
    }
    Result(hist.select(outCols: _*), certain, maybe)
  }
}
