package graft.sparql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.rdf.Term
import graft.search.FullText
import Algebra._
import Translator.Result

/** Internal SERVICE registry — the ServiceCallJoin/ServiceRegistry analogue
  * (/root/reference/bigdata/src/java/com/bigdata/bop/controller/
  * ServiceCallJoin.java:103; registry sparql/ast/service/
  * ServiceRegistry.java:34). Remote HTTP endpoints are out of scope
  * (zero-egress); internal services evaluate a configuration BGP into a
  * solution DataFrame that joins back into the enclosing group.
  *
  * Built-in: `graft://search` — the bds:search magic-predicate surface
  * (reference rdf/store/BDS.java:94-143):
  *
  *   SERVICE <graft://search> {
  *     ?lit <graft://search#query> "spark fast" .
  *     ?lit <graft://search#relevance> ?score .      # optional
  *     ?lit <graft://search#rank> ?rank .            # optional
  *     ?lit <graft://search#minRelevance> "0.1" .    # optional
  *     ?lit <graft://search#maxRelevance> "0.9" .    # optional
  *     ?lit <graft://search#minRank> "5" .           # optional
  *     ?lit <graft://search#maxRank> "20" .          # optional
  *     ?lit <graft://search#matchAllTerms> "true" .  # optional
  *     ?lit <graft://search#matchExact> "true" .     # optional
  *     ?lit <graft://search#matchRegex> "sp.rk" .    # optional
  *     ?lit <graft://search#prefixMatch> "true" .    # optional (deprecated:
  *                                                   #   trailing-'*' terms)
  *     ?lit <graft://search#rangeCount> ?n .         # optional: bind hit
  *                                                   #   count, no hits
  *   }
  *
  * binds ?lit to matching string literals in the store's default graph —
  * the complete BDS.java:94-431 magic-predicate surface (subjectSearch is
  * the subject-centric index, FullText.buildSubjectIndex; searchTimeout
  * parses, with enforcement at the query-lifecycle deadline).
  */
object Services {

  type ServiceFn = (DataFrame, Seq[TriplePattern]) => Result

  private var registry = Map.empty[String, ServiceFn]

  def register(iri: String, fn: ServiceFn): Unit = synchronized {
    registry += iri -> fn
  }

  def isRegistered(iri: String): Boolean = registry.contains(iri)

  def lookup(iri: String): ServiceFn =
    registry.getOrElse(iri,
      throw new IllegalArgumentException(s"unknown SERVICE <$iri>"))

  // ---- built-in: full-text search over the store's string literals ----

  val SearchIri = "graft://search"
  private val NS = "graft://search#"

  /** Synthetic config predicate the translator appends when the search
    * group sits inside GRAPH ?g / GRAPH <iri> (see Translator.rewriteGraph).
    */
  val graphConfigPred: org.apache.spark.sql.Column = Term.iri(NS + "graph")

  /** The bds index is a LOAD-TIME artifact, not a per-query derivation —
    * the reference builds its full-text index once, as statements load
    * (FullTextIndex.java:240: a persistent B+Tree populated by the
    * LexiconRelation), and every `bds:search` query only READS it. Keyed
    * by the store's canonicalized logical plan (structural identity — the
    * functional-store analogue of the server's store generation: an
    * updated store is a different plan, so it gets a fresh index), then
    * materialized to parquet via the Catalog exactly like the oracle fts
    * artifacts. Per store we keep TWO tables:
    *   bds_index — (term, doc, tf, w) over EVERY distinct string literal
    *               in the store (all graphs + default), Lucene-quantized
    *               tf-cosine weights. Doc weights are doc-local (no idf),
    *               so one store-wide index serves every GRAPH scope.
    *   bds_occ   — (doc, g) literal→graph occurrences (g null for the
    *               default graph): GRAPH-scoped queries FILTER postings
    *               by a semi-join on in-scope docs instead of rebuilding.
    */
  /** Store-plan → artifact-key cache, LRU-bounded: a long-lived server
    * yields a new store plan per update, and an unbounded map would retain
    * every superseded plan plus two parquet artifacts each.
    *
    * Eviction does NOT delete artifacts immediately: an in-flight query
    * may still hold a lazy DataFrame scanning the evicted key's parquet,
    * and deleting under it fails the scan mid-read. Evicted keys retire
    * into a small FIFO grace window instead; a key's artifacts are
    * physically dropped only after `RetiredGrace` further evictions (and
    * only if the key was not re-inserted meanwhile). Disk stays bounded
    * at 2·(MaxBdsStores + RetiredGrace) artifacts.
    */
  private val MaxBdsStores = 8
  private val RetiredGrace = 4
  private val retired = new java.util.ArrayDeque[String]()
  private val storeKeys = new java.util.LinkedHashMap[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String](
      16, 0.75f, /* accessOrder = */ true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[
          org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String])
        : Boolean =
      if (size > MaxBdsStores) { retired.addLast(e.getValue); true }
      else false
  }
  private val keyCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Drop retired keys past the grace window; call with storeKeys held.
    * A key re-inserted while retired (mid-build resurrection) is live
    * again — skip it.
    */
  private def drainRetired(): Unit =
    while (retired.size > RetiredGrace) {
      val k = retired.pollFirst()
      if (!storeKeys.containsValue(k)) graft.queries.Catalog.drop(k)
    }

  /** Live bds cache entries (spec hook for the eviction bound). */
  private[graft] def bdsCacheSize: Int = storeKeys.synchronized(storeKeys.size)

  private def litFilter: org.apache.spark.sql.Column =
    Term.isLiteral(col("o")) &&
      (Term.dt(col("o")) === Term.XsdString || Term.dt(col("o")).isNull)

  private def bdsArtifacts(quads: DataFrame): (DataFrame, DataFrame) = {
    val spark = quads.sparkSession
    val plan = quads.queryExecution.analyzed.canonicalized
    val key = storeKeys.synchronized {
      Option(storeKeys.get(plan)).getOrElse {
        val k = s"bds-store-${keyCounter.incrementAndGet()}"
        storeKeys.put(plan, k)
        k
      }
    }
    val idx = graft.queries.Catalog.table(spark, key, "bds_index") {
      val lits = quads.filter(litFilter)
        .select(Term.lex(col("o")).as("doc")).distinct()
        .withColumn("text", col("doc"))
      FullText.buildBdsIndex(lits)
    }
    val occ = graft.queries.Catalog.table(spark, key, "bds_occ") {
      quads.filter(litFilter)
        .select(Term.lex(col("o")).as("doc"), col("c").as("g")).distinct()
    }
    // the build ran outside the lock (it is a Spark job — serializing all
    // searches behind it would be worse); if OUR key was evicted while
    // building, re-insert it so the freshly built artifacts are owned by
    // a live entry again and eventually retire through the normal path —
    // never orphaned under a dead key
    storeKeys.synchronized {
      if (!Option(storeKeys.get(plan)).contains(key)) {
        storeKeys.put(plan, key)
        retired.removeFirstOccurrence(key)
      }
      drainRetired()
    }
    (idx, occ)
  }

  register(SearchIri, (quads: DataFrame, config: Seq[TriplePattern]) => {
    // extract (predicate-iri -> subject, object) via the constants' lex forms
    val entries: Seq[(String, Pat, Pat)] = config.map {
      case TriplePattern(s, C(pc), o, _) =>
        (constLex(pc), s, o)
      case other => throw new IllegalArgumentException(
        s"search service config must use constant predicates: $other")
    }
    def find(suffix: String): Option[(Pat, Pat)] =
      entries.collectFirst { case (p, s, o) if p == NS + suffix => (s, o) }

    // bds:searchInSearch (SearchInSearchServiceFactory, ServiceRegistry
    // .java:83): `?s bds:searchInSearch "query"` binds ?s to every SUBJECT
    // with at least one triple whose object literal is a full-text hit of
    // the query (reference getSubjects(): hits -> access path (null,null,o)
    // -> subject set). The enclosing group's compatibility join then
    // filters incoming bindings exactly like the reference's vectored
    // in-memory filter — same search knobs as bds:search.
    val searchInSearch = find("searchInSearch")
    val (litVarPat, queryPat) = searchInSearch.orElse(find("query")).getOrElse(
      throw new IllegalArgumentException("search service needs a #query triple"))
    val litVar = litVarPat match {
      case V(n) => n
      case _ => throw new IllegalArgumentException("search subject must be a variable")
    }
    val queryText = queryPat match {
      case C(t) => constLex(t)
      case _ => throw new IllegalArgumentException("#query must be a constant string")
    }
    val minRel = find("minRelevance").flatMap {
      case (_, C(t)) => Some(constLex(t).toDouble); case _ => None }.getOrElse(0.0)
    val maxRel = find("maxRelevance").flatMap {
      case (_, C(t)) => Some(constLex(t).toDouble); case _ => None }.getOrElse(1.0)
    val maxRank = find("maxRank").flatMap {
      case (_, C(t)) => Some(constLex(t).toInt); case _ => None }.getOrElse(Int.MaxValue)
    val minRank = find("minRank").flatMap {
      case (_, C(t)) => Some(constLex(t).toInt); case _ => None }.getOrElse(1)
    def boolCfg(suffix: String): Boolean = find(suffix).exists {
      case (_, C(t)) => constLex(t).equalsIgnoreCase("true"); case _ => false }
    val matchAll = boolCfg("matchAllTerms")
    // bds:matchExact — hits must CONTAIN the exact query string
    // (BigdataValueCentricFullTextIndex.matchExact:390, value.contains(q))
    val matchExact = boolCfg("matchExact")
    // bds:matchRegex — hits the Java regex finds in (applyRegex:461)
    val matchRegex = find("matchRegex").collect { case (_, C(t)) => constLex(t) }
    // bds:prefixMatch (deprecated in the reference for the trailing-'*'
    // syntax, BDS.java:364 + ticket 803, but still accepted): every query
    // term becomes a prefix pattern
    val prefixAll = boolCfg("prefixMatch")
    // bds:searchTimeout parses but the engine's query-lifecycle deadline
    // (server `timeout=` / cancelQuery, which interrupts the whole
    // evaluation this search is a lazy part of) is the enforcement point —
    // a per-fragment deadline has no independent meaning in a deferred plan
    find("searchTimeout").foreach { case (_, o) =>
      o match { case C(t) => constLex(t).toLong; case _ => () } }
    val scoreVar = find("relevance").collect { case (_, V(n)) => n }
    val rankVar = find("rank").collect { case (_, V(n)) => n }
    // bds:rangeCount — bind the object var to the hit count instead of
    // materializing hits (SearchServiceFactory.java:614-626)
    val rangeCountVar = find("rangeCount").collect { case (_, V(n)) => n }

    // GRAPH scope, threaded in by the translator: a constant restricts
    // the searched literals to that graph; a variable additionally binds
    // it from each matched literal's named-graph occurrences. The index is
    // the store-wide load-time artifact; scoping is a semi-join on the
    // occurrence table — doc weights are doc-local (plain tf-cosine, no
    // idf), so filtering docs yields byte-identical scores to an index
    // built over only the in-scope literals.
    val graphScope = find("graph")
    val (idx, occ) = bdsArtifacts(quads)
    val scopedIdx = graphScope match {
      case Some((C(t), _)) =>
        idx.join(occ.filter(col("g") === t).select("doc").distinct(), "doc")
      case Some((V(_), _)) =>
        idx.join(occ.filter(col("g").isNotNull).select("doc").distinct(), "doc")
      case _ => idx
    }
    // reference-faithful scoring: tf-cosine with Lucene-quantized doc
    // weights (FullTextIndex.java:892-897; see FullText.buildBdsIndex) —
    // the golden search-* cases' scores depend on the exact round-trip
    val terms0 = queryText.split("\\s+").toSeq.filter(_.nonEmpty)
    val terms = if (prefixAll) terms0.map(t => if (t.endsWith("*")) t else t + "*")
                else terms0
    val hits = FullText.searchBds(scopedIdx, terms,
                                  minRel, maxRank, matchAll, maxRel, minRank,
                                  if (matchExact) Some(queryText) else None,
                                  matchRegex)

    if (searchInSearch.isDefined) {
      // subject-set mode: distinct subjects linked to any hit literal, in
      // any graph (the reference walks the store-wide (null,null,o) access
      // path). One semi-join of the store's literal rows against the hit
      // docs — the hit frame is rank-bounded, so it broadcasts.
      val subs = quads.filter(litFilter)
        .select(col("s"), Term.lex(col("o")).as("doc"))
        .join(broadcast(hits.select("doc").distinct()), "doc")
        .select(col("s").as(litVar)).distinct()
      Result(subs, Set(litVar), Set.empty)
    } else rangeCountVar match {
      case Some(rv) =>
        // one solution, binding only the count (the reference's fast-path
        // contract: same query params, hits counted instead of converted —
        // SearchServiceFactory.call:614 binds just the rangeCount var)
        val out = hits.agg(count(lit(1)).as("__n"))
          .select(Term.num(col("__n").cast(Term.numType), Term.XsdInteger).as(rv))
        Result(out, Set(rv), Set.empty)
      case None =>
        var out = hits.select(
          (Term.str(col("doc")).as("__lit") +: (
            scoreVar.map(_ => Term.num(col("score").cast(Term.numType), Term.XsdDouble)).toSeq ++
            rankVar.map(_ => Term.num(col("rank").cast(Term.numType), Term.XsdInteger)).toSeq
          )): _*)
        var names = litVar +: (scoreVar.toSeq ++ rankVar.toSeq)
        // variable GRAPH scope: fan each hit out to the named graphs where
        // the literal occurs, binding the graph variable
        graphScope match {
          case Some((V(gv), _)) =>
            val namedOcc = occ.filter(col("g").isNotNull)
              .select(col("doc").as("__occlit"), col("g").as("__g"))
            out = out.join(namedOcc, Term.lex(col("__lit")) === col("__occlit"))
              .drop("__occlit")
            names = names :+ gv
          case _ =>
        }
        out = out.toDF(names: _*)
        Result(out, names.toSet, Set.empty)
    }
  })

  /** Recover the lexical form of a constant term Column (built by the
    * parser via Term constructors — the lex field is a string literal).
    */
  private[sparql] def constLex(t: org.apache.spark.sql.Column): String = {
    // evaluate the constant struct against a 1-row frame
    val spark = org.apache.spark.sql.SparkSession.active
    spark.range(1).select(Term.lex(t).as("l")).head().getString(0)
  }

  /** Federated SERVICE over the SPARQL protocol (ServiceCallJoin's remote
    * half, bigdata sparql/ast/service/RemoteServiceCallImpl.java): POST the
    * group's SELECT to the endpoint, parse the JSON results into a
    * term-struct solution frame, and hand it back for the enclosing group's
    * compatibility join. Remote chunks materialize on the driver — the same
    * granularity the reference's remote service calls work at.
    */
  def callRemote(spark: org.apache.spark.sql.SparkSession, endpoint: String,
                 query: String): Result = {
    val conn = java.net.URI.create(endpoint).toURL
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "application/x-www-form-urlencoded")
    conn.setRequestProperty("Accept", "application/sparql-results+json")
    val body = "query=" + java.net.URLEncoder.encode(query, "UTF-8")
    conn.getOutputStream.write(body.getBytes("UTF-8"))
    val code = conn.getResponseCode
    if (code >= 400)
      throw new IllegalStateException(s"SERVICE <$endpoint> returned HTTP $code")
    val text = new String(conn.getInputStream.readAllBytes(), "UTF-8")
    val (vars, df) = Results.fromJson(spark, text)
    // the shipped SELECT * also projects the group's anonymous-[]
    // variables under their generated names; the remote server generates
    // the SAME names for its own anonymous nodes, so keeping them would
    // fabricate a shared join variable (and remote bnode labels are
    // endpoint-scoped anyway — W3C federation service10). Drop them.
    val visible = vars.filterNot(_.startsWith("__anon_"))
    // remote bindings may leave any var unbound in any row → all maybe
    Result(df.select(visible.map(col): _*), Set.empty, visible.toSet)
  }

  // ---- reference registry parity (ServiceRegistry.java:83-110) ----------
  // bd:sample / bd:slice / bd:values ([[BdServices]]) and bd:history
  // ([[History]]) register here — the one init point the parser's
  // isRegistered() dispatch consults — with graft:// aliases.
  register(BdServices.SampleIri, BdServices.sample)
  register("graft://sample", BdServices.sample)
  register(BdServices.SliceIri, BdServices.slice)
  register("graft://slice", BdServices.slice)
  register(BdServices.ValuesIri, BdServices.values)
  register("graft://values", BdServices.values)
  register(History.HistoryIri, History.service)
  register(History.BdHistoryIri, History.service)
}
