package graft.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.{AtomicLong, AtomicReference}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StructField, StructType}
import graft.rdf.{NTriples, QuadStore, Term}
import graft.sparql.{Parser, Results, Update}

/** SPARQL-over-HTTP facade — the NanoSparqlServer analogue
  * (/root/reference/bigdata-sails/src/java/com/bigdata/rdf/sail/webapp/
  * NanoSparqlServer.java:79, RESTServlet.java:43, QueryServlet.java:88).
  *
  * Endpoints (on the JDK's built-in HTTP server; zero dependencies):
  *   GET  /sparql?query=...       SELECT→JSON (Accept: xml→XML), ASK→JSON,
  *                                CONSTRUCT/DESCRIBE→N-Triples
  *   POST /sparql                 form body `query=` (as GET) or `update=`
  *                                (SPARQL UPDATE; mutates the served store)
  *   GET  /sparql?ESTCARD[&s=<iri>][&p=<iri>][&o=<iri>]   fast cardinality
  *   GET  /sparql?CONTEXTS        named-graph listing (N-Triples terms)
  *   GET  /sparql?query=...&explain   EXPLAIN instead of running (algebra
  *                                + scope + marker counts + physical plan)
  *   GET  /status                 liveness + store size
  *
  * Multi-tenancy (the MultiTenancyServlet surface,
  * /root/reference/bigdata-sails/src/java/com/bigdata/rdf/sail/webapp/
  * MultiTenancyServlet.java:66 — create/list/destroy namespaces at
  * runtime, one isolated store each; the reference's default namespace is
  * "kb", NanoSparqlServer.java:121):
  *   GET    /namespace                list namespaces (text/plain, one per line)
  *   GET    /namespace/<ns>/properties  tenant metadata (JSON)
  *   POST   /namespace?name=<ns>     create an empty namespace (409 if taken)
  *   DELETE /namespace/<ns>          destroy a namespace (default refused)
  *   *      /namespace/<ns>/sparql   the full /sparql surface on <ns>'s store
  * `/sparql` is an alias for `/namespace/kb/sparql`.
  *
  * Each namespace's store is an AtomicReference swapped by updates — the
  * functional-store analogue of the reference's unisolated-writer commit.
  * The HTTP layer is deliberately thin: every query runs through exactly
  * the library pipeline (§3.1/§3.3); a production deployment would put the
  * same calls behind Spark Connect instead.
  */
class SparqlServer(spark: SparkSession, initial: DataFrame, port: Int = 0) {

  /** One tenant: an immutable-store cell plus its update generation (the
    * per-namespace DESCRIBE-cache invalidation key).
    */
  private final class Namespace(init: DataFrame) {
    val store = new AtomicReference[DataFrame](init)
    val generation = new AtomicLong(0L)
  }

  val DefaultNamespace = "kb"

  private val namespaces =
    new java.util.concurrent.ConcurrentHashMap[String, Namespace]()
  namespaces.put(DefaultNamespace, new Namespace(initial))

  private val describeCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, String), String]()
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  private val quadSchema = StructType(Seq(
    StructField("s", Term.schema), StructField("p", Term.schema),
    StructField("o", Term.schema), StructField("c", Term.schema)))

  private def emptyStore: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], quadSchema)

  def current: DataFrame = namespaces.get(DefaultNamespace).store.get()
  def boundPort: Int = server.getAddress.getPort

  /** Namespace names currently served (spec hook + /namespace listing). */
  def namespaceNames: Seq[String] = {
    val it = namespaces.keys()
    Iterator.continually(it).takeWhile(_.hasMoreElements)
      .map(_.nextElement()).toSeq.sorted
  }

  def start(): SparqlServer = {
    server.createContext("/sparql", (ex: HttpExchange) => safely(ex) {
      handleSparql(ex, namespaces.get(DefaultNamespace), DefaultNamespace)
    })
    // namespace admin + per-namespace endpoints, dispatched on path:
    //   /namespace            (admin: list/create)
    //   /namespace/<ns>       (admin: destroy)
    //   /namespace/<ns>/sparql (tenant SPARQL surface)
    server.createContext("/namespace", (ex: HttpExchange) => safely(ex) {
      val rest = ex.getRequestURI.getPath.stripPrefix("/namespace")
        .stripPrefix("/").stripSuffix("/")
      val parts = if (rest.isEmpty) Array.empty[String] else rest.split("/")
      (ex.getRequestMethod, parts) match {
        case (_, Array(ns, "sparql")) =>
          namespaces.get(ns) match {
            case null => respond(ex, 404, "text/plain", s"no namespace $ns")
            case tenant => handleSparql(ex, tenant, ns)
          }
        // MultiTenancyServlet's per-namespace properties document
        case ("GET", Array(ns, "properties")) =>
          namespaces.get(ns) match {
            case null => respond(ex, 404, "text/plain", s"no namespace $ns")
            case tenant =>
              respond(ex, 200, "application/json",
                s"""{"namespace":"$ns","statements":${tenant.store.get().count()},""" +
                  s""""generation":${tenant.generation.get()}}""")
          }
        case ("GET", Array()) =>
          respond(ex, 200, "text/plain", namespaceNames.mkString("\n"))
        case ("POST", Array()) =>
          formParams(ex).get("name") match {
            case None | Some("") =>
              respond(ex, 400, "text/plain", "missing name param")
            case Some(ns) if !ns.matches("[A-Za-z0-9_-]+") =>
              respond(ex, 400, "text/plain", s"invalid namespace name $ns")
            case Some(ns) =>
              if (namespaces.putIfAbsent(ns, new Namespace(emptyStore)) != null)
                respond(ex, 409, "text/plain", s"namespace $ns exists")
              else respond(ex, 201, "text/plain", s"created $ns")
          }
        case ("DELETE", Array(ns)) =>
          if (ns == DefaultNamespace)
            respond(ex, 400, "text/plain", "cannot destroy the default namespace")
          else if (namespaces.remove(ns) == null)
            respond(ex, 404, "text/plain", s"no namespace $ns")
          else respond(ex, 200, "text/plain", s"destroyed $ns")
        case _ => respond(ex, 405, "text/plain", "unsupported")
      }
    })
    server.createContext("/status", (ex: HttpExchange) => safely(ex) {
      respond(ex, 200, "application/json",
        s"""{"status":"ok","statements":${current.count()},""" +
          s""""namespaces":${namespaceNames.size}}""")
    })
    // linked-data GET (RESTServlet.java:132-170): /ld?uri=<iri> → DESCRIBE.
    // CBDs cache per IRI (DescribeCache.java's job) keyed on the store
    // generation — any update invalidates the whole cache at once.
    server.createContext("/ld", (ex: HttpExchange) => safely(ex) {
      formParams(ex).get("uri") match {
        case None => respond(ex, 400, "text/plain", "missing uri param")
        case Some(u) =>
          val tenant = namespaces.get(DefaultNamespace)
          val gen = tenant.generation.get()
          val body = describeCache.computeIfAbsent((DefaultNamespace, gen, u), { _ =>
            serializeTriples(
              Parser.describe(spark, tenant.store.get(), s"DESCRIBE <$u>"))
          })
          respond(ex, 200, "application/n-triples", body)
      }
    })
    server.setExecutor(null) // current thread of the request
    server.start()
    this
  }

  private def handleSparql(ex: HttpExchange, tenant: Namespace,
                           ns: String): Unit = {
    val params = formParams(ex)
    if (params.contains("update") && ex.getRequestMethod == "POST") {
      tenant.store.updateAndGet(st => Update.execute(spark, st, params("update")))
      tenant.generation.incrementAndGet() // invalidates cached CBDs
      respond(ex, 200, "text/plain", "update ok")
    } else if (params.contains("ESTCARD")) {
      def term(k: String) = params.get(k).map(v => Term.iri(v))
      val n = QuadStore.estcard(tenant.store.get(), term("s"), term("p"), term("o"))
      respond(ex, 200, "application/json", s"""{"rangeCount":$n}""")
    } else if (params.contains("CONTEXTS")) {
      val gs = QuadStore.contexts(tenant.store.get())
        .select(NTriples.termToString(col("c"))).collect().map(_.getString(0))
      respond(ex, 200, "text/plain", gs.mkString("\n"))
    } else params.get("query") match {
      case None => respond(ex, 400, "text/plain", "missing query/update param")
      case Some(q) if params.contains("explain") =>
        // the reference's ?explain surface (QueryServlet.java EXPLAIN
        // attribute: renders the optimized AST + BOp plan instead of
        // running the query): SPARQL algebra, variable scope, EXISTS
        // marker counts, and the Catalyst physical plan
        respond(ex, 200, "text/plain",
          graft.sparql.Explain.explain(spark, tenant.store.get(), q).render)
      case Some(q) => runQuery(ex, tenant.store.get(), q)
    }
  }

  private def runQuery(ex: HttpExchange, store: DataFrame, text: String): Unit = {
    import Parser._
    val form = parse(spark, text).form
    val accept = Option(ex.getRequestHeaders.getFirst("Accept")).getOrElse("")
    form match {
      case SelectForm =>
        val sols = select(spark, store, text)
        if (accept.contains("xml"))
          respond(ex, 200, "application/sparql-results+xml", Results.toXml(sols))
        else if (accept.contains("tab-separated"))
          respond(ex, 200, "text/tab-separated-values", Results.toTsv(sols))
        else if (accept.contains("text/csv"))
          respond(ex, 200, "text/csv", Results.toCsv(sols))
        else
          respond(ex, 200, "application/sparql-results+json", Results.toJson(sols))
      case AskForm =>
        val b = ask(spark, store, text)
        respond(ex, 200, "application/sparql-results+json",
          s"""{"head":{},"boolean":$b}""")
      case ConstructForm =>
        respond(ex, 200, "application/n-triples",
          serializeTriples(construct(spark, store, text)))
      case DescribeForm =>
        respond(ex, 200, "application/n-triples",
          serializeTriples(describe(spark, store, text)))
    }
  }

  private def serializeTriples(df: DataFrame): String =
    df.select(NTriples.termToString(col("s")), NTriples.termToString(col("p")),
              NTriples.termToString(col("o")))
      .collect()
      .map(r => s"${r.getString(0)} ${r.getString(1)} ${r.getString(2)} .")
      .mkString("\n")

  /** Merge query-string and (for POST) form-encoded body parameters.
    * Bare flags like ESTCARD map to "". */
  private def formParams(ex: HttpExchange): Map[String, String] = {
    def decode(s: String): Map[String, String] =
      s.split("&").filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) kv -> ""
        else java.net.URLDecoder.decode(kv.take(i), UTF_8) ->
             java.net.URLDecoder.decode(kv.drop(i + 1), UTF_8)
      }.toMap
    val fromUri = Option(ex.getRequestURI.getRawQuery).map(decode).getOrElse(Map.empty)
    val fromBody =
      if (ex.getRequestMethod == "POST")
        decode(new String(ex.getRequestBody.readAllBytes(), UTF_8))
      else Map.empty[String, String]
    fromUri ++ fromBody
  }

  private def safely(ex: HttpExchange)(body: => Unit): Unit =
    try body
    catch {
      case e: Throwable =>
        try respond(ex, 500, "text/plain", s"error: ${e.getMessage}")
        catch { case _: Throwable => }
    }

  private def respond(ex: HttpExchange, code: Int, ctype: String, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", ctype)
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    os.write(bytes)
    os.close()
  }

  def stop(): Unit = server.stop(0)
}
