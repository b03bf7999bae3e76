package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.rdf.{NTriples, QuadStore, Term}
import graft.sparql._
import graft.sparql.Algebra._

/** SPARQL-engine operator suite, oracle-gated: the quad store is derived
  * deterministically from the relational test tables (customer/nation/region/
  * orders → entity triples), each algebra query is run through the
  * Translator, and the DuckDB oracle computes the same answer with plain SQL
  * joins over the base tables.
  *
  * This is the driver-checkable face of the RDF core; SPARQL-semantics corner
  * cases (unbound handling, type errors, total order, MINUS scoping) are
  * covered by RdfAlgebraSpec fixtures.
  */
object RdfSuite {

  private val G = "http://g/"

  /** Money columns quantized to 2 decimals; lexical forms are their exact
    * string rendering, so oracle comparison is string-exact (no float drift).
    */
  private def money(c: Column): Column = Term.num(c.cast(DecimalType(18, 2)))

  /** Derive the quad store: customers, nations, regions, orders as entities.
    * locatedIn forms a 2-level hierarchy (customer→nation→region) for path
    * queries. Load-time artifact: triple-ization runs once per (JVM, dir)
    * via the Catalog, like the reference's bulk-load path.
    */
  def buildQuads(s: SparkSession, dir: String): DataFrame =
    Catalog.table(s, dir, "quads")(buildQuadsRaw(s, dir))

  private def buildQuadsRaw(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(s, dir, "customer")
    val nat = Tables.load(s, dir, "nation")
    val reg = Tables.load(s, dir, "region")
    val ord = Tables.load(s, dir, "orders")
    val custT = QuadStore.tripleize(cust,
      Term.iri(concat(lit(G + "c"), col("c_custkey"))),
      Seq(
        G + "name" -> Term.str(col("c_name")),
        G + "segment" -> Term.str(col("c_mktsegment")),
        G + "acctbal" -> money(col("c_acctbal")),
        G + "locatedIn" -> Term.iri(concat(lit(G + "n"), col("c_nationkey")))))
    val natT = QuadStore.tripleize(nat,
      Term.iri(concat(lit(G + "n"), col("n_nationkey"))),
      Seq(
        G + "name" -> Term.str(col("n_name")),
        G + "locatedIn" -> Term.iri(concat(lit(G + "r"), col("n_regionkey")))))
    val regT = QuadStore.tripleize(reg,
      Term.iri(concat(lit(G + "r"), col("r_regionkey"))),
      Seq(G + "name" -> Term.str(col("r_name"))))
    val ordT = QuadStore.tripleize(ord,
      Term.iri(concat(lit(G + "o"), col("o_orderkey"))),
      Seq(
        G + "by" -> Term.iri(concat(lit(G + "c"), col("o_custkey"))),
        G + "price" -> money(col("o_totalprice"))))
    QuadStore.fromTriples(Seq(custT, natT, regT, ordT))
  }

  /** Variant with named graphs: entity triples per source table graph. */
  def buildNamedQuads(s: SparkSession, dir: String): DataFrame =
    Catalog.table(s, dir, "named_quads")(buildNamedQuadsRaw(s, dir))

  private def buildNamedQuadsRaw(s: SparkSession, dir: String): DataFrame = {
    val q = buildQuads(s, dir)
    val g = when(Term.lex(col("s")).startsWith(G + "c"), Term.iri(G + "g_cust"))
      .when(Term.lex(col("s")).startsWith(G + "n"), Term.iri(G + "g_nat"))
      .when(Term.lex(col("s")).startsWith(G + "r"), Term.iri(G + "g_reg"))
      .otherwise(Term.iri(G + "g_ord"))
    q.withColumn("c", g)
  }

  /** Dictionary-encoded store as a load-time Catalog artifact. */
  def dictStore(s: SparkSession, d: String): graft.rdf.Dict.Store =
    graft.rdf.Dict.Store(
      Catalog.table(s, d, "dict_quads")(graft.rdf.Dict.encode(buildQuads(s, d)).quads),
      Catalog.table(s, d, "dict_lexicon")(graft.rdf.Dict.encode(buildQuads(s, d)).lexicon))

  private def tp(s: Pat, p: String, o: Pat) =
    TriplePattern(s, C(Term.iri(G + p)), o)

  private def run(s: SparkSession, dir: String, n: Node): Translator.Result =
    Translator.translate(buildQuads(s, dir), n)

  /** Per-user event-succession triples <e{id}> g:nextEvent <e{next}> —
    * directed chains (no reverse edges, so the closure is cycle-free and
    * cleanly oracle-checkable). Load-time artifact like the main store.
    */
  private def chainQuads(s: SparkSession, dir: String): DataFrame =
    Catalog.table(s, dir, "chain_quads") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val ev = Tables.load(s, dir, "events")
        .withColumn("nxt", lead(col("event_id"), 1).over(w))
        .filter(col("nxt").isNotNull)
      QuadStore.tripleize(ev,
        Term.iri(concat(lit(G + "e"), col("event_id"))),
        Seq(G + "nextEvent" -> Term.iri(concat(lit(G + "e"), col("nxt")))))
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "rdf_bgp_join" -> ((s, d) => {
      // 4-pattern star join on ?c (SPOStarJoin shape); the segment pattern
      // also restricts ?c to customer entities
      val q = Bgp(Seq(
        tp(V("c"), "locatedIn", V("n")),
        tp(V("c"), "segment", V("sg")),
        tp(V("c"), "name", V("cname")),
        tp(V("n"), "name", V("nname"))))
      run(s, d, q).df
        .select(Term.lex(col("cname")).as("cname"), Term.lex(col("nname")).as("nname"))
        .orderBy("cname")
    }),

    "rdf_optional" -> ((s, d) => {
      val q = LeftJoin(
        Bgp(Seq(tp(V("c"), "name", V("cn")))),
        Filter(r => TermOps.gt(r("p"), Term.num(lit(400000))),
          Bgp(Seq(tp(V("o"), "by", V("c")), tp(V("o"), "price", V("p"))))))
      run(s, d, q).df
        .select(Term.lex(col("cn")).as("cn"), Term.lex(col("p")).as("p"))
        .orderBy("cn", "p")
    }),

    "rdf_union" -> ((s, d) => {
      val q = Union(
        Bgp(Seq(tp(V("x"), "segment", V("seg")), tp(V("x"), "name", V("nm")))),
        Bgp(Seq(tp(V("x"), "locatedIn", V("r")),
                tp(V("r"), "name", V("rn")), tp(V("x"), "name", V("nm")))))
      run(s, d, q).df
        .select(Term.lex(col("nm")).as("nm"))
        .groupBy("nm").agg(count(lit(1)).as("n"))
        .orderBy("nm")
    }),

    "rdf_minus" -> ((s, d) => {
      val big = Filter(r => TermOps.gt(r("p"), Term.num(lit(400000))),
        Bgp(Seq(tp(V("o"), "by", V("c")), tp(V("o"), "price", V("p")))))
      val q = Minus(Bgp(Seq(tp(V("c"), "name", V("cn")), tp(V("c"), "segment", V("sg")))),
                    big)
      run(s, d, q).df.select(Term.lex(col("cn")).as("cn")).orderBy("cn")
    }),

    "rdf_exists" -> ((s, d) => {
      val big = Filter(r => TermOps.gt(r("p"), Term.num(lit(400000))),
        Bgp(Seq(tp(V("o"), "by", V("c")), tp(V("o"), "price", V("p")))))
      val q = ExistsFilter(Bgp(Seq(tp(V("c"), "name", V("cn")))), big, negated = false)
      run(s, d, q).df.select(Term.lex(col("cn")).as("cn")).orderBy("cn")
    }),

    "rdf_exists_bind" -> ((s, d) => {
      // EXISTS as a VALUE (BIND(EXISTS{...} AS ?has)): the ExtendExists
      // marker-bind operator under the oracle gate — every customer row
      // survives, annotated true/false by a semi/anti marker pair
      val big = Filter(r => TermOps.gt(r("p"), Term.num(lit(400000))),
        Bgp(Seq(tp(V("o"), "by", V("c")), tp(V("o"), "price", V("p")))))
      // the segment pattern restricts ?c to customer entities (nation and
      // region share the name predicate)
      val q = ExtendExists("has",
        r => Term.bool(r("__m").cast(org.apache.spark.sql.types.BooleanType)),
        Seq("__m" -> big),
        Bgp(Seq(tp(V("c"), "name", V("cn")), tp(V("c"), "segment", V("sg")))))
      run(s, d, q).df
        .select(Term.lex(col("cn")).as("cn"), Term.lex(col("has")).as("has"))
        .orderBy("cn")
    }),

    "rdf_filter_bind" -> ((s, d) => {
      // exact-addition BIND: no decimal rounding, so the oracle compare is
      // string-exact
      val q = Extend("disc", r => TermOps.arith(r("p"), Term.num(lit(1000)), _ + _),
        Filter(r => TermOps.ge(r("p"), Term.num(lit(500000))),
          Bgp(Seq(tp(V("o"), "by", V("c")), tp(V("o"), "price", V("p"))))))
      run(s, d, q).df
        .select(Term.lex(col("o")).as("o"),
                Term.numVal(col("disc")).cast(DecimalType(18, 2)).cast(StringType).as("disc"))
        .orderBy("o")
    }),

    "rdf_agg_group" -> ((s, d) => {
      val q = Group(Seq("nname"),
        Seq("ncust" -> Aggs.countVar("c"), "bal" -> Aggs.sumVar("b")),
        Bgp(Seq(
          tp(V("c"), "locatedIn", V("n")), tp(V("n"), "name", V("nname")),
          tp(V("c"), "acctbal", V("b")))))
      run(s, d, q).df
        .select(Term.lex(col("nname")).as("nname"),
                Term.numVal(col("ncust")).cast(LongType).as("ncust"),
                Term.numVal(col("bal")).cast(DecimalType(18, 2)).cast(StringType).as("bal"))
        .orderBy("nname")
    }),

    "rdf_orderby_slice" -> ((s, d) => {
      val q = Slice(0, 10,
        OrderBy(Seq("b" -> false, "cn" -> true),
          Bgp(Seq(tp(V("c"), "name", V("cn")), tp(V("c"), "acctbal", V("b"))))))
      run(s, d, q).df
        .select(Term.lex(col("cn")).as("cn"), Term.lex(col("b")).as("b"))
    }),

    // ---- dict-store (id-space) algebra twins: same semantics as their
    // struct-space counterparts, evaluated by Dict.translate with joins /
    // OPTIONAL / UNION / aggregation on 8-byte ids and lazy lexicon decode
    "rdf_optional_dict" -> ((s, d) => {
      import graft.rdf.Dict._
      val store = dictStore(s, d)
      val q = DLeftJoin(
        DBgp(Seq(tp(V("c"), "name", V("cn")))),
        DFilter("p", p => graft.sparql.TermOps.gt(p, Term.num(lit(400000))),
          DBgp(Seq(tp(V("o"), "by", V("c")), tp(V("o"), "price", V("p"))))))
      graft.rdf.Dict.run(store, q, Seq("cn", "p"))
        .select(Term.lex(col("cn")).as("cn"), Term.lex(col("p")).as("p"))
        .orderBy("cn", "p")
    }),

    "rdf_union_dict" -> ((s, d) => {
      import graft.rdf.Dict._
      val store = dictStore(s, d)
      val q = DGroup(Seq("nm"), Seq("n" -> DCountStar),
        DUnion(
          DBgp(Seq(tp(V("x"), "segment", V("seg")), tp(V("x"), "name", V("nm")))),
          DBgp(Seq(tp(V("x"), "locatedIn", V("r")),
                   tp(V("r"), "name", V("rn")), tp(V("x"), "name", V("nm"))))))
      graft.rdf.Dict.run(store, q, Seq("nm", "n"))
        .select(Term.lex(col("nm")).as("nm"),
                Term.numVal(col("n")).cast(LongType).as("n"))
        .orderBy("nm")
    }),

    "rdf_agg_group_dict" -> ((s, d) => {
      import graft.rdf.Dict._
      val store = dictStore(s, d)
      val q = DGroup(Seq("nname"),
        Seq("ncust" -> DCountVar("c"), "bal" -> DSumNum("b")),
        DBgp(Seq(
          tp(V("c"), "locatedIn", V("n")), tp(V("n"), "name", V("nname")),
          tp(V("c"), "acctbal", V("b")))))
      graft.rdf.Dict.run(store, q, Seq("nname", "ncust", "bal"))
        .select(Term.lex(col("nname")).as("nname"),
                Term.numVal(col("ncust")).cast(LongType).as("ncust"),
                Term.numVal(col("bal")).cast(DecimalType(18, 2)).cast(StringType).as("bal"))
        .orderBy("nname")
    }),

    "rdf_star_provenance" -> ((s, d) => {
      // SIDs / RDF-star: provenance statements about statements. Every
      // customer locatedIn statement gets (sid g:assertedBy g:census);
      // the query matches the quoted-triple pattern and joins on the SID.
      val base = buildQuads(s, d)
      val located = base.filter(col("p") === Term.iri(G + "locatedIn") &&
        Term.lex(col("s")).startsWith(G + "c"))
      val meta = located.select(
        QuadStore.sidOf(col("s"), col("p"), col("o")).as("s"),
        Term.iri(G + "assertedBy").as("p"),
        Term.iri(G + "census").as("o"),
        Term.unbound.as("c"))
      val store = base.unionByName(meta)
      Parser.select(s, store,
        s"""PREFIX g: <$G>
           SELECT ?c ?src WHERE { <<?c g:locatedIn ?n>> g:assertedBy ?src }""")
        .select(Term.lex(col("c")).as("c"), Term.lex(col("src")).as("src"))
        .orderBy("c")
    }),

    "rdf_path_plus" -> ((s, d) => {
      val q = PathPattern(V("x"), OneOrMore(Link(G + "locatedIn")), V("y"))
      run(s, d, q).df
        .select(Term.lex(col("x")).as("x"), Term.lex(col("y")).as("y"))
        .orderBy("x", "y")
    }),

    "rdf_path_chain" -> ((s, d) => {
      // (p)+ over DIRECTED per-user event chains — up to ~86 hops at
      // sf0.01, median ~66, so this gate fails any closure that bounds
      // path length (the one-hop/64-round loop it was added against
      // silently truncated everything past 65 edges)
      val r = Translator.translate(chainQuads(s, d),
        PathPattern(V("x"), OneOrMore(Link(G + "nextEvent")), V("y")))
      r.df.select(Term.lex(col("x")).as("x"), Term.lex(col("y")).as("y"))
        .orderBy("x", "y")
    }),

    "rdf_path_alt_inv" -> ((s, d) => {
      // alternation + inverse in one path: ?x (locatedIn | ^by) ?y — every
      // locatedIn edge (customer→nation, nation→region) plus each
      // customer's orders through the inverted by-edge
      val q = PathPattern(V("x"),
        Alt(Link(G + "locatedIn"), Inv(Link(G + "by"))), V("y"))
      run(s, d, q).df
        .select(Term.lex(col("x")).as("x"), Term.lex(col("y")).as("y"))
        .orderBy("x", "y")
    }),

    "rdf_path_nps" -> ((s, d) => {
      // negated property set: !(name|segment|acctbal|price|by) leaves
      // exactly the locatedIn edges
      val q = PathPattern(V("x"),
        NegatedSet(Seq(G + "name", G + "segment", G + "acctbal",
                       G + "price", G + "by")), V("y"))
      run(s, d, q).df
        .select(Term.lex(col("x")).as("x"), Term.lex(col("y")).as("y"))
        .orderBy("x", "y")
    }),

    "rdf_path_star" -> ((s, d) => {
      // zero-or-more from a constant start: c1, its nation, its region —
      // the zero-length path contributes the start node itself
      val q = PathPattern(C(Term.iri(G + "c1")),
        ZeroOrMore(Link(G + "locatedIn")), V("y"))
      run(s, d, q).df
        .select(Term.lex(col("y")).as("y"))
        .orderBy("y")
    }),

    "rdf_construct" -> ((s, d) => {
      import QueryForms._
      val quads = buildQuads(s, d)
      val node = PathPattern(V("c"), PSeq(Link(G + "locatedIn"), Link(G + "locatedIn")), V("r"))
      val g = construct(quads, node,
        Seq((TVar("c"), TConst(Term.iri(G + "inRegion")), TVar("r"))))
      g.select(NTriples.termToString(col("s")).as("s"),
               NTriples.termToString(col("p")).as("p"),
               NTriples.termToString(col("o")).as("o"))
        .orderBy("s", "o")
    }),

    "rdf_bgp_join_dict" -> ((s, d) => {
      // the same star BGP as rdf_bgp_join, evaluated on the dictionary-
      // encoded store (id joins + lazy lexicon decode) — same oracle.
      // Encoding is the load-time step (Term2IdWriteTask runs at bulk load,
      // not per query), so both halves come from the Catalog.
      val store = dictStore(s, d)
      val tps = Seq(
        tp(V("c"), "locatedIn", V("n")),
        tp(V("c"), "segment", V("sg")),
        tp(V("c"), "name", V("cname")),
        tp(V("n"), "name", V("nname")))
      graft.rdf.Dict.bgp(store, tps, Seq("cname", "nname"))
        .select(Term.lex(col("cname")).as("cname"), Term.lex(col("nname")).as("nname"))
        .orderBy("cname")
    }),

    "rdf_filter_dict" -> ((s, d) => {
      // filter on a decoded VALUE over the id-joined store: the BGP joins
      // stay in id space; only ?b (the filter var) and the projection
      // decode through the lexicon (lazy materialization)
      val store = dictStore(s, d)
      val tps = Seq(
        tp(V("c"), "acctbal", V("b")),
        tp(V("c"), "name", V("cname")))
      graft.rdf.Dict.bgpFilter(store, tps,
          filters = Seq("b" -> ((b: org.apache.spark.sql.Column) =>
            graft.sparql.TermOps.gt(b, Term.num(lit(9000))))),
          project = Seq("cname", "b"))
        .select(Term.lex(col("cname")).as("cname"),
                Term.lex(col("b")).as("bal"))
        .orderBy("cname")
    }),

    "sparql_text" -> ((s, d) => {
      // the full text path: SPARQL string -> parser -> algebra -> DataFrame
      val df = Parser.select(s, buildQuads(s, d),
        """PREFIX g: <http://g/>
           SELECT ?nname (COUNT(?c) AS ?n) WHERE {
             ?c g:locatedIn ?nat .
             ?nat g:name ?nname .
             ?c g:acctbal ?b .
             FILTER(?b > 0)
           } GROUP BY ?nname ORDER BY ?nname""")
      df.select(Term.lex(col("nname")).as("nname"),
                Term.numVal(col("n")).cast(LongType).as("n"))
        .orderBy("nname")
    }),

    "service_slice" -> ((s, d) => {
      // bd:slice registry service end-to-end through SPARQL text: a page
      // of the locatedIn access path in the engine's total term order
      // (SliceServiceFactory.java:83-100 analogue, offset/limit mode)
      val df = Parser.select(s, buildQuads(s, d),
        """PREFIX bd: <http://www.bigdata.com/rdf#>
           PREFIX g: <http://g/>
           SELECT ?s ?o WHERE {
             SERVICE bd:slice {
               ?s g:locatedIn ?o .
               bd:serviceParam bd:slice.offset 25 .
               bd:serviceParam bd:slice.limit 40 .
             }
           }""")
      df.select(Term.lex(col("s")).as("x"), Term.lex(col("o")).as("y"))
        .orderBy("x", "y")
    }),

    "service_sample" -> ((s, d) => {
      // bd:sample registry service: seeded deterministic RANDOM sample of
      // one access path (SampleServiceFactory.java:74-84 analogue) — the
      // seeded-md5 order replays bit-for-bit in the oracle
      val df = Parser.select(s, buildQuads(s, d),
        """PREFIX bd: <http://www.bigdata.com/rdf#>
           PREFIX g: <http://g/>
           SELECT ?s ?o WHERE {
             SERVICE bd:sample {
               ?s g:locatedIn ?o .
               bd:serviceParam bd:sample.limit 50 .
               bd:serviceParam bd:sample.seed 7 .
             }
           }""")
      df.select(Term.lex(col("s")).as("x"), Term.lex(col("o")).as("y"))
        .orderBy("x", "y")
    }),

    "rdf_named_graphs" -> ((s, d) => {
      val q = GraphNode(V("g"), Bgp(Seq(tp(V("x"), "name", V("nm")))))
      Translator.translate(buildNamedQuads(s, d), q).df
        .select(Term.lex(col("g")).as("g"))
        .groupBy("g").agg(count(lit(1)).as("n"))
        .orderBy("g")
    })
  )

  private val oraclesBase: Map[String, String] = Map(
    "rdf_bgp_join" ->
      """SELECT c_name AS cname, n_name AS nname
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         ORDER BY cname""",

    "rdf_optional" ->
      """SELECT cn, p FROM (
           SELECT c_name AS cn,
             regexp_replace(regexp_replace(
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
               '(\.\d*?)0+$', '\1'), '\.$', '') AS p
           FROM customer LEFT JOIN
             (SELECT * FROM orders WHERE CAST(o_totalprice AS DECIMAL(18,2)) > 400000) o
             ON o.o_custkey = c_custkey
           UNION ALL SELECT n_name, NULL FROM nation   -- ?c ranges over all
           UNION ALL SELECT r_name, NULL FROM region)  -- named entities
         ORDER BY cn, p""",

    "rdf_union" ->
      """SELECT nm, COUNT(*) AS n FROM (
           SELECT c_name AS nm FROM customer          -- arm 1: segment+name
           UNION ALL
           SELECT c_name AS nm FROM customer          -- arm 2: customers...
           UNION ALL
           SELECT n_name AS nm FROM nation)           -- ...and nations
         GROUP BY nm ORDER BY nm""",

    "rdf_minus" ->
      """SELECT c_name AS cn FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                           AND CAST(o_totalprice AS DECIMAL(18,2)) > 400000)
         ORDER BY cn""",

    "rdf_exists" ->
      """SELECT c_name AS cn FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                       AND CAST(o_totalprice AS DECIMAL(18,2)) > 400000)
         ORDER BY cn""",

    "rdf_exists_bind" ->
      """SELECT c_name AS cn,
           CASE WHEN EXISTS (SELECT 1 FROM orders
                             WHERE o_custkey = c_custkey
                             AND CAST(o_totalprice AS DECIMAL(18,2)) > 400000)
                THEN 'true' ELSE 'false' END AS has
         FROM customer ORDER BY cn""",

    "rdf_filter_dict" ->
      """SELECT c_name AS cname,
           regexp_replace(regexp_replace(
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR),
             '(\.\d*?)0+$', '\1'), '\.$', '') AS bal
         FROM customer WHERE CAST(c_acctbal AS DECIMAL(18,2)) > 9000
         ORDER BY cname""",

    "rdf_filter_bind" ->
      """SELECT 'http://g/o' || o_orderkey AS o,
           CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) + 1000 AS DECIMAL(18,2)) AS VARCHAR) AS disc
         FROM orders WHERE CAST(o_totalprice AS DECIMAL(18,2)) >= 500000
         ORDER BY o""",

    "rdf_agg_group" ->
      """SELECT n_name AS nname, COUNT(*) AS ncust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS bal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY nname""",

    "rdf_orderby_slice" ->
      """SELECT c_name AS cn,
           regexp_replace(regexp_replace(
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR),
             '(\.\d*?)0+$', '\1'), '\.$', '') AS b
         FROM customer
         ORDER BY CAST(c_acctbal AS DECIMAL(18,2)) DESC, c_name LIMIT 10""",

    "rdf_star_provenance" ->
      """SELECT 'http://g/c' || c_custkey AS c, 'http://g/census' AS src
         FROM customer ORDER BY c""",

    "rdf_path_plus" ->
      """SELECT x, y FROM (
           SELECT 'http://g/c' || c_custkey AS x, 'http://g/n' || c_nationkey AS y
           FROM customer
           UNION ALL
           SELECT 'http://g/c' || c_custkey, 'http://g/r' || n_regionkey
           FROM customer JOIN nation ON c_nationkey = n_nationkey
           UNION ALL
           SELECT DISTINCT 'http://g/n' || n_nationkey, 'http://g/r' || n_regionkey
           FROM nation)
         ORDER BY x, y""",

    "rdf_path_alt_inv" ->
      """SELECT x, y FROM (
           SELECT 'http://g/c' || c_custkey AS x, 'http://g/n' || c_nationkey AS y
           FROM customer
           UNION ALL
           SELECT DISTINCT 'http://g/n' || n_nationkey, 'http://g/r' || n_regionkey
           FROM nation
           UNION ALL
           SELECT 'http://g/c' || o_custkey, 'http://g/o' || o_orderkey
           FROM orders)
         ORDER BY x, y""",

    "rdf_path_nps" ->
      """SELECT x, y FROM (
           SELECT 'http://g/c' || c_custkey AS x, 'http://g/n' || c_nationkey AS y
           FROM customer
           UNION ALL
           SELECT DISTINCT 'http://g/n' || n_nationkey, 'http://g/r' || n_regionkey
           FROM nation)
         ORDER BY x, y""",

    "rdf_path_star" ->
      """SELECT y FROM (
           SELECT 'http://g/c1' AS y
           UNION ALL
           SELECT 'http://g/n' || c_nationkey FROM customer WHERE c_custkey = 1
           UNION ALL
           SELECT 'http://g/r' || n_regionkey
           FROM customer JOIN nation ON c_nationkey = n_nationkey
           WHERE c_custkey = 1)
         ORDER BY y""",

    "rdf_construct" ->
      """SELECT DISTINCT '<http://g/c' || c_custkey || '>' AS s,
           '<http://g/inRegion>' AS p,
           '<http://g/r' || n_regionkey || '>' AS o
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         ORDER BY s, o""",

    "rdf_bgp_join_dict" ->
      """SELECT c_name AS cname, n_name AS nname
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         ORDER BY cname""",

    "rdf_path_chain" ->
      """WITH RECURSIVE pair AS (
           SELECT event_id AS src,
                  LEAD(event_id) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS dst
           FROM events),
         e AS (SELECT src, dst FROM pair WHERE dst IS NOT NULL),
         reach(src, dst) AS (
           SELECT src, dst FROM e
           UNION
           SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src)
         SELECT 'http://g/e' || src AS x, 'http://g/e' || dst AS y
         FROM reach ORDER BY x, y""",

    "sparql_text" ->
      """SELECT n_name AS nname, COUNT(*) AS n
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         WHERE CAST(c_acctbal AS DECIMAL(18,2)) > 0
         GROUP BY n_name ORDER BY nname""",

    "service_slice" ->
      """WITH li AS (
           SELECT 'http://g/c' || c_custkey AS s, 'http://g/n' || c_nationkey AS o
           FROM customer
           UNION ALL
           SELECT 'http://g/n' || n_nationkey, 'http://g/r' || n_regionkey
           FROM nation),
         page AS (SELECT s, o FROM li ORDER BY o, s OFFSET 25 LIMIT 40)
         SELECT s AS x, o AS y FROM page ORDER BY x, y""",

    "service_sample" ->
      """WITH li AS (
           SELECT 'http://g/c' || c_custkey AS s, 'http://g/n' || c_nationkey AS o
           FROM customer
           UNION ALL
           SELECT 'http://g/n' || n_nationkey, 'http://g/r' || n_regionkey
           FROM nation),
         h AS (SELECT s, o,
                 CAST('0x' || substr(md5('7 ' || o || ' ' || s), 1, 15) AS BIGINT) AS hh
               FROM li),
         pick AS (SELECT s, o FROM h ORDER BY hh LIMIT 50)
         SELECT s AS x, o AS y FROM pick ORDER BY x, y""",

    "rdf_named_graphs" ->
      """SELECT g, n FROM (
           SELECT 'http://g/g_cust' AS g, COUNT(*) AS n FROM customer
           UNION ALL
           SELECT 'http://g/g_nat', COUNT(*) FROM nation
           UNION ALL
           SELECT 'http://g/g_reg', COUNT(*) FROM region)
         ORDER BY g"""
  )

  /** The dict-store twins share their struct-space counterparts' oracles
    * (identical semantics, different evaluation space).
    */
  val oracles: Map[String, String] = oraclesBase ++ Map(
    "rdf_optional_dict" -> oraclesBase("rdf_optional"),
    "rdf_union_dict" -> oraclesBase("rdf_union"),
    "rdf_agg_group_dict" -> oraclesBase("rdf_agg_group"))
}
