package graft

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import graft.rdf.{NTriples, QuadStore, Term}
import graft.sparql.{Parser, Translator, Update}

/** SERVICE (search magic predicates) + SPARQL UPDATE text + persisted-store
  * partition pruning.
  */
class ServiceUpdateSpec extends SparkSpecBase {

  private val EX = "http://ex/"
  private def parse(nt: Seq[String]): DataFrame =
    NTriples.parseLines(spark, spark.createDataset(nt)(Encoders.STRING).toDF("value"))

  test("SERVICE graft://search binds literals with relevance and rank") {
    val quads = parse(Seq(
      s"""<${EX}d1> <${EX}body> "spark joins data fast" .""",
      s"""<${EX}d2> <${EX}body> "slow tortoise walks" .""",
      s"""<${EX}d3> <${EX}body> "fast spark query" ."""))
    val df = Parser.select(spark, quads, s"""
      PREFIX ex: <$EX>
      SELECT ?doc ?lit ?score WHERE {
        ?doc ex:body ?lit .
        SERVICE <graft://search> {
          ?lit <graft://search#query> "fast spark" .
          ?lit <graft://search#relevance> ?score .
          ?lit <graft://search#rank> ?rank .
          ?lit <graft://search#maxRank> "5" .
        }
      } ORDER BY ?doc""")
    val docs = df.select(Term.lex(col("doc"))).collect().map(_.getString(0))
    assert(docs.toSeq == Seq(EX + "d1", EX + "d3"))
  }

  test("bds knob surface: minRank/maxRelevance/matchExact/matchRegex/prefixMatch/rangeCount") {
    // quantized tf-cosine scores differ: d3 = 0.928078, d1 = 0.707107
    val quads = parse(Seq(
      s"""<${EX}d1> <${EX}body> "spark joins data fast" .""",
      s"""<${EX}d2> <${EX}body> "slow tortoise walks" .""",
      s"""<${EX}d3> <${EX}body> "fast fast spark" ."""))
    def search(config: String, proj: String = "?lit"): Seq[Seq[String]] = {
      val df = Parser.select(spark, quads, s"""
        SELECT $proj WHERE {
          SERVICE <graft://search> {
            ?lit <graft://search#query> "fast spark" .
            $config
          }
        }""")
      val lexed = df.select(df.columns.map(c => Term.lex(col(c)).as(c)): _*)
      lexed.collect().toSeq.map(r => (0 until r.length).map(r.getString))
    }
    // baseline ordering: d3 outscores d1
    assert(search("""?lit <graft://search#rank> ?r .""").map(_.head).toSet ==
      Set("spark joins data fast", "fast fast spark"))
    // minRank=2: pagination window starts at the 2nd hit, which KEEPS rank 2
    val page2 = search("""?lit <graft://search#rank> ?r .
                          ?lit <graft://search#minRank> "2" .""", "?lit ?r")
    assert(page2 == Seq(Seq("spark joins data fast", "2")))
    // maxRelevance prunes the top hit; the survivor keeps its original rank
    val maxRel = search("""?lit <graft://search#rank> ?r .
                           ?lit <graft://search#maxRelevance> "0.8" .""", "?lit ?r")
    assert(maxRel == Seq(Seq("spark joins data fast", "2")))
    // matchExact: literal must CONTAIN the exact query string
    assert(search("""?lit <graft://search#matchExact> "true" .""") ==
      Seq(Seq("fast fast spark")))
    // matchRegex: Java find() semantics over the literal
    assert(search("""?lit <graft://search#matchRegex> "joins? data" .""") ==
      Seq(Seq("spark joins data fast")))
    // rangeCount binds ONLY the count — one solution, no hits
    val df = Parser.select(spark, quads, s"""
      SELECT ?n WHERE {
        SERVICE <graft://search> {
          ?lit <graft://search#query> "fast spark" .
          ?lit <graft://search#rangeCount> ?n .
        }
      }""")
    assert(df.select(Term.lex(col("n"))).collect().map(_.getString(0)).toSeq
      == Seq("2"))
  }

  test("bds prefixMatch flag treats every query term as a prefix") {
    val quads = parse(Seq(
      s"""<${EX}d1> <${EX}body> "sparkling fastest" .""",
      s"""<${EX}d2> <${EX}body> "slow tortoise walks" ."""))
    val df = Parser.select(spark, quads, s"""
      SELECT ?lit WHERE {
        SERVICE <graft://search> {
          ?lit <graft://search#query> "spark fast" .
          ?lit <graft://search#prefixMatch> "true" .
        }
      }""")
    assert(df.select(Term.lex(col("lit"))).collect().map(_.getString(0)).toSeq
      == Seq("sparkling fastest"))
  }

  test("magic search predicates inline in a BGP (bds:search surface)") {
    val quads = parse(Seq(
      s"""<${EX}d1> <${EX}body> "spark joins data fast" .""",
      s"""<${EX}d2> <${EX}body> "slow tortoise walks" .""",
      s"""<${EX}d3> <${EX}body> "fast spark query" ."""))
    // no SERVICE wrapper: the magic predicates sit in the triples block
    // like the reference's ?lit bds:search "..." pattern
    val df = Parser.select(spark, quads, s"""
      PREFIX ex: <$EX>
      SELECT ?doc ?score WHERE {
        ?doc ex:body ?lit .
        ?lit <graft://search#query> "fast spark" .
        ?lit <graft://search#relevance> ?score .
      } ORDER BY ?doc""")
    val docs = df.select(Term.lex(col("doc"))).collect().map(_.getString(0))
    assert(docs.toSeq == Seq(EX + "d1", EX + "d3"))
  }

  test("SPARQL UPDATE: INSERT DATA / DELETE DATA / DELETE-INSERT WHERE") {
    val store0 = parse(Seq(
      s"""<${EX}alice> <${EX}status> "active" .""",
      s"""<${EX}bob> <${EX}status> "active" ."""))
    // INSERT DATA
    val s1 = Update.execute(spark, store0,
      s"""INSERT DATA { <${EX}carol> <${EX}status> "new" . }""")
    assert(s1.count() == 3)
    // DELETE DATA
    val s2 = Update.execute(spark, s1,
      s"""DELETE DATA { <${EX}carol> <${EX}status> "new" . }""")
    assert(s2.count() == 2)
    // DELETE { } INSERT { } WHERE { }: archive active users
    val s3 = Update.execute(spark, s2, s"""
      PREFIX ex: <$EX>
      DELETE { ?u ex:status "active" }
      INSERT { ?u ex:status "archived" . ?u ex:wasActive "true" }
      WHERE { ?u ex:status "active" }""")
    assert(s3.count() == 4) // 2 archived + 2 wasActive
    assert(s3.filter(col("o") === Term.str("archived")).count() == 2)
    // sequential ops with ';' — including ';' and escaped quotes inside a
    // literal, which must NOT split the program
    val s4 = Update.execute(spark, s3,
      s"""INSERT DATA { <${EX}x> <${EX}p> "a;b and \\"q\\"" . } ;
          INSERT DATA { <${EX}x> <${EX}p> "2" . }""")
    assert(s4.count() == 6)
    assert(!s4.filter(col("o") === Term.str("a;b and \"q\"")).isEmpty)
  }

  test("bds artifact cache stays bounded across live-store updates") {
    import graft.sparql.Services
    var store = parse(Seq(s"""<${EX}d0> <${EX}body> "alpha beta" ."""))
    val q = s"""
      PREFIX ex: <$EX>
      SELECT ?lit WHERE { ?lit <graft://search#query> "alpha" . }"""
    // every update yields a NEW store plan; each search keys the bds index
    // by that plan — without eviction the map and artifact dir grow per
    // update, forever, in a long-lived server
    for (i <- 1 to 12) {
      store = Update.execute(spark, store,
        s"""INSERT DATA { <${EX}d$i> <${EX}body> "alpha gamma $i" . }""")
      assert(Parser.select(spark, store, q).count() >= 1)
    }
    assert(Services.bdsCacheSize <= 8)
    // two artifacts (bds_index, bds_occ) per retained store key, plus the
    // retired-key grace window (evicted artifacts outlive their entry by
    // RetiredGrace evictions so in-flight scans finish): 2*(8+4)
    assert(graft.queries.Catalog.entryCount("bds-store-") <= 24)
  }

  test("INSERT DATA blank nodes are fresh per operation (19.6)") {
    val store0 = parse(Seq(s"""<${EX}seed> <${EX}p> "0" ."""))
    // two ops in one request, both using _:x — they must mint DISTINCT nodes
    val s1 = Update.execute(spark, store0,
      s"""INSERT DATA { _:x <${EX}tag> "one" . } ;
          INSERT DATA { _:x <${EX}tag> "two" . }""")
    val tagged = s1.filter(col("p") === Term.iri(EX + "tag"))
    assert(tagged.count() == 2)
    assert(tagged.select(col("s")).distinct().count() == 2)
    // within ONE op the same label is the same node
    val s2 = Update.execute(spark, store0,
      s"""INSERT DATA { _:y <${EX}a> "1" . _:y <${EX}b> "2" . }""")
    assert(s2.filter(col("p") === Term.iri(EX + "a") ||
                     col("p") === Term.iri(EX + "b"))
      .select(col("s")).distinct().count() == 1)
    // re-executing the same op mints NEW nodes (4 distinct subjects total)
    val s3 = Update.execute(spark, s1,
      s"""INSERT DATA { _:x <${EX}tag> "one" . }""")
    assert(s3.filter(col("p") === Term.iri(EX + "tag"))
      .select(col("s")).distinct().count() == 3)
  }

  test("INSERT template blank node mints a fresh node per solution (19.6)") {
    val store0 = parse(Seq(
      s"""<${EX}alice> <${EX}status> "active" .""",
      s"""<${EX}bob> <${EX}status> "active" ."""))
    val s1 = Update.execute(spark, store0, s"""
      PREFIX ex: <$EX>
      INSERT { ?u ex:record _:r . _:r ex:kind "audit" }
      WHERE { ?u ex:status "active" }""")
    // one fresh bnode per solution, shared between the template's triples
    val recs = s1.filter(col("p") === Term.iri(EX + "record"))
    assert(recs.count() == 2)
    assert(recs.select(col("o")).distinct().count() == 2)
    val kinds = s1.filter(col("p") === Term.iri(EX + "kind"))
    assert(kinds.count() == 2)
    // the _:r object of ex:record IS the subject of ex:kind, per solution
    assert(recs.select(col("o").as("n")).intersect(
             kinds.select(col("s").as("n"))).count() == 2)
  }

  test("INSERT template bnodes are fresh per DUPLICATE solution (19.6)") {
    // two distinct users share the same status value; projecting only
    // ?status makes the WHERE multiset carry two IDENTICAL solutions —
    // each must still mint its own _:m (a value-keyed bnode would
    // collapse them into one shared node)
    val store0 = parse(Seq(
      s"""<${EX}alice> <${EX}status> "active" .""",
      s"""<${EX}bob> <${EX}status> "active" ."""))
    val s1 = Update.execute(spark, store0, s"""
      PREFIX ex: <$EX>
      INSERT { _:m ex:saw ?status }
      WHERE { SELECT ?status WHERE { ?u ex:status ?status } }""")
    val saw = s1.filter(col("p") === Term.iri(EX + "saw"))
    assert(saw.count() == 2, "duplicate solutions collapsed to one bnode")
    assert(saw.select(col("s")).distinct().count() == 2)
  }

  test("GRAPH-scoped UPDATE: WITH, USING, GRAPH templates, graph management") {
    val store0 = parse(Seq(
      s"""<${EX}a> <${EX}st> "live" <${EX}g1> .""",
      s"""<${EX}b> <${EX}st> "live" <${EX}g2> .""",
      s"""<${EX}c> <${EX}st> "live" ."""))

    // WITH <g1>: pattern matches only g1's contents; template writes to g1
    val s1 = Update.execute(spark, store0, s"""
      PREFIX ex: <$EX>
      WITH <${EX}g1>
      DELETE { ?u ex:st "live" }
      INSERT { ?u ex:st "done" }
      WHERE { ?u ex:st "live" }""")
    assert(s1.filter(col("c") === Term.iri(EX + "g1") &&
                     col("o") === Term.str("done")).count() == 1)
    // g2 and the default graph are untouched
    assert(s1.filter(col("o") === Term.str("live")).count() == 2)

    // USING <g2>: dataset for WHERE is g2 as default graph; the GRAPH
    // template routes the insert into g3
    val s2 = Update.execute(spark, s1, s"""
      PREFIX ex: <$EX>
      INSERT { GRAPH <${EX}g3> { ?u ex:seen "yes" } }
      USING <${EX}g2>
      WHERE { ?u ex:st "live" }""")
    assert(s2.filter(col("c") === Term.iri(EX + "g3")).count() == 1)
    assert(s2.filter(col("c") === Term.iri(EX + "g3"))
      .select(graft.rdf.Term.lex(col("s"))).head().getString(0) == EX + "b")

    // COPY replaces the target graph; ADD merges; MOVE drops the source
    val s3 = Update.execute(spark, s2, s"COPY <${EX}g1> TO <${EX}g3>")
    assert(s3.filter(col("c") === Term.iri(EX + "g3")).count() == 1) // replaced
    val s4 = Update.execute(spark, s3, s"ADD <${EX}g2> TO <${EX}g3>")
    assert(s4.filter(col("c") === Term.iri(EX + "g3")).count() == 2) // merged
    val s5 = Update.execute(spark, s4, s"MOVE <${EX}g2> TO <${EX}g1>")
    assert(s5.filter(col("c") === Term.iri(EX + "g2")).count() == 0)
    assert(s5.filter(col("c") === Term.iri(EX + "g1"))
      .select(graft.rdf.Term.lex(col("o"))).head().getString(0) == "live")

    // CLEAR DEFAULT keeps only named graphs
    val s6 = Update.execute(spark, s5, "CLEAR DEFAULT")
    assert(s6.filter(col("c").isNull).count() == 0 && s6.count() > 0)
  }

  test("persisted store: bound-predicate patterns prune partitions") {
    val quads = parse(Seq(
      s"""<${EX}a> <${EX}p1> "v1" .""",
      s"""<${EX}b> <${EX}p2> "v2" .""",
      s"""<${EX}c> <${EX}p3> "v3" ."""))
    val path = "/tmp/graft_store_pruning"
    QuadStore.save(quads, path)
    val store = QuadStore.load(spark, path)
    val df = Parser.select(spark, store,
      s"""SELECT ?s WHERE { ?s <${EX}p2> ?o }""")
    assert(df.count() == 1)
    // the physical plan must contain a partition filter on p_bucket
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(p_bucket"),
           s"no partition pruning in plan:\n$plan")
  }

  // ---- registry-parity services (ServiceRegistry.java:83-110) -----------

  private def numberedQuads(n: Int): DataFrame =
    parse((1 to n).map(i => f"<${EX}s$i%02d> <${EX}p> <${EX}o$i%02d> ."))

  test("SERVICE bd:sample: bounded, deterministic under seed, all types") {
    val quads = numberedQuads(20)
    def run(params: String): Seq[String] = {
      val df = Parser.select(spark, quads, s"""
        PREFIX bd: <http://www.bigdata.com/rdf#>
        SELECT ?s WHERE {
          SERVICE bd:sample {
            ?s <${EX}p> ?o .
            $params
          }
        }""")
      df.select(Term.lex(col("s"))).collect().map(_.getString(0)).toSeq
    }
    val r1 = run("""bd:serviceParam bd:sample.limit 5 .
                    bd:serviceParam bd:sample.seed 42 .""")
    assert(r1.size == 5 && r1.forall(_.startsWith(EX + "s")))
    // seeded-md5 order: the same seed replays the same sample
    assert(run("""bd:serviceParam bd:sample.limit 5 .
                  bd:serviceParam bd:sample.seed 42 .""") == r1)
    // a different seed draws a different sample (20 choose 5 — collision
    // would be a hash bug, not chance)
    assert(run("""bd:serviceParam bd:sample.limit 5 .
                  bd:serviceParam bd:sample.seed 43 .""") != r1)
    // DENSE: the first rows in total term order
    assert(run("""bd:serviceParam bd:sample.limit 3 .
                  bd:serviceParam bd:sample.sampleType "DENSE" .""") ==
      Seq(EX + "s01", EX + "s02", EX + "s03"))
    // EVEN: every k-th row, k = ceil(20/4) = 5
    assert(run("""bd:serviceParam bd:sample.limit 4 .
                  bd:serviceParam bd:sample.sampleType "EVEN" .""").sorted ==
      Seq(EX + "s01", EX + "s06", EX + "s11", EX + "s16"))
  }

  test("SERVICE bd:slice: offset/limit paging and range-count mode") {
    val quads = numberedQuads(10)
    val page = Parser.select(spark, quads, s"""
      PREFIX bd: <http://www.bigdata.com/rdf#>
      SELECT ?s WHERE {
        SERVICE bd:slice {
          ?s <${EX}p> ?o .
          bd:serviceParam bd:slice.offset 3 .
          bd:serviceParam bd:slice.limit 4 .
        }
      }""").select(Term.lex(col("s"))).collect().map(_.getString(0)).toSeq
    assert(page == Seq(EX + "s04", EX + "s05", EX + "s06", EX + "s07"))
    val n = Parser.select(spark, quads, s"""
      PREFIX bd: <http://www.bigdata.com/rdf#>
      SELECT ?range WHERE {
        SERVICE bd:slice {
          ?s <${EX}p> ?o .
          bd:serviceParam bd:slice.range ?range .
        }
      }""").select(Term.lex(col("range"))).collect().map(_.getString(0)).toSeq
    assert(n == Seq("10"))
  }

  test("SERVICE bd:values joins like inline VALUES") {
    val quads = numberedQuads(5)
    val df = Parser.select(spark, quads, s"""
      PREFIX bd: <http://www.bigdata.com/rdf#>
      SELECT ?s WHERE {
        ?s <${EX}p> ?o .
        SERVICE bd:values {
          bd:serviceParam bd:values.var ?s .
          bd:serviceParam bd:values.val <${EX}s02> .
          bd:serviceParam bd:values.val <${EX}s04> .
        }
      } ORDER BY ?s""")
    assert(df.select(Term.lex(col("s"))).collect().map(_.getString(0)).toSeq ==
      Seq(EX + "s02", EX + "s04"))
  }

  test("bds:searchInSearch filters subjects linked to full-text hits") {
    val quads = parse(Seq(
      s"""<${EX}d1> <${EX}body> "spark joins data fast" .""",
      s"""<${EX}d2> <${EX}body> "slow tortoise walks" .""",
      s"""<${EX}d3> <${EX}body> "fast spark query" .""",
      s"""<${EX}d1> <${EX}tag> "keep" .""",
      s"""<${EX}d2> <${EX}tag> "keep" ."""))
    // of the subjects carrying ex:tag, only d1 has a full-text hit literal
    val df = Parser.select(spark, quads, s"""
      SELECT ?s WHERE {
        ?s <${EX}tag> "keep" .
        ?s <http://www.bigdata.com/rdf/search#searchInSearch> "fast spark" .
      }""")
    assert(df.select(Term.lex(col("s"))).collect().map(_.getString(0)).toSeq ==
      Seq(EX + "d1"))
  }

  // ---- bd:history (ServiceRegistry.java:103-110) -------------------------

  test("SERVICE bd:history: the parquet history index answers since-queries") {
    import graft.sparql.History
    val root = java.nio.file.Files.createTempDirectory("graft-history").toString
    QuadStore.enableHistory(root)
    val v1 = parse(Seq(s"<${EX}a> <${EX}p> <${EX}b> ."))
    val v2 = parse(Seq(s"<${EX}a> <${EX}p> <${EX}b> .",
                       s"<${EX}c> <${EX}p> <${EX}d> ."))
    val v3 = parse(Seq(s"<${EX}c> <${EX}p> <${EX}d> ."))
    QuadStore.commit(v1, root) // rev 0: +a
    QuadStore.commit(v2, root) // rev 1: +c
    QuadStore.commit(v3, root) // rev 2: -a
    val store = QuadStore.open(spark, root)
    History.bind(store, QuadStore.history(spark, root))
    def hist(config: String): Seq[(String, String, String)] =
      Parser.select(spark, store, s"""
        SELECT ?rev ?s ?act WHERE {
          SERVICE <graft://history> {
            ?rev <graft://history#subject> ?s .
            ?rev <graft://history#action> ?act .
            $config
          }
        } ORDER BY ?rev ?s""")
        .select(Term.lex(col("rev")), Term.lex(col("s")), Term.lex(col("act")))
        .collect().toSeq.map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(hist("") == Seq(
      ("0", EX + "a", "INSERTED"),
      ("1", EX + "c", "INSERTED"),
      ("2", EX + "a", "REMOVED")))
    // "what changed since revision 1" — the service's reason to exist
    assert(hist(s"""?rev <graft://history#sinceRevision> "2" .""") ==
      Seq(("2", EX + "a", "REMOVED")))
    // constant action filters instead of binding
    val removed = Parser.select(spark, store, s"""
      SELECT ?s WHERE {
        SERVICE <graft://history> {
          ?rev <graft://history#subject> ?s .
          ?rev <graft://history#action> "REMOVED" .
        }
      }""").select(Term.lex(col("s"))).collect().map(_.getString(0)).toSeq
    assert(removed == Seq(EX + "a"))
  }

  test("bd:history: sequential UPDATE commits write rev=1,2 partitions and " +
       "a since/until window spans the boundary") {
    import graft.sparql.{History, Update}
    val root = java.nio.file.Files.createTempDirectory("graft-hist-upd").toString
    QuadStore.enableHistory(root)
    // rev 0: the base store
    QuadStore.commit(parse(Seq(s"<${EX}base> <${EX}p> <${EX}o> .")), root)
    // rev 1, rev 2: one SPARQL UPDATE each, committed sequentially — the
    // write path a long-lived endpoint takes (update → commit → listener)
    val s0 = QuadStore.open(spark, root)
    val s1 = Update.execute(spark, s0,
      s"INSERT DATA { <${EX}u1> <${EX}p> <${EX}v1> }")
    QuadStore.commit(s1, root)
    val s2 = Update.execute(spark, QuadStore.open(spark, root),
      s"""DELETE DATA { <${EX}u1> <${EX}p> <${EX}v1> } ;
          INSERT DATA { <${EX}u2> <${EX}p> <${EX}v2> }""")
    QuadStore.commit(s2, root)
    // one immutable parquet partition per commit
    val revDirs = new java.io.File(s"$root/_history").listFiles()
      .map(_.getName).filter(_.startsWith("rev=")).sorted.toSeq
    assert(revDirs == Seq("rev=0", "rev=1", "rev=2"))
    val store = QuadStore.open(spark, root)
    History.bind(store, QuadStore.history(spark, root))
    def window(config: String): Seq[(String, String, String)] =
      Parser.select(spark, store, s"""
        SELECT ?rev ?s ?act WHERE {
          SERVICE <graft://history> {
            ?rev <graft://history#subject> ?s .
            ?rev <graft://history#action> ?act .
            $config
          }
        } ORDER BY ?rev ?s ?act""")
        .select(Term.lex(col("rev")), Term.lex(col("s")), Term.lex(col("act")))
        .collect().toSeq.map(r => (r.getString(0), r.getString(1), r.getString(2)))
    // the since/until window spanning the rev=1 / rev=2 boundary sees the
    // insert, its retraction, and the replacement — not the base commit
    assert(window(s"""?rev <graft://history#sinceRevision> "1" .
                      ?rev <graft://history#untilRevision> "2" .""") == Seq(
      ("1", EX + "u1", "INSERTED"),
      ("2", EX + "u1", "REMOVED"),
      ("2", EX + "u2", "INSERTED")))
    // a window closed at the boundary sees only its own side
    assert(window(s"""?rev <graft://history#sinceRevision> "1" .
                      ?rev <graft://history#untilRevision> "1" .""") ==
      Seq(("1", EX + "u1", "INSERTED")))
  }

  test("history bindings LRU: eviction fails loudly, never silently " +
       "re-binds the wrong store") {
    import graft.sparql.History
    // register MaxBindings+2 distinct store frames: the first two must be
    // evicted; querying one of them then raises the no-bound-change-log
    // error — a silent wrong-store binding would be a correctness bug in a
    // multi-tenant server, a loud error is the documented failure mode
    val stores = (0 until 18).map { i =>
      parse(Seq(s"<${EX}tenant$i> <${EX}p> <${EX}o> ."))
    }
    stores.foreach(st => History.bind(st, History.emptyRelation(spark)))
    // the most-recent 16 still resolve
    Parser.select(spark, stores.last, s"""
      SELECT ?rev WHERE { SERVICE <graft://history> {
        ?rev <graft://history#subject> ?s . } }""").collect()
    // the evicted one raises the loud, named error
    val ex = intercept[IllegalArgumentException] {
      Parser.select(spark, stores.head, s"""
        SELECT ?rev WHERE { SERVICE <graft://history> {
          ?rev <graft://history#subject> ?s . } }""").collect()
    }
    assert(ex.getMessage.contains("no bound change log"))
  }
}
