package graft.rdf

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Quad-store construction and SPARQL-UPDATE-style mutation as DataFrame
  * transformations (reference: SPORelation + AST2BOpUpdate under
  * /root/reference/ — bigdata-rdf/src/java/com/bigdata/rdf/spo/
  * SPORelation.java:128, sparql/ast/eval/AST2BOpUpdate.java:385-417).
  *
  * Scale posture: a persisted store is a parquet table partitioned by a
  * predicate bucket (quads cluster naturally by `p` — the POS covering
  * index's insight) so pattern scans with a bound predicate prune files; the
  * in-memory form used by tests is the same DataFrame, unpartitioned.
  */
object QuadStore {

  /** Assemble a quads DataFrame from (s,p,o[,c]) term columns. */
  def fromTriples(dfs: Seq[DataFrame]): DataFrame =
    dfs.map(_.select(col("s"), col("p"), col("o"),
              if (dfs.head.columns.contains("c")) col("c") else Term.unbound.as("c")))
      .reduce(_ unionByName _)

  /** One relational row set → triples: for each (predicate, object column)
    * pair, emit (subjectIri, predIri, obj). Null objects are skipped.
    */
  def tripleize(rows: DataFrame, subject: Column,
                pos: Seq[(String, Column)], graph: Option[Column] = None): DataFrame = {
    val c = graph.getOrElse(Term.unbound)
    pos.map { case (p, o) =>
      rows.select(subject.as("s"), Term.iri(p).as("p"), o.as("o"), c.as("c"))
        .filter(col("o").isNotNull)
    }.reduce(_ unionByName _)
  }

  /** Statement identifier (SID) of an asserted triple — the reference's
    * statement-identifiers database mode (AbstractTripleStore.java:787
    * STATEMENT_IDENTIFIERS; SPO.java sid handling) reified as a
    * content-addressed blank node: same triple, same SID, across
    * executors/replays — no mutable counter, which is what makes the mode
    * distributable. Statements ABOUT a statement use its SID as subject.
    */
  def sidOf(s: Column, p: Column, o: Column): Column =
    Term.bnode(concat(lit("sid-"), md5(concat_ws("",
      NTriples.termToString(s), NTriples.termToString(p),
      NTriples.termToString(o)))))

  /** The store's statements with their SIDs materialized (the `sid`
    * column reserved in SURVEY.md §1.2).
    */
  def withSids(store: DataFrame): DataFrame =
    store.withColumn("sid", sidOf(col("s"), col("p"), col("o")))

  /** SIDs-mode load transform: classic reification collapses into
    * statement identifiers (the reference's StatementBuffer SIDs handling
    * — reified statement models convert to SIDs at load,
    * AbstractTripleStore.java:787). A bnode carrying rdf:subject/
    * rdf:predicate/rdf:object (+ rdf:type rdf:Statement) is replaced by
    * the inner triple's SID everywhere it appears; the four reification
    * triples are dropped. Reification DESCRIBES a statement, it does not
    * assert it (the reference's rdr fixtures: metadata about an
    * unasserted statement matches no quoted-triple pattern) — so the
    * inner triple is NOT added.
    */
  def fromReified(store: DataFrame): DataFrame = {
    val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    def pIs(name: String) = col("p") === Term.iri(RdfNs + name)
    val isReifTriple = pIs("subject") || pIs("predicate") || pIs("object") ||
      (pIs("type") && col("o") === Term.iri(RdfNs + "Statement"))
    val stmts = store.filter(pIs("subject"))
      .select(col("s").as("rn"), col("o").as("rs"))
      .join(store.filter(pIs("predicate"))
        .select(col("s").as("rn2"), col("o").as("rp")), col("rn") === col("rn2"))
      .join(store.filter(pIs("object"))
        .select(col("s").as("rn3"), col("o").as("ro")), col("rn") === col("rn3"))
      .select(col("rn"), col("rs"), col("rp"), col("ro"),
              sidOf(col("rs"), col("rp"), col("ro")).as("rsid"))
    val mapping = stmts.select(col("rn"), col("rsid"))
    val rest = store.filter(!isReifTriple)
    // statements ABOUT a reified node move to its SID (subject position;
    // object position likewise, for completeness)
    val subjMapped = rest.join(mapping, rest("s") === mapping("rn"), "left")
      .select(coalesce(col("rsid"), col("s")).as("s"), col("p"), col("o"), col("c"))
    val objMapped = subjMapped.join(mapping.select(col("rn").as("rn4"), col("rsid").as("rsid4")),
        subjMapped("o") === col("rn4"), "left")
      .select(col("s"), col("p"), coalesce(col("rsid4"), col("o")).as("o"), col("c"))
    objMapped.distinct()
  }

  // ---- SPARQL UPDATE data operations (InsertStatementsOp /
  //      RemoveStatementsOp analogues) ----

  /** INSERT DATA / INSERT WHERE: append, bag-dedup against existing. */
  def insert(store: DataFrame, triples: DataFrame): DataFrame =
    store.unionByName(triples.select("s", "p", "o", "c")).distinct()

  /** DELETE DATA / DELETE WHERE: anti-join removal. */
  def delete(store: DataFrame, triples: DataFrame): DataFrame =
    store.join(triples.select(col("s").as("ds"), col("p").as("dp"),
                              col("o").as("do"), col("c").as("dc")),
      col("s") === col("ds") && col("p") === col("dp") &&
      col("o") === col("do") && col("c") <=> col("dc"),
      "left_anti")

  /** CLEAR GRAPH <g> / DROP GRAPH: partition-level delete on context. */
  def clearGraph(store: DataFrame, g: Column): DataFrame =
    store.filter(!(col("c") <=> g))

  /** ADD/COPY graph-to-graph. */
  def copyGraph(store: DataFrame, from: Column, to: Column): DataFrame =
    insert(store, store.filter(col("c") <=> from).withColumn("c", to))

  /** Fast cardinality estimate for an as-bound pattern (the REST API's
    * ESTCARD, /root/reference/bigdata-sails/src/java/com/bigdata/rdf/sail/
    * webapp/QueryServlet.java:116; backed there by B+Tree range counts,
    * here by a pruned parquet count — parquet stats + pushdown make it a
    * metadata-mostly scan for selective patterns).
    */
  def estcard(store: DataFrame, s: Option[Column] = None,
              p: Option[Column] = None, o: Option[Column] = None,
              c: Option[Column] = None): Long = {
    var df = store
    s.foreach(t => df = df.filter(col("s") === t))
    p.foreach(t => df = df.filter(col("p") === t))
    o.foreach(t => df = df.filter(col("o") === t))
    c.foreach(t => df = df.filter(col("c") <=> t))
    df.count()
  }

  /** Enumerate named graphs (the REST API's CONTEXTS,
    * QueryServlet.java:122): distinct non-null contexts.
    */
  def contexts(store: DataFrame): DataFrame =
    store.filter(col("c").isNotNull).select(col("c")).distinct()

  /** Bucket count for predicate partitioning — fixed so readers can derive
    * the partition filter from a constant predicate (Translator adds it).
    */
  val PBuckets = 64

  /** Persist partitioned for predicate pruning at scale: quads cluster by a
    * hash bucket of the predicate (the POS covering index's locality,
    * SPOKeyOrder.java:89-127, reborn as partition pruning).
    */
  def save(quads: DataFrame, path: String): Unit =
    quads
      .withColumn("p_bucket", pmod(hash(col("p.lex")), lit(PBuckets)))
      .write.mode("overwrite").partitionBy("p_bucket").parquet(path)

  /** Load a persisted store; keeps `p_bucket` so bound-predicate patterns
    * prune partitions (Translator.translateTp consumes and drops it).
    */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Save as a SUBJECT-bucketed table: rows hash-cluster by `s` into a
    * fixed bucket count recorded in the table metadata, so star joins and
    * self-joins on the subject read co-located buckets and skip the
    * shuffle entirely — the SPO covering index's join locality
    * (SPOKeyOrder.java:89) expressed as Spark bucketing. Requires
    * saveAsTable (bucket metadata lives in the catalog).
    */
  def saveBucketed(quads: DataFrame, table: String, buckets: Int = 64): Unit =
    quads.select("s", "p", "o", "c")
      .write.mode("overwrite")
      .bucketBy(buckets, "s")
      .format("parquet")
      .saveAsTable(table)

  // ---- versioned commits ----------------------------------------------
  // The reference's commit protocol (CommitOp → Journal commit points with
  // commitCounter/commit records, bigdata/src/java/com/bigdata/journal/
  // AbstractJournal.java) maps to snapshot-versioned table directories:
  // each commit writes a NEW immutable version directory v<n>, then
  // atomically publishes it by renaming a pointer file — readers resolve
  // the pointer and only ever see complete snapshots; old versions remain
  // readable (time travel / long-running queries keep their snapshot).
  // This is the Delta-style pattern expressed with nothing but a
  // filesystem; on an object store the pointer lives in a small
  // transaction-log object instead.

  private def versionDir(root: String, v: Long) = s"$root/v$v"
  private def pointer(root: String) = new java.io.File(s"$root/_CURRENT")

  /** Per-commit change notification — the reference's IChangeLog surface
    * (bigdata-sails/src/java/com/bigdata/rdf/sail/changesets/
    * IChangeLog.java): listeners registered on a store root observe, for
    * every commit, the quads asserted and retracted by that commit.
    *
    * The deltas are LAZY DataFrames — anti-joins between the new and
    * previous immutable snapshot directories. A listener that ignores them
    * pays nothing; one that executes them pays two hash anti-joins, the
    * same plan shape at 60k rows and at 100 TB. Downstream invalidation
    * (caches, incremental indexes, subscriptions) keys off `version`
    * exactly like the server's DESCRIBE cache keys off its generation.
    */
  trait ChangeListener {
    def changeEvent(root: String, version: Long,
                    asserted: DataFrame, retracted: DataFrame): Unit
  }

  private val changeListeners =
    scala.collection.concurrent.TrieMap.empty[String, Vector[ChangeListener]]

  def addChangeListener(root: String, l: ChangeListener): Unit =
    changeListeners.updateWith(root) {
      case Some(ls) => Some(ls :+ l)
      case None => Some(Vector(l))
    }

  def removeChangeListener(root: String, l: ChangeListener): Unit =
    changeListeners.updateWith(root) {
      case Some(ls) =>
        val rest = ls.filterNot(_ eq l)
        if (rest.isEmpty) None else Some(rest)
      case None => None
    }

  // ---- history index -----------------------------------------------------

  /** Change-log INDEX maintenance — the reference's bd:history service's
    * write half (sparql/ast/service/history/HistoryServiceFactory.java:132
    * HistoryChangeLogListener: an IChangeLog writing each commit's change
    * records into an index keyed by revision time). One immutable parquet
    * partition `_history/rev=<n>` per commit, carrying the change action
    * and the commit wall time; maintenance cost is exactly the delta
    * frames the listener contract already defines — O(delta) whenever the
    * committer passes `knownDelta`. [[graft.sparql.History]] serves it to
    * SPARQL.
    */
  private object HistoryIndexListener extends ChangeListener {
    def changeEvent(root: String, version: Long,
                    asserted: DataFrame, retracted: DataFrame): Unit =
      graft.sparql.History
        .records(asserted, retracted, version, System.currentTimeMillis())
        .drop("rev") // carried by the partition directory
        .write.mode("overwrite").parquet(s"$root/_history/rev=$version")
  }

  /** Turn on history-index maintenance for a store root (idempotent) —
    * opt-in, like the reference's history-index option
    * (TestHistoryIndex.test_historyIndexDisabled).
    */
  def enableHistory(root: String): Unit = {
    removeChangeListener(root, HistoryIndexListener)
    addChangeListener(root, HistoryIndexListener)
  }

  /** The recorded change relation of a store root: one row per changed
    * statement per commit — (s,p,o,c, action INSERTED|REMOVED, rev,
    * revtime). Empty (same schema) before the first recorded commit.
    */
  def history(spark: SparkSession, root: String): DataFrame = {
    val dir = new java.io.File(s"$root/_history")
    if (!dir.isDirectory ||
        !dir.listFiles().exists(_.getName.startsWith("rev=")))
      graft.sparql.History.emptyRelation(spark)
    else
      spark.read.parquet(s"$root/_history")
        .withColumn("rev", col("rev").cast("long"))
        .select("s", "p", "o", "c", "action", "rev", "revtime")
  }

  /** Notify listeners of a commit that is ALREADY durable: a listener
    * that throws must neither fail the (succeeded) commit back to the
    * caller — who might retry it — nor starve the remaining listeners
    * (the reference's IChangeLog contract). Log and continue.
    */
  private def notifyListeners(ls: Seq[ChangeListener], root: String,
                              version: Long, asserted: DataFrame,
                              retracted: DataFrame): Unit =
    ls.foreach { l =>
      try l.changeEvent(root, version, asserted, retracted)
      catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(
            s"[graft] change listener failed for $root@v$version: $e")
      }
    }

  /** Latest committed version, or -1 for an empty store root. */
  def currentVersion(root: String): Long = {
    val p = pointer(root)
    if (!p.exists()) -1L
    else java.nio.file.Files.readString(p.toPath).trim.toLong
  }

  /** Commit a new snapshot: write v<n+1> fully, then publish it with an
    * atomic pointer swap. Returns the new version number.
    *
    * `knownDelta`: when the caller already knows this commit's (asserted,
    * retracted) quads — streaming ingest derives them while extending the
    * closure — pass them through and change listeners read O(delta)
    * frames. Otherwise the delta is recovered by diffing the new snapshot
    * against the previous one: two full-store hash anti-joins, correct at
    * any scale but proportional to the STORE, not the change.
    */
  def commit(quads: DataFrame, root: String,
             knownDelta: Option[(DataFrame, DataFrame)] = None): Long = {
    val next = currentVersion(root) + 1
    save(quads, versionDir(root, next))
    val tmp = new java.io.File(s"$root/_CURRENT.tmp")
    java.nio.file.Files.writeString(tmp.toPath, next.toString)
    java.nio.file.Files.move(tmp.toPath, pointer(root).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val ls = changeListeners.getOrElse(root, Vector.empty)
    if (ls.nonEmpty) {
      val (asserted, retracted) = knownDelta.getOrElse {
        val spark = quads.sparkSession
        val cols = Seq("s", "p", "o", "c")
        val cur = open(spark, root, next).select(cols.map(col): _*)
        // the previous snapshot may have been compacted away; then the
        // whole commit reads as asserted (no baseline to diff against)
        val prev =
          if (next == 0 ||
              !new java.io.File(versionDir(root, next - 1)).isDirectory) None
          else Some(open(spark, root, next - 1).select(cols.map(col): _*))
        (prev.map(cur.except).getOrElse(cur),
         prev.map(_.except(cur)).getOrElse(cur.limit(0)))
      }
      notifyListeners(ls, root, next, asserted, retracted)
    }
    next
  }

  /** Open the store at the latest commit, or a specific version (time
    * travel). Reading a version is always consistent: version directories
    * are immutable once the pointer has advanced past them.
    */
  def open(spark: SparkSession, root: String, version: Long = -1L): DataFrame = {
    val v = if (version >= 0) version else currentVersion(root)
    require(v >= 0, s"no committed version under $root")
    load(spark, versionDir(root, v))
  }

  /** Committed versions present under the root, ascending. */
  def versions(root: String): Seq[Long] = {
    val dir = new java.io.File(root)
    Option(dir.listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(_.getName.substring(1).toLong).sorted
  }

  /** Compact the commit log: drop snapshot directories older than the
    * newest `keepLast` versions (the reference's journal compaction /
    * history-retention analogue — full-snapshot versioning is unbounded
    * storage growth without it). The CURRENT version is never dropped;
    * time travel below the watermark becomes unavailable. Returns the
    * versions removed.
    */
  def compact(root: String, keepLast: Int = 1): Seq[Long] = {
    require(keepLast >= 1, "must keep at least the current version")
    val vs = versions(root)
    val current = currentVersion(root)
    val cutoff = vs.filter(_ <= current).takeRight(keepLast).headOption.getOrElse(return Nil)
    val drop = vs.filter(v => v < cutoff && v != current)
    drop.foreach { v =>
      val dir = java.nio.file.Paths.get(versionDir(root, v))
      // delete children first (parquet part files + _SUCCESS)
      java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
    drop
  }
}
