package graft.sparql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.rdf.{NTriples, QuadStore, Term}
import Algebra._

/** SPARQL UPDATE text execution (reference: AST2BOpUpdate.convertUpdateSwitch,
  * /root/reference/bigdata-rdf/src/java/com/bigdata/rdf/sparql/ast/eval/
  * AST2BOpUpdate.java:385-417). Supported forms:
  *
  *   INSERT DATA { triples }            DELETE DATA { triples }
  *   DELETE WHERE { pattern }
  *   [WITH <g>] DELETE { template } INSERT { template } [USING [NAMED] <g>]*
  *     WHERE { pattern }
  *   (either DELETE or INSERT part may be absent; templates and DATA blocks
  *   may contain GRAPH <g> { ... } groups; WITH scopes un-GRAPHed template
  *   triples and, absent USING, the WHERE default graph; USING builds the
  *   dataset: USING graphs merge into the default graph, USING NAMED lists
  *   the visible named graphs)
  *   CLEAR GRAPH <g> | CLEAR DEFAULT | CLEAR ALL   (DROP = CLEAR)
  *   CREATE GRAPH <g>   (no-op: graphs exist implicitly)
  *   ADD <g1> TO <g2> | COPY <g1> TO <g2> | MOVE <g1> TO <g2>
  *     (either side may be the keyword DEFAULT)
  *   LOAD <path> [INTO GRAPH <g>]
  *
  * Execution is functional: each operation maps a store DataFrame to a new
  * store DataFrame (Delta-style table replacement is the deploy-time
  * equivalent of the reference's commit protocol). Multiple operations
  * separated by ';' apply sequentially (Steps.java:53 analogue).
  */
object Update {

  def execute(spark: SparkSession, store: DataFrame, text: String): DataFrame = {
    // reuse the query tokenizer via a dedicated parse pass
    val ops = splitOps(text)
    ops.foldLeft(store)((st, op) => executeOne(spark, st, op))
  }

  /** Split on top-level ';' (outside braces/quotes; escaped quotes inside
    * literals do not toggle string state).
    */
  private def splitOps(text: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    var depth = 0
    var inStr = false
    var prevBackslash = false
    val cur = new StringBuilder
    for (c <- text) {
      if (c == '"' && !prevBackslash) inStr = !inStr
      if (!inStr) {
        if (c == '{') depth += 1
        if (c == '}') depth -= 1
      }
      if (c == ';' && depth == 0 && !inStr) { out += cur.toString; cur.clear() }
      else cur.append(c)
      prevBackslash = c == '\\' && !prevBackslash
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private def executeOne(spark: SparkSession, store: DataFrame, op: String): DataFrame = {
    val u = op.trim
    val upper = u.toUpperCase
    if (upper.startsWith("INSERT DATA")) {
      QuadStore.insert(store, constantTriples(spark, body(u)))
    } else if (upper.startsWith("DELETE DATA")) {
      QuadStore.delete(store, constantTriples(spark, body(u)))
    } else if (upper.startsWith("DELETE WHERE")) {
      val q = Parser.parse(spark, prefixesOf(u) +
        s" SELECT * WHERE { ${body(u)} }")
      val sols = Translator.translate(store, q.node)
      val tmpl = templateOf(spark, prefixesOf(u), body(u))
      QuadStore.delete(store, instantiate(sols, tmpl))
    } else if (upper.startsWith("CLEAR") || upper.startsWith("DROP")) {
      val last = u.split("\\s+").last.toUpperCase
      if (last == "DEFAULT") store.filter(col("c").isNotNull)
      else if (last == "ALL") store.limit(0)
      else if (last == "NAMED") store.filter(col("c").isNull)
      else {
        val g = u.split("\\s+").last.stripPrefix("<").stripSuffix(">")
        QuadStore.clearGraph(store, Term.iri(g))
      }
    } else if (upper.startsWith("CREATE")) {
      store // graphs exist implicitly in the quad model
    } else if (upper.startsWith("ADD") || upper.startsWith("COPY") ||
               upper.startsWith("MOVE")) {
      val m = "(?i)^(ADD|COPY|MOVE)\\s+(?:GRAPH\\s+)?(DEFAULT|<[^>]*>)\\s+TO\\s+(?:GRAPH\\s+)?(DEFAULT|<[^>]*>)".r
        .findFirstMatchIn(u)
        .getOrElse(throw new IllegalArgumentException(s"bad graph op: ${u.take(60)}"))
      def gcol(tok: String): Column =
        if (tok.equalsIgnoreCase("DEFAULT")) Term.unbound
        else Term.iri(tok.stripPrefix("<").stripSuffix(">"))
      val (from, to) = (gcol(m.group(2)), gcol(m.group(3)))
      val kind = m.group(1).toUpperCase
      // COPY replaces the target graph first; ADD merges into it
      val base = if (kind == "ADD") store else store.filter(!(col("c") <=> to))
      val copied = QuadStore.insert(base,
        store.filter(col("c") <=> from).withColumn("c", to))
      if (kind == "MOVE") copied.filter(!(col("c") <=> from)) else copied
    } else if (upper.startsWith("LOAD")) {
      val parts = u.split("\\s+")
      val path = parts(1).stripPrefix("<").stripSuffix(">")
      val triples = NTriples.read(spark, path)
      val withG = if (upper.contains("INTO GRAPH")) {
        val g = parts.last.stripPrefix("<").stripSuffix(">")
        triples.withColumn("c", Term.iri(g))
      } else triples
      QuadStore.insert(store, withG)
    } else {
      // [prefixes] [WITH <g>] [DELETE { t }] [INSERT { t }]
      //   [USING [NAMED] <g>]* WHERE { pattern }
      val prefixes = prefixesOf(u)
      val withG: Option[Column] =
        "(?i)\\bWITH\\s+<([^>]*)>".r.findFirstMatchIn(u)
          .map(m => Term.iri(m.group(1)))
      val usingDefault = "(?i)\\bUSING\\s+<([^>]*)>".r
        .findAllMatchIn(u).map(m => Term.iri(m.group(1))).toSeq
      val usingNamed = "(?i)\\bUSING\\s+NAMED\\s+<([^>]*)>".r
        .findAllMatchIn(u).map(m => Term.iri(m.group(1))).toSeq
      val del = sectionBody(u, "DELETE")
      val ins = sectionBody(u, "INSERT")
      val where = sectionBody(u, "WHERE").getOrElse(
        throw new IllegalArgumentException(s"unsupported update: ${u.take(60)}"))
      // dataset for WHERE: USING clauses build it outright; otherwise WITH
      // makes that graph's contents the default graph (named graphs stay)
      val dataset =
        if (usingDefault.nonEmpty || usingNamed.nonEmpty) {
          val defaultPart = usingDefault.map(g =>
            store.filter(col("c") <=> g).withColumn("c", Term.unbound))
          val namedPart = usingNamed.map(g => store.filter(col("c") <=> g))
          (defaultPart ++ namedPart)
            .reduceOption(_ unionByName _)
            .getOrElse(store.limit(0))
        } else withG.map { g =>
          store.filter(col("c") <=> g).withColumn("c", Term.unbound)
            .unionByName(store.filter(col("c").isNotNull))
        }.getOrElse(store)
      val q = Parser.parse(spark, s"$prefixes SELECT * WHERE { $where }")
      val sols = Translator.translate(dataset, q.node)
      // un-GRAPHed template triples land in the WITH graph (default if none)
      def scope(tmpl: Seq[TriplePattern]): Seq[TriplePattern] = withG match {
        case Some(g) => tmpl.map(tp =>
          if (tp.g.isEmpty) tp.copy(g = Some(C(g))) else tp)
        case None => tmpl
      }
      val afterDel = del.map { d =>
        QuadStore.delete(store, instantiate(sols, scope(templateOf(spark, prefixes, d))))
      }.getOrElse(store)
      ins.map { t =>
        QuadStore.insert(afterDel, instantiate(sols, scope(templateOf(spark, prefixes, t))))
      }.getOrElse(afterDel)
    }
  }

  private def prefixesOf(u: String): String =
    "(?i)PREFIX\\s+\\S+\\s+<[^>]*>".r.findAllIn(u).mkString(" ")

  /** The body of the first top-level { ... } after the leading keyword. */
  private def body(u: String): String = {
    val start = u.indexOf('{')
    var depth = 0
    var i = start
    while (i < u.length) {
      if (u.charAt(i) == '{') depth += 1
      if (u.charAt(i) == '}') { depth -= 1; if (depth == 0) return u.substring(start + 1, i) }
      i += 1
    }
    throw new IllegalArgumentException("unbalanced braces in update")
  }

  /** The brace body following the given keyword, if present. */
  private def sectionBody(u: String, kw: String): Option[String] = {
    val m = s"(?i)\\b$kw\\b".r.findFirstMatchIn(u)
    m.flatMap { mm =>
      val after = u.substring(mm.end).trim
      if (!after.startsWith("{")) None
      else Some(body(u.substring(mm.end)))
    }
  }

  /** Parse a constant triple block (INSERT/DELETE DATA) via the query
    * parser's triples machinery on a WHERE-shaped wrapper.
    */
  private def constantTriples(spark: SparkSession, triples: String): DataFrame = {
    val q = Parser.parse(spark, s"SELECT * WHERE { $triples }")
    val tps = flat(q.node)
    val rows = tps.map { tp =>
      val cols = Seq(constCol(tp.s).as("s"), constCol(tp.p).as("p"),
                     constCol(tp.o).as("o"),
                     tp.g.map(constCol).getOrElse(Term.unbound).as("c"))
      spark.range(1).select(cols: _*)
    }
    rows.reduce(_ unionByName _)
  }

  private def constCol(p: Pat): Column = p match {
    case C(t) => t
    case V(n) => throw new IllegalArgumentException(s"variable ?$n in DATA block")
  }

  /** Instantiate a triple template once per solution; rows with unbound
    * positions are dropped (per spec).
    */
  private def instantiate(sols: Translator.Result,
                          tmpl: Seq[TriplePattern]): DataFrame = {
    def pos(p: Pat): Column = p match {
      case C(t) => t
      case V(n) => if (sols.vars(n)) col(n) else Term.unbound
    }
    tmpl.map { tp =>
      sols.df.select(pos(tp.s).as("s"), pos(tp.p).as("p"), pos(tp.o).as("o"),
                     tp.g.map(pos).getOrElse(Term.unbound).as("c"))
        .filter(col("s").isNotNull && col("p").isNotNull && col("o").isNotNull)
    }.reduce(_ unionByName _).distinct()
  }

  /** Parse a template block into triple patterns (vars allowed). */
  private def templateOf(spark: SparkSession, prefixes: String,
                         tmpl: String): Seq[TriplePattern] =
    flat(Parser.parse(spark, s"$prefixes SELECT * WHERE { $tmpl }").node)

  private def flat(n: Node): Seq[TriplePattern] = n match {
    case Bgp(tps, _) => tps
    case Join(l, r) => flat(l) ++ flat(r)
    case GraphNode(g, ch) => flat(ch).map(tp =>
      if (tp.g.isEmpty) tp.copy(g = Some(g)) else tp)
    case other => throw new IllegalArgumentException(s"bad template node: $other")
  }
}
