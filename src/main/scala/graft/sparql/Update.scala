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
    val ops = splitOps(stripComments(text))
    ops.foldLeft(normalize(store))((st, op) => executeOne(spark, st, op))
  }

  /** Project a store frame to the canonical quad columns: a persisted
    * store ([[graft.rdf.QuadStore.open]]) carries the physical `p_bucket`
    * partition column for scan pruning, which must not reach the
    * insert-side unions (and a re-commit re-derives it anyway).
    */
  private def normalize(store: DataFrame): DataFrame = {
    val quadCols = Seq("s", "p", "o", "c")
    if (store.columns.toSeq == quadCols) store
    else if (quadCols.forall(store.columns.contains))
      store.select(quadCols.map(org.apache.spark.sql.functions.col): _*)
    else store
  }

  /** Parse/validate only — no file reads, no execution side effects (the
    * W3C Positive/NegativeUpdateSyntaxTest contract: LOAD of an
    * unreachable IRI is still SYNTACTICALLY valid).
    */
  def validate(spark: SparkSession, store: DataFrame, text: String): Unit = {
    val ops = splitOps(stripComments(text))
    require(ops.nonEmpty || text.trim.isEmpty ||
            stripComments(text).trim.isEmpty, s"no operations in: $text")
    ops.foldLeft(normalize(store))((st, op) =>
      executeOne(spark, st, op, parseOnly = true))
  }

  /** Drop '#' comments (outside string literals and IRI refs). */
  private def stripComments(text: String): String = {
    val sb = new StringBuilder(text.length)
    var i = 0
    var inStr: Char = 0
    var inIri = false
    while (i < text.length) {
      val c = text.charAt(i)
      if (inStr != 0) {
        sb.append(c)
        if (c == '\\' && i + 1 < text.length) { sb.append(text.charAt(i + 1)); i += 1 }
        else if (c == inStr) inStr = 0
      } else if (inIri) { sb.append(c); if (c == '>') inIri = false }
      else if (c == '"' || c == '\'') { inStr = c; sb.append(c) }
      else if (c == '<') { inIri = true; sb.append(c) }
      else if (c == '#') { while (i < text.length && text.charAt(i) != '\n') i += 1; sb.append('\n') }
      else sb.append(c)
      i += 1
    }
    sb.toString
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
    out += cur.toString
    val segs = out.result().map(_.trim)
    // grammar: Update ::= Prologue (Update1 (';' Update)?)? — one trailing
    // ';' is legal, an empty operation between separators (";;") is not
    // (syntax-update-bad-08/09)
    val body = if (segs.nonEmpty && segs.last.isEmpty) segs.init else segs
    require(body.forall(_.nonEmpty), "empty update operation (';;')")
    body
  }

  private def executeOne(spark: SparkSession, store: DataFrame, op: String,
                         parseOnly: Boolean = false): DataFrame = {
    val u = op.trim
    // prologue: leading BASE/PREFIX declarations scope the operation; the
    // dispatch keyword is the first token AFTER them
    val prologueRe = "(?is)^((?:\\s*(?:BASE\\s+<[^>]*>|PREFIX\\s+\\S+\\s+<[^>]*>))*)\\s*".r
    val prologue = prologueRe.findFirstMatchIn(u).map(_.group(1)).getOrElse("")
    val base = "(?i)BASE\\s+<([^>]*)>".r.findFirstMatchIn(prologue)
      .map(_.group(1)).getOrElse("")
    val prefixMap: Map[String, String] =
      "(?i)PREFIX\\s+([^\\s:]*):\\s*<([^>]*)>".r.findAllMatchIn(prologue)
        .map(m => m.group(1) -> m.group(2)).toMap
    val core = u.substring(prologueRe.findFirstMatchIn(u).map(_.group(1).length).getOrElse(0)).trim
    // a prologue with no operation is a valid (empty) update request
    // (syntax-update-39/40)
    if (core.isEmpty) return store
    // dispatch over whitespace-normalized text ("INSERT \n DATA" is legal)
    val upper = core.replaceAll("\\s+", " ").toUpperCase
    // a graph token: <iri> (BASE-resolved) or prefixed name
    def graphIri(tok: String): String =
      if (tok.startsWith("<")) graft.rdf.Iri.resolve(
        tok.stripPrefix("<").stripSuffix(">"), base)
      else {
        val i = tok.indexOf(':')
        require(i >= 0, s"not a graph ref: '$tok'")
        prefixMap.get(tok.substring(0, i)) match {
          case Some(ns) => ns + tok.substring(i + 1)
          case None => throw new IllegalArgumentException(
            s"unknown prefix in graph ref '$tok'")
        }
      }
    if (upper.startsWith("INSERT DATA")) {
      val data = constantTriples(spark, prologue, body(core), base)
      if (parseOnly) store else QuadStore.insert(store, data)
    } else if (upper.startsWith("DELETE DATA")) {
      // DELETE DATA admits no blank nodes (19.6)
      val b = body(core)
      require(!hasBareBnode(b), "blank node in DELETE DATA")
      val data = constantTriples(spark, prologue, b, base)
      if (parseOnly) store else QuadStore.delete(store, data)
    } else if (upper.startsWith("DELETE WHERE")) {
      val q = Parser.parse(spark, prologue +
        s" SELECT * WHERE { ${body(core)} }", base)
      val tmpl = templateOf(spark, prologue, body(core), base,
                            forbidBnodes = true)
      if (parseOnly) store
      else {
        val sols = Translator.translate(store, q.node)
        QuadStore.delete(store, instantiate(sols, tmpl))
      }
    } else if (upper.startsWith("CLEAR") || upper.startsWith("DROP")) {
      val toks = core.split("\\s+")
      require(toks.length >= 2, s"bad ${toks.head} op")
      val last = toks.last
      if (parseOnly) {
        if (!Set("DEFAULT", "ALL", "NAMED").contains(last.toUpperCase)) graphIri(last)
        store
      }
      else if (last.equalsIgnoreCase("DEFAULT")) store.filter(col("c").isNotNull)
      else if (last.equalsIgnoreCase("ALL")) store.limit(0)
      else if (last.equalsIgnoreCase("NAMED")) store.filter(col("c").isNull)
      else QuadStore.clearGraph(store, Term.iri(graphIri(last)))
    } else if (upper.startsWith("CREATE")) {
      // validate the full form even though graphs exist implicitly in the
      // quad model (CREATE DEAFULT / a missing ';' must still be errors)
      val m = "(?is)^CREATE\\s+(?:SILENT\\s+)?GRAPH\\s+(<[^>]*>|[^\\s<>]*:[^\\s<>]*)\\s*$".r
        .findFirstMatchIn(core)
        .getOrElse(throw new IllegalArgumentException(s"bad CREATE: ${core.take(60)}"))
      graphIri(m.group(1))
      store
    } else if (upper.startsWith("ADD") || upper.startsWith("COPY") ||
               upper.startsWith("MOVE")) {
      val m = ("(?is)^(ADD|COPY|MOVE)\\s+(SILENT\\s+)?(?:GRAPH\\s+)?" +
               "(DEFAULT|<[^>]*>|[^\\s<>]*:[^\\s<>]*)\\s+TO\\s+(?:GRAPH\\s+)?" +
               "(DEFAULT|<[^>]*>|[^\\s<>]*:[^\\s<>]*)").r
        .findFirstMatchIn(core)
        .getOrElse(throw new IllegalArgumentException(s"bad graph op: ${core.take(60)}"))
      def gcol(tok: String): Column =
        if (tok.equalsIgnoreCase("DEFAULT")) Term.unbound
        else Term.iri(graphIri(tok))
      val silent = m.group(2) != null
      val (from, to) = (gcol(m.group(3)), gcol(m.group(4)))
      val kind = m.group(1).toUpperCase
      if (parseOnly) store
      else if (from == to && m.group(3).equalsIgnoreCase(m.group(4))) store
      else if (!m.group(3).equalsIgnoreCase("DEFAULT") &&
               store.filter(col("c") <=> from).isEmpty) {
        // a non-existent source graph fails the operation (the default
        // graph always exists); SILENT turns the failure into a no-op
        if (silent) store
        else throw new IllegalArgumentException(
          s"$kind: source graph does not exist: ${m.group(3)}")
      } else {
        // COPY/MOVE replace the target graph first; ADD merges into it
        val base2 = if (kind == "ADD") store else store.filter(!(col("c") <=> to))
        val copied = QuadStore.insert(base2,
          store.filter(col("c") <=> from).withColumn("c", to))
        if (kind == "MOVE") copied.filter(!(col("c") <=> from)) else copied
      }
    } else if (upper.startsWith("LOAD")) {
      val toks = core.split("\\s+")
      val silent = toks.length > 1 && toks(1).equalsIgnoreCase("SILENT")
      val pathTok = toks(if (silent) 2 else 1)
      val path = graft.rdf.Iri.resolve(
        pathTok.stripPrefix("<").stripSuffix(">"), base)
      if (parseOnly) store
      else {
        def load(): DataFrame = {
          val triples =
            if (path.endsWith(".ttl")) graft.rdf.Turtle.read(spark, path, path)
            else if (path.endsWith(".rdf")) graft.rdf.RdfXml.read(spark, path, path)
            else NTriples.read(spark, path)
          val withG = if (upper.contains("INTO GRAPH")) {
            triples.withColumn("c", Term.iri(graphIri(toks.last)))
          } else triples
          QuadStore.insert(store, withG)
        }
        if (silent) scala.util.Try(load()).getOrElse(store) else load()
      }
    } else {
      // [prologue] [WITH <g>] [DELETE { t }] [INSERT { t }]
      //   [USING [NAMED] <g>]* WHERE { pattern }
      val prefixes = prologue
      val withG: Option[Column] =
        "(?i)\\bWITH\\s+(<[^>]*>|[^\\s<>]*:[^\\s<>]*)".r.findFirstMatchIn(core)
          .map(m => Term.iri(graphIri(m.group(1))))
      val usingDefault = "(?i)\\bUSING\\s+(?!NAMED\\b)(<[^>]*>|[^\\s<>]*:[^\\s<>]*)".r
        .findAllMatchIn(core).map(m => Term.iri(graphIri(m.group(1)))).toSeq
      val usingNamed = "(?i)\\bUSING\\s+NAMED\\s+(<[^>]*>|[^\\s<>]*:[^\\s<>]*)".r
        .findAllMatchIn(core).map(m => Term.iri(graphIri(m.group(1)))).toSeq
      val del = sectionBody(core, "DELETE")
      val ins = sectionBody(core, "INSERT")
      val where = sectionBody(core, "WHERE").getOrElse(
        throw new IllegalArgumentException(s"unsupported update: ${core.take(60)}"))
      // "INSERT WHERE"/"DELETE WHERE" handled above; the modify form needs
      // at least one template (syntax-update-bad-06)
      require(del.isDefined || ins.isDefined,
        "DELETE/INSERT ... WHERE needs at least one template")
      // dataset for WHERE: USING replaces the default graph, USING NAMED
      // restricts the named graphs; a GRAPH clause still sees the store's
      // named graphs when no USING NAMED is given (the approved
      // dawg-delete-using-02/06 semantics: "the GRAPH clause overrides the
      // USING clause"). Otherwise WITH makes that graph's contents the
      // default graph (named graphs stay).
      val dataset =
        if (usingDefault.nonEmpty || usingNamed.nonEmpty) {
          val defaultPart =
            if (usingDefault.nonEmpty) usingDefault.map(g =>
              store.filter(col("c") <=> g).withColumn("c", Term.unbound))
            else Seq(store.filter(col("c").isNull))
          val namedPart =
            if (usingNamed.nonEmpty) usingNamed.map(g => store.filter(col("c") <=> g))
            else Seq(store.filter(col("c").isNotNull))
          (defaultPart ++ namedPart).reduce(_ unionByName _)
        } else withG.map { g =>
          store.filter(col("c") <=> g).withColumn("c", Term.unbound)
            .unionByName(store.filter(col("c").isNotNull))
        }.getOrElse(store)
      val q = Parser.parse(spark, s"$prefixes SELECT * WHERE { $where }", base)
      val delT = del.map(d => templateOf(spark, prefixes, d, base,
                                         forbidBnodes = true))
      val insT = ins.map(t => templateOf(spark, prefixes, t, base))
      if (parseOnly) store
      else {
        val sols = Translator.translate(dataset, q.node)
        // un-GRAPHed template triples land in the WITH graph (default if none)
        def scope(tmpl: Seq[TriplePattern]): Seq[TriplePattern] = withG match {
          case Some(g) => tmpl.map(tp =>
            if (tp.g.isEmpty) tp.copy(g = Some(C(g))) else tp)
          case None => tmpl
        }
        val afterDel = delT.map { d =>
          QuadStore.delete(store, instantiate(sols, scope(d)))
        }.getOrElse(store)
        insT.map { t =>
          QuadStore.insert(afterDel, instantiate(sols, scope(t)))
        }.getOrElse(afterDel)
      }
    }
  }

  /** Does a template/data block contain a blank node ([] or _:label)?
    * Scans tokens outside string literals (19.6: DELETE forms admit none).
    */
  private def hasBareBnode(block: String): Boolean = {
    var i = 0; var inStr: Char = 0; var inIri = false
    while (i < block.length) {
      val c = block.charAt(i)
      if (inStr != 0) {
        if (c == '\\') i += 1 else if (c == inStr) inStr = 0
      }
      else if (inIri) { if (c == '>') inIri = false }
      else if (c == '"' || c == '\'') inStr = c
      else if (c == '<') inIri = true
      else if (c == '[') return true
      else if (c == '_' && i + 1 < block.length && block.charAt(i + 1) == ':')
        return true
      i += 1
    }
    false
  }

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
  private def constantTriples(spark: SparkSession, prefixes: String,
                              triples: String, base: String = ""): DataFrame = {
    val q = Parser.parse(spark, s"$prefixes SELECT * WHERE { $triples }", base)
    val tps = flat(q.node)
    if (tps.isEmpty) return spark.range(0)
      .select(Term.unbound.as("s"), Term.unbound.as("p"),
              Term.unbound.as("o"), Term.unbound.as("c"))
    val opId = opCounter.incrementAndGet()
    val rows = tps.map { tp =>
      val cols = Seq(constCol(tp.s, opId).as("s"), constCol(tp.p, opId).as("p"),
                     constCol(tp.o, opId).as("o"),
                     tp.g.map(constCol(_, opId)).getOrElse(Term.unbound).as("c"))
      spark.range(1).select(cols: _*)
    }
    rows.reduce(_ unionByName _)
  }

  // Blank nodes in INSERT DATA / INSERT templates are existentials scoped
  // to ONE operation execution (SPARQL Update 19.6): re-using `_:x` across
  // two operations — or re-running the same operation — must mint distinct
  // nodes. Each execution draws a fresh id to mix into the labels.
  private val opCounter = new java.util.concurrent.atomic.AtomicLong(0)

  private def isTemplateBnode(n: String): Boolean =
    n.startsWith("__bn_") || n.startsWith("__anon_") || n.startsWith("__coll_")

  private def constCol(p: Pat, opId: Long): Column = p match {
    case C(t) => t
    // a blank node in INSERT DATA mints a fresh node (existential); the
    // parser surfaced it as an internal var — label it per operation
    case V(n) if isTemplateBnode(n) => Term.bnode(lit(s"u${opId}_" + n))
    case V(n) => throw new IllegalArgumentException(s"variable ?$n in DATA block")
  }

  /** Instantiate a triple template once per solution; rows with unbound
    * positions are dropped (per spec). A blank node in an INSERT template
    * mints a fresh node PER SOLUTION (19.6): the same label within one
    * solution is one node; distinct solutions — including solutions
    * IDENTICAL in every binding (the multiset keeps duplicates) — get
    * distinct nodes. The per-row key is therefore a positional id, not a
    * value hash; it is minted once and materialized (localCheckpoint) so
    * every template triple derived from the same solution row sees the
    * SAME id — monotonically_increasing_id alone could disagree between
    * the per-triple scans if the upstream recomputes.
    */
  private def instantiate(sols: Translator.Result,
                          tmpl: Seq[TriplePattern]): DataFrame = {
    val opId = opCounter.incrementAndGet()
    val mintsBnodes = tmpl.exists(tp =>
      (Seq(tp.s, tp.p, tp.o) ++ tp.g.toSeq).exists {
        case V(n) => !sols.vars(n) && isTemplateBnode(n)
        case _ => false
      })
    val src =
      if (mintsBnodes)
        sols.df.withColumn("__sol", monotonically_increasing_id())
          .localCheckpoint()
      else sols.df
    val rowKey: Column = hex(col("__sol"))
    def pos(p: Pat): Column = p match {
      case C(t) => t
      case V(n) if sols.vars(n) => col(n)
      case V(n) if isTemplateBnode(n) =>
        Term.bnode(concat(lit(s"t${opId}_${n}_"), rowKey))
      case V(_) => Term.unbound
    }
    tmpl.map { tp =>
      src.select(pos(tp.s).as("s"), pos(tp.p).as("p"), pos(tp.o).as("o"),
                 tp.g.map(pos).getOrElse(Term.unbound).as("c"))
        .filter(col("s").isNotNull && col("p").isNotNull && col("o").isNotNull)
    }.reduce(_ unionByName _).distinct()
  }

  /** Parse a template block into triple patterns (vars allowed). */
  private def templateOf(spark: SparkSession, prefixes: String,
                         tmpl: String, base: String = "",
                         forbidBnodes: Boolean = false): Seq[TriplePattern] = {
    if (forbidBnodes) require(!hasBareBnode(tmpl),
      "blank node in DELETE template (19.6)")
    flat(Parser.parse(spark, s"$prefixes SELECT * WHERE { $tmpl }", base).node)
  }

  private def flat(n: Node): Seq[TriplePattern] = n match {
    case Bgp(tps, _) => tps
    case Join(l, r) => flat(l) ++ flat(r)
    case GraphNode(g, ch) =>
      // QuadData/QuadPattern admit no nested GRAPH (syntax-update-bad-05)
      def nested(x: Node): Boolean = x match {
        case _: GraphNode => true
        case Join(a, b) => nested(a) || nested(b)
        case _ => false
      }
      require(!nested(ch), "nested GRAPH block in quad data")
      flat(ch).map(tp =>
        if (tp.g.isEmpty) tp.copy(g = Some(g)) else tp)
    // an empty group ({} or GRAPH <g> {}) parses to the empty solution —
    // zero quads, which is legal DATA (syntax-update-27/28)
    case Values(df, _) if df.columns.isEmpty => Nil
    case other => throw new IllegalArgumentException(s"bad template node: $other")
  }
}
