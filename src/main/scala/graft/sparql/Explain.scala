package graft.sparql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Query EXPLAIN surface — the ASTContainer's diagnostic dump
  * (/root/reference/bigdata-rdf/src/java/com/bigdata/rdf/sparql/ast/
  * ASTContainer.java:45 carries original/optimized AST + BOp plan; REST
  * exposes it via ?explain). Here: the parsed algebra, the variable-scope
  * analysis, and Catalyst's formatted physical plan.
  */
object Explain {

  final case class Explanation(algebra: String, certainVars: Set[String],
                               maybeVars: Set[String], physicalPlan: String,
                               hints: Map[String, String] = Map.empty,
                               existsMarkers: Int = 0,
                               rto: Option[Translator.RtoDecision] = None) {
    def render: String = {
      val hintSection =
        if (hints.isEmpty) ""
        else hints.toSeq.sorted
          .map { case (k, v) => s"$k = $v" }
          .mkString("== query hints ==\n", "\n", "\n")
      val rtoSection = rto.map { d =>
        val lines = d.order.zip(d.prefixCards).zipWithIndex.map {
          case ((pat, card), i) =>
            val kind = if (i < d.searched) "prefix card" else "pattern card"
            f"  ${i + 1}. $pat  ($kind ~ $card sampled)"
        }
        s"== runtime optimizer (sampled join-order search) ==\n" +
          s"searched exhaustively over ${d.searched} patterns\n" +
          lines.mkString("\n") + "\n"
      }.getOrElse("")
      val markerLine =
        if (existsMarkers == 0) ""
        else s"exists markers: $existsMarkers " +
          s"(one hash left_outer join each, linear in markers)\n"
      s"""== SPARQL algebra ==
         |$algebra
         |$hintSection$rtoSection== variable scope ==
         |certain: ${certainVars.toSeq.sorted.mkString(", ")}
         |maybe:   ${maybeVars.toSeq.sorted.mkString(", ")}
         |$markerLine== physical plan (Catalyst) ==
         |$physicalPlan""".stripMargin
    }
  }

  def explain(spark: SparkSession, quads: DataFrame, queryText: String): Explanation = {
    val q = Parser.parse(spark, queryText)
    val runtime = q.hints.get("optimizer").contains("Runtime")
    val res =
      if (runtime) Translator.translateSampled(quads, q.node)
      else Translator.translate(quads, q.node)
    Explanation(
      algebra = pretty(q.node, 0),
      certainVars = res.certain,
      maybeVars = res.maybe,
      physicalPlan = res.df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")),
      hints = q.hints,
      existsMarkers = countMarkers(q.node),
      // the translate above ran on this thread, so this is THIS query's
      // decision (last BGP wins for multi-BGP queries)
      rto = if (runtime) Translator.lastRtoDecision else None)
  }

  /** Total EXISTS marker binds in the tree — each costs exactly one
    * left_outer marker join (Translator.bindMarkers), so this IS the
    * engine-level join count plan guards assert on.
    */
  def countMarkers(n: Algebra.Node): Int = {
    import Algebra._
    n match {
      case FilterExists(_, binds, c) =>
        binds.size + binds.map(b => countMarkers(b._2)).sum + countMarkers(c)
      case ExtendExists(_, _, binds, c) =>
        binds.size + binds.map(b => countMarkers(b._2)).sum + countMarkers(c)
      case LeftJoin(l, r, _, ex) =>
        ex.size + ex.map(b => countMarkers(b._2)).sum +
          countMarkers(l) + countMarkers(r)
      case Filter(_, c) => countMarkers(c)
      case Join(l, r) => countMarkers(l) + countMarkers(r)
      case Union(l, r) => countMarkers(l) + countMarkers(r)
      case Minus(l, r) => countMarkers(l) + countMarkers(r)
      case ExistsFilter(c, s, _) => countMarkers(c) + countMarkers(s)
      case Extend(_, _, c) => countMarkers(c)
      case Project(_, c) => countMarkers(c)
      case Distinct(c) => countMarkers(c)
      case OrderBy(_, c) => countMarkers(c)
      case Slice(_, _, c) => countMarkers(c)
      case Group(_, _, c) => countMarkers(c)
      case GraphNode(_, c) => countMarkers(c)
      case _ => 0
    }
  }

  private def pretty(n: Algebra.Node, depth: Int): String = {
    import Algebra._
    val pad = "  " * depth
    n match {
      case Bgp(tps, fixed) =>
        s"${pad}BGP(${tps.size} patterns${if (fixed) ", fixedOrder" else ""})"
      case PathPattern(s, p, o, g) =>
        // mirrors Translator's plan choice: a top-level closure with a
        // constant endpoint evaluates seeded (frontier from the bound term)
        val closure = p match {
          case _: OneOrMore | _: ZeroOrMore => true
          case _ => false
        }
        val seeded = closure && !g.exists(_.isInstanceOf[V]) &&
          (s.isInstanceOf[C] || o.isInstanceOf[C])
        s"${pad}Path(${p.getClass.getSimpleName}" +
          s"${g.map(x => s", graph=$x").getOrElse("")}" +
          s"${if (seeded) ", seeded" else ""})"
      case Filter(_, c) => s"${pad}Filter\n${pretty(c, depth + 1)}"
      case Join(l, r) => s"${pad}Join\n${pretty(l, depth + 1)}\n${pretty(r, depth + 1)}"
      case LeftJoin(l, r, cond, ex) =>
        val ann = (if (cond.isDefined) Seq("cond") else Nil) ++
                  (if (ex.nonEmpty)
                     Seq(s"markers=${ex.size}: ${ex.map("?" + _._1).mkString(",")}")
                   else Nil)
        s"${pad}LeftJoin${if (ann.nonEmpty) ann.mkString("(", ", ", ")") else ""}\n${pretty(l, depth + 1)}\n${pretty(r, depth + 1)}"
      case Union(l, r) => s"${pad}Union\n${pretty(l, depth + 1)}\n${pretty(r, depth + 1)}"
      case Minus(l, r) => s"${pad}Minus\n${pretty(l, depth + 1)}\n${pretty(r, depth + 1)}"
      case ExistsFilter(c, s, neg) =>
        s"${pad}${if (neg) "NotExists" else "Exists"}\n${pretty(c, depth + 1)}\n${pretty(s, depth + 1)}"
      case FilterExists(_, binds, c) =>
        (s"${pad}FilterExists(markers=${binds.size}: ${binds.map("?" + _._1).mkString(", ")})" +:
         (binds.map(b => pretty(b._2, depth + 1)) :+ pretty(c, depth + 1)))
          .mkString("\n")
      case ExtendExists(v, _, binds, c) =>
        (s"${pad}ExtendExists(?$v; markers=${binds.size}: ${binds.map("?" + _._1).mkString(", ")})" +:
         (binds.map(b => pretty(b._2, depth + 1)) :+ pretty(c, depth + 1)))
          .mkString("\n")
      case Extend(v, _, c) => s"${pad}Extend(?$v)\n${pretty(c, depth + 1)}"
      case Project(vs, c) => s"${pad}Project(${vs.map("?" + _).mkString(", ")})\n${pretty(c, depth + 1)}"
      case Distinct(c) => s"${pad}Distinct\n${pretty(c, depth + 1)}"
      case OrderBy(ks, c) =>
        s"${pad}OrderBy(${ks.map { case (v, a) => s"?$v ${if (a) "ASC" else "DESC"}" }.mkString(", ")})\n${pretty(c, depth + 1)}"
      case Slice(o, l, c) => s"${pad}Slice(offset=$o, limit=$l)\n${pretty(c, depth + 1)}"
      case Group(ks, aggs, c) =>
        s"${pad}Group(keys=${ks.map("?" + _).mkString(",")}; aggs=${aggs.map("?" + _._1).mkString(",")})\n${pretty(c, depth + 1)}"
      case Values(_, _) => s"${pad}Values"
      case GraphNode(_, c) => s"${pad}Graph\n${pretty(c, depth + 1)}"
      case ServiceNode(iri, _, _, _) => s"${pad}Service<$iri>"
      case ServiceVarNode(v, _, _) => s"${pad}Service(?$v)"
      case SidPattern(_, _, _, v) => s"${pad}SidPattern(?$v)"
    }
  }
}
