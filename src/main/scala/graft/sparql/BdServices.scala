package graft.sparql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.rdf.Term
import Algebra._
import Translator.Result

/** Registry-parity shims for the reference's remaining built-in services
  * (ServiceRegistry.java:86-93) — thin wrappers over first-class operators:
  *
  *   SERVICE bd:sample {               # SampleServiceFactory.java:74-84
  *     ?s rdf:type ex:Foo .            #   exactly one triple pattern
  *     bd:serviceParam bd:sample.limit 200 .          # default 100
  *     bd:serviceParam bd:sample.seed 0 .             # default 0
  *     bd:serviceParam bd:sample.sampleType "RANDOM" .# RANDOM|EVEN|DENSE
  *   }
  *
  *   SERVICE bd:slice {                # SliceServiceFactory.java:83-100
  *     ?s rdf:type ex:Foo .
  *     bd:serviceParam bd:slice.offset 0 .
  *     bd:serviceParam bd:slice.limit 2000 .
  *     # or instead of offset/limit: bind the access path's range count
  *     bd:serviceParam bd:slice.range ?range .
  *   }
  *
  *   SERVICE bd:values {               # ValuesServiceFactory.java:73-83
  *     bd:serviceParam bd:values.var ?var .
  *     bd:serviceParam bd:values.val "val1" .
  *     bd:serviceParam bd:values.val "val2" .
  *   }
  *
  * The reference runs these against its B+Tree access paths
  * (SampleIndex / DistinctMultiTermAdvancer); here the pattern evaluates
  * through the same single-pattern translation every BGP uses
  * (Translator.translateTp — partition-pruned scan), and the sample/slice
  * disciplines are deterministic: RANDOM is seeded-md5 order (replayable,
  * partitioning-independent — no rand()), EVEN takes every k-th row and
  * DENSE the first rows in the engine's total term order, the analogue of
  * the reference's B+Tree key order. Sampling is a TakeOrdered over the
  * pattern's bindings — driver-safe at any store size because `limit`
  * bounds it.
  */
object BdServices {

  /** Split a service group into (serviceParam map, access-path patterns). */
  private def splitParams(ns: String, config: Seq[TriplePattern])
      : (Map[String, Seq[Pat]], Seq[TriplePattern]) = {
    val isParam: Pat => Boolean = {
      case C(t) => Services.constLex(t) == BdParam
      case _ => false
    }
    val (params, patterns) = config.partition(tp => isParam(tp.s))
    val m = params.map {
      case TriplePattern(_, C(pc), o, _) =>
        val p = Services.constLex(pc)
        require(p.startsWith(ns + "."),
          s"unknown service param <$p> (expected <$ns.*>)")
        p.substring(ns.length + 1) -> o
      case other => throw new IllegalArgumentException(
        s"service params must use constant predicates: $other")
    }.groupMap(_._1)(_._2)
    (m, patterns)
  }

  private def one(m: Map[String, Seq[Pat]], k: String): Option[Pat] =
    m.get(k).map { vs =>
      require(vs.size == 1, s"service param $k given ${vs.size} times")
      vs.head
    }

  private def constOf(p: Pat, what: String): String = p match {
    case C(t) => Services.constLex(t)
    case _ => throw new IllegalArgumentException(s"$what must be a constant")
  }

  private def longParam(m: Map[String, Seq[Pat]], k: String,
                        dflt: Long): Long =
    one(m, k).map(p => constOf(p, k).toLong).getOrElse(dflt)

  /** Deterministic per-row position: seeded md5 over the solution's term
    * lexes (the engine's shared no-rand() sampling discipline).
    */
  private def rowHash(seed: Long, vars: Seq[String]) =
    graft.pipeline.TextPrep.hash64(concat(
      (lit(s"$seed") +: vars.flatMap(v =>
        Seq(lit(" "), coalesce(Term.lex(col(v)), lit(""))))): _*))

  private val BdNs = "http://www.bigdata.com/rdf#"
  private val BdParam = BdNs + "serviceParam"
  val SampleIri: String = BdNs + "sample"
  val SliceIri: String = BdNs + "slice"
  val ValuesIri: String = BdNs + "values"

  /** bd:sample — a bounded sample of one access path's solutions. */
  def sample(quads: DataFrame, config: Seq[TriplePattern]): Result = {
    val (params, patterns) = splitParams(SampleIri, config)
    require(patterns.size == 1,
      s"bd:sample needs exactly one triple pattern, got ${patterns.size}")
    val limit = longParam(params, "limit", 100L).toInt
    val seed = longParam(params, "seed", 0L)
    val sampleType = one(params, "sampleType")
      .map(p => constOf(p, "sampleType")).getOrElse("RANDOM")
    val base = Translator.translateTp(quads, patterns.head)
    val vars = base.certain.toSeq.sorted
    val out = sampleType.toUpperCase match {
      case "RANDOM" =>
        base.df.orderBy(rowHash(seed, vars)).limit(limit)
      case "DENSE" =>
        // first rows in total term order (the B+Tree key-order analogue)
        base.df.orderBy(vars.flatMap(v => TermOps.sortKeys(col(v))): _*)
          .limit(limit)
      case "EVEN" =>
        // every k-th row of the ordered path, k = ceil(n / limit). A
        // global row_number() window would move the whole access path to
        // ONE reducer; orderBy is a range-partitioned sort and
        // zipWithIndex numbers it distributedly (one extra count job for
        // the partition offsets) — the one RDD hop in this file, because
        // Spark has no partition-parallel global-rank SQL operator.
        val n = base.df.count()
        val k = math.max(1L, (n + limit - 1) / limit)
        val sorted = base.df
          .orderBy(vars.flatMap(v => TermOps.sortKeys(col(v))): _*)
        val every = sorted.rdd.zipWithIndex()
          .filter(_._2 % k == 0).map(_._1)
        quads.sparkSession.createDataFrame(every, sorted.schema).limit(limit)
      case other =>
        throw new IllegalArgumentException(s"unknown sampleType $other")
    }
    Result(out, base.certain, Set.empty)
  }

  /** bd:slice — offset/limit page of one access path in the engine's total
    * term order, or (with `range`) its cardinality bound to a variable.
    */
  def slice(quads: DataFrame, config: Seq[TriplePattern]): Result = {
    val (params, patterns) = splitParams(SliceIri, config)
    require(patterns.size == 1,
      s"bd:slice needs exactly one triple pattern, got ${patterns.size}")
    val base = Translator.translateTp(quads, patterns.head)
    one(params, "range") match {
      case Some(V(rv)) =>
        // range-count mode (the ESTCARD-style fast path): one solution
        // binding the access path's cardinality
        val out = base.df.agg(count(lit(1)).as("__n"))
          .select(Term.num(col("__n").cast(Term.numType), Term.XsdInteger)
            .as(rv))
        Result(out, Set(rv), Set.empty)
      case Some(_) =>
        throw new IllegalArgumentException("bd:slice.range must be a variable")
      case None =>
        val offset = longParam(params, "offset", 0L).toInt
        val limit = longParam(params, "limit", 2000L).toInt
        val vars = base.certain.toSeq.sorted
        val out = base.df
          .orderBy(vars.flatMap(v => TermOps.sortKeys(col(v))): _*)
          .offset(offset).limit(limit)
        Result(out, base.certain, Set.empty)
    }
  }

  /** bd:values — an inline one-variable VALUES relation. */
  def values(quads: DataFrame, config: Seq[TriplePattern]): Result = {
    val (params, patterns) = splitParams(ValuesIri, config)
    require(patterns.isEmpty, "bd:values takes only service params")
    val varName = one(params, "var") match {
      case Some(V(n)) => n
      case _ => throw new IllegalArgumentException(
        "bd:values needs `bd:serviceParam bd:values.var ?var`")
    }
    val vals = params.getOrElse("val", Nil).collect { case C(t) => t }
    require(vals.nonEmpty, "bd:values needs at least one bd:values.val")
    val spark = quads.sparkSession
    val out = vals.map(c => spark.range(1).select(c.as(varName)))
      .reduce(_ unionByName _)
    Result(out, Set(varName), Set.empty)
  }
}
