package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Ev

/** Structured Streaming semantics via MemoryStream micro-batches. */
class StreamingSpec extends SparkSpecBase {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  private def parse(nt: Seq[String]) = {
    import org.apache.spark.sql.Encoders
    graft.rdf.NTriples.parseLines(spark,
      spark.createDataset(nt)(Encoders.STRING).toDF("value"))
  }

  test("watermarked windowed counts aggregate per 10-minute window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.windowedTypeCounts(input.toDF())
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData(
        Ev(1, ts(1), 7, "click", 1.0), Ev(2, ts(4), 7, "click", 2.0),
        Ev(3, ts(11), 8, "view", 5.0), Ev(4, ts(12), 7, "click", 3.0))
      q.processAllAvailable()
      val rows = spark.table("win_counts").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(rows == Set(
        ("2026-01-01 10:00:00.0", "click", 2L, 3.0),
        ("2026-01-01 10:10:00.0", "click", 1L, 3.0),
        ("2026-01-01 10:10:00.0", "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("stream-static enrichment join against a dimension table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val users = Seq((7L, "gold"), (8L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[Ev]
    val enriched = input.toDF().join(users, "user_id")
    val q = enriched.writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Ev(1, ts(1), 7, "click", 1.0), Ev(2, ts(2), 9, "view", 2.0))
      q.processAllAvailable()
      val rows = spark.table("enriched").collect()
      assert(rows.length == 1) // user 9 has no dimension row (inner join)
      assert(rows(0).getAs[String]("tier") == "gold")
    } finally q.stop()
  }

  test("sessionization closes a session after the gap, keeps the open one") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.sessionize(input.toDS(), gapMinutes = 5)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 7: events at :01 and :03 (one session), then :30 (new session)
      input.addData(
        Ev(1, ts(1), 7, "click", 1.0), Ev(2, ts(3), 7, "click", 2.0),
        Ev(3, ts(30), 7, "view", 4.0))
      q.processAllAvailable()
      val sessions = spark.table("sessions").as[EventStreams.Session].collect()
      // the :01-:03 session is closed by the :30 event (gap > 5 min)
      assert(sessions.length == 1)
      assert(sessions(0).n_events == 2 && sessions(0).total_value == 3.0)
      assert(sessions(0).started == ts(1) && sessions(0).ended == ts(3))
    } finally q.stop()
  }

  test("streaming RDF ingest: per-batch incremental closure + versioned commits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.rdf.{QuadStore, Term}
    import graft.rules.RDFS
    import org.apache.spark.sql.functions.col
    val EX = "http://ex/"
    val root = java.nio.file.Files.createTempDirectory("rdf-ingest").toString
    val input = MemoryStream[String]
    val q = graft.streaming.RdfIngest.startIngest(input.toDF(), root)
    try {
      // batch 1: schema + one typed individual
      input.addData(
        s"<${EX}Dog> <${RDFS.SubClassOf}> <${EX}Animal> .",
        s"<${EX}rex> <${RDFS.RdfType}> <${EX}Dog> .")
      q.processAllAvailable()
      val v1 = QuadStore.currentVersion(root)
      val s1 = QuadStore.open(spark, root)
      // closure inferred (rex type Animal)
      assert(!s1.filter(col("s.lex") === (EX + "rex") &&
                        col("o.lex") === (EX + "Animal")).isEmpty)

      // batch 2: a second individual — only the delta's consequences derive
      input.addData(s"<${EX}lassie> <${RDFS.RdfType}> <${EX}Dog> .")
      q.processAllAvailable()
      val v2 = QuadStore.currentVersion(root)
      assert(v2 == v1 + 1)
      val s2 = QuadStore.open(spark, root)
      assert(!s2.filter(col("s.lex") === (EX + "lassie") &&
                        col("o.lex") === (EX + "Animal")).isEmpty)
      // time travel: the v1 snapshot is still readable and lassie-free
      val old = QuadStore.open(spark, root, v1)
      assert(old.filter(col("s.lex") === (EX + "lassie")).isEmpty)
      // full-recompute equivalence for the final state
      val all = parse(Seq(
        s"<${EX}Dog> <${RDFS.SubClassOf}> <${EX}Animal> .",
        s"<${EX}rex> <${RDFS.RdfType}> <${EX}Dog> .",
        s"<${EX}lassie> <${RDFS.RdfType}> <${EX}Dog> ."))
      val full = RDFS.closure(all).select("s", "p", "o")
      val got = s2.drop("p_bucket").select("s", "p", "o")
      assert(got.except(full).isEmpty && full.except(got).isEmpty)

      // compaction: retain only the newest snapshot; the current version
      // stays readable, the old one is gone, the pointer is untouched
      val dropped = QuadStore.compact(root, keepLast = 1)
      assert(dropped == Seq(v1), s"expected to drop v$v1, dropped $dropped")
      assert(QuadStore.versions(root) == Seq(v2))
      assert(QuadStore.currentVersion(root) == v2)
      assert(!QuadStore.open(spark, root).isEmpty)
      intercept[Exception](QuadStore.open(spark, root, v1).collect())
    } finally q.stop()
  }

  test("change listeners observe per-commit assert/retract deltas (IChangeLog)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.rdf.QuadStore
    import org.apache.spark.sql.functions.col
    val EX = "http://ex/"
    val root = java.nio.file.Files.createTempDirectory("changelog").toString
    // capture each event as (version, asserted subjects, retracted subjects)
    var events = Vector.empty[(Long, Set[String], Set[String])]
    var lastFrames: Option[(org.apache.spark.sql.DataFrame,
                            org.apache.spark.sql.DataFrame)] = None
    val listener = new QuadStore.ChangeListener {
      def changeEvent(r: String, version: Long,
                      asserted: org.apache.spark.sql.DataFrame,
                      retracted: org.apache.spark.sql.DataFrame): Unit = {
        lastFrames = Some((asserted, retracted))
        events :+= ((version,
          asserted.select(col("s.lex")).collect().map(_.getString(0)).toSet,
          retracted.select(col("s.lex")).collect().map(_.getString(0)).toSet))
      }
    }
    QuadStore.addChangeListener(root, listener)
    try {
      // first commit: everything asserts, nothing retracts
      val v0 = QuadStore.commit(parse(Seq(
        s"<${EX}a> <${EX}p> <${EX}x> .",
        s"<${EX}b> <${EX}p> <${EX}x> .")), root)
      assert(events == Vector((v0, Set(EX + "a", EX + "b"), Set.empty[String])))
      // second commit: drop b, add c — the delta, not the snapshot
      val v1 = QuadStore.commit(parse(Seq(
        s"<${EX}a> <${EX}p> <${EX}x> .",
        s"<${EX}c> <${EX}p> <${EX}x> .")), root)
      assert(events(1) == ((v1, Set(EX + "c"), Set(EX + "b"))))
      // a streaming-ingest batch commits through the same hook: the event
      // carries the batch's triples plus their inferred consequences
      graft.streaming.RdfIngest.ingestBatch(spark,
        Seq(s"<${EX}rex> <${graft.rules.RDFS.RdfType}> <${EX}Dog> .")
          .toDF("value"), root)
      assert(events.size == 3 && events(2)._2.contains(EX + "rex") &&
             events(2)._3.isEmpty)
      // the ingest path KNOWS its delta (the incremental closure derived
      // it), so the listener frames must be O(delta) materialized
      // checkpoints — never a re-diff of two full store snapshots (no
      // parquet version-dir scan anywhere in their plans)
      val (a3, r3) = lastFrames.get
      Seq(a3, r3).foreach { f =>
        val plan = f.queryExecution.analyzed.toString
        assert(!plan.toLowerCase.contains("parquet"),
          s"ingest listener delta re-scans a store snapshot:\n$plan")
      }
    } finally QuadStore.removeChangeListener(root, listener)
    // removed listeners observe nothing
    QuadStore.commit(parse(Seq(s"<${EX}d> <${EX}p> <${EX}x> .")), root)
    assert(events.size == 3)
  }

  test("a throwing change listener neither fails the commit nor starves the rest") {
    import graft.rdf.QuadStore
    val EX = "http://ex/"
    val root = java.nio.file.Files.createTempDirectory("changelog2").toString
    var laterSaw = Vector.empty[Long]
    val thrower = new QuadStore.ChangeListener {
      def changeEvent(r: String, version: Long,
                      asserted: org.apache.spark.sql.DataFrame,
                      retracted: org.apache.spark.sql.DataFrame): Unit =
        throw new RuntimeException("listener boom")
    }
    val later = new QuadStore.ChangeListener {
      def changeEvent(r: String, version: Long,
                      asserted: org.apache.spark.sql.DataFrame,
                      retracted: org.apache.spark.sql.DataFrame): Unit =
        laterSaw :+= version
    }
    QuadStore.addChangeListener(root, thrower)
    QuadStore.addChangeListener(root, later)
    try {
      // the commit is durable before listeners run: a throwing listener
      // must not surface a failure for it (the caller would retry a
      // commit that succeeded) and must not skip listeners after it
      val v = QuadStore.commit(parse(Seq(s"<${EX}a> <${EX}p> <${EX}x> .")), root)
      assert(QuadStore.currentVersion(root) == v)
      assert(laterSaw == Vector(v))
    } finally {
      QuadStore.removeChangeListener(root, thrower)
      QuadStore.removeChangeListener(root, later)
    }
  }

  test("streaming near-dup candidates: shared minhash band pairs across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.{Doc, NearDupCandidate}
    val input = MemoryStream[Doc]
    val q = graft.streaming.EventStreams.streamingNearDupCandidates(input.toDS())
      .writeStream.format("memory").queryName("neardup")
      .outputMode(OutputMode.Append()).start()
    val near1 = "the quick brown fox jumps over the lazy dog again and again today"
    val near2 = "the quick brown fox jumps over the lazy dog again and again tonight"
    val far = "completely different content about distributed query engines at scale"
    try {
      input.addData(Doc(1, "a", near1), Doc(9, "b", far))
      q.processAllAvailable()
      // batch 2: a near-duplicate of doc 1 arrives later
      input.addData(Doc(5, "c", near2))
      q.processAllAvailable()
      val cands = spark.table("neardup").as[NearDupCandidate].collect().toSet
      assert(cands.contains(NearDupCandidate(5, 1)),
             s"near-dup pair not emitted: $cands")
      assert(!cands.exists(c => c.doc_id == 9 || c.rep_id == 9),
             s"unrelated doc paired: $cands")
    } finally q.stop()
  }

  test("streaming exact dedup passes first doc per content key, drops later dups") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.Doc
    val input = MemoryStream[Doc]
    val q = EventStreams.streamingExactDedup(input.toDS())
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: k1 twice (lowest id wins), k2 once
      input.addData(Doc(5, "k1", "a"), Doc(2, "k1", "a"), Doc(3, "k2", "b"))
      q.processAllAvailable()
      // batch 2: k1 again (dropped — state remembers), k3 new (passes)
      input.addData(Doc(9, "k1", "a"), Doc(7, "k3", "c"))
      q.processAllAvailable()
      val out = spark.table("deduped").as[Doc].collect().map(d => (d.doc_id, d.content_key)).toSet
      assert(out == Set((2L, "k1"), (3L, "k2"), (7L, "k3")))
    } finally q.stop()
  }

  test("streaming bloom dedup drops cross-batch duplicates with fixed bitset state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.Doc
    // the JVM hash64 replica is bit-identical to the column expression —
    // the property that makes the streaming probes the batch operator's
    val keys = Seq("k1", "0:k1", "weird key é中", "")
    val colSide = keys.toDF("s")
      .select(graft.pipeline.TextPrep.hash64(org.apache.spark.sql.functions.col("s")))
      .collect().map(_.getLong(0)).toSeq
    assert(colSide == keys.map(EventStreams.hash64),
           "JVM hash64 replica diverges from the column expression")
    val input = MemoryStream[Doc]
    val q = EventStreams.streamingBloomDedup(input.toDS(), mBits = 1024, k = 3)
      .writeStream.format("memory").queryName("bloomed")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: k1 twice (lowest id wins), k2 once
      input.addData(Doc(5, "k1", "a"), Doc(2, "k1", "a"), Doc(3, "k2", "b"))
      q.processAllAvailable()
      // batch 2: k1 again (bitset remembers across batches), k3 new
      input.addData(Doc(9, "k1", "a"), Doc(7, "k3", "c"))
      q.processAllAvailable()
      val out = spark.table("bloomed").as[Doc].collect()
        .map(d => (d.doc_id, d.content_key)).toSet
      assert(out == Set((2L, "k1"), (3L, "k2"), (7L, "k3")),
             s"bloom dedup kept: $out")
    } finally q.stop()
  }

  test("streaming count-min sketch matches the batch cells bit-for-bit across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.Doc
    val d1 = Seq(Doc(1, "k1", "the quick brown fox jumps over the lazy dog"),
                 Doc(2, "k2", "the quick brown fox again and again"))
    val d2 = Seq(Doc(3, "k3", "entirely different tokens flow in the second batch"))
    val input = MemoryStream[Doc]
    val q = EventStreams.streamingCmsCells(input.toDS(), depth = 4, width = 32)
      .writeStream.format("memory").queryName("cms_cells")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData(d1: _*); q.processAllAvailable()
      input.addData(d2: _*); q.processAllAvailable()
      val streamed = spark.table("cms_cells").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      val batch = graft.pipeline.TextAnalysis
        .cmsCells((d1 ++ d2).toDF("doc_id", "content_key", "text"), 4, 32)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch,
             "streaming CMS cells diverge from the batch sketch")
      // fixed state: never more than depth*width rows whatever the stream
      assert(streamed.size <= 4 * 32)
    } finally q.stop()
  }

  test("streaming quantile cells match the batch sketch cells across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.GroupVal
    val b1 = Seq(GroupVal("a", 10L), GroupVal("a", 100L), GroupVal("b", 900L))
    val b2 = Seq(GroupVal("a", 300L), GroupVal("b", 5000L) /* clamps to top bin */,
                 GroupVal("b", -7L) /* clamps to bin 0 */)
    val input = MemoryStream[GroupVal]
    val q = EventStreams.streamingQuantileCells(input.toDS(), bins = 32,
                                                lo = 0L, hi = 1023L)
      .writeStream.format("memory").queryName("q_cells")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("q_cells").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val batch = graft.pipeline.TextAnalysis.quantileCellsFrom(
          (b1 ++ b2).toDF("grp", "x"), bins = 32, lo = 0L, hi = 1023L)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch,
             s"streaming quantile cells diverge: $streamed vs $batch")
      // out-of-range values clamp into the edge bins, state stays bounded
      assert(streamed.exists { case (g, b, _) => g == "b" && b == 31L })
      assert(streamed.exists { case (g, b, _) => g == "b" && b == 0L })
      assert(streamed.size <= 2 * 32)
    } finally q.stop()
  }

  test("streaming group centroids accumulate to the batch exact mean " +
       "across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.LabeledVec
    // negative components with exact .5 quantization fractions included:
    // -3.5/2^20 scales to -3.5, where math.round would give -3 but the
    // batch operator's HALF_UP gives -4
    val b1 = Seq(
      LabeledVec(1L, 0L, Seq(1.0f, -3.5f / 1048576.0f)),
      LabeledVec(2L, 0L, Seq(0.5f, 1.0f)),
      LabeledVec(3L, 1L, Seq(-1.0f, 2.0f)))
    val b2 = Seq(
      LabeledVec(4L, 0L, Seq(0.25f, 0.75f)),
      LabeledVec(5L, 2L, Seq(4.0f, -4.0f)))
    val input = MemoryStream[LabeledVec]
    val q = EventStreams.streamingGroupCentroids(input.toDS())
      .writeStream.format("memory").queryName("centroids")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      // latest emission per group = the one with the largest count
      val streamed = spark.table("centroids").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2)))
        .groupBy(_._1).map(_._2.maxBy(_._2)).toSet
      val batch = graft.pipeline.Similarity.groupCentroids(
          (b1 ++ b2).map(v => (v.vec_id, v.label, v.embedding))
            .toDF("vec_id", "label", "embedding"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2))).toSet
      assert(streamed == batch,
             s"streaming centroids diverge from batch: $streamed vs $batch")
      // group 0 spans both batches — its final count proves accumulation
      assert(streamed.exists { case (g, n, _) => g == 0L && n == 3L })
    } finally q.stop()
  }

  test("streaming ccnet admission equals the batch threshold filter " +
       "bit-for-bit across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.GroupDoc
    import graft.pipeline.LanguageModel
    import org.apache.spark.sql.functions._
    val dd = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val ref = dd.filter(col("doc_id") % 10 === 0)
    // batch-trained load-time artifacts: model relations + the tertile
    // report's head+middle cutoffs
    val big = LanguageModel.bigramCounts(ref).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val uni = LanguageModel.unigramCounts(ref).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val thr = LanguageModel.pplBuckets(dd, ref).filter(col("bucket") <= 2)
      .groupBy("lang").agg(max(col("max_ce")).as("t")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // the batch THRESHOLD filter (the semantics the stream deploys) over
    // the batch plan's rounded scores
    val ceMap = LanguageModel.crossEntropy(dd, ref).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val expect = dd.select("doc_id", "lang").collect().filter { r =>
      ceMap.get(r.getLong(0)).exists(c =>
        thr.get(r.getString(1)).exists(c <= _))
    }.map(_.getLong(0)).toSet
    assert(expect.nonEmpty && expect.size < ceMap.size,
           "fixture thresholds do not split the corpus")
    val docs = dd.collect()
      .map(r => GroupDoc(r.getLong(0), r.getString(1), r.getString(2)))
    val input = MemoryStream[GroupDoc]
    val q = EventStreams.streamingCcnetAdmit(
        input.toDS(), big, uni, vocab = uni.size.toLong, keepCeMax = thr)
      .writeStream.format("memory").queryName("ccnet_admit")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = docs.splitAt(docs.length / 2)
      input.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      input.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
      val got = spark.table("ccnet_admit").as[GroupDoc].collect()
        .map(_.doc_id).toSet
      // the JVM scoring replica must reproduce the batch plan's rounded
      // cross-entropy EXACTLY — one ulp of drift at a threshold boundary
      // and an admission flips
      assert(got == expect,
             s"streaming admission diverges: extra=${got -- expect} " +
             s"missing=${expect -- got}")
    } finally q.stop()
  }

  test("streaming decontamination via foreachBatch against a static benchmark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the per-doc contaminated set derives from the corpus side, so a direct
    // streaming plan would need a stream-stream anti-join (unsupported);
    // the scale-correct shape is foreachBatch — each micro-batch is a static
    // frame, so the batch operator (broadcast bench set, left-anti) applies
    // unchanged and no state store is involved
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val kept = scala.collection.mutable.Set.empty[Long]
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        kept ++= graft.pipeline.Decontam.decontaminate(batch, bench, n = 5)
          .select("doc_id").collect().map(_.getLong(0))
        ()
      }
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, "alpha beta gamma delta epsilon leaked from the eval set"),
        (2L, "entirely fresh training text with no benchmark overlap here"))
      q.processAllAvailable()
      input.addData((3L, "zeta epsilon delta gamma beta reversed so no 5-gram matches"))
      q.processAllAvailable()
      assert(kept.toSet == Set(2L, 3L), s"streaming decontam kept: $kept")
    } finally q.stop()
  }

  test("streaming token-budget admission: per-group running sum across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.GroupDoc
    val input = MemoryStream[GroupDoc]
    val q = EventStreams.streamingTokenBudget(input.toDS(), budgetPerGroup = 5L)
      .writeStream.format("memory").queryName("budgeted")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1 in the batch operator's salted-hash order is [3, 1, 2]:
      // doc3(2 tokens, cum 2) admits, doc1(3, cum 5) admits, doc2(3, cum 8)
      // crosses the budget — prefix truncation, identical to
      // Sampling.tokenBudgetSample (asserted below)
      val batch1 = Seq(GroupDoc(1, "g1", "one two three"),
                       GroupDoc(2, "g1", "four five six"),
                       GroupDoc(3, "g1", "seven eight"))
      input.addData(batch1: _*)
      q.processAllAvailable()
      val afterB1 = spark.table("budgeted").as[GroupDoc].collect()
        .map(_.doc_id).toSet
      // single-micro-batch equivalence with the batch operator, exactly
      val batchOp = graft.pipeline.Sampling.tokenBudgetSample(
        batch1.toDF(), budgetPerGroup = 5L, groupCol = "group")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(afterB1 == batchOp,
             s"stream admitted $afterB1 but batch operator samples $batchOp")
      // batch 2: g1's running total (8, including the skipped doc2) already
      // crossed the budget, so doc4 is past the cutoff; fresh group g2 admits
      input.addData(GroupDoc(4, "g1", "x"), GroupDoc(5, "g2", "a b c"))
      q.processAllAvailable()
      val out = spark.table("budgeted").as[GroupDoc].collect()
        .map(d => d.doc_id).toSet
      assert(out == Set(1L, 3L, 5L), s"admitted: $out")
    } finally q.stop()
  }

  test("streaming domain mixture: single-batch admission equals the batch " +
       "operator, budgets carry across batches, non-whitelisted drops") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.GroupDoc
    val weights = Map("g1" -> 3.0, "g2" -> 1.0) // of 8 tokens: g1=6, g2=2
    val input = MemoryStream[GroupDoc]
    val stream = EventStreams.streamingDomainMixture(input.toDS(), weights,
                                                     totalTokens = 8L)
      .writeStream.format("memory").queryName("mixed")
      .outputMode(OutputMode.Append()).start()
    try {
      val batch1 = Seq(GroupDoc(1, "g1", "one two three"),
                       GroupDoc(2, "g1", "four five six"),
                       GroupDoc(3, "g1", "seven eight"),
                       GroupDoc(4, "g2", "a b c"),   // 3 > share 2: drops
                       GroupDoc(5, "g3", "x"))       // not in the mixture
      input.addData(batch1: _*)
      stream.processAllAvailable()
      val got = spark.table("mixed").as[GroupDoc].collect().map(_.doc_id).toSet
      val batchOp = graft.pipeline.Sampling.domainMixture(
        batch1.toDF(), weights, totalTokens = 8L, sourceCol = "group")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == batchOp, s"stream admitted $got, batch operator $batchOp")
      assert(!got.exists(Set(4L, 5L)), s"over-budget or non-whitelisted admitted: $got")
      // batch 2: g1's cumulative (8 incl. skipped) has crossed its share of
      // 6, so nothing more admits even though doc6 alone would fit
      input.addData(GroupDoc(6, "g1", "y"))
      stream.processAllAvailable()
      val after = spark.table("mixed").as[GroupDoc].collect().map(_.doc_id).toSet
      assert(after == got, s"late doc admitted past the share: $after")
    } finally stream.stop()
  }

  test("streaming unimax: single-batch admission equals the batch operator " +
       "under its trained allocations; budgets carry across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.GroupDoc
    val corpus = Seq(
      GroupDoc(1, "en", "one two three four"),
      GroupDoc(2, "en", "five six seven eight"),
      GroupDoc(3, "en", "nine ten"),
      GroupDoc(4, "de", "eins zwei"),
      GroupDoc(5, "fr", "un"))
    val docsDf = corpus.toDF().withColumnRenamed("group", "lang")
    // allocation trained batch-side on the corpus snapshot
    val alloc = graft.pipeline.Sampling
      .unimaxAllocations(docsDf, totalBudget = 7L, maxEpochs = 2)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val input = MemoryStream[GroupDoc]
    val stream = graft.streaming.EventStreams
      .streamingUnimax(input.toDS(), alloc)
      .writeStream.format("memory").queryName("unimaxed")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(corpus: _*)
      stream.processAllAvailable()
      val got = spark.table("unimaxed").as[GroupDoc].collect().map(_.doc_id).toSet
      val batchOp = graft.pipeline.Sampling
        .unimaxSample(docsDf, totalBudget = 7L, maxEpochs = 2)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == batchOp, s"stream admitted $got, batch operator $batchOp")
      // a later doc in a language whose cumulative crossed its allocation
      // stays out, even if it alone would fit
      input.addData(GroupDoc(6, "en", "x"))
      stream.processAllAvailable()
      val after = spark.table("unimaxed").as[GroupDoc].collect().map(_.doc_id).toSet
      assert(after == got, s"late doc admitted past the allocation: $after")
    } finally stream.stop()
  }

  test("streaming pack assignment: single-batch spans equal the batch " +
       "operator, offsets carry across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.{GroupDoc, PackedSpan}
    val input = MemoryStream[GroupDoc]
    val q = EventStreams.streamingPackAssign(input.toDS(), seqLen = 4L)
      .writeStream.format("memory").queryName("packed")
      .outputMode(OutputMode.Append()).start()
    try {
      val batch1 = Seq(GroupDoc(1, "g1", "one two three"),
                       GroupDoc(2, "g1", "four five six seven eight"),
                       GroupDoc(3, "g1", ""),
                       GroupDoc(4, "g2", "a b"))
      input.addData(batch1: _*)
      q.processAllAvailable()
      val spans = spark.table("packed").as[PackedSpan].collect()
        .map(s => s.doc_id -> (s.seq_first, s.seq_last)).toMap
      // single-micro-batch equivalence with Packing.packSequences, exactly
      val batchOp = graft.pipeline.Packing.packSequences(
          batch1.toDF(), seqLen = 4L, groupCol = "group")
        .groupBy("doc_id")
        .agg(org.apache.spark.sql.functions.min("seq_id").as("lo"),
             org.apache.spark.sql.functions.max("seq_id").as("hi"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(spans == batchOp, s"stream spans $spans != batch $batchOp")
      assert(!spans.contains(3L), "zero-token doc must occupy no span")
      // batch 2: g1 resumes at offset 8 (2 full sequences), g2 at 2
      input.addData(GroupDoc(5, "g1", "nine ten"), GroupDoc(6, "g2", "c d e"))
      q.processAllAvailable()
      val all = spark.table("packed").as[PackedSpan].collect()
        .map(s => s.doc_id -> s).toMap
      assert(all(5L).start_offset == 8L && all(5L).seq_first == 2L)
      assert(all(6L).start_offset == 2L && all(6L).seq_first == 0L &&
             all(6L).seq_last == 1L, s"g2 span: ${all(6L)}")
    } finally q.stop()
  }

  test("streaming PII redaction: stateless per-batch column pipeline") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = graft.pipeline.Redact.piiStats(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("pii")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, "reach me at jo@corp.example or +12025550147"),
                    (2L, "nothing sensitive"))
      q.processAllAvailable()
      val rows = spark.table("pii").orderBy("doc_id").collect()
      assert(rows(0).getAs[Long]("n_email") == 1L &&
             rows(0).getAs[Long]("n_phone") == 1L)
      assert(rows(1).getAs[Long]("n_pii") == 0L)
    } finally q.stop()
  }
}
