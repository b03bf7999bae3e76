package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming over the event schema.
  *
  * The reference has NO streaming model (SURVEY.md §1.5/§2.16) — its closest
  * artifacts are the change-log listeners
  * (/root/reference/bigdata-sails/src/java/com/bigdata/rdf/sail/changesets/)
  * and incremental truth maintenance. This module is the additive streaming
  * story: the same event relation consumed incrementally with watermarked
  * event-time windows and custom session state.
  *
  * Scale posture: both operators are classic keyed streaming aggregations —
  * state is partitioned by (window, type) / user key across executors, the
  * watermark bounds state size, and checkpointing makes them exactly-once on
  * a real sink.
  */
object EventStreams {

  final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                      event_type: String, value: Double)

  final case class Session(user_id: Long, n_events: Int, total_value: Double,
                           started: java.sql.Timestamp, ended: java.sql.Timestamp)

  /** Watermarked tumbling-window counts/sums per event type.
    * 10-minute windows, 20-minute allowed lateness.
    */
  def windowedTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "20 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("w.start").as("window_start"), col("event_type"),
              col("n"), col("total"))

  /** Gap-based sessionization via flatMapGroupsWithState: a session closes
    * after `gapMinutes` without events (processing-time timeout drives
    * emission between batches; end-of-stream flush is the caller's concern).
    */
  def sessionize(events: Dataset[Ev], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    events
      .withWatermark("ts", "20 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Ev], Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[Ev], state: GroupState[List[Ev]]) =>
          if (state.hasTimedOut) {
            val evs = state.get
            state.remove()
            Iterator(mkSession(user, evs))
          } else {
            val all = (state.getOption.getOrElse(Nil) ++ batch.toList).sortBy(_.ts.getTime)
            // split on gaps: emit all closed sessions, keep the open one
            val (closed, open) = splitSessions(all, gapMs)
            if (open.nonEmpty) {
              state.update(open)
              state.setTimeoutTimestamp(open.last.ts.getTime + gapMs)
            } else state.remove()
            closed.iterator.map(evs => mkSession(user, evs))
          }
      }
  }

  private def splitSessions(evs: List[Ev], gapMs: Long): (List[List[Ev]], List[Ev]) = {
    if (evs.isEmpty) return (Nil, Nil)
    val sessions = evs.tail.foldLeft(List(List(evs.head))) { (acc, e) =>
      val cur = acc.head
      if (e.ts.getTime - cur.last.ts.getTime > gapMs) List(e) :: acc
      else (cur :+ e) :: acc.tail
    }.reverse
    (sessions.init, sessions.last)
  }

  private def mkSession(user: Long, evs: List[Ev]): Session =
    Session(user, evs.size, evs.map(_.value).sum, evs.head.ts, evs.last.ts)

  /** File-source streaming ingest of the same parquet schema → windowed
    * aggregate → a sink; demonstrates the deploy shape (readStream over a
    * directory a loader appends to).
    */
  def fileStreamCounts(spark: SparkSession, dir: String): DataFrame =
    windowedTypeCounts(
      spark.readStream
        .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, " +
                "value DOUBLE, props STRING")
        .parquet(dir))

  final case class Doc(doc_id: Long, content_key: String, text: String)

  final case class NearDupCandidate(doc_id: Long, rep_id: Long)

  /** Streaming NEAR-dup candidates at ingestion: each document's MinHash
    * signature computes per row (`Dedup.minhashSignatureArray` — no
    * aggregation state), splits into LSH band keys, and a stateful
    * operator keyed by (band, band_key) remembers the first document of
    * each bucket. A later document sharing any band emits a candidate
    * edge (doc, bucket_representative) — downstream, exact verification +
    * clustering run exactly as in the batch `dedupClusters`. State is one
    * long per non-empty bucket, the streaming analogue of the sketch
    * index.
    */
  def streamingNearDupCandidates(docs: Dataset[Doc], n: Int = 3,
                                 numHashes: Int = 16,
                                 bands: Int = 4): Dataset[NearDupCandidate] = {
    import docs.sparkSession.implicits._
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes, "bands must divide numHashes")
    val sig = docs.toDF()
      .withColumn("sig", graft.pipeline.Dedup.minhashSignatureArray(
        org.apache.spark.sql.functions.col("text"), n, numHashes))
    val bandRows = (0 until bands).map { b =>
      sig.select(
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.concat_ws("|",
          (org.apache.spark.sql.functions.lit(b) +:
            (0 until rowsPerBand).map(j =>
              org.apache.spark.sql.functions.element_at(
                org.apache.spark.sql.functions.col("sig"),
                b * rowsPerBand + j + 1))): _*).as("bucket"))
    }.reduce(_ unionByName _)
    bandRows.as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, NearDupCandidate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, batch: Iterator[(Long, String)], state: GroupState[Long]) =>
          val ids = batch.map(_._1).toSeq.sorted
          state.getOption match {
            case Some(rep) =>
              ids.filter(_ != rep).map(NearDupCandidate(_, rep)).iterator
            case None =>
              val rep = ids.head
              state.update(rep)
              ids.tail.map(NearDupCandidate(_, rep)).iterator
          }
      }
  }

  /** Streaming exact dedup for the ingestion pipeline: the FIRST document
    * per content key passes through, later duplicates are dropped —
    * `mapGroupsWithState` keyed by content key holds one boolean per key
    * (the seen-set), so state is O(distinct keys) and partitioned across
    * executors. This is how the batch `Dedup.exactGroups` semantics carry
    * over to continuous ingestion at 100 TB: dedup before you ever land
    * the duplicate bytes.
    */
  def streamingExactDedup(docs: Dataset[Doc]): Dataset[Doc] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.content_key)
      .flatMapGroupsWithState[Boolean, Doc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, batch: Iterator[Doc], state: GroupState[Boolean]) =>
          if (state.getOption.contains(true)) Iterator.empty
          else {
            state.update(true)
            // within one batch, the lowest doc_id is the canonical survivor
            val first = batch.minBy(_.doc_id)
            Iterator(first)
          }
      }
  }

  /** JVM replica of [[graft.pipeline.TextPrep.hash64]]: first 15 hex digits
    * of md5, parsed base-16 — bit-identical to the column expression, so
    * driver-side state operators probe the same positions the batch plans
    * compute.
    */
  private[graft] def hash64(s: String): Long =
    graft.pipeline.TextPrep.hash64Jvm(s)

  /** Streaming Bloom dedup — the streaming face of
    * `Decontam.bloomFlag` with the IDENTICAL probe construction
    * (`hash64(i || ":" || key) % mBits`): drop documents whose content key
    * PROBABLY arrived before, with O(mBits) state per shard instead of
    * `streamingExactDedup`'s O(distinct keys) seen-set — the fixed-memory
    * dedup for unbounded ingestion where the key set itself would not fit.
    *
    * Sharding is by a hash of the content key, so equal keys always meet
    * the same bitset: NO false negatives versus exact streaming dedup (a
    * true duplicate is always dropped). The trade is the Bloom false
    * positive: a first-seen document whose k positions were all set by
    * other keys is wrongly dropped at the classical ~(1-e^(-kn/m))^k rate
    * per shard — size mBits per expected keys-per-shard accordingly.
    * Within a batch the lowest doc_id wins, as in `streamingExactDedup`.
    */
  def streamingBloomDedup(docs: Dataset[Doc], mBits: Int = 1024, k: Int = 3,
                          shards: Int = 32): Dataset[Doc] = {
    import docs.sparkSession.implicits._
    require(mBits > 0 && mBits % 64 == 0, "mBits must pack 64-bit words")
    docs
      .groupByKey(d => java.lang.Math.floorMod(hash64(d.content_key), shards.toLong))
      .flatMapGroupsWithState[Array[Long], Doc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, batch: Iterator[Doc], state: GroupState[Array[Long]]) =>
          val bits = state.getOption.getOrElse(new Array[Long](mBits / 64))
          val kept = batch.toVector.sortBy(_.doc_id).filter { d =>
            val ps = (0 until k).map(i =>
              (hash64(s"$i:" + d.content_key) % mBits).toInt)
            val dup = ps.forall(p => ((bits(p >> 6) >>> (p & 63)) & 1L) == 1L)
            ps.foreach(p => bits(p >> 6) |= 1L << (p & 63))
            !dup
          }
          state.update(bits)
          kept.iterator
      }
  }

  /** Streaming Count-Min sketch — the streaming face of
    * `TextAnalysis.cmsCells` with IDENTICAL cell values: the sketch is a
    * mergeable monoid (cells add), so Structured Streaming's stateful
    * aggregation IS the operator — the same depth×width grouped count over
    * the token stream, maintained incrementally per micro-batch. State is
    * bounded at depth×width rows REGARDLESS of stream length (contrast
    * `streamingExactDedup`'s O(distinct keys) seen-set) — the property that
    * makes the sketch the standard frequency monitor over unbounded
    * ingestion. Emit in Complete/Update mode; bit-parity with the batch
    * operator over the same docs (accumulated across micro-batches) is
    * pinned by StreamingSpec.
    */
  def streamingCmsCells(docs: Dataset[Doc],
                        depth: Int = 4, width: Int = 32): DataFrame =
    graft.pipeline.TextAnalysis.cmsCellsFrom(
      docs.toDF()
        .withColumn("ws", graft.pipeline.TextPrep.words(lower(col("text"))))
        .select(explode(col("ws")).as("token")),
      depth, width)

  /** A grouped numeric observation (document length, latency, size...). */
  final case class GroupVal(group: String, x: Long)

  /** Streaming fixed-bin quantile cells — the streaming face of
    * `TextAnalysis.quantileSketch`'s sketch side with IDENTICAL cell
    * values: bin counts are a mergeable monoid (counts add), so the
    * stateful grouped count IS the operator, maintained incrementally per
    * micro-batch with state bounded at groups×bins rows REGARDLESS of
    * stream length — the live percentile monitor over unbounded ingestion
    * (any percentile reads off the accumulated cells with the batch
    * estimator's cumulative pass). Emit in Complete/Update mode;
    * bit-parity with the batch cells over the same rows is pinned by
    * StreamingSpec.
    */
  def streamingQuantileCells(vals: Dataset[GroupVal], bins: Int,
                             lo: Long, hi: Long): DataFrame =
    graft.pipeline.TextAnalysis.quantileCellsFrom(
      vals.toDF().select(col("group").as("grp"), col("x")), bins, lo, hi)

  /** Token-budget admission at ingest — the streaming face of
    * Sampling.tokenBudgetSample with IDENTICAL cutoff semantics: docs order
    * by the batch operator's salted hash (hash64(key || ":budget"), key),
    * the running total accumulates EVERY doc seen (admitted or skipped),
    * and a doc admits iff the total through it stays within budget
    * (prefix truncation, not first-fit). A stream arriving as one
    * micro-batch therefore admits exactly the batch operator's sample
    * (pinned by StreamingSpec); across micro-batches the running total
    * carries over, so the result equals the batch operator applied to the
    * batches in arrival order — arrival interleaving is the one degree of
    * freedom inherent to streaming. State is ONE long per group.
    */
  final case class GroupDoc(doc_id: Long, group: String, text: String)

  /** Executor-side twin of TextPrep.hash64 over s"$id:budget" (md5, first
    * 15 hex digits as a long) — keeps stream and batch admission order
    * bit-identical.
    */
  private def budgetHash(id: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id:budget".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  def streamingTokenBudget(docs: Dataset[GroupDoc],
                           budgetPerGroup: Long): Dataset[GroupDoc] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.group)
      .flatMapGroupsWithState[Long, GroupDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, batch: Iterator[GroupDoc], state: GroupState[Long]) =>
          var cum = state.getOption.getOrElse(0L)
          val admitted = Vector.newBuilder[GroupDoc]
          batch.toVector.sortBy(d => (budgetHash(d.doc_id), d.doc_id)).foreach { d =>
            cum += d.text.trim.split("\\s+").count(_.nonEmpty).toLong
            if (cum <= budgetPerGroup) admitted += d
          }
          state.update(cum)
          admitted.result().iterator
      }
  }

  /** Executor-side twin of TextPrep.hash64 over s"$id:mix" — keeps stream
    * and batch mixture admission order bit-identical.
    */
  private def mixHash(id: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id:mix".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Domain-mixture admission at ingest — the streaming face of
    * Sampling.domainMixture with IDENTICAL cutoff semantics: each source's
    * token budget is its weight-normalized share of `totalTokens`
    * (`floor(w/Σw · total)`; absent sources get 0 — a mixture is a
    * whitelist), docs order by the batch operator's salted hash
    * (hash64(key || ":mix"), key) within a micro-batch, the running total
    * accumulates EVERY doc seen, and a doc admits iff the total through
    * it stays within the share (prefix truncation, not first-fit). A
    * stream arriving as one micro-batch admits exactly the batch
    * operator's mixture (pinned by StreamingSpec); across batches the
    * total carries over — the result equals the batch operator applied to
    * the batches in arrival order. State is ONE long per source.
    */
  def streamingDomainMixture(docs: Dataset[GroupDoc],
                             weights: Map[String, Double],
                             totalTokens: Long): Dataset[GroupDoc] = {
    require(weights.nonEmpty && weights.values.forall(_ >= 0),
            "mixture weights must be non-negative")
    val wSum = weights.values.sum
    val budgets = weights.map { case (src, w) =>
      src -> math.floor(w / wSum * totalTokens).toLong
    }
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.group)
      .flatMapGroupsWithState[Long, GroupDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, batch: Iterator[GroupDoc], state: GroupState[Long]) =>
          val budget = budgets.getOrElse(src, 0L)
          var cum = state.getOption.getOrElse(0L)
          val admitted = Vector.newBuilder[GroupDoc]
          batch.toVector.sortBy(d => (mixHash(d.doc_id), d.doc_id)).foreach { d =>
            cum += d.text.trim.split("\\s+").count(_.nonEmpty).toLong
            if (cum <= budget) admitted += d
          }
          state.update(cum)
          admitted.result().iterator
      }
  }

  /** Executor-side twin of TextPrep.hash64 over s"$id:unimax". */
  private def unimaxHash(id: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id:unimax".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** UniMax admission at ingest — the streaming face of
    * [[graft.pipeline.Sampling.unimaxSample]]. The language ALLOCATIONS are
    * computed batch-side (waterfilling needs the corpus-wide language token
    * masses, a global statistic no stream can know mid-flight — train the
    * allocation on the corpus snapshot, then admit live) and enter as a
    * plain map; each language's documents admit against its allocation in
    * the batch operator's salted-hash order with the same prefix-truncation
    * cutoff (the running total counts EVERY doc seen, skipped ones
    * included). State is ONE long per language; a stream arriving as one
    * micro-batch admits exactly the batch operator's sample (StreamingSpec
    * pins the parity).
    */
  def streamingUnimax(docs: Dataset[GroupDoc],
                      allocations: Map[String, Long]): Dataset[GroupDoc] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.group)
      .flatMapGroupsWithState[Long, GroupDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (lang: String, batch: Iterator[GroupDoc], state: GroupState[Long]) =>
          val alloc = allocations.getOrElse(lang, 0L)
          var cum = state.getOption.getOrElse(0L)
          val admitted = Vector.newBuilder[GroupDoc]
          batch.toVector.sortBy(d => (unimaxHash(d.doc_id), d.doc_id)).foreach { d =>
            cum += d.text.trim.split("\\s+").count(_.nonEmpty).toLong
            if (cum <= alloc) admitted += d
          }
          state.update(cum)
          admitted.result().iterator
      }
  }

  /** A document's span in its group's packed token stream. */
  final case class PackedSpan(doc_id: Long, group: String, seq_first: Long,
                              seq_last: Long, start_offset: Long, n_tok: Long)

  /** Executor-side twin of TextPrep.hash64 over s"$id:pack" — keeps stream
    * and batch packing order bit-identical.
    */
  private def packHash(id: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id:pack".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Sequence-packing assignment at ingest — the streaming face of
    * Packing.packSequences: each arriving document is laid at its group's
    * current token offset (ONE long of state per group) and emits the
    * sequence span it occupies. Within a micro-batch, documents lay out in
    * the batch operator's salted-hash order, so a stream arriving as one
    * batch produces exactly the batch operator's spans (pinned by
    * StreamingSpec); across micro-batches the offset carries over —
    * packing equals the batch operator applied to the batches in arrival
    * order, the same contract streamingTokenBudget keeps. Zero-token
    * documents occupy no span and emit nothing.
    */
  def streamingPackAssign(docs: Dataset[GroupDoc],
                          seqLen: Long): Dataset[PackedSpan] = {
    require(seqLen > 0, "seqLen must be positive")
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.group)
      .flatMapGroupsWithState[Long, PackedSpan](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (g: String, batch: Iterator[GroupDoc], state: GroupState[Long]) =>
          var off = state.getOption.getOrElse(0L)
          val out = Vector.newBuilder[PackedSpan]
          batch.toVector.sortBy(d => (packHash(d.doc_id), d.doc_id)).foreach { d =>
            val n = d.text.trim.split("\\s+").count(_.nonEmpty).toLong
            if (n > 0) {
              out += PackedSpan(d.doc_id, g, off / seqLen,
                                (off + n - 1) / seqLen, off, n)
              off += n
            }
          }
          state.update(off)
          out.result().iterator
      }
  }

  final case class LabeledVec(vec_id: Long, label: Long,
                              embedding: Seq[Float])

  final case class GroupCentroid(grp: Long, n_vecs: Long, gv: Seq[Double])

  /** Streaming face of the centroid stage behind
    * [[graft.pipeline.Similarity.centroidDrift]] — the live corpus-mix
    * drift monitor: per group, the running (count, Σ per-dimension
    * quantized-long) pair accumulates across micro-batches and each batch
    * re-emits the touched groups' exact centroids. The pair is a MONOID
    * over the batch operator's own quantization (float→double exact,
    * ×2^20, HALF_UP to long — [[quantHalfUp]] replicates Spark's round()
    * away-from-zero tie rule, where `math.round`'s toward-positive rule
    * would diverge on exact .5 fractions of negative components), so the
    * emitted centroid after ANY prefix of the stream is bit-identical to
    * `Similarity.groupCentroids` over the same rows (StreamingSpec pins
    * single-batch parity and cross-batch accumulation). State: one
    * (long + dim longs) per group — groups × dim regardless of stream
    * length. Pairwise drift is a per-batch groups²-sized afterthought the
    * consumer computes from these frames.
    */
  def streamingGroupCentroids(vecs: Dataset[LabeledVec])
      : Dataset[GroupCentroid] = {
    import vecs.sparkSession.implicits._
    vecs
      .groupByKey(_.label)
      .flatMapGroupsWithState[(Long, Array[Long]), GroupCentroid](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (grp: Long, batch: Iterator[LabeledVec],
         state: GroupState[(Long, Array[Long])]) =>
          var (n, sums) = state.getOption.getOrElse((0L, Array.empty[Long]))
          batch.foreach { v =>
            if (sums.isEmpty) sums = new Array[Long](v.embedding.length)
            require(v.embedding.length == sums.length,
              s"group $grp: embedding dim ${v.embedding.length} != ${sums.length}")
            var d = 0
            while (d < sums.length) {
              sums(d) += quantHalfUp(v.embedding(d).toDouble * 1048576.0)
              d += 1
            }
            n += 1
          }
          if (n == 0) Iterator.empty
          else {
            state.update((n, sums))
            val nv = n
            Iterator(GroupCentroid(grp, nv,
              sums.toSeq.map(s => (s.toDouble / nv) / 1048576.0)))
          }
      }
  }

  /** Spark `round()`'s HALF_UP (ties away from zero) for doubles —
    * `math.round` rounds ties toward +∞ and would flip negative .5s.
    */
  private def quantHalfUp(y: Double): Long =
    (if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)).toLong

  /** CCNet ONLINE admission — the streaming face of the pipeline_ccnet
    * selection: score each arriving document's bigram cross-entropy under
    * the batch-trained reference model and admit iff it clears its
    * language's keep threshold (the head+middle cutoff a batch
    * [[graft.pipeline.LanguageModel.pplBuckets]] report produced — CCNet
    * deploys exactly this shape: thresholds train offline, the filter
    * runs at ingest).
    *
    * Admission is BY VALUE (ce <= keepCeMax(lang)), the deployable
    * semantics: a threshold comparison is stateless and order-free,
    * whereas NTILE membership depends on every other document in the
    * tile and can split a ce TIE across the boundary — so parity is
    * pinned (StreamingSpec) against the batch THRESHOLD filter
    * (crossEntropy + compare), not against tile membership; they differ
    * only for boundary ties, which a value threshold deliberately admits
    * whole. Documents with <2 tokens carry no LM evidence and are not
    * admitted (pplBuckets leaves them unbucketed for the same reason).
    *
    * The scoring replica matches the batch plan's IEEE sequence exactly:
    * lowercased whitespace tokens (empty-filtered, Locale.ROOT),
    * left-to-right ln((c_ab+1)/(c_w+V)) accumulation in document order —
    * the same order Spark's Sum sees the exploded bigram rows — one
    * division, negate, HALF_UP round to 6 decimals. Model maps and
    * thresholds are load-time artifacts (the reference model is
    * Zipf-bounded; prune hapax bigrams for a giant reference — the
    * LanguageModel scaladoc's dial); state here is ZERO — the filter is
    * a pure stream-side projection, shard-count-free at any ingest rate.
    */
  def streamingCcnetAdmit(docs: Dataset[GroupDoc],
                          bigram: Map[(String, String), Long],
                          unigram: Map[String, Long],
                          vocab: Long,
                          keepCeMax: Map[String, Double]): Dataset[GroupDoc] = {
    require(vocab > 0, "reference vocabulary must be non-empty")
    docs.filter { d =>
      val ws = d.text.trim.toLowerCase(java.util.Locale.ROOT)
        .split("\\s+").filter(_.nonEmpty)
      ws.length >= 2 && {
        var s = 0.0
        var i = 0
        while (i < ws.length - 1) {
          val cab = bigram.getOrElse((ws(i), ws(i + 1)), 0L)
          val cw = unigram.getOrElse(ws(i), 0L)
          s += math.log((cab + 1L).toDouble / (cw + vocab).toDouble)
          i += 1
        }
        val ce = BigDecimal(-(s / (ws.length - 1)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        keepCeMax.get(d.group).exists(ce <= _)
      }
    }
  }
}
