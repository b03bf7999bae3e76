package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-time (temporal) operators over point-event relations: as-of
  * joins, gap sessionization, ordered-step funnels, and banded
  * interval-point joins.
  *
  * Provenance: the reference has no temporal operator family — its
  * event-shaped surfaces are the change-log listeners
  * (/root/reference/bigdata-sails/src/java/com/bigdata/rdf/sail/changesets/
  * IChangeLog.java:43) and the history index
  * (/root/reference/bigdata-rdf/src/java/com/bigdata/rdf/sparql/ast/eval/
  * HistoryServiceFactory.java:77), both covered elsewhere. This module is
  * the standard event-time kit a telemetry / training-data pipeline needs
  * (attribution as-of joins, session rollups, conversion funnels,
  * incident-window joins), built Spark-first: every operator below is a
  * declarative Catalyst plan — no range/theta join ever reaches the
  * physical plan, no per-event driver logic, no UDFs.
  *
  * Determinism contract (oracle replay): all time arithmetic happens in
  * integral epoch MICROSECONDS (`unix_micros` here, `epoch_us` in DuckDB),
  * ties break on unique ids, and money-style sums go through
  * DECIMAL(18,2) like the relational suite.
  */
object Temporal {

  // the driver's parquet reads event time as TIMESTAMP_NTZ; unix_micros
  // requires TIMESTAMP, and the session is pinned to UTC, so the cast is
  // an exact relabeling
  private def us(c: Column): Column = unix_micros(c.cast(TimestampType))

  /** Distributed as-of join: for each left row, the single right row
    * (same `keyCol`) with the greatest `tsCol` such that
    * right.ts <= left.ts (`direction = "backward"`, the default) or the
    * smallest such that right.ts >= left.ts (`"forward"`) — pandas
    * `merge_asof` / DuckDB `ASOF JOIN` inclusive semantics, LEFT-outer
    * (unmatched left rows keep null right columns). `toleranceSec` nulls
    * out matches further than the tolerance from `left.ts` in the match
    * direction (pandas' `tolerance=`).
    *
    * Plan shape (the 100 TB story): there is NO join operator at all.
    * Both sides union into one tagged frame, ONE hash exchange on the key
    * partitions it, and a per-key ordered window pass carries the most
    * recent right payload forward (`last(_, ignoreNulls)` over
    * rows unbounded-preceding..current, ordered by (ts, side) with right
    * rows first so equal timestamps match inclusively). Cost is a single
    * shuffle plus a per-key sort — the same shape Flink's event-time
    * temporal join uses — versus the non-equi range join a naive
    * formulation would produce (BroadcastNestedLoop at best, quadratic
    * per key at worst). Parallelism is key-cardinality-bound: each key
    * sorts independently, and at corpus scale keys are users/entities in
    * the billions. A single pathological key serializes only its own
    * history (inherent to per-key temporal order).
    *
    * Timestamp collisions on the right stay deterministic without any
    * extra pass: the window's sort order ends on `tieCol` (a unique id),
    * placing the row the match must return LAST among its equal-ts
    * group (backward: max id; forward: min id), where the running
    * `last()` picks it up. A separate (key, ts) dedup window would cost
    * a second full shuffle of the corpus-sized right side.
    *
    * Output: every left column, then each right payload column prefixed
    * `r_` (including `r_<tsCol>`, the matched timestamp).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, tieCol: String, payloadCols: Seq[String],
               toleranceSec: Option[Long] = None,
               direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
            s"asofJoin direction must be backward|forward, got $direction")
    val fwd = direction == "forward"
    val rightKeep = (tsCol +: payloadCols).distinct
    val lStructT = StructType(left.schema.fields)
    val rStructT = StructType(rightKeep.map(c => right.schema(c)))
    val tieT = right.schema(tieCol).dataType
    // side ordering makes equal timestamps INCLUSIVE both ways: right
    // rows sort before left rows at equal ts in the scan direction.
    // Left rows carry a null tie key (their mutual order is irrelevant)
    val lTagged = left.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(1).as("__side"),
      lit(null).cast(tieT).as("__tie"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rStructT).as("__r"))
    val rTagged = right.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(0).as("__side"),
      col(tieCol).as("__tie"),
      lit(null).cast(lStructT).as("__l"),
      struct(rightKeep.map(col): _*).as("__r"))
    // BOTH directions use a running [unbounded-preceding, current] frame
    // (O(n) streaming evaluation): forward simply scans time DESCENDING,
    // so "last right seen" is the earliest at-or-after row. The mirrored
    // [current, unbounded-following] frame would re-aggregate the tail
    // per row — O(n²) per key in Spark's UnboundedFollowing frame.
    // Tie order ends ascending (backward) / descending (forward) on the
    // unique id so last() lands on the max / min id at equal ts.
    val w = (if (fwd)
               Window.partitionBy("__k")
                 .orderBy(col("__ts").desc, col("__side"), col("__tie").desc)
             else
               Window.partitionBy("__k")
                 .orderBy(col("__ts"), col("__side"), col("__tie")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lTagged.unionByName(rTagged)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val bounded = toleranceSec match {
      case Some(tol) =>
        val tolUs = tol * 1000000L
        val inTol =
          if (fwd) us(col("__m")(tsCol)) <= us(col("__ts")) + tolUs
          else us(col("__m")(tsCol)) >= us(col("__ts")) - tolUs
        matched.withColumn("__m", when(inTol, col("__m")))
      case None => matched
    }
    bounded.select(
      left.columns.map(c => col("__l")(c).as(c)) ++
        rightKeep.map(c => col("__m")(c).as(s"r_$c")): _*)
  }

  /** Gap-based batch sessionization: events closer than or exactly `gapSec`
    * apart (per `keyCol`, event time `tsCol`) belong to one session; a gap
    * STRICTLY GREATER than `gapSec` starts a new one — exactly the
    * streaming face's split rule
    * ([[graft.streaming.EventStreams.sessionize]] closes a session when
    * `e.ts - last.ts > gap`), so batch and stream agree bit-for-bit on
    * session membership.
    *
    * Built on Spark's native `session_window` aggregation — an Aggregate,
    * not a Window function: no per-key global sort, sessions merge inside
    * partial aggregation, and the plan scales like any hash aggregate.
    * `session_window` merges adjacency-inclusively (an event exactly
    * `gap` after the previous one extends the session; pinned by spec at
    * the microsecond boundary), which is precisely the `> gap` split rule.
    *
    * Output per (key, session): key, session_start/end (min/max event ts —
    * NOT session_window's end, which pads the gap), n_events,
    * total_value (DECIMAL(18,2)-exact sum of `valueCol`, as double).
    */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 valueCol: String, gapSec: Long): DataFrame = {
    val gapExpr = s"${gapSec * 1000000L} microseconds"
    events
      .groupBy(col(keyCol), session_window(col(tsCol), gapExpr).as("__sw"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast(DecimalType(18, 2))).cast(DoubleType)
          .as("total_value"))
      .drop("__sw")
  }

  /** Ordered-step conversion funnel (ClickHouse `windowFunnel` semantics,
    * strict ordering): per key, `t1` is the earliest `steps(0)` event;
    * `t(i+1)` is the earliest `steps(i)` event STRICTLY after `t(i)` and
    * within `windowSec` of the anchor `t1`. Depth = number of steps
    * reached. Keys that never fire `steps(0)` do not appear.
    *
    * Plan shape: one filtered aggregation per step plus equi-joins on the
    * key — each stage is a hash aggregate over only that step's events
    * (the type filter pushes to the scan), and every join is keyed, so
    * AQE is free to broadcast the (per-key, tiny) frontier frames against
    * the event scan. No window functions, no range join, no per-key sort;
    * at 100 TB each step costs one scan-side filter + keyed aggregate.
    *
    * Output: key, t1..tN (timestamps, null once the chain breaks), depth.
    */
  def windowFunnel(events: DataFrame, keyCol: String, tsCol: String,
                   typeCol: String, steps: Seq[String],
                   windowSec: Long): DataFrame = {
    require(steps.nonEmpty, "windowFunnel needs at least one step")
    val winUs = windowSec * 1000000L
    val s0 = events.filter(col(typeCol) === steps.head)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as("t1"))
    val acc = steps.tail.zipWithIndex.foldLeft(s0) { case (a, (st, i)) =>
      val prev = s"t${i + 1}"
      val cur = s"t${i + 2}"
      val nxt = events.filter(col(typeCol) === st)
        .select(col(keyCol), col(tsCol).as("__cts"))
        .join(a.select(col(keyCol), col(prev), col("t1")), Seq(keyCol))
        .filter(us(col("__cts")) > us(col(prev)) &&
                us(col("__cts")) <= us(col("t1")) + winUs)
        .groupBy(col(keyCol)).agg(min(col("__cts")).as(cur))
      a.join(nxt, Seq(keyCol), "left")
    }
    val depth = steps.indices.tail.foldLeft(lit(1)) { (d, i) =>
      d + when(col(s"t${i + 1}").isNotNull, 1).otherwise(0)
    }
    acc.withColumn("depth", depth.cast(LongType))
  }

  /** Cohort retention matrix: users cohort by the calendar week
    * (Monday-truncated, UTC) of their first event; cell (cohort,
    * week_offset) counts the distinct cohort members active in the week
    * `offset` weeks later. The standard growth-analytics rollup.
    *
    * Plan shape: one keyed aggregate for first-seen, one distinct over
    * (key, week) — both map-side-combining hash aggregates over the scan —
    * then a keyed equi-join (the first-seen frame is one row per user;
    * AQE broadcasts it when small) and a final small aggregate whose
    * cardinality is weeks². Week arithmetic stays in integral
    * microseconds; offsets are exact (UTC weeks are uniformly 604800 s).
    */
  def retentionMatrix(events: DataFrame, keyCol: String,
                      tsCol: String): DataFrame = {
    val firstSeen = events.groupBy(col(keyCol))
      .agg(min(date_trunc("week", col(tsCol))).as("cohort"))
    val active = events
      .select(col(keyCol), date_trunc("week", col(tsCol)).as("__wk"))
      .distinct()
    firstSeen.join(active, keyCol)
      .withColumn("__off", (us(col("__wk")) - us(col("cohort")))
        .cast(LongType))
      .withColumn("__off", expr("__off div 604800000000L"))
      .groupBy(col("cohort"), col("__off").as("week_offset"))
      .agg(count_distinct(col(keyCol)).as("n_users"))
  }

  /** Interval-point join via time banding: match each point row
    * (`pTs`, same `keyCol`) into every interval `[iStart, iStart+lenSec)`
    * of the same key. Semantically a range join; physically a pure
    * equi-join.
    *
    * Scale shape: both sides band to `floor(epoch_us / bandUs)`
    * (`bandSec` defaults to the interval length). The interval side
    * explodes to the ceil(len/band)+1 bands its span touches (2 rows at
    * the default), the point side maps to exactly one band, the join runs
    * on (key, band), and the exact range predicate filters the candidates.
    * A point lies in exactly one band, and an interval emits each band
    * once, so no (interval, point) pair can duplicate — no distinct
    * needed. The non-equi predicate therefore never reaches the join:
    * Catalyst sees an equi-join it can shuffle or broadcast, instead of
    * the BroadcastNestedLoopJoin a raw `p >= s AND p < e` condition
    * forces. Requires nonnegative epochs (banding uses integral division).
    *
    * Output: every interval column, then the point columns (key dropped
    * from the point side).
    */
  def intervalPointJoin(intervals: DataFrame, points: DataFrame,
                        keyCol: String, iStart: String, lenSec: Long,
                        pTs: String, bandSec: Long = 0L): DataFrame = {
    val bandUs = (if (bandSec > 0) bandSec else lenSec) * 1000000L
    val lenUs = lenSec * 1000000L
    // `div` (SQL integral division) keeps banding exact on epoch-micro
    // longs — double division could round across a band boundary
    val iBanded = intervals
      .withColumn("__ius", us(col(iStart)))
      .withColumn("__band",
        explode(expr(s"sequence(__ius div ${bandUs}L, " +
                     s"(__ius + ${lenUs - 1L}L) div ${bandUs}L)")))
    val pBanded = points
      .withColumn("__pus", us(col(pTs)))
      .withColumn("__band", expr(s"__pus div ${bandUs}L"))
      .withColumnRenamed(keyCol, "__pk")
    iBanded
      .join(pBanded,
            iBanded(keyCol) === pBanded("__pk") &&
              iBanded("__band") === pBanded("__band"))
      .filter(col("__pus") >= col("__ius") &&
              col("__pus") < col("__ius") + lenUs)
      .drop("__band", "__pk", "__ius", "__pus")
  }
}
