package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.pipeline.Temporal

/** Semantics of the temporal operator family (as-of join, batch
  * sessionization, window funnel, banded interval join) on hand-built
  * fixtures that pin every boundary: tie timestamps, exact-gap splits,
  * strict funnel ordering, band-straddling intervals.
  */
class TemporalSpec extends SparkSpecBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asofJoin: backward inclusive, dedup ties by max id, left outer") {
    import spark.implicits._
    val left = Seq(
      (100L, 1L, ts("2026-01-01 10:10:00")),
      (101L, 1L, ts("2026-01-01 10:20:00")),
      (102L, 2L, ts("2026-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, 1L, ts("2026-01-01 10:05:00")),
      (2L, 1L, ts("2026-01-01 10:10:00")), // equal ts -> inclusive match
      (3L, 1L, ts("2026-01-01 10:10:00")), // tie: max event_id wins
      (4L, 1L, ts("2026-01-01 10:21:00"))  // after both lefts
    ).toDF("right_id", "user_id", "ts")
      .withColumnRenamed("right_id", "event_id")
    val out = Temporal.asofJoin(left, right, "user_id", "ts",
                                tieCol = "event_id",
                                payloadCols = Seq("event_id"))
      .orderBy("event_id")
      .select("event_id", "r_event_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1))))
    assert(out.toSeq == Seq(
      (100L, Some(3L)), // inclusive at equal ts, tie -> id 3 over 2
      (101L, Some(3L)), // 10:21 is in the future, latest prior is 10:10
      (102L, None)      // user 2 has no reference rows -> left outer
    ))
  }

  test("asofJoin: tolerance nulls out matches older than the bound") {
    import spark.implicits._
    val left = Seq((10L, 1L, ts("2026-01-01 12:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((1L, 1L, ts("2026-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    def run(tol: Option[Long]) =
      Temporal.asofJoin(left, right, "user_id", "ts", "event_id",
                        Seq("event_id"), toleranceSec = tol)
        .select("r_event_id").collect().map(r => Option(r.get(0))).toSeq
    assert(run(None) == Seq(Some(1L)))
    assert(run(Some(7200L)) == Seq(Some(1L))) // exactly 2h old: kept
    assert(run(Some(7199L)) == Seq(None))     // one second past: nulled
  }

  test("asofJoin forward: earliest at-or-after match, min-id ties, tolerance") {
    import spark.implicits._
    val left = Seq(
      (100L, 1L, ts("2026-01-01 10:10:00")),
      (101L, 1L, ts("2026-01-01 10:30:00"))
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, 1L, ts("2026-01-01 10:05:00")), // in the past: never matches
      (2L, 1L, ts("2026-01-01 10:10:00")), // equal ts -> inclusive
      (3L, 1L, ts("2026-01-01 10:10:00")), // tie: forward keeps MIN id
      (4L, 1L, ts("2026-01-01 10:45:00"))
    ).toDF("event_id", "user_id", "ts")
    def run(tol: Option[Long]) =
      Temporal.asofJoin(left, right, "user_id", "ts", "event_id",
                        Seq("event_id"), toleranceSec = tol,
                        direction = "forward")
        .orderBy("event_id")
        .select("event_id", "r_event_id")
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq
    assert(run(None) == Seq((100L, Some(2L)), (101L, Some(4L))))
    // 15 min to the 10:45 match: tolerance 900s keeps it, 899s nulls it
    assert(run(Some(900L)) == Seq((100L, Some(2L)), (101L, Some(4L))))
    assert(run(Some(899L)) == Seq((100L, Some(2L)), (101L, None)))
  }

  test("asofJoin plan is join-free: union + keyed window, no join operator") {
    import spark.implicits._
    val left = Seq((1L, 1L, ts("2026-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((2L, 1L, ts("2026-01-01 09:00:00")))
      .toDF("event_id", "user_id", "ts")
    val plan = Temporal.asofJoin(left, right, "user_id", "ts", "event_id",
                                 Seq("event_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert(plan.contains("Window"), "as-of carries matches via a window")
  }

  test("sessionize: exact gap stays in-session, gap+1us splits") {
    import spark.implicits._
    // gap 60s; second event exactly 60s later (same session), third
    // 60.000001s after the second (split at the microsecond boundary)
    val ev = Seq(
      (1L, ts("2026-01-01 10:00:00"), 1.0, 1L),
      (1L, ts("2026-01-01 10:01:00"), 2.0, 2L),
      (1L, ts("2026-01-01 10:02:00.000001"), 4.0, 3L),
      (3L, ts("2026-01-01 10:00:30"), 8.0, 7L) // second user, own session
    ).toDF("user_id", "ts", "value", "event_id")
    val out = Temporal.sessionize(ev, "user_id", "ts", "value", gapSec = 60)
      .orderBy("user_id", "session_start")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
                 r.getTimestamp(2).toString, r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (1L, "2026-01-01 10:00:00.0", "2026-01-01 10:01:00.0", 2L, 3.0),
      (1L, "2026-01-01 10:02:00.000001", "2026-01-01 10:02:00.000001",
       1L, 4.0),
      (3L, "2026-01-01 10:00:30.0", "2026-01-01 10:00:30.0", 1L, 8.0)))
  }

  test("sessionize agrees with the streaming face's closed sessions") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.EventStreams
    import graft.streaming.EventStreams.Ev
    implicit val sqlCtx = spark.sqlContext
    val evs = Seq(
      Ev(1, ts("2026-01-01 10:00:00"), 1, "click", 1.0),
      Ev(2, ts("2026-01-01 10:10:00"), 1, "click", 2.0),
      Ev(3, ts("2026-01-01 12:00:00"), 1, "click", 4.0), // new session
      Ev(4, ts("2026-01-01 10:05:00"), 2, "view", 8.0),
      // sentinel events: far-future per user, forces earlier sessions
      // closed via the event-time watermark
      Ev(98, ts("2026-01-02 10:00:00"), 1, "click", 0.0),
      Ev(99, ts("2026-01-02 10:00:00"), 2, "click", 0.0))
    val input = MemoryStream[Ev]
    val q = EventStreams.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("temporal_parity")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(evs.take(4): _*)
      q.processAllAvailable()
      input.addData(evs.drop(4): _*)
      q.processAllAvailable()
      // one more empty-ish batch advances the watermark past the gap
      input.addData(Ev(100, ts("2026-01-03 10:00:00"), 3, "click", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("temporal_parity")
        .select("user_id", "started", "ended", "n_events", "total_value")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString,
                   r.getTimestamp(2).toString, r.getInt(3).toLong,
                   r.getDouble(4))).toSet
      val batch = Temporal.sessionize(
        evs.take(6).map(e => (e.user_id, e.ts, e.value, e.event_id))
          .toDF("user_id", "ts", "value", "event_id"),
        "user_id", "ts", "value", gapSec = 1800)
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString,
                   r.getTimestamp(2).toString, r.getLong(3),
                   r.getDouble(4))).toSet
      // streaming emitted every session the batch face computes for the
      // same rows (the sentinel sessions themselves stay open/unflushed)
      val closedBatch = batch.filter(s => !s._2.startsWith("2026-01-02"))
      assert(closedBatch.subsetOf(streamed),
             s"batch sessions $closedBatch not all in streamed $streamed")
    } finally q.stop()
  }

  test("windowFunnel: strict order, anchor window, earliest completion") {
    import spark.implicits._
    val ev = Seq(
      // user 1: full funnel in order inside the anchor window
      (1L, ts("2026-01-01 10:00:00"), "signup"),
      (1L, ts("2026-01-01 10:30:00"), "view"),
      (1L, ts("2026-01-01 10:59:00"), "purchase"),
      // user 2: purchase BEFORE the first view -> depth 2 only
      (2L, ts("2026-01-01 10:00:00"), "signup"),
      (2L, ts("2026-01-01 10:20:00"), "purchase"),
      (2L, ts("2026-01-01 10:40:00"), "view"),
      // user 3: view outside the 1h anchor window -> depth 1
      (3L, ts("2026-01-01 10:00:00"), "signup"),
      (3L, ts("2026-01-01 11:00:01"), "view"),
      // user 4: no signup -> absent
      (4L, ts("2026-01-01 10:00:00"), "view")
    ).toDF("user_id", "ts", "event_type")
    val out = Temporal.windowFunnel(ev, "user_id", "ts", "event_type",
                                    Seq("signup", "view", "purchase"),
                                    windowSec = 3600)
      .orderBy("user_id")
      .select("user_id", "depth")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 3L), (2L, 2L), (3L, 1L)))
  }

  test("windowFunnel: completion uses earliest valid step times") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2026-01-01 10:00:00"), "signup"),
      (1L, ts("2026-01-01 10:10:00"), "view"),
      (1L, ts("2026-01-01 10:20:00"), "view"), // later view ignored
      (1L, ts("2026-01-01 10:15:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val r = Temporal.windowFunnel(ev, "user_id", "ts", "event_type",
                                  Seq("signup", "view", "purchase"), 3600)
      .select("t2", "t3").head()
    assert(r.getTimestamp(0).toString == "2026-01-01 10:10:00.0")
    assert(r.getTimestamp(1).toString == "2026-01-01 10:15:00.0")
  }

  test("retentionMatrix: cohort by first week, offsets count returners") {
    import spark.implicits._
    // 2026-01-05 and 2026-01-12 are Mondays (week starts)
    val ev = Seq(
      (1L, ts("2026-01-06 10:00:00")), // user 1 cohort wk0
      (1L, ts("2026-01-13 10:00:00")), // returns wk1
      (2L, ts("2026-01-07 10:00:00")), // user 2 cohort wk0, never returns
      (3L, ts("2026-01-14 10:00:00"))  // user 3 cohort wk1
    ).toDF("user_id", "ts")
    val out = Temporal.retentionMatrix(ev, "user_id", "ts")
      .orderBy("cohort", "week_offset")
      .collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1),
                 r.getLong(2)))
    assert(out.toSeq == Seq(
      ("2026-01-05", 0L, 2L), // users 1,2 active in their cohort week
      ("2026-01-05", 1L, 1L), // user 1 returned
      ("2026-01-12", 0L, 1L)  // user 3's cohort
    ))
  }

  test("intervalPointJoin: [start, start+len) bounds, no duplicate pairs") {
    import spark.implicits._
    val intervals = Seq(
      (10L, 1L, ts("2026-01-01 10:00:00")),
      // second interval straddles a band boundary relative to its points
      (11L, 1L, ts("2026-01-01 10:04:30"))
    ).toDF("iid", "user_id", "start")
    val points = Seq(
      (100L, 1L, ts("2026-01-01 10:00:00")),      // == start: in
      (101L, 1L, ts("2026-01-01 10:04:59.999999")), // just inside i10
      (102L, 1L, ts("2026-01-01 10:05:00")),      // == end of i10: out
      (103L, 1L, ts("2026-01-01 10:07:00")),      // in i11 (band 2 of it)
      (104L, 2L, ts("2026-01-01 10:00:30"))       // other key: out
    ).toDF("pid", "user_id", "pts")
    val got = Temporal.intervalPointJoin(intervals, points, "user_id",
                                         iStart = "start", lenSec = 300,
                                         pTs = "pts")
      .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet == Set((10L, 100L), (10L, 101L), (11L, 101L),
                            (11L, 102L), (11L, 103L)))
    assert(got.length == got.toSet.size, "banding must not duplicate pairs")
  }

  test("intervalPointJoin plans an equi-join, never a nested-loop join") {
    import spark.implicits._
    val intervals = Seq((1L, 1L, ts("2026-01-01 10:00:00")))
      .toDF("iid", "user_id", "start")
    val points = Seq((2L, 1L, ts("2026-01-01 10:01:00")))
      .toDF("pid", "user_id", "pts")
    val plan = Temporal.intervalPointJoin(intervals, points, "user_id",
                                          "start", 300, "pts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
           !plan.contains("CartesianProduct"),
           s"banded interval join must stay an equi-join:\n$plan")
  }
}
