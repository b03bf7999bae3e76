package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.pipeline.Temporal

/** Temporal operator inventory over the driver's `events` table, each
  * entry replayed by a DuckDB oracle (ASOF JOIN / window SQL give DuckDB
  * the same semantics natively; the Spark side uses the scale-shaped
  * plans in [[graft.pipeline.Temporal]]).
  *
  * All four entries follow the suite-wide determinism contract: integral
  * epoch-microsecond arithmetic (`unix_micros` / `epoch_us`), unique-id
  * tiebreaks, DECIMAL(18,2) money sums, ORDER BY a unique key.
  */
object TemporalSuite {

  private def ev(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "events")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // backward as-of: each purchase matched to the user's latest
    // at-or-before view (attribution join) — join-free union+window plan
    "events_asof_join" -> ((s, d) => {
      val e = ev(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val views = e.filter(col("event_type") === "view")
        .select("user_id", "ts", "event_id")
      Temporal.asofJoin(purchases, views, "user_id", "ts",
                        tieCol = "event_id", payloadCols = Seq("event_id"))
        .select(col("event_id"), col("user_id"), col("ts"),
                col("r_event_id").as("view_id"), col("r_ts").as("view_ts"),
                (unix_micros(col("ts").cast("timestamp")) -
                  unix_micros(col("r_ts").cast("timestamp"))).as("lag_us"))
        .orderBy("event_id")
    }),

    // 30-minute-gap sessions per user via native session_window — an
    // Aggregate, not a per-user sort; split rule matches the streaming
    // face (same session iff gap <= 30 min)
    "events_sessionize" -> ((s, d) =>
      Temporal.sessionize(ev(s, d), "user_id", "ts", "value", gapSec = 1800)
        .orderBy("user_id", "session_start")),

    // signup -> view -> purchase conversion funnel, 24h window anchored
    // at the first signup; strict ordering, earliest-completion times
    "events_funnel" -> ((s, d) =>
      Temporal.windowFunnel(ev(s, d), "user_id", "ts", "event_type",
                            Seq("signup", "view", "purchase"),
                            windowSec = 86400)
        .select("user_id", "t1", "t2", "t3", "depth")
        .orderBy("user_id")),

    // weekly cohort retention matrix (first-seen week x offset)
    "events_retention" -> ((s, d) =>
      Temporal.retentionMatrix(ev(s, d), "user_id", "ts")
        .orderBy("cohort", "week_offset")),

    // clicks landing inside each error's 5-minute incident window —
    // a range join executed as a banded (key, band) equi-join
    "events_interval_join" -> ((s, d) => {
      val e = ev(s, d)
      val errors = e.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("user_id"),
                col("ts").as("e_ts"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id"),
                col("ts").as("c_ts"))
      val pairs = Temporal.intervalPointJoin(errors, clicks, "user_id",
                                             iStart = "e_ts", lenSec = 300,
                                             pTs = "c_ts")
      errors
        .join(pairs.groupBy("error_id").agg(count(lit(1)).as("n_clicks")),
              Seq("error_id"), "left")
        .select(col("error_id"), col("user_id"), col("e_ts"),
                coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
        .orderBy("error_id")
    })
  )

  val oracles: Map[String, String] = Map(

    "events_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'purchase'),
              v AS (SELECT user_id, ts, CAST(MAX(event_id) AS BIGINT) AS view_id
                    FROM events WHERE event_type = 'view' GROUP BY 1, 2)
         SELECT p.event_id, p.user_id, p.ts,
                v.view_id, v.ts AS view_ts,
                epoch_us(p.ts) - epoch_us(v.ts) AS lag_us
         FROM p ASOF LEFT JOIN v
           ON p.user_id = v.user_id AND p.ts >= v.ts
         ORDER BY p.event_id""",

    "events_sessionize" ->
      """WITH o AS (SELECT user_id, ts, event_id, value,
                      lag(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS pts
                    FROM events),
              m AS (SELECT user_id, ts, event_id, value,
                      CASE WHEN pts IS NULL
                             OR epoch_us(ts) - epoch_us(pts) > 1800000000
                           THEN 1 ELSE 0 END AS brk
                    FROM o),
              s AS (SELECT user_id, ts, value,
                      SUM(brk) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sid
                    FROM m)
         SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
                CAST(COUNT(*) AS BIGINT) AS n_events,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                  AS total_value
         FROM s GROUP BY user_id, sid
         ORDER BY user_id, session_start""",

    "events_funnel" ->
      """WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                     WHERE event_type = 'signup' GROUP BY 1),
              s2 AS (SELECT e.user_id, MIN(e.ts) AS t2
                     FROM events e JOIN s1 ON e.user_id = s1.user_id
                     WHERE e.event_type = 'view'
                       AND epoch_us(e.ts) > epoch_us(s1.t1)
                       AND epoch_us(e.ts) <= epoch_us(s1.t1) + 86400000000
                     GROUP BY 1),
              s3 AS (SELECT e.user_id, MIN(e.ts) AS t3
                     FROM events e
                       JOIN s1 ON e.user_id = s1.user_id
                       JOIN s2 ON e.user_id = s2.user_id
                     WHERE e.event_type = 'purchase'
                       AND epoch_us(e.ts) > epoch_us(s2.t2)
                       AND epoch_us(e.ts) <= epoch_us(s1.t1) + 86400000000
                     GROUP BY 1)
         SELECT s1.user_id, s1.t1, s2.t2, s3.t3,
                CAST(1 + CASE WHEN s2.t2 IS NULL THEN 0 ELSE 1 END
                       + CASE WHEN s3.t3 IS NULL THEN 0 ELSE 1 END
                     AS BIGINT) AS depth
         FROM s1
           LEFT JOIN s2 ON s1.user_id = s2.user_id
           LEFT JOIN s3 ON s1.user_id = s3.user_id
         ORDER BY s1.user_id""",

    "events_retention" ->
      """WITH f AS (SELECT user_id,
                      MIN(CAST(date_trunc('week', ts) AS TIMESTAMP))
                        AS cohort
                    FROM events GROUP BY 1),
              a AS (SELECT DISTINCT user_id,
                      CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
                    FROM events)
         SELECT f.cohort,
                (epoch_us(a.wk) - epoch_us(f.cohort)) // 604800000000
                  AS week_offset,
                CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
         FROM f JOIN a ON f.user_id = a.user_id
         GROUP BY 1, 2 ORDER BY cohort, week_offset""",

    "events_interval_join" ->
      """SELECT e.event_id AS error_id, e.user_id, e.ts AS e_ts,
                CAST(COUNT(c.event_id) AS BIGINT) AS n_clicks
         FROM events e LEFT JOIN events c
           ON c.user_id = e.user_id AND c.event_type = 'click'
          AND epoch_us(c.ts) >= epoch_us(e.ts)
          AND epoch_us(c.ts) < epoch_us(e.ts) + 300000000
         WHERE e.event_type = 'error'
         GROUP BY 1, 2, 3
         ORDER BY error_id"""
  )
}
