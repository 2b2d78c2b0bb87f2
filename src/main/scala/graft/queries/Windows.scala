package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Num._
import graft.streaming.EventWindows

/** Event-time window inventory (SURVEY §2.7 T3) — the same
  * [[graft.streaming.EventWindows]] builders the streaming surface uses,
  * run in batch mode against the DuckDB oracle. Tumbling/sliding buckets
  * align on the epoch (Spark `window`) and DuckDB `time_bucket`'s
  * 2000-01-03 origin is 5-minute aligned with it (946857600 % 300 = 0).
  */
object Windows extends QueryModule {

  val all: Seq[Q] = Seq(

    Q("q38_tumbling_window", Some(s"""
      SELECT time_bucket(INTERVAL '5 minutes', ts) AS w_start, event_type,
        COUNT(*) AS n, ${sqlSum("value")} AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""")) { (s, d) =>
      EventWindows.tumbling(Tables.events(s, d), "5 minutes")
        .orderBy("w_start", "event_type")
    },

    Q("q39_sliding_window", Some(s"""
      SELECT time_bucket(INTERVAL '5 minutes', ts) - k.k * INTERVAL '5 minutes'
          AS w_start, event_type,
        COUNT(*) AS n, ${sqlSum("value")} AS sum_value
      FROM events CROSS JOIN (VALUES (0), (1)) k(k)
      GROUP BY 1, 2 ORDER BY w_start, event_type""")) { (s, d) =>
      EventWindows.sliding(Tables.events(s, d), "10 minutes", "5 minutes")
        .orderBy("w_start", "event_type")
    },

    Q("q40_session_window", Some(s"""
      WITH l AS (SELECT user_id, ts, value,
          lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts
        FROM events),
      f AS (SELECT user_id, ts, value,
          CASE WHEN pts IS NULL OR ts >= pts + INTERVAL '5 minutes'
               THEN 1 ELSE 0 END AS nf
        FROM l),
      s AS (SELECT user_id, ts, value,
          SUM(nf) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
        FROM f)
      SELECT user_id, MIN(ts) AS s_start,
        MAX(ts) + INTERVAL '5 minutes' AS s_end,
        COUNT(*) AS n, ${sqlSum("value")} AS sum_value
      FROM s GROUP BY user_id, sid ORDER BY user_id, s_start""")) { (s, d) =>
      EventWindows.sessions(Tables.events(s, d), "5 minutes")
        .orderBy("user_id", "s_start")
    }
  )
}
