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
    },

    // ---- ordered event funnel (view → click → purchase) ----
    // Classic event-stream analytics the windows above don't express:
    // how many users progress through an ORDERED stage sequence, each
    // stage strictly after the previous one's first occurrence. Three
    // per-user min aggregations chained by user_id equi-joins — each
    // stage's frame is user-count-sized with map-side partial mins, and
    // the strictly-after comparisons run on µs timestamps in BOTH
    // engines (the oracle CASTs DuckDB's ns parquet reads down, so tie
    // semantics can never diverge).
    Q("q98_event_funnel", Some("""
      WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        FROM events),
      a AS (SELECT user_id,
          MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view
        FROM ev GROUP BY user_id),
      b AS (SELECT e.user_id, MIN(e.ts) AS t_click
        FROM ev e JOIN a ON a.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts > a.t_view
        GROUP BY e.user_id),
      c AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM ev e JOIN b ON b.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > b.t_click
        GROUP BY e.user_id)
      SELECT stage, n_users FROM (
        SELECT 'f1_view' AS stage, COUNT(*) AS n_users FROM a
          WHERE t_view IS NOT NULL
        UNION ALL SELECT 'f2_click_after_view', COUNT(*) FROM b
        UNION ALL SELECT 'f3_purchase_after_click', COUNT(*) FROM c)
      ORDER BY stage""")) { (s, d) =>
      val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
      val a = ev.groupBy("user_id")
        .agg(min(when(col("event_type") === "view", col("ts"))).as("t_view"))
      val b = ev.filter(col("event_type") === "click").join(a, "user_id")
        .filter(col("ts") > col("t_view"))
        .groupBy("user_id").agg(min("ts").as("t_click"))
      val c = ev.filter(col("event_type") === "purchase").join(b, "user_id")
        .filter(col("ts") > col("t_click"))
        .groupBy("user_id").agg(min("ts").as("t_purchase"))
      a.filter(col("t_view").isNotNull)
        .agg(count(lit(1)).as("n_users"))
        .select(lit("f1_view").as("stage"), col("n_users"))
        .unionByName(c.agg(count(lit(1)).as("n_users"))
          .select(lit("f3_purchase_after_click").as("stage"), col("n_users")))
        .unionByName(b.agg(count(lit(1)).as("n_users"))
          .select(lit("f2_click_after_view").as("stage"), col("n_users")))
        .orderBy("stage")
    },

    // ---- cohort retention (first-seen date × activity offset) ----
    // The other staple of event analytics: group users by first-seen
    // DATE, count distinct active users at each day offset. Two grouped
    // aggregations joined on user_id — the cohort frame is user-count-
    // sized; the distinct count shuffles (cohort, offset, user) triples
    // with map-side partial distinct.
    Q("q99_cohort_retention", Some("""
      WITH ev AS (SELECT user_id,
          CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events),
      f AS (SELECT user_id, MIN(d) AS cohort FROM ev GROUP BY user_id)
      SELECT f.cohort,
        CAST(datediff('day', f.cohort, ev.d) AS INT) AS day_offset,
        COUNT(DISTINCT ev.user_id) AS n_active
      FROM ev JOIN f ON f.user_id = ev.user_id
      GROUP BY 1, 2 ORDER BY cohort, day_offset""")) { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("d"))
      val f = ev.groupBy("user_id").agg(min("d").as("cohort"))
      ev.join(f, "user_id")
        .groupBy(col("cohort"), datediff(col("d"), col("cohort")).as("day_offset"))
        .agg(countDistinct("user_id").as("n_active"))
        .orderBy("cohort", "day_offset")
    },

    // ---- user journey paths (first-5-event prefix frequencies) ----
    // Path analysis: each user's ordered event-type prefix as a '>'
    // string, counted across users. The (ts, event_id) tie-break pins
    // the order in both engines; the in-row sort/transform touches ≤5
    // elements per user — immaterial, unlike per-shingle HOF work.
    Q("q100_user_paths", Some("""
      WITH o AS (SELECT user_id, event_type,
          ROW_NUMBER() OVER (PARTITION BY user_id
            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        FROM events),
      p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        FROM o WHERE rn <= 5 GROUP BY user_id)
      SELECT path, COUNT(*) AS n_users FROM p GROUP BY path
      ORDER BY n_users DESC, path""")) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .groupBy("user_id")
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("rn"), col("event_type")))),
          x => x.getField("event_type")), ">").as("path"))
        .groupBy("path").agg(count(lit(1)).as("n_users"))
        .orderBy(desc("n_users"), asc("path"))
    },

    // ---- gap-based sessionization + per-user engagement stats ----
    // The batch twin of q40's session windows, reported per USER: a
    // session breaks on a >30-min silence (lag + conditional running
    // sum = the classic sessionize shape), then two grouped aggs give
    // session count, events, the largest session, and total active
    // time. All time math runs in exact epoch MICROSECONDS on both
    // engines (event timestamps carry sub-second parts, so second
    // truncation would mis-split borderline gaps). Two user-partitioned
    // windows + two partial-agg shuffles — parallelizes across users,
    // sorts only within one user's events.
    Q("q124_session_stats", Some("""
      WITH o AS (SELECT user_id, event_id,
          epoch_us(CAST(ts AS TIMESTAMP)) AS us,
          LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER (PARTITION BY user_id
            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev
        FROM events),
      s AS (SELECT user_id, us,
          CAST(SUM(CASE WHEN prev IS NULL OR us - prev > 1800000000
              THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY us, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
        FROM o),
      g AS (SELECT user_id, sid, COUNT(*) AS n_events,
          MAX(us) - MIN(us) AS dur_us
        FROM s GROUP BY user_id, sid)
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
        CAST(SUM(n_events) AS BIGINT) AS n_events,
        CAST(MAX(n_events) AS BIGINT) AS max_session_events,
        CAST(SUM(dur_us) AS BIGINT) AS active_us
      FROM g GROUP BY user_id ORDER BY user_id""")) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("us"), col("event_id"))
      // cast before unix_micros: a parquet rewrite can surface ts as
      // TIMESTAMP_NTZ (unix_micros is LTZ-strict); under the UTC session
      // the cast is value-preserving and a no-op on the normal path
      val o = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
        .withColumn("prev", lag(col("us"), 1).over(byUser))
      val sess = o.withColumn("sid",
        sum(when(col("prev").isNull ||
            col("us") - col("prev") > 1800000000L, 1L).otherwise(0L))
          .over(byUser.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
      sess.groupBy("user_id", "sid")
        .agg(count(lit(1)).as("n_events"),
          (max(col("us")) - min(col("us"))).as("dur_us"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_events")).as("n_events"),
          max(col("n_events")).as("max_session_events"),
          sum(col("dur_us")).as("active_us"))
        .orderBy("user_id")
    },

    // ---- event transition matrix (first-order Markov model) ----
    // (from_type → to_type) counts over each user's time-ordered event
    // stream plus the conditional transition probability — the behavior
    // model behind next-action prediction and anomaly scoring. One
    // user-partitioned lead() window (the q100 ordering contract:
    // event-time then event_id so tie semantics match both engines),
    // one counted shuffle; probabilities normalize within from_type over
    // the type×type aggregate, never the event stream.
    Q("q111_event_transitions", Some("""
      WITH s AS (SELECT user_id, event_type,
          lead(event_type) OVER (PARTITION BY user_id
            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_type
        FROM events),
      t AS (SELECT event_type AS from_type, next_type AS to_type,
          COUNT(*) AS n
        FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2)
      SELECT from_type, to_type, n,
        CAST(n AS DOUBLE)
          / CAST(CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS DOUBLE)
          AS p
      FROM t ORDER BY from_type, to_type""")) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("p", col("n").cast("double")
          / sum(col("n")).over(Window.partitionBy("from_type")).cast("double"))
        .orderBy("from_type", "to_type")
    }
  )
}
