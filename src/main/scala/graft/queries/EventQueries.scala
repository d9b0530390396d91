package graft.queries

import graft.streaming.EventStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-verified batch forms of the streaming operators: the same
  * transforms StreamingSpec drives through MemoryStream, here executed
  * over the events table so the DuckDB oracle can pin their semantics.
  * `ts` arrives as nanos-long OR TimestampType depending on the
  * dataset generation (EventStream.tsSecCol dispatches on the type);
  * the oracle reads the same parquet natively and goes through
  * `epoch()`, which covers both contracts.
  */
object EventQueries {
  import StarQueries.t

  /** Tumbling 5-minute windows per event type (window() function on
    * the Spark side; epoch-bucket arithmetic in the oracle). */
  def evWindow(s: SparkSession, dir: String): DataFrame =
    EventStream.windowedAggregates(t(s, dir, "events"))
      .orderBy(col("bucket_start"), col("event_type"))

  private val evWindowSql =
    """SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300
         AS bucket_start,
       event_type, COUNT(*) AS n_events,
       CAST(ROUND(CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
         AS DECIMAL(28,10)), 2) AS DOUBLE) AS sum_value
       FROM events GROUP BY bucket_start, event_type
       ORDER BY bucket_start, event_type"""

  /** Typed schema-on-read over the `props` JSON column
    * ([[EventStream.propsJsonStats]]): parse accounting + integer
    * aggregates per event type. The oracle extracts via DuckDB's
    * JSON operator — two independent JSON parsers agreeing on every
    * value. */
  def evJsonProps(s: SparkSession, dir: String): DataFrame =
    EventStream.propsJsonStats(t(s, dir, "events"))
      .orderBy(col("event_type"))

  private val evJsonPropsSql =
    """SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(CAST(props->>'k' AS INTEGER)) AS BIGINT)
         AS n_parsed,
       CAST(SUM(CAST(props->>'k' AS INTEGER)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(props->>'k' AS INTEGER)) AS INTEGER) AS min_k,
       CAST(MAX(CAST(props->>'k' AS INTEGER)) AS INTEGER) AS max_k
       FROM events GROUP BY event_type ORDER BY event_type"""

  /** Robust daily-volume anomaly detection
    * ([[EventStream.dailyAnomalies]]): modified z-score vs
    * median/MAD per event type, flags at |z| > 3.5. */
  def evAnomaly(s: SparkSession, dir: String): DataFrame =
    EventStream.dailyAnomalies(t(s, dir, "events"))

  private val evAnomalySql =
    """WITH daily AS (
         SELECT event_type,
           (CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS day,
           CAST(COUNT(*) AS BIGINT) AS n
         FROM events GROUP BY event_type, day),
       med AS (
         SELECT event_type, median(n) AS med
         FROM daily GROUP BY event_type),
       dev AS (
         SELECT d.event_type, d.day, d.n, m.med,
           abs(CAST(d.n AS DOUBLE) - m.med) AS adev
         FROM daily d JOIN med m USING (event_type)),
       mad AS (
         SELECT event_type, median(adev) AS mad
         FROM dev GROUP BY event_type)
       SELECT d.event_type, d.day, d.n,
         CAST(ROUND(CAST(d.med AS DECIMAL(28,10)), 6) AS DOUBLE)
           AS med,
         CAST(ROUND(CAST(m2.mad AS DECIMAL(28,10)), 6) AS DOUBLE)
           AS mad,
         CASE WHEN m2.mad = 0 THEN NULL
           ELSE CAST(ROUND(CAST(CAST(0.6745 AS DOUBLE) *
             (CAST(d.n AS DOUBLE) - d.med) / m2.mad
             AS DECIMAL(28,10)), 6) AS DOUBLE) END AS z_score,
         CASE WHEN m2.mad = 0 THEN CAST(d.n AS DOUBLE) <> d.med
           ELSE abs(CAST(0.6745 AS DOUBLE) *
             (CAST(d.n AS DOUBLE) - d.med) / m2.mad) >
             CAST(3.5 AS DOUBLE) END AS is_anomaly
       FROM dev d JOIN mad m2 USING (event_type)
       ORDER BY d.event_type, d.day"""

  /** Sessionization (30-minute inactivity gap) per user. */
  def evSessions(s: SparkSession, dir: String): DataFrame =
    EventStream.sessionizeBatch(
      EventStream.normalize(t(s, dir, "events")).toDF())
      .orderBy(col("user_id"))

  private val evSessionsSql =
    """WITH e AS (
         SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT)
           AS ts_sec
         FROM events),
       flagged AS (
         SELECT user_id,
           CASE WHEN LAG(ts_sec) OVER w IS NULL
                  OR ts_sec - LAG(ts_sec) OVER w > 1800
                THEN 1 ELSE 0 END AS new_session
         FROM e WINDOW w AS (PARTITION BY user_id
                             ORDER BY ts_sec, event_id))
       SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
         COUNT(*) AS n_events
       FROM flagged GROUP BY user_id ORDER BY user_id"""

  /** Per-session rows via the native `session_window` primitive (gap
    * 30 min). Boundary semantics, pinned at sf0.1 by a real
    * exactly-1800s gap: an event landing exactly at the current
    * session's end (gap == duration) MERGES — a new session needs a
    * strictly greater gap, matching the lag-gap form's rule. */
  def evSessionNative(s: SparkSession, dir: String): DataFrame =
    EventStream.sessionWindows(t(s, dir, "events"))
      .orderBy(col("user_id"), col("session_start"))

  private val evSessionNativeSql =
    """WITH e AS (
         SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
         FROM events),
       flagged AS (
         SELECT user_id, ts_sec,
           CASE WHEN LAG(ts_sec) OVER w IS NULL
                  OR ts_sec - LAG(ts_sec) OVER w > 1800
                THEN 1 ELSE 0 END AS new_session
         FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec)),
       sess AS (
         SELECT user_id, ts_sec,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_sec
             ROWS UNBOUNDED PRECEDING) AS sid
         FROM flagged)
       SELECT user_id, MIN(ts_sec) AS session_start,
         MAX(ts_sec) + 1800 AS session_end, COUNT(*) AS n_events
       FROM sess GROUP BY user_id, sid
       ORDER BY user_id, session_start"""

  /** Sliding 10-minute windows advancing every 5 — each event lands in
    * exactly two windows (Spark's window(size, slide); the oracle
    * replicates membership by enumerating the two starts). */
  def evSliding(s: SparkSession, dir: String): DataFrame =
    EventStream.withEventTime(t(s, dir, "events"))
      .groupBy(window(col("event_ts"), "10 minutes", "5 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").cast("long").as("window_start"),
        col("event_type"), col("n_events"))
      .orderBy(col("window_start"), col("event_type"))

  private val evSlidingSql =
    """SELECT ((CAST(floor(epoch(ts)) AS BIGINT) // 300) - k) * 300
         AS window_start,
       event_type, COUNT(*) AS n_events
       FROM events CROSS JOIN range(0, 2) r(k)
       GROUP BY window_start, event_type
       ORDER BY window_start, event_type"""

  /** Batch form of the stream-stream interval join (purchases ⋈ same-
    * user clicks within the preceding 30 minutes) — the exact
    * transform StreamingSpec drives through MemoryStream. */
  def evIntervalJoin(s: SparkSession, dir: String): DataFrame =
    EventStream.purchaseClickJoin(t(s, dir, "events"))
      .select(col("purchase_id"), col("user_id"),
        col("purchase_ts").cast("long").as("purchase_sec"),
        col("click_id"), col("click_ts").cast("long").as("click_sec"))
      .orderBy(col("purchase_id"), col("click_id"))

  private val evIntervalSql =
    """WITH e AS (
         SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT)
           AS ts_sec, event_type
         FROM events),
       c AS (SELECT * FROM e WHERE event_type = 'click'),
       p AS (SELECT * FROM e WHERE event_type = 'purchase')
       SELECT p.event_id AS purchase_id, p.user_id,
         p.ts_sec AS purchase_sec, c.event_id AS click_id,
         c.ts_sec AS click_sec
       FROM p JOIN c ON c.user_id = p.user_id
         AND c.ts_sec BETWEEN p.ts_sec - 1800 AND p.ts_sec
       ORDER BY purchase_id, click_id"""

  /** Batch form of the stream-stream LEFT OUTER interval join — every
    * purchase, attributed clicks or NULL (the attribution-gap query).
    * Same StreamingSpec-driven transform as the inner form. */
  def evIntervalLeft(s: SparkSession, dir: String): DataFrame =
    EventStream.purchaseClickJoinOuter(t(s, dir, "events"))
      .select(col("purchase_id"), col("user_id"),
        col("purchase_ts").cast("long").as("purchase_sec"),
        col("click_id"), col("click_ts").cast("long").as("click_sec"))
      .orderBy(col("purchase_id"), col("click_id"))

  private val evIntervalLeftSql =
    """WITH e AS (
         SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT)
           AS ts_sec, event_type
         FROM events),
       c AS (SELECT * FROM e WHERE event_type = 'click'),
       p AS (SELECT * FROM e WHERE event_type = 'purchase')
       SELECT p.event_id AS purchase_id, p.user_id,
         p.ts_sec AS purchase_sec, c.event_id AS click_id,
         c.ts_sec AS click_sec
       FROM p LEFT JOIN c ON c.user_id = p.user_id
         AND c.ts_sec BETWEEN p.ts_sec - 1800 AND p.ts_sec
       ORDER BY purchase_id, click_id"""

  /** Batch form of watermarked streaming dedup, keyed on
    * (user_id, event_type). A kept row's non-key columns are
    * pick-dependent (whichever row the state store saw first), so the
    * oracle-comparable projection is the key set itself — which is
    * exactly what the operator guarantees: one surviving row per key. */
  def evDedup(s: SparkSession, dir: String): DataFrame =
    EventStream.deduplicated(t(s, dir, "events"),
        Seq("user_id", "event_type"))
      .select(col("user_id"), col("event_type"))
      .orderBy(col("user_id"), col("event_type"))

  private val evDedupSql =
    """SELECT DISTINCT user_id, event_type FROM events
       ORDER BY user_id, event_type"""

  /** Batch form of the stream-static enrichment join: events left-
    * joined to the customer dimension on user_id (events with no
    * dimension row survive with NULL segment). The static side
    * carries no forced hint — Catalyst broadcasts the gate-scale
    * customer dim on its size estimate (PlanSpec pins it) and would
    * degrade to a shuffle for a production-scale dimension. */
  def evEnrich(s: SparkSession, dir: String): DataFrame = {
    val dim = t(s, dir, "customer")
      .select(col("c_custkey").as("user_id"),
        col("c_mktsegment").as("segment"))
    EventStream.enriched(
        t(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type")),
        dim)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("segment"))
      .orderBy(col("event_id"))
  }

  private val evEnrichSql =
    """SELECT e.event_id, e.user_id, e.event_type,
       c.c_mktsegment AS segment
       FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id
       ORDER BY e.event_id"""

  /** Ordered funnel view → click → purchase
    * ([[EventStream.funnelReport]]): per step, users whose step event
    * falls strictly after their earliest completion of the previous
    * prefix. The oracle replays the sequential min-then-filter
    * derivation at microsecond precision. */
  def evFunnel(s: SparkSession, dir: String): DataFrame =
    EventStream.funnelReport(t(s, dir, "events"),
      Seq("view", "click", "purchase"))
      .orderBy(col("step"))

  /** [[evFunnel]] over an event set whose middle step has NO events
    * at all: the report must still emit one row per declared step
    * (n_users 0, conversion 0.0 for the empty step and everything
    * after it) — the report's shape is the funnel definition's, not
    * the data's. Gates the empty-step contract the spec-only fix
    * left undriven: dropping the step-list left join would lose the
    * click and purchase rows here and the hash diverges. */
  def evFunnelSparse(s: SparkSession, dir: String): DataFrame =
    EventStream.funnelReport(
      t(s, dir, "events").filter(col("event_type") =!= "click"),
      Seq("view", "click", "purchase"))
      .orderBy(col("step"))

  private val evFunnelSql =
    """WITH e AS (
         SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
       s1 AS (SELECT user_id, MIN(ts_us) AS t FROM e
              WHERE event_type = 'view' GROUP BY user_id),
       s2 AS (SELECT e.user_id, MIN(e.ts_us) AS t
              FROM e JOIN s1 ON s1.user_id = e.user_id
              WHERE e.event_type = 'click' AND e.ts_us > s1.t
              GROUP BY e.user_id),
       s3 AS (SELECT e.user_id, MIN(e.ts_us) AS t
              FROM e JOIN s2 ON s2.user_id = e.user_id
              WHERE e.event_type = 'purchase' AND e.ts_us > s2.t
              GROUP BY e.user_id),
       r AS (
         SELECT 1 AS step, 'view' AS event_type, COUNT(*) AS n_users
         FROM s1
         UNION ALL SELECT 2, 'click', COUNT(*) FROM s2
         UNION ALL SELECT 3, 'purchase', COUNT(*) FROM s3)
       SELECT step, event_type, n_users,
         CAST(ROUND(CAST(
           CASE WHEN LAG(n_users) OVER (ORDER BY step) IS NULL
                THEN CAST(1.0 AS DOUBLE)
                WHEN LAG(n_users) OVER (ORDER BY step) = 0
                THEN CAST(0.0 AS DOUBLE)
                ELSE CAST(n_users AS DOUBLE) /
                     LAG(n_users) OVER (ORDER BY step) END
           AS DECIMAL(28,10)), 3) AS DOUBLE) AS conversion
       FROM r ORDER BY step"""

  /** [[evFunnelSparse]]'s oracle: the same chain over the filtered
    * event set — s2/s3 are empty relations, but the aggregate COUNT
    * rows (0) survive, mirroring the engine's step-list left join. */
  private val evFunnelSparseSql =
    """WITH e AS (
         SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
         WHERE event_type <> 'click'),
       s1 AS (SELECT user_id, MIN(ts_us) AS t FROM e
              WHERE event_type = 'view' GROUP BY user_id),
       s2 AS (SELECT e.user_id, MIN(e.ts_us) AS t
              FROM e JOIN s1 ON s1.user_id = e.user_id
              WHERE e.event_type = 'click' AND e.ts_us > s1.t
              GROUP BY e.user_id),
       s3 AS (SELECT e.user_id, MIN(e.ts_us) AS t
              FROM e JOIN s2 ON s2.user_id = e.user_id
              WHERE e.event_type = 'purchase' AND e.ts_us > s2.t
              GROUP BY e.user_id),
       r AS (
         SELECT 1 AS step, 'view' AS event_type, COUNT(*) AS n_users
         FROM s1
         UNION ALL SELECT 2, 'click', COUNT(*) FROM s2
         UNION ALL SELECT 3, 'purchase', COUNT(*) FROM s3)
       SELECT step, event_type, n_users,
         CAST(ROUND(CAST(
           CASE WHEN LAG(n_users) OVER (ORDER BY step) IS NULL
                THEN CAST(1.0 AS DOUBLE)
                WHEN LAG(n_users) OVER (ORDER BY step) = 0
                THEN CAST(0.0 AS DOUBLE)
                ELSE CAST(n_users AS DOUBLE) /
                     LAG(n_users) OVER (ORDER BY step) END
           AS DECIMAL(28,10)), 3) AS DOUBLE) AS conversion
       FROM r ORDER BY step"""

  /** Day-granularity cohort retention
    * ([[EventStream.cohortRetention]]): users cohorted by first
    * active day, activity counted per day offset — a pure integer
    * pipeline the oracle replays with epoch-day arithmetic. */
  def evRetention(s: SparkSession, dir: String): DataFrame =
    EventStream.cohortRetention(t(s, dir, "events"))
      .orderBy(col("cohort_day"), col("day_offset"))

  private val evRetentionSql =
    """WITH ud AS (
         SELECT DISTINCT user_id,
           CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
         FROM events),
       cohorts AS (SELECT user_id, MIN(day) AS cohort_day FROM ud
                   GROUP BY user_id),
       sizes AS (SELECT cohort_day, COUNT(*) AS cohort_users
                 FROM cohorts GROUP BY cohort_day),
       act AS (
         SELECT c.cohort_day, u.day - c.cohort_day AS day_offset,
           COUNT(*) AS n_active
         FROM ud u JOIN cohorts c ON c.user_id = u.user_id
         GROUP BY c.cohort_day, u.day - c.cohort_day)
       SELECT a.cohort_day, a.day_offset, a.n_active,
         CAST(ROUND(CAST(CAST(a.n_active AS DOUBLE) / s.cohort_users
           AS DECIMAL(28,10)), 3) AS DOUBLE) AS retention
       FROM act a JOIN sizes s ON s.cohort_day = a.cohort_day
       ORDER BY a.cohort_day, a.day_offset"""

  /** Feature-store projection ([[EventStream.userFeatures]]): per
    * user, counts, exact decimal-routed purchase value, first/last
    * seen, active days, distinct event types. */
  def evUserFeatures(s: SparkSession, dir: String): DataFrame =
    EventStream.userFeatures(t(s, dir, "events"))
      .orderBy(col("user_id"))

  private val evUserFeaturesSql =
    """WITH e AS (
         SELECT user_id, event_type, value,
           CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
         FROM events)
       SELECT user_id, COUNT(*) AS n_events,
         COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
           AS n_purchases,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE)
           AS purchase_value,
         MIN(ts_sec) AS first_seen, MAX(ts_sec) AS last_seen,
         COUNT(DISTINCT ts_sec // 86400) AS active_days,
         COUNT(DISTINCT event_type) AS n_event_types
       FROM e GROUP BY user_id ORDER BY user_id"""

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_funnel" -> (evFunnel _),
    "ev_funnel_sparse" -> (evFunnelSparse _),
    "ev_user_features" -> (evUserFeatures _),
    "ev_retention" -> (evRetention _),
    "ev_window" -> (evWindow _),
    "ev_sliding" -> (evSliding _),
    "ev_sessions" -> (evSessions _),
    "ev_session_native" -> (evSessionNative _),
    "ev_interval_join" -> (evIntervalJoin _),
    "ev_interval_left" -> (evIntervalLeft _),
    "ev_dedup" -> (evDedup _),
    "ev_enrich" -> (evEnrich _),
    "ev_json_props" -> (evJsonProps _),
    "ev_anomaly" -> (evAnomaly _))

  val oracle: Map[String, String] = Map(
    "ev_funnel" -> evFunnelSql,
    "ev_funnel_sparse" -> evFunnelSparseSql,
    "ev_user_features" -> evUserFeaturesSql,
    "ev_retention" -> evRetentionSql,
    "ev_window" -> evWindowSql,
    "ev_sliding" -> evSlidingSql,
    "ev_sessions" -> evSessionsSql,
    "ev_session_native" -> evSessionNativeSql,
    "ev_interval_join" -> evIntervalSql,
    "ev_interval_left" -> evIntervalLeftSql,
    "ev_dedup" -> evDedupSql,
    "ev_enrich" -> evEnrichSql,
    "ev_json_props" -> evJsonPropsSql,
    "ev_anomaly" -> evAnomalySql)
}
