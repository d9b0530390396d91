package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** One event after timestamp normalization (`ts_sec` is the
  * floor-seconds epoch regardless of the physical `ts` type — see
  * [[EventStream.tsSecCol]]). */
final case class NormalizedEvent(
    event_id: Long,
    user_id: Long,
    event_type: String,
    value: Double,
    ts_sec: Long)

final case class UserSessions(user_id: Long, n_sessions: Long,
    n_events: Long)

private final case class SessionState(lastTsSec: Long, sessions: Long,
    events: Long)

/** Structured Streaming surface of the engine.
  *
  * The reference has no streaming semantics (its async pipeline is
  * ingestion concurrency, SURVEY.md §2.9) — this module is the
  * beyond-parity event-processing layer: event-time tumbling windows
  * with watermarked late-data handling, and stateful sessionization via
  * `flatMapGroupsWithState`. Every transform takes a plain DataFrame,
  * so the same code runs in batch (oracle-verified: ev_* queries) and
  * under `readStream` (exercised with MemoryStream in StreamingSpec).
  */
object EventStream {

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

  /** The driver's `events.parquet` has shipped `ts` under different
    * physical contracts across dataset generations: TIMESTAMP(NANOS),
    * which Spark reads as a nanos **LongType** under
    * `spark.sql.legacy.parquet.nanosAsLong=true`, and plain
    * tz-less timestamp[us], which arrives as **TimestampNTZType**
    * (the legacy conf is inert there). Every event-time consumer
    * dispatches on the arriving type through these two helpers so all
    * contracts produce the same integer timeline; an unrecognized type
    * fails loudly with a pointed message instead of a scattered
    * DATATYPE_MISMATCH. NTZ values are interpreted in the session time
    * zone (pinned to UTC by every builder in this project), matching
    * the DuckDB oracle's `epoch()`, which reads naive timestamps
    * as-is. */
  private def unsupportedTs(dt: DataType): Nothing =
    throw new IllegalArgumentException(
      s"events.ts arrived as $dt — expected nanos LongType (TIMESTAMP(" +
        "NANOS) under nanosAsLong), TimestampType, or TimestampNTZType " +
        "(timestamp[us]). The driver's events.parquet physical type " +
        "changed again: extend EventStream.tsSecCol/tsMicrosCol for " +
        "the new contract.")

  /** Exact microseconds epoch column for `df.ts`, whatever its
    * physical type — the native precision of every contract's
    * comparable timeline (DuckDB coerces TIMESTAMP_NS to µs too). */
  def tsMicrosCol(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType => expr("ts div 1000") // integral div: no double rounding
    case TimestampType => expr("unix_micros(ts)")
    case TimestampNTZType =>
      expr("unix_micros(cast(ts as timestamp_ltz))")
    case other => unsupportedTs(other)
  }

  /** Floor-seconds epoch column for `df.ts`, whatever its physical
    * type. (All branches truncate toward zero; the corpus is entirely
    * post-epoch, so truncation == floor, matching the oracle's
    * `floor(epoch(ts))`.) */
  def tsSecCol(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType => expr("ts div 1000000000")
    case TimestampType => expr("unix_micros(ts) div 1000000")
    case TimestampNTZType =>
      expr("unix_micros(cast(ts as timestamp_ltz)) div 1000000")
    case other => unsupportedTs(other)
  }

  /** Raw ts → seconds-precision event-time column. */
  def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("event_ts", timestamp_seconds(tsSecCol(events)))

  /** Tumbling 5-minute event-time windows per event_type with a
    * 10-minute watermark: counts + exact value sums. Works identically
    * over a stream (append after watermark passes) and a batch frame. */
  def windowedAggregates(events: DataFrame): DataFrame =
    withEventTime(events)
      .withWatermark("event_ts", "10 minutes")
      .groupBy(window(col("event_ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double")
          .as("sum_value"))
      .select(col("window.start").cast("long").as("bucket_start"),
        col("event_type"), col("n_events"),
        round(col("sum_value").cast(
          org.apache.spark.sql.types.DecimalType(28, 10)), 2)
          .cast("double").as("sum_value"))

  /** Session gap: 30 minutes of user inactivity starts a new session. */
  val sessionGapSec: Long = 1800L

  /** Stateful sessionization: per-user session counting with
    * `flatMapGroupsWithState` (Update mode — emits the running
    * per-user totals each batch). State is one tiny record per user;
    * at scale this is the standard keyed-state pattern with state
    * store checkpointing. */
  def sessionize(events: Dataset[NormalizedEvent]): Dataset[UserSessions] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSessions](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[NormalizedEvent],
            state: GroupState[SessionState]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts_sec, e.event_id))
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          sorted.foreach { e =>
            val newSession = st.lastTsSec == Long.MinValue ||
              e.ts_sec - st.lastTsSec > sessionGapSec
            // clamp: a late event must not move the session clock
            // backwards (it would manufacture a spurious gap against
            // the next on-time event)
            st = SessionState(math.max(st.lastTsSec, e.ts_sec),
              st.sessions + (if (newSession) 1 else 0), st.events + 1)
          }
          if (sorted.nonEmpty) state.update(st)
          if (sorted.nonEmpty)
            Iterator(UserSessions(userId, st.sessions, st.events))
          else Iterator.empty
      }
  }

  /** Sessionization via Spark's native `session_window` — the
    * built-in merging-window primitive (works identically over a
    * watermarked stream, where state merges adjacent sessions).
    * Boundary semantics, pinned against the oracle by a real
    * exactly-equal gap in the sf0.1 events: an event at precisely the
    * current session's end (gap == duration) MERGES into it — a new
    * session requires a strictly greater gap, the same rule as the
    * lag-gap form. Output: one row per (user, session) with start,
    * end (last event + gap), and event count. */
  def sessionWindows(events: DataFrame,
      gap: String = "30 minutes"): DataFrame =
    sessionWindowsTimed(withEventTime(events), gap)

  /** [[sessionWindows]] over a frame already carrying `event_ts` —
    * the entry point for streams, where the caller's watermark on
    * `event_ts` must survive (re-deriving the column would drop it). */
  def sessionWindowsTimed(timed: DataFrame,
      gap: String = "30 minutes"): DataFrame =
    timed
      .groupBy(session_window(col("event_ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").cast("long").as("session_start"),
        col("session_window.end").cast("long").as("session_end"),
        col("n_events"))

  /** Batch sessionization — identical semantics to [[sessionize]],
    * expressed as windows (lag → gap flag → running sum), which is the
    * oracle-comparable form. */
  def sessionizeBatch(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts_sec"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts_sec") - col("prev_ts") > sessionGapSec, 1L)
          .otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("n_sessions"),
        count(lit(1)).as("n_events"))
  }

  /** Stream-stream interval join: each purchase paired with the same
    * user's clicks in the 30 minutes up to (and including) the
    * purchase. Both sides carry event-time watermarks and the join
    * condition bounds click_ts relative to purchase_ts, so state for
    * either side is dropped once the watermark passes the interval —
    * the canonical bounded-state stream-stream join. The same
    * transform runs in batch (ev_interval_join pins it against the
    * DuckDB oracle). */
  def purchaseClickJoin(events: DataFrame): DataFrame = {
    val base = withEventTime(events)
    val clicks = base.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"),
        col("event_id").as("click_id"), col("event_ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = base.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"),
        col("event_id").as("purchase_id"),
        col("event_ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 30 MINUTES") &&
        col("click_ts") <= col("purchase_ts"))
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("purchase_ts"), col("click_id"), col("click_ts"))
  }

  /** Left-outer variant of [[purchaseClickJoin]]: EVERY purchase is
    * emitted — paired with each same-user click in the preceding 30
    * minutes, or with NULL click columns when none exists (the
    * attribution-gap query: unattributed purchases are exactly the
    * click_id-NULL rows). Over a stream this is Spark's watermarked
    * stream-stream LEFT OUTER join: the null row for an unmatched
    * purchase is emitted once the watermark passes its join window,
    * and state stays bounded exactly as in the inner form. In batch
    * it is a plain left outer join — the oracle-comparable twin
    * (ev_interval_left). */
  def purchaseClickJoinOuter(events: DataFrame): DataFrame = {
    val base = withEventTime(events)
    val clicks = base.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"),
        col("event_id").as("click_id"), col("event_ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = base.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"),
        col("event_id").as("purchase_id"),
        col("event_ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 30 MINUTES") &&
        col("click_ts") <= col("purchase_ts"),
      "leftOuter")
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("purchase_ts"), col("click_id"), col("click_ts"))
  }

  /** Streaming exact deduplication on event_id:
    * dropDuplicatesWithinWatermark keeps per-key state only until the
    * watermark passes the key's event time, so the state store stays
    * bounded — the streaming counterpart of the batch dd_exact
    * operator (which can see the whole corpus at once). */
  def deduplicated(events: DataFrame,
      keys: Seq[String] = Seq("event_id")): DataFrame = {
    val timed = withEventTime(events)
    // dropDuplicatesWithinWatermark is a streaming-only operator (its
    // whole point is bounding the state store); the batch semantic
    // equivalent — one surviving row per key over the full input — is
    // plain dropDuplicates.
    if (events.isStreaming)
      timed.withWatermark("event_ts", "10 minutes")
        .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
    else timed.dropDuplicates(keys)
  }

  /** Stream-static enrichment join: the event stream joined to a
    * static dimension on user_id; left join preserves events with no
    * dimension row. The third stream-join class next to windowed aggs
    * and stream-stream joins — no watermark needed because the static
    * side never grows state.
    *
    * Deliberately NO broadcast hint (round-19): a user dimension at
    * production event scale is 10⁸-10⁹ rows — not a bounded relation —
    * and a forced hint turns a degradable stream-static join into a
    * hard broadcast failure. Catalyst picks the broadcast on its own
    * whenever the dim's size estimate is under the threshold
    * (PlanSpec pins that it still fires for a small dim), and
    * degrades to a shuffled join when it isn't — re-resolved per
    * micro-batch either way. */
  def enriched(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(userDim, Seq("user_id"), "left")

  /** Ordered funnel report: how many users complete each step of
    * `steps` IN ORDER — step i counts a user only if some step-i event
    * falls strictly after their earliest completion of step i−1
    * (earliest-completion semantics: the first time the prefix could
    * have completed, the standard unordered-window-free funnel
    * definition). Output one row per step: `(step, event_type,
    * n_users, conversion)` with conversion relative to the previous
    * step (1.0 for the first), microsecond event-time precision via
    * the schema-adaptive [[tsMicrosCol]]. Every configured step gets
    * a row even when no user reaches it — `n_users` 0, conversion 0.0
    * when the previous step is empty (the step list is left-joined
    * against the counts, so the report shape is a function of the
    * CONFIGURATION, not the data).
    *
    * Scale shape: one filtered keyed `min` aggregate + one
    * user_id-keyed join per step — every shuffle is keyed on user_id,
    * so after the first exchange the per-step frames stay co-located;
    * the final report is |steps| rows (the window over it is
    * trivial). Nothing collects: the counts are a relational
    * group-by over the unioned step frames. The per-step user frames
    * are EAGER localCheckpoints: each feeds the next step AND the
    * final report, and the lazy form does not dedupe consumers within
    * one action (each step would re-derive the whole prefix, an
    * O(steps²) events scan); the frames are user-cardinality-bounded
    * and shrink monotonically, so materializing them is the cheap
    * side of that trade. */
  def funnelReport(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnelReport: at least one step")
    val e = events.select(col("user_id"), col("event_type"),
      tsMicrosCol(events).as("ts_us"))
      .localCheckpoint(false) // scanned once per step
    var reached: List[(Int, String, DataFrame)] = Nil
    var prev: Option[DataFrame] = None
    steps.zipWithIndex.foreach { case (step, i) =>
      val mine = e.filter(col("event_type") === step)
      val cur = (prev match {
        case None => mine
        case Some(p) => mine.join(p.select(col("user_id"), col("t")),
          Seq("user_id")).filter(col("ts_us") > col("t"))
      }).groupBy(col("user_id")).agg(min(col("ts_us")).as("t"))
        .localCheckpoint() // eager: next step + report both consume it
      reached ::= ((i + 1, step, cur))
      prev = Some(cur)
    }
    val unioned = reached.reverse.map { case (i, step, f) =>
      f.select(lit(i).as("step"), lit(step).as("event_type"),
        col("user_id"))
    }.reduce(_ union _)
    val stepList = events.sparkSession
      .createDataFrame(steps.zipWithIndex.map { case (s, i) =>
        (i + 1, s)
      })
      .toDF("step", "event_type")
    val w = Window.orderBy(col("step"))
    stepList
      .join(unioned.groupBy(col("step"), col("event_type"))
          .agg(count(lit(1)).as("n_raw")),
        Seq("step", "event_type"), "left")
      .withColumn("n_users", coalesce(col("n_raw"), lit(0L)))
      .withColumn("conversion",
        when(lag(col("n_users"), 1).over(w).isNull,
          lit(1.0).cast("double"))
          .when(lag(col("n_users"), 1).over(w) === 0,
            lit(0.0).cast("double"))
          .otherwise(col("n_users").cast("double") /
            lag(col("n_users"), 1).over(w)))
      .select(col("step"), col("event_type"), col("n_users"),
        round(col("conversion").cast(DecimalType(28, 10)), 3)
          .cast("double").as("conversion"))
  }

  /** Day-granularity cohort retention: users cohorted by their first
    * active day, then counted per (cohort_day, day offset) they were
    * active again. The single most-asked engagement query over an
    * event log, and a pure integer pipeline — epoch-day arithmetic,
    * distinct user-days, exact count ratios.
    *
    * Scale shape: the user-day dedup and the cohort min are both
    * user_id-keyed aggregates (one exchange, reused); the matrix agg
    * is keyed on (cohort_day, offset) — tiny cardinality; cohort
    * sizes broadcast back onto it. Output `(cohort_day, day_offset,
    * n_active, retention)`, retention = n_active / cohort size. */
  def cohortRetention(events: DataFrame): DataFrame = {
    val userDays = events.select(col("user_id"),
      (tsSecCol(events) / 86400).cast("long").as("day"))
      .distinct()
      .localCheckpoint(false) // cohort min AND activity join
    val cohorts = userDays.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
      .localCheckpoint(false) // activity join AND cohort sizes
    val sizes = cohorts.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("cohort_users"))
    userDays.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_day"),
        (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), Seq("cohort_day"))
      .select(col("cohort_day"), col("day_offset"), col("n_active"),
        round((col("n_active").cast("double") / col("cohort_users"))
          .cast(DecimalType(28, 10)), 3).cast("double").as("retention"))
  }

  /** Per-user feature materialization — the feature-store projection
    * of the raw event log: activity counts, exact purchase value
    * (decimal-routed), first/last seen, active-day count, distinct
    * event types. One user_id-keyed aggregate with map-side partials
    * (the count-distincts expand to two-phase aggs on the same key),
    * which is the whole plan — this is the table a training pipeline
    * joins user features from, materialized once per day at scale.
    * Value sums route through DECIMAL(18,4) like
    * [[windowedAggregates]], so partial-combine order can't perturb
    * them. */
  def userFeatures(events: DataFrame): DataFrame = {
    val sec = tsSecCol(events)
    events
      .select(col("user_id"), col("event_type"), col("value"),
        sec.as("ts_sec"), (sec / 86400).cast("long").as("day"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        count(when(col("event_type") === "purchase", 1))
          .as("n_purchases"),
        sum(when(col("event_type") === "purchase",
          col("value").cast(DecimalType(18, 4)))).cast("double")
          .as("purchase_value"),
        min(col("ts_sec")).as("first_seen"),
        max(col("ts_sec")).as("last_seen"),
        countDistinct(col("day")).as("active_days"),
        countDistinct(col("event_type")).as("n_event_types"))
  }

  /** Schema-on-read over the semi-structured `props` JSON column:
    * `from_json` with an explicit typed schema (never schema
    * inference on a 100 TB column), then per-event-type parse
    * accounting + typed aggregates. Malformed JSON and absent keys
    * parse to NULL and are COUNTED (`n_events` − `n_parsed`), not
    * dropped or thrown — the tolerant-reader contract the XML ingest
    * tier established (a poison record must never kill a pipeline).
    * Scan-local parse, one keyed aggregation; all-integer output. */
  def propsJsonStats(events: DataFrame): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.IntegerType)))
    events
      .withColumn("p", from_json(col("props"), schema))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("p.k")).as("n_parsed"),
        sum(col("p.k")).as("sum_k"),
        min(col("p.k")).as("min_k"),
        max(col("p.k")).as("max_k"))
  }

  /** Robust anomaly detection over the daily event-volume series,
    * per event type: modified z-score (Iglewicz–Hoaglin,
    * 0.6745·(n−median)/MAD) with |z| > `threshold` flagged. Median
    * and MAD are EXACT interpolated percentiles, not approximations —
    * affordable because they run on the aggregated (type × day)
    * frame, never the raw events: the corpus-sized work is ONE
    * partial-aggregate count shuffle; everything after operates on
    * O(types × days) rows (eagerly checkpointed once, since three
    * consumers would otherwise re-run the corpus aggregation).
    * Degenerate series (MAD = 0: most days identical) fall back to
    * exact inequality — a deviating day is still anomalous, and z is
    * NULL rather than infinite. */
  def dailyAnomalies(events: DataFrame,
      threshold: Double = 3.5): DataFrame = {
    val sec = tsSecCol(events)
    val daily = events
      .select(col("event_type"), (sec / 86400).cast("long").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // tiny (types × days); 3 downstream consumers
    val med = daily.groupBy(col("event_type"))
      .agg(percentile(col("n"), lit(0.5)).as("med"))
    val dev = daily.join(broadcast(med), Seq("event_type"))
      .withColumn("adev", abs(col("n").cast("double") - col("med")))
    val mad = dev.groupBy(col("event_type"))
      .agg(percentile(col("adev"), lit(0.5)).as("mad"))
    val r6 = (c: Column) =>
      round(c.cast(DecimalType(28, 10)), 6).cast("double")
    val z = lit(0.6745) * (col("n").cast("double") - col("med")) /
      col("mad")
    dev.join(broadcast(mad), Seq("event_type"))
      .select(col("event_type"), col("day"), col("n"),
        r6(col("med")).as("med"), r6(col("mad")).as("mad"),
        when(col("mad") === 0.0, lit(null).cast("double"))
          .otherwise(r6(z)).as("z_score"),
        when(col("mad") === 0.0,
          col("n").cast("double") =!= col("med"))
          .otherwise(abs(z) > threshold).as("is_anomaly"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Normalize the raw events frame (either ts contract) into
    * [[NormalizedEvent]]s. */
  def normalize(events: DataFrame): Dataset[NormalizedEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_id"), col("user_id"), col("event_type"),
      col("value"), tsSecCol(events).as("ts_sec"))
      .as[NormalizedEvent]
  }
}
