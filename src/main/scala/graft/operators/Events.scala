package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Usage-stream analytics (trackUsage at scale): sessionization and
  * tumbling-window rollups over the `events` table. The streaming module
  * (graft.streaming) runs the same logic on an unbounded source; these
  * batch forms are the oracle-checkable equivalents.
  *
  * Timestamps are compared as exact epoch-microsecond longs — no float
  * seconds, no truncation mismatches across engines.
  */
object Events {

  val SessionGapUs: Long = 30L * 60 * 1000 * 1000 // 30 min

  /** e1: gap-based sessionization per user: a new session starts when the
    * gap since the previous event exceeds 30 min; one shuffle on user_id
    * serves both window passes. */
  def e1Sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir).select("event_id", "ts", "user_id", "value")
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("new_session",
        when(col("us") - lag(col("us"), 1).over(byUser) > SessionGapUs, 1)
          .when(lag(col("us"), 1).over(byUser).isNull, 1).otherwise(0))
      .withColumn("session_seq", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_events"),
           min(col("us")).as("start_us"),
           max(col("us")).as("end_us"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy("user_id", "session_seq")
  }

  val e1Sql: String =
    """WITH e AS (
      | SELECT event_id, user_id, value, epoch_us(ts) AS us FROM events),
      |flagged AS (
      | SELECT *, CASE
      |    WHEN us - lag(us) OVER w > 1800000000 THEN 1
      |    WHEN lag(us) OVER w IS NULL THEN 1
      |    ELSE 0 END AS new_session
      | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |sessions AS (
      | SELECT *, cast(sum(new_session) OVER (
      |    PARTITION BY user_id ORDER BY us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bigint) AS session_seq
      | FROM flagged)
      |SELECT user_id, session_seq, count(*) AS n_events,
      | min(us) AS start_us, max(us) AS end_us,
      | cast(sum(cast(value AS decimal(18,2))) AS double) AS total_value
      |FROM sessions GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin

  /** e2: hourly tumbling-window rollup per event type. */
  def e2TumblingWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select("ts", "event_type", "value")
      .groupBy(unix_micros(date_trunc("hour", col("ts"))).as("hour_us"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy("hour_us", "event_type")

  val e2Sql: String =
    """SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
      | count(*) AS cnt,
      | cast(sum(cast(value AS decimal(18,2))) AS double) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY hour_us, event_type""".stripMargin

  /** e3: ordered three-step funnel (signup → first click strictly after
    * it → first purchase strictly after that click), counting users that
    * reach each stage.
    *
    * Single-scan, single-shuffle formulation: running-min windows over
    * (user_id, ts) mark, per row, the earliest signup so far and the
    * earliest qualifying click so far — a click qualifies iff a signup
    * precedes it, a purchase iff a qualifying click precedes it. The
    * per-user stage times then reduce with plain min aggregates that
    * REUSE the window's hash partitioning on user_id (one exchange
    * total). Equivalent to the oracle's three dependent
    * aggregate-join passes, which would scan the fact three times.
    *
    * user_id is a HIGH-cardinality window key — this is not the q15
    * low-cardinality window shape; at 100 TB the window sort is
    * per-user-slice-sized. */
  def e3Funnel(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir).select("event_id", "ts", "user_id", "event_type")
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("t1_run", min(when(col("event_type") === "signup", col("us"))).over(w))
      .withColumn("click_ok",
        when(col("event_type") === "click" && col("us") > col("t1_run"), col("us")))
      .withColumn("t2_run", min(col("click_ok")).over(w))
      .withColumn("purchase_ok",
        when(col("event_type") === "purchase" && col("us") > col("t2_run"), col("us")))
      .groupBy("user_id")
      .agg(min(when(col("event_type") === "signup", col("us"))).as("t1"),
           min(col("click_ok")).as("t2"),
           min(col("purchase_ok")).as("t3"))
      .agg(count(col("t1")).as("n_signup"),
           count(col("t2")).as("n_click_after_signup"),
           count(col("t3")).as("n_purchase_after_click"))
  }

  val PathTopK = 20

  /** e5: top session PATHS — the most frequent 3-step event sequences
    * inside a session (the "user journey" mining behind product
    * dashboards; the reference's conversation flows are this shape at
    * usage-tracking scale).
    *
    * Builds on e1's session assignment, then takes lead(type,1/2) within
    * (user, session) order and counts complete trigrams. ONE exchange
    * total on user_id: the session windows hash-partition by user_id,
    * and the (user_id, session_seq) lead window is clustering-satisfied
    * by that same partitioning (same-user rows are already colocated),
    * so Spark inserts only a sort. The trigram count is a
    * map-side-combined group on the path string (path-vocabulary-bound)
    * and the global top-K collapses to TakeOrderedAndProject.
    *
    * `concat` (not concat_ws) on purpose: a lead past the session end is
    * NULL and must null out the whole path — matching SQL `||`. */
  def e5EventPaths(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val bySession = Window.partitionBy("user_id", "session_seq")
      .orderBy(col("us"), col("event_id"))
    Tables.events(s, dir).select("event_id", "ts", "user_id", "event_type")
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("new_session",
        when(col("us") - lag(col("us"), 1).over(byUser) > SessionGapUs, 1)
          .when(lag(col("us"), 1).over(byUser).isNull, 1).otherwise(0))
      .withColumn("session_seq", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("path",
        concat(col("event_type"), lit(">"),
          lead(col("event_type"), 1).over(bySession), lit(">"),
          lead(col("event_type"), 2).over(bySession)))
      .filter(col("path").isNotNull)
      .groupBy("path").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("path").asc)
      .limit(PathTopK)
  }

  val e5Sql: String =
    s"""WITH e AS (
       | SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events),
       |flagged AS (
       | SELECT *, CASE
       |    WHEN us - lag(us) OVER w > 1800000000 THEN 1
       |    WHEN lag(us) OVER w IS NULL THEN 1
       |    ELSE 0 END AS new_session
       | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
       |sessions AS (
       | SELECT *, cast(sum(new_session) OVER (
       |    PARTITION BY user_id ORDER BY us, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bigint) AS session_seq
       | FROM flagged),
       |paths AS (
       | SELECT event_type || '>' || lead(event_type, 1) OVER sw
       |     || '>' || lead(event_type, 2) OVER sw AS path
       | FROM sessions
       | WINDOW sw AS (PARTITION BY user_id, session_seq ORDER BY us, event_id))
       |SELECT path, count(*) AS cnt FROM paths WHERE path IS NOT NULL
       |GROUP BY path ORDER BY cnt DESC, path ASC LIMIT $PathTopK""".stripMargin

  val WeekUs: Long = 7L * 24 * 3600 * 1000 * 1000

  /** e4: weekly cohort retention — the usage-dashboard shape behind the
    * reference's per-month trackUsage rollups (trackUsageController.js
    * groups activity by calendar period per user; retention is the same
    * rollup keyed by the user's FIRST-activity period).
    *
    * cohort_week = first_event_us DIV week and week_offset =
    * event_us DIV week - cohort_week are exact LONG integer division
    * (timestamps are positive) — no double rounding, no calendar
    * truncation that could disagree across engines.
    *
    * Single scan: the first-event time comes from a running-min window
    * over (user_id, ts) — user_id is high-cardinality, so the window
    * sort is per-user-slice-sized (the e3 shape, not the q15 anti-shape)
    * — and the (cohort, offset) distinct-user count is Spark's standard
    * two-phase distinct aggregate, group-count-bound. The oracle spells
    * the same result as a firsts-aggregate + self-join (two scans). */
  def e4Retention(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    Tables.events(s, dir).select("user_id", "ts")
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("first_us", min(col("us")).over(w))
      .withColumn("cohort_week", expr(s"first_us DIV $WeekUs"))
      .withColumn("week_offset", expr(s"us DIV $WeekUs") - col("cohort_week"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  val e4Sql: String =
    s"""WITH e AS (
       | SELECT user_id, epoch_us(ts) AS us FROM events),
       |firsts AS (
       | SELECT user_id, min(us) // $WeekUs AS cohort_week
       | FROM e GROUP BY user_id)
       |SELECT cohort_week,
       | us // $WeekUs - cohort_week AS week_offset,
       | count(DISTINCT e.user_id) AS n_users
       |FROM e JOIN firsts ON e.user_id = firsts.user_id
       |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin

  /** e6: day-over-day spike detection per event type — the ops-alerting
    * shape over usage tracking (a 1.5× jump vs the previous calendar
    * day flags the day). Integer test `c*10 > c_prev*15`, so no float
    * threshold crosses engines.
    *
    * Scale shape: ONE group-count-bound aggregation reduces the corpus
    * to (type × day) rows; the previous-day comparison then runs on
    * that tiny table as a broadcast self-join keyed on the EXACT
    * calendar predecessor (day − 1). Deliberately not a LAG window over
    * the raw events (the q15 anti-shape: 5-value partition key), and
    * not lag-over-present-days either — a missing day yields c_prev
    * NULL, not a comparison against last week. */
  def e6SpikeDays(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.events(s, dir)
      .select(col("event_type"), col("ts").cast("date").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("c"))
    val prev = d.select(col("event_type").as("et_p"), col("day").as("day_p"),
      col("c").as("c_prev"))
    d.join(broadcast(prev),
        col("event_type") === col("et_p") && col("day") === date_add(col("day_p"), 1),
        "left")
      .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("c"), col("c_prev"),
        when(col("c_prev").isNotNull && col("c") * 10 > col("c_prev") * 15, 1)
          .otherwise(0).as("spike"))
      .orderBy("event_type", "day")
  }

  val e6Sql: String =
    """WITH d AS (
      | SELECT event_type, cast(ts AS date) AS day, count(*) AS c
      | FROM events GROUP BY 1, 2)
      |SELECT a.event_type, strftime(a.day, '%Y-%m-%d') AS day, a.c, b.c AS c_prev,
      | CASE WHEN b.c IS NOT NULL AND a.c * 10 > b.c * 15 THEN 1 ELSE 0 END AS spike
      |FROM d a LEFT JOIN d b
      |  ON a.event_type = b.event_type AND a.day = b.day + 1
      |ORDER BY a.event_type, day""".stripMargin

  /** e7: trailing-7-day active users per day (WAU) — the engagement
    * dashboard metric. The naive formulation is a RANGE join (every day
    * × every user-day within 6 days — quadratic in days and unindexable
    * in a shuffle engine); instead each DISTINCT (user, day) pair
    * explodes into the ≤7 target days it contributes to, and a
    * two-phase distinct count per target day finishes it.
    *
    * Scale: the corpus reduces to user-day pairs first (one distinct
    * shuffle, activity-bound not event-bound); the ×7 explode is
    * bounded by the window width; the observed-days list broadcasts
    * (calendar-bound). No range join, no window over a date key. */
  def e7Wau(s: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(s, dir)
      .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
    val days = ud.select(col("day").as("tday")).distinct()
    ud.select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), 6))).as("tday"))
      .join(broadcast(days), Seq("tday"))
      .groupBy("tday").agg(countDistinct(col("user_id")).as("wau"))
      .select(date_format(col("tday"), "yyyy-MM-dd").as("day"), col("wau"))
      .orderBy("day")
  }

  val e7Sql: String =
    """WITH ud AS (
      | SELECT DISTINCT user_id, cast(ts AS date) AS day FROM events),
      |days AS (SELECT DISTINCT day FROM ud)
      |SELECT strftime(d.day, '%Y-%m-%d') AS day, count(DISTINCT u.user_id) AS wau
      |FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
      |GROUP BY d.day ORDER BY day""".stripMargin

  /** Debounce interval: events of the same (user, type) closer than this
    * are counted as bounces, not fresh events. */
  val DebounceUs: Long = 300L * 1000 * 1000

  /** e8: recency-window event dedup ("debounce") — an event survives only
    * if the SAME user's previous event of the SAME type is more than 5
    * minutes older (double-click / retry suppression, the ingest-side
    * twin of d9's content dedup). One shuffle on the HIGH-cardinality
    * (user_id, event_type) composite key — per-slice sort is a user's
    * per-type history, never the corpus — then a group-count-bound
    * rollup of kept vs total per type. */
  def e8Debounce(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("kept",
        col("prev_us").isNull || col("us") - col("prev_us") > DebounceUs)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
      .orderBy("event_type")
  }

  val e8Sql: String =
    s"""WITH e AS (
       | SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events),
       |flagged AS (
       | SELECT event_type,
       |  CASE WHEN lag(us) OVER (PARTITION BY user_id, event_type ORDER BY us, event_id) IS NULL
       |        OR us - lag(us) OVER (PARTITION BY user_id, event_type ORDER BY us, event_id) > $DebounceUs
       |   THEN 1 ELSE 0 END AS kept
       | FROM e)
       |SELECT event_type, count(*) AS n_events,
       | cast(sum(kept) AS bigint) AS n_kept
       |FROM flagged GROUP BY event_type ORDER BY event_type""".stripMargin

  val e3Sql: String =
    """WITH e AS (
      | SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events),
      |s1 AS (
      | SELECT user_id, min(CASE WHEN event_type = 'signup' THEN us END) AS t1
      | FROM e GROUP BY user_id),
      |s2 AS (
      | SELECT e.user_id, min(us) AS t2
      | FROM e JOIN s1 ON e.user_id = s1.user_id
      | WHERE event_type = 'click' AND us > t1 GROUP BY e.user_id),
      |s3 AS (
      | SELECT e.user_id, min(us) AS t3
      | FROM e JOIN s2 ON e.user_id = s2.user_id
      | WHERE event_type = 'purchase' AND us > t2 GROUP BY e.user_id)
      |SELECT count(t1) AS n_signup,
      | count(t2) AS n_click_after_signup,
      | count(t3) AS n_purchase_after_click
      |FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
      |        LEFT JOIN s3 ON s1.user_id = s3.user_id""".stripMargin

  /** Days of inactivity after which a user counts as churned. */
  val ChurnDays = 14L

  /** e9: churn / inactivity screen — per-user last-activity day vs the
    * corpus's latest day (the "inactive tenants" report; the reference's
    * soft-delete sweep over stale users is this predicate).
    *
    * Scale: last-activity is ONE map-side-combined max per user
    * (group-count-bound shuffle); the corpus max is a second agg over
    * that already-bound output, broadcast back as one row. Day
    * arithmetic is integer (epoch-micros DIV day) so no date type or
    * timezone crosses the engine boundary. */
  def e9Churn(s: SparkSession, dir: String): DataFrame = {
    val DayUs = 86400000000L
    val per = Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .groupBy("user_id")
      .agg(max(col("us")).as("last_us"), count(lit(1)).as("n_events"))
      .withColumn("last_day", expr(s"last_us DIV $DayUs"))
    // corpus max DIRECTLY from the scan (floor is monotone, so the global
    // max day equals the max of per-user last days). Deriving it from
    // `per` instead re-plans that whole subtree: column pruning strips
    // n_events from the second branch, the two aggregates stop being
    // canonically equal, exchange reuse is defeated, and the fact table
    // pays a SECOND user-keyed shuffle just to take a one-row max
    // (plan-asserted in ScaleShapeSpec). This branch is a map-combined
    // one-row-per-partition max into a single-partition exchange.
    val tot = Tables.events(s, dir)
      .select(unix_micros(col("ts")).as("us"))
      .agg(expr(s"max(us) DIV $DayUs").as("corpus_day"))
    per.crossJoin(broadcast(tot))
      .select(col("user_id"), col("n_events"),
        col("last_day"),
        (col("corpus_day") - col("last_day")).as("days_inactive"),
        (col("corpus_day") - col("last_day") >= ChurnDays).as("churned"))
      .orderBy("user_id")
  }

  val e9Sql: String =
    s"""WITH per AS (
       | SELECT user_id, count(*) AS n_events,
       |  max(epoch_us(ts)) // 86400000000 AS last_day
       | FROM events GROUP BY user_id),
       |tot AS (SELECT max(last_day) AS corpus_day FROM per)
       |SELECT user_id, n_events, cast(last_day AS bigint) AS last_day,
       | cast(corpus_day - last_day AS bigint) AS days_inactive,
       | corpus_day - last_day >= $ChurnDays AS churned
       |FROM per CROSS JOIN tot
       |ORDER BY user_id""".stripMargin

  /** e11: inter-event GAP percentiles per event type — the
    * re-engagement-latency distribution (how long until the same user
    * fires the same event again): gap = time since the user's previous
    * event of the same type, then EXACT rank-based p50/p95 per type via
    * the q15 two-pass quantile machinery. The debounce interval (e8),
    * session gap (e1), and churn threshold (e9) are all tuned off this
    * distribution — it closes the loop on those operators' constants.
    *
    * Scale: the lag window runs on the HIGH-cardinality (user, type)
    * composite key (per-user-per-type history slices — the e8 shape);
    * the quantile passes are histogram-bucket- and group-count-bound
    * (see Quantiles.exactGroupedQuantiles), never a per-type global
    * sort. Gaps are exact micros cast to double (< 2^53, lossless). */
  def e11GapPercentiles(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    val gaps = Tables.events(s, dir)
      .select(col("event_type"), col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("gap", (col("us") - lag(col("us"), 1).over(w)).cast("double"))
      .filter(col("gap").isNotNull)
      .select("event_type", "gap")
    Quantiles.exactGroupedQuantiles(gaps, key = "event_type", value = "gap",
        probs = Seq("p50" -> 0.5, "p95" -> 0.95))
      .groupBy("event_type")
      .agg(max(when(col("which") === "p50", col("v"))).as("p50_gap_us"),
           max(when(col("which") === "p95", col("v"))).as("p95_gap_us"),
           max(col("n_events")).as("n_gaps"))
      .orderBy("event_type")
  }

  val e11Sql: String =
    """WITH g AS (
      | SELECT event_type,
      |  cast(us - lag(us) OVER (PARTITION BY user_id, event_type
      |                          ORDER BY us, event_id) AS double) AS gap
      | FROM (SELECT event_type, user_id, event_id, epoch_us(ts) AS us FROM events)),
      |v AS (
      | SELECT event_type, gap,
      |  row_number() OVER (PARTITION BY event_type ORDER BY gap) AS rn,
      |  count(*) OVER (PARTITION BY event_type) AS n
      | FROM g WHERE gap IS NOT NULL)
      |SELECT event_type,
      | max(CASE WHEN rn = cast(ceil(0.5 * n) AS bigint) THEN gap END) AS p50_gap_us,
      | max(CASE WHEN rn = cast(ceil(0.95 * n) AS bigint) THEN gap END) AS p95_gap_us,
      | count(*) AS n_gaps
      |FROM v GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Trailing-window length for e10's baseline statistics. */
  val ZWin = 7

  /** z-score threshold in milli-units (3.0 σ). */
  val ZThreshMilli = 3000L

  /** e10: trailing z-score anomaly detection per event type — e6's
    * fixed-ratio day-over-day alert generalized to a SELF-CALIBRATING
    * one: each (type, day) count is scored against the mean/stddev of
    * that type's previous [[ZWin]] observed days, and |z| ≥ 3σ flags the
    * day. The rolling baseline adapts per type (a chatty event type
    * needs a bigger absolute jump to alarm than a quiet one), which is
    * why ops alerting uses z-scores rather than e6's global 1.5× ratio.
    *
    * Determinism contract: the window accumulates INTEGER sums (Σc,
    * Σc²), so frame-order never matters; the z-score is computed in one
    * algebraic shot, z = (n·c − Σc) / √(n·Σc² − (Σc)²), with exactly one
    * IEEE multiply-divide-sqrt chain and one floor into milli-units
    * (the t12 score_micro rule). A zero variance window yields NULL.
    *
    * Scale shape: ONE group-count-bound aggregation reduces the corpus
    * to (type × day) rows; the window then runs over that TINY table —
    * its low-cardinality partition key (event_type) is harmless there,
    * unlike the q15 anti-shape of windowing the raw events. ROWS frame
    * (last 7 observed days), so a silent day doesn't stall the baseline. */
  def e10AnomalyDays(s: SparkSession, dir: String): DataFrame = {
    // day = fixed-UTC epoch-day arithmetic, NOT ts.cast("date"): the cast
    // resolves through the session time zone, while the streaming twin
    // (EventStreams.anomalyAlerts) buckets by unix_micros div 86400e6 —
    // deriving both from the same epoch arithmetic makes the documented
    // batch/stream bit-equality structural instead of
    // true-only-when-the-session-happens-to-run-UTC
    val d = Tables.events(s, dir)
      .select(col("event_type"),
        expr("date_from_unix_date(cast(unix_micros(ts) div 86400000000 as int))").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-ZWin, -1)
    // c² is materialized BEFORE the window so all three accumulators are
    // plain column refs over one frame — a single Window node (sum(c*c)
    // inline would force ExtractWindowExpressions to split the Window in
    // two around the product's projection)
    d.withColumn("c2", col("c") * col("c"))
      .withColumn("n", count(col("c")).over(w))
      .withColumn("s1", sum(col("c")).over(w))
      .withColumn("s2", sum(col("c2")).over(w))
      .filter(col("n") === ZWin)
      .withColumn("z_milli",
        when(col("n") * col("s2") === col("s1") * col("s1"), lit(null))
          .otherwise(floor(lit(1000.0) * (col("n") * col("c") - col("s1")) /
            sqrt((col("n") * col("s2") - col("s1") * col("s1")).cast("double")))))
      .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("c"), col("z_milli"),
        coalesce(abs(col("z_milli")) >= ZThreshMilli, lit(false)).as("anomaly"))
      .orderBy("event_type", "day")
  }

  val e10Sql: String =
    s"""WITH d AS (
       | SELECT event_type, cast(ts AS date) AS day, count(*) AS c
       | FROM events GROUP BY 1, 2),
       |win AS (
       | SELECT event_type, day, c,
       |  count(c) OVER w AS n, sum(c) OVER w AS s1, sum(c * c) OVER w AS s2
       | FROM d
       | WINDOW w AS (PARTITION BY event_type ORDER BY day
       |              ROWS BETWEEN $ZWin PRECEDING AND 1 PRECEDING)),
       |scored AS (
       | SELECT event_type, day, c,
       |  CASE WHEN n * s2 = s1 * s1 THEN NULL
       |       ELSE cast(floor(1000.0 * (n * c - s1) /
       |                       sqrt(cast(n * s2 - s1 * s1 AS double))) AS bigint)
       |  END AS z_milli
       | FROM win WHERE n = $ZWin)
       |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, c, z_milli,
       | coalesce(abs(z_milli) >= $ZThreshMilli, false) AS anomaly
       |FROM scored ORDER BY event_type, day""".stripMargin

  // ---- e12: first-order event-transition model ----

  /** e12: the EVENT-TYPE TRANSITION MATRIX — the first-order Markov
    * model of user journeys (e5 mines the top-k 3-step paths; this is
    * the full P(next | current) table the paths are drawn from — what a
    * product-analytics tier renders as the flow/sankey diagram, and the
    * model behind next-action prediction baselines). For every pair of
    * CONSECUTIVE events of one user: (from_type, to_type) count and the
    * conditional probability in exact integer ppm.
    *
    * Shape (the e8/e11 family rule): ONE lead() window over the
    * HIGH-cardinality user_id — slices are per-user histories, never a
    * low-cardinality sort — then a (types²)-bound pair aggregate; the
    * per-from totals are a ≤|types|-row broadcast back onto the pair
    * frame. At 100 TB everything after the one user-keyed exchange is
    * KB-scale. */
  def e12MarkovTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val pairs = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val fromTot = pairs.groupBy("from_type").agg(sum(col("n")).as("tot"))
    pairs.join(broadcast(fromTot), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("n * 1000000 div tot").as("p_ppm"))
      .orderBy("from_type", "to_type")
  }

  val e12Sql: String =
    """WITH e AS (
      | SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events),
      |nxt AS (
      | SELECT event_type AS from_type,
      |  lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS to_type
      | FROM e),
      |pairs AS (
      | SELECT from_type, to_type, count(*) AS n
      | FROM nxt WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
      |tot AS (SELECT from_type, sum(n) AS tot FROM pairs GROUP BY from_type)
      |SELECT p.from_type, p.to_type, cast(p.n AS bigint) AS n,
      | cast(p.n * 1000000 // t.tot AS bigint) AS p_ppm
      |FROM pairs p JOIN tot t ON p.from_type = t.from_type
      |ORDER BY p.from_type, p.to_type""".stripMargin

  // ---- e13: purchase attribution (first-touch vs last-touch) ----

  /** e13: ATTRIBUTION — each purchase's exact cents credited to the
    * touch CHANNEL (the event_type of a non-purchase event by the same
    * user strictly before it) under the two classic models side by
    * side: FIRST-touch (the channel that acquired the user) and
    * LAST-touch (the channel that converted them); a purchase with no
    * prior touch credits 'direct'. The marketing-spend report every
    * usage ledger grows into — and the journey twin of e12's
    * transition matrix (e12 says where users GO, e13 says what their
    * purchases were WORTH by where they came from).
    *
    * Determinism: event order is (ts, event_id) — the e11 tiebreak;
    * money is exact integer cents (decimal cast before scaling).
    *
    * Scale: ONE user-keyed window pass computes both models (two
    * IGNORE-NULLS frames over the same sort — Spark plans them in one
    * exchange+sort, plan-asserted); everything after is channel-bound
    * map-combined aggregation. The window partition key is
    * high-cardinality user_id — the e1/q41 shape, never a 5-row key. */
  def e13Attribution(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type") =!= "purchase", col("event_type"))
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"),
        (dec(col("value")) * 100).cast("long").as("cents"))
      // both models in ONE select => one Window node, one sort
      .select(col("event_type"), col("cents"),
        first(touch, ignoreNulls = true).over(w).as("ft"),
        last(touch, ignoreNulls = true).over(w).as("lt"))
      .filter(col("event_type") === "purchase")
      .select(col("cents"),
        coalesce(col("ft"), lit("direct")).as("ft"),
        coalesce(col("lt"), lit("direct")).as("lt"))
    val models = e.select(explode(array(
        struct(lit("first_touch").as("model"), col("ft").as("channel"), col("cents")),
        struct(lit("last_touch").as("model"), col("lt").as("channel"), col("cents"))))
        .as("t"))
      .select("t.model", "t.channel", "t.cents")
    models.groupBy("model", "channel")
      .agg(count(lit(1)).as("n_purchases"), sum("cents").as("attributed_cents"))
      .orderBy("model", "channel")
  }

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  val e13Sql: String =
    """WITH e AS (
      | SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
      |  cast(cast(value AS decimal(18,2)) * 100 AS bigint) AS cents
      | FROM events),
      |tch AS (
      | SELECT event_type, cents,
      |  first_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      |   OVER (PARTITION BY user_id ORDER BY us, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ft,
      |  last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      |   OVER (PARTITION BY user_id ORDER BY us, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
      | FROM e),
      |p AS (
      | SELECT coalesce(ft, 'direct') AS ft, coalesce(lt, 'direct') AS lt, cents
      | FROM tch WHERE event_type = 'purchase'),
      |m AS (
      | SELECT 'first_touch' AS model, ft AS channel, cents FROM p
      | UNION ALL SELECT 'last_touch', lt, cents FROM p)
      |SELECT model, channel, count(*) AS n_purchases,
      | cast(sum(cents) AS bigint) AS attributed_cents
      |FROM m GROUP BY model, channel
      |ORDER BY model, channel""".stripMargin

  /** e15: GROWTH ACCOUNTING — the weekly new / retained / resurrected /
    * churned user ledger (the growth-team standard that decomposes
    * every active-user curve; e4 follows cohorts forward, e9 takes one
    * churn snapshot — this is the week-over-week flow statement).
    * Definitions, all exact integer week arithmetic (the e4 DIV rule):
    * a user's week is active; NEW = first active week; RETAINED =
    * active in the immediately previous week; RESURRECTED = active
    * before but not last week; CHURNED(w) = active in w−1, not in w
    * (attributed to w, reported through the corpus's last week).
    *
    * Plan: the corpus reduces ONCE to distinct (user, week) pairs
    * (two-phase distinct, user-week-bound); lag and lead share ONE
    * window over HIGH-cardinality user_id (same partition, same order —
    * one sort); classification is row-local; activity and churn rollups
    * are week-bound and meet in a |weeks|-bound full-outer join gated
    * by the one-row corpus max week. Nothing event-sized is windowed
    * twice. */
  def e15GrowthAccounting(s: SparkSession, dir: String): DataFrame = {
    val uw = Tables.events(s, dir).select("user_id", "ts")
      .select(col("user_id"), expr(s"unix_micros(ts) DIV $WeekUs").as("wk"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("wk")
    val stepped = uw
      .withColumn("prev", lag(col("wk"), 1).over(w))
      .withColumn("next", lead(col("wk"), 1).over(w))
    val activity = stepped.groupBy("wk").agg(
      sum(when(col("prev").isNull, 1L).otherwise(0L)).as("n_new"),
      sum(when(col("prev") === col("wk") - 1, 1L).otherwise(0L)).as("n_retained"),
      sum(when(col("prev").isNotNull && col("prev") < col("wk") - 1, 1L)
        .otherwise(0L)).as("n_resurrected"))
    val churn = stepped
      .filter(col("next").isNull || col("next") > col("wk") + 1)
      .select((col("wk") + 1).as("wk"))
      .groupBy("wk").agg(count(lit(1)).as("n_churned"))
    val maxWk = uw.agg(max("wk").as("max_wk"))
    activity.join(churn, Seq("wk"), "full_outer")
      .na.fill(0L, Seq("n_new", "n_retained", "n_resurrected", "n_churned"))
      .crossJoin(broadcast(maxWk))
      .filter(col("wk") <= col("max_wk"))
      .select(col("wk"), col("n_new"), col("n_retained"),
        col("n_resurrected"), col("n_churned"),
        (col("n_new") + col("n_retained") + col("n_resurrected")).as("n_active"))
      .orderBy("wk")
  }

  val e15Sql: String =
    s"""WITH uw AS (
       | SELECT DISTINCT user_id, epoch_us(ts) // $WeekUs AS wk FROM events),
       |st AS (
       | SELECT user_id, wk,
       |  lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev,
       |  lead(wk) OVER (PARTITION BY user_id ORDER BY wk) AS next
       | FROM uw),
       |act AS (
       | SELECT wk,
       |  sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS n_new,
       |  sum(CASE WHEN prev = wk - 1 THEN 1 ELSE 0 END) AS n_retained,
       |  sum(CASE WHEN prev IS NOT NULL AND prev < wk - 1 THEN 1 ELSE 0 END) AS n_resurrected
       | FROM st GROUP BY wk),
       |ch AS (
       | SELECT wk + 1 AS wk, count(*) AS n_churned
       | FROM st WHERE next IS NULL OR next > wk + 1 GROUP BY 1),
       |mx AS (SELECT max(wk) AS max_wk FROM uw)
       |SELECT coalesce(act.wk, ch.wk) AS wk,
       | cast(coalesce(n_new, 0) AS bigint) AS n_new,
       | cast(coalesce(n_retained, 0) AS bigint) AS n_retained,
       | cast(coalesce(n_resurrected, 0) AS bigint) AS n_resurrected,
       | cast(coalesce(n_churned, 0) AS bigint) AS n_churned,
       | cast(coalesce(n_new, 0) + coalesce(n_retained, 0)
       |   + coalesce(n_resurrected, 0) AS bigint) AS n_active
       |FROM act FULL OUTER JOIN ch ON act.wk = ch.wk, mx
       |WHERE coalesce(act.wk, ch.wk) <= max_wk
       |ORDER BY wk""".stripMargin

  /** e14: calendar GAP-FILL + trailing window — the resample step every
    * time-series dashboard and anomaly detector needs before trusting a
    * daily curve (a day with zero events must appear as 0, not vanish:
    * e6's day-over-day and e10's z-scores silently skip missing days;
    * this operator manufactures the dense calendar they'd need at
    * serving time). Per event_type and calendar day over the corpus's
    * [min, max] span: the observed count (0 on gap days) and the
    * trailing-7-day sum.
    *
    * Plan: the corpus reduces ONCE to the (day, type)-bound daily
    * frame (map-combined); the calendar is generated from a one-row
    * min/max aggregate via sequence+explode and cross-joined with the
    * |types|-bound distinct — the dense grid is (days × types), a
    * metadata-sized frame at any corpus size; the gap-fill LEFT join
    * and the trailing window run on that TINY grid (the e10 rule:
    * window the cell table, never the fact table — broadcast-joined
    * under AQE). Nothing corpus-sized is windowed, exploded, or
    * broadcast. */
  def e14Gapfill(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("ts").cast("date").as("day"), col("event_type"))
    val daily = ev.groupBy("day", "event_type").agg(count(lit(1)).as("n"))
    val calendar = ev.agg(min("day").as("d0"), max("day").as("d1"))
      .select(explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val types = ev.select("event_type").distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    calendar.crossJoin(types)
      .join(daily, Seq("day", "event_type"), "left")
      .na.fill(0L, Seq("n"))
      .withColumn("trail7", sum("n").over(w))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), col("trail7"))
      .orderBy("event_type", "day")
  }

  val e14Sql: String =
    """WITH daily AS (
      | SELECT cast(ts AS date) AS day, event_type, count(*) AS n
      | FROM events GROUP BY 1, 2),
      |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
      |cal AS (
      | SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::date AS day
      | FROM b),
      |ty AS (SELECT DISTINCT event_type FROM events),
      |filled AS (
      | SELECT g.day, g.event_type, coalesce(d.n, 0) AS n
      | FROM (SELECT * FROM cal CROSS JOIN ty) g
      |  LEFT JOIN daily d ON g.day = d.day AND g.event_type = d.event_type)
      |SELECT strftime(day, '%Y-%m-%d') AS day, event_type,
      | cast(n AS bigint) AS n,
      | cast(sum(n) OVER (PARTITION BY event_type ORDER BY day
      |   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS bigint) AS trail7
      |FROM filled ORDER BY event_type, day""".stripMargin

  /** e17's per-step deadline: 24 hours, in microseconds. */
  val FunnelDeadlineUs: Long = 86400L * 1000000L

  /** e17: the DEADLINE FUNNEL — e3's signup→click→purchase chain with a
    * per-step conversion WINDOW (each step counts only within 24 h of
    * the previous step's completion), plus the per-step conversion rate
    * in exact ppm. This is the form product analytics actually ships
    * ("converted within 24 h"), and it is a different query from e3:
    * an unbounded funnel only ever grows, a deadline funnel can LOSE a
    * user whose next step came too late. Anchoring follows e3's
    * deterministic convention — each step anchors at the EARLIEST
    * in-window completion of the previous step.
    *
    * Plan: identical shape to e3 (the high-cardinality user window
    * family): running-min windows share ONE user_id sort, the deadline
    * test is row-local arithmetic against the running anchor, and both
    * rollups are bounded. The running t*_run equals the oracle's global
    * per-user min at every row AFTER that min's position (rows sort by
    * time), so the window form and the oracle's correlated-min chain
    * agree exactly — e3's proven argument, deadline conditions being
    * row-local in (us, anchor). */
  def e17DeadlineFunnel(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val d = FunnelDeadlineUs
    Tables.events(s, dir).select("event_id", "ts", "user_id", "event_type")
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("t1_run", min(when(col("event_type") === "signup", col("us"))).over(w))
      .withColumn("click_ok",
        when(col("event_type") === "click" && col("us") > col("t1_run") &&
          col("us") <= col("t1_run") + d, col("us")))
      .withColumn("t2_run", min(col("click_ok")).over(w))
      .withColumn("purchase_ok",
        when(col("event_type") === "purchase" && col("us") > col("t2_run") &&
          col("us") <= col("t2_run") + d, col("us")))
      .groupBy("user_id")
      .agg(min(when(col("event_type") === "signup", col("us"))).as("t1"),
           min(col("click_ok")).as("t2"),
           min(col("purchase_ok")).as("t3"))
      .agg(count(col("t1")).as("n_signup"),
           count(col("t2")).as("n_click_24h"),
           count(col("t3")).as("n_purchase_24h"))
      .select(col("n_signup"), col("n_click_24h"), col("n_purchase_24h"),
        expr("n_click_24h * 1000000L DIV n_signup").as("step2_ppm"),
        expr("CASE WHEN n_click_24h > 0 THEN n_purchase_24h * 1000000L DIV n_click_24h ELSE 0 END")
          .as("step3_ppm"))
  }

  val e17Sql: String =
    s"""WITH e AS (
       | SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events),
       |s1 AS (
       | SELECT user_id, min(CASE WHEN event_type = 'signup' THEN us END) AS t1
       | FROM e GROUP BY user_id),
       |s2 AS (
       | SELECT e.user_id, min(us) AS t2
       | FROM e JOIN s1 ON e.user_id = s1.user_id
       | WHERE event_type = 'click' AND us > t1 AND us <= t1 + $FunnelDeadlineUs
       | GROUP BY e.user_id),
       |s3 AS (
       | SELECT e.user_id, min(us) AS t3
       | FROM e JOIN s2 ON e.user_id = s2.user_id
       | WHERE event_type = 'purchase' AND us > t2 AND us <= t2 + $FunnelDeadlineUs
       | GROUP BY e.user_id),
       |agg AS (
       | SELECT count(t1) AS n_signup, count(t2) AS n_click_24h,
       |  count(t3) AS n_purchase_24h
       | FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
       |         LEFT JOIN s3 ON s1.user_id = s3.user_id)
       |SELECT n_signup, n_click_24h, n_purchase_24h,
       | cast(n_click_24h * 1000000 // n_signup AS bigint) AS step2_ppm,
       | cast(CASE WHEN n_click_24h > 0
       |   THEN n_purchase_24h * 1000000 // n_click_24h ELSE 0 END AS bigint) AS step3_ppm
       |FROM agg""".stripMargin

  /** e16: SEASONAL-NAIVE FORECAST BACKTEST — the capacity-planning
    * baseline every traffic dashboard starts from: forecast each day's
    * per-type event count as the integer mean of the same weekday's
    * counts one and two weeks back, score the forecast against the
    * actual over the whole corpus calendar, and report per-type error
    * totals. Any real model ships only after beating this line; the
    * backtest (not the model) is the data-engine operator, and its
    * arithmetic is exact: forecast = (lag7 + lag14) DIV 2 on
    * nonnegative counts (floor, both engines), MAE ×100 via integer
    * division, the BIAS kept as a signed exact SUM (never divided — a
    * negative numerator would floor differently across engines).
    *
    * Plan: the corpus reduces ONCE to the (day, type) cell table
    * (map-combined rollup, the only corpus-sized exchange); the
    * calendar gap-fill guarantees lag(7)/lag(14) really mean "same
    * weekday N weeks back" even across zero-traffic days (the e14
    * machinery — missing days would silently shift a raw lag); both
    * lags share ONE window over the TINY filled cell frame (types ×
    * days — the e10 rule: window the cell table, never the fact); the
    * report is |types|-bound. */
  def e16ForecastBacktest(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("ts").cast("date").as("day"), col("event_type"))
    val daily = ev.groupBy("day", "event_type").agg(count(lit(1)).as("n"))
    val calendar = ev.agg(min("day").as("d0"), max("day").as("d1"))
      .select(explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val types = ev.select("event_type").distinct()
    val w = Window.partitionBy("event_type").orderBy("day")
    calendar.crossJoin(types)
      .join(daily, Seq("day", "event_type"), "left")
      .na.fill(0L, Seq("n"))
      .withColumn("l7", lag(col("n"), 7).over(w))
      .withColumn("l14", lag(col("n"), 14).over(w))
      .filter(col("l7").isNotNull && col("l14").isNotNull)
      .select(col("event_type"), col("n"),
        expr("(l7 + l14) DIV 2").as("fc"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum("n").as("actual_total"),
        sum(abs(col("n") - col("fc"))).as("abs_err_total"),
        sum(col("fc") - col("n")).as("bias_signed"))
      .withColumn("mae_x100", expr("abs_err_total * 100 DIV n_days"))
      .orderBy("event_type")
  }

  val e16Sql: String =
    """WITH daily AS (
      | SELECT cast(ts AS date) AS day, event_type, count(*) AS n
      | FROM events GROUP BY 1, 2),
      |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
      |cal AS (
      | SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::date AS day
      | FROM b),
      |ty AS (SELECT DISTINCT event_type FROM events),
      |filled AS (
      | SELECT g.day, g.event_type, coalesce(d.n, 0) AS n
      | FROM (SELECT * FROM cal CROSS JOIN ty) g
      |  LEFT JOIN daily d ON g.day = d.day AND g.event_type = d.event_type),
      |fc AS (
      | SELECT event_type, n,
      |  (lag(n, 7) OVER (PARTITION BY event_type ORDER BY day) +
      |   lag(n, 14) OVER (PARTITION BY event_type ORDER BY day)) // 2 AS fc
      | FROM filled
      | QUALIFY lag(n, 14) OVER (PARTITION BY event_type ORDER BY day) IS NOT NULL)
      |SELECT event_type, count(*) AS n_days,
      | cast(sum(n) AS bigint) AS actual_total,
      | cast(sum(abs(n - fc)) AS bigint) AS abs_err_total,
      | cast(sum(fc - n) AS bigint) AS bias_signed,
      | cast(sum(abs(n - fc)) * 100 // count(*) AS bigint) AS mae_x100
      |FROM fc GROUP BY 1 ORDER BY event_type""".stripMargin

  /** e18: PEAK CONCURRENT SESSIONS per UTC day — the capacity number a
    * serving deployment sizes against (max simultaneous live sessions,
    * not events/day). e1's 30-min-gap sessions become closed intervals
    * [start_us, end_us]; the classic sweep-line counts +1 at each start
    * and −1 at each end, with starts ordered BEFORE ends at an equal
    * instant (closed-interval semantics: a zero-length single-event
    * session still registers, and a session ending exactly as another
    * starts counts as concurrent). Sessions crossing midnight are split
    * into per-day segments, so a spanning session correctly appears in
    * every day it touches. The split fan-out is bounded by SESSION
    * DURATION, which the 30-min gap rule does NOT cap (ADVICE r12): a
    * user emitting events every <30 min indefinitely yields one
    * arbitrarily long session and one segment row per calendar day it
    * spans — an always-on bot is linear fan-out in days, not a
    * correctness hazard (results stay exact), but worth knowing when
    * sizing the segment explode.
    *
    * Scale: the running sum is NOT one day-keyed window over every
    * boundary (a day of a 100 TB feed is millions of rows through one
    * reducer) — it is the t13 distributed-prefix-sum discipline: hour
    * buckets give per-(day, hour) partial sums, a 24-bounded window
    * cumulates bucket offsets, and the within-bucket running sum runs
    * on day/24 slices. The day-level MAX of the running count is
    * invariant to the bucket decomposition (same boundary order), so
    * the bucketed plan is bit-equal to the oracle's flat window. */
  def e18PeakConcurrency(s: SparkSession, dir: String): DataFrame = {
    val DayUs = 86400000000L
    val HourUs = 3600000000L
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val sess = Tables.events(s, dir).select("event_id", "ts", "user_id")
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("new_session",
        when(col("us") - lag(col("us"), 1).over(byUser) > SessionGapUs, 1)
          .when(lag(col("us"), 1).over(byUser).isNull, 1).otherwise(0))
      .withColumn("session_seq", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"))
    val segs = sess
      .withColumn("d", explode(sequence(
        expr(s"start_us DIV $DayUs"), expr(s"end_us DIV $DayUs"))))
      .select(col("d"),
        greatest(col("start_us"), col("d") * DayUs).as("s_us"),
        least(col("end_us"), (col("d") + 1) * DayUs - 1).as("e_us"))
    val bounds = segs.select(col("d"), col("s_us").as("us"), lit(1L).as("delta"))
      .unionByName(segs.select(col("d"), col("e_us").as("us"), lit(-1L).as("delta")))
      .withColumn("hr", expr(s"(us DIV $HourUs) % 24"))
    // bounded bucket offsets: ≤24 rows per day through the hour window
    val bySums = bounds.groupBy("d", "hr")
      .agg(sum(col("delta")).as("bsum"),
        sum(when(col("delta") > 0, 1L).otherwise(0L)).as("starts"))
    val byDayHr = Window.partitionBy("d").orderBy("hr")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = bySums
      .withColumn("off", sum(col("bsum")).over(byDayHr) - col("bsum"))
    val inBucket = Window.partitionBy("d", "hr")
      .orderBy(col("us"), col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bounds.join(offsets.select("d", "hr", "off"), Seq("d", "hr"))
      .withColumn("run", col("off") + sum(col("delta")).over(inBucket))
      .groupBy(col("d").as("day_num"))
      .agg(sum(when(col("delta") > 0, 1L).otherwise(0L)).as("n_sessions"),
        max(col("run")).as("peak_concurrent"))
      .orderBy("day_num")
  }

  val e18Sql: String =
    """WITH e AS (
      | SELECT event_id, user_id, epoch_us(ts) AS us FROM events),
      |flagged AS (
      | SELECT *, CASE
      |    WHEN us - lag(us) OVER w > 1800000000 THEN 1
      |    WHEN lag(us) OVER w IS NULL THEN 1
      |    ELSE 0 END AS new_session
      | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |sessions AS (
      | SELECT *, sum(new_session) OVER (
      |    PARTITION BY user_id ORDER BY us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      | FROM flagged),
      |sess AS (
      | SELECT user_id, session_seq, min(us) AS start_us, max(us) AS end_us
      | FROM sessions GROUP BY 1, 2),
      |segs AS (
      | SELECT d,
      |  greatest(start_us, d * 86400000000) AS s_us,
      |  least(end_us, (d + 1) * 86400000000 - 1) AS e_us
      | FROM (SELECT *,
      |   unnest(range(start_us // 86400000000, end_us // 86400000000 + 1)) AS d
      |  FROM sess)),
      |bounds AS (
      | SELECT d, s_us AS us, 1 AS delta FROM segs
      | UNION ALL SELECT d, e_us, -1 FROM segs),
      |run AS (
      | SELECT d, delta, sum(delta) OVER (
      |    PARTITION BY d ORDER BY us, delta DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      | FROM bounds)
      |SELECT d AS day_num,
      | cast(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS bigint) AS n_sessions,
      | cast(max(c) AS bigint) AS peak_concurrent
      |FROM run GROUP BY d ORDER BY day_num""".stripMargin
}
