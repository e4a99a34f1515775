package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Wider analytics surface: multi-way joins, exact percentiles, rollup
  * hierarchies, JSON field extraction — the admin-dashboard queries the
  * reference serves from Mongo aggregations, shaped for a cluster.
  */
object Analytics {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  /** q14: 5-way star join (lineitem→orders→customer→nation→region),
    * TPC-H Q5 shape: revenue per nation for one region + year. The three
    * dimension tables broadcast; only the two fact tables shuffle — and
    * the orders date filter is pushed into its scan, shrinking the join
    * input before the shuffle. */
  def q14Multijoin(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir).select("l_orderkey", "l_extendedprice", "l_discount")
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val n = Tables.nation(s, dir).select("n_nationkey", "n_name", "n_regionkey")
    val r = Tables.region(s, dir).filter(col("r_name") === "ASIA").select("r_regionkey")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
             .cast("double").as("revenue"),
           count(lit(1)).as("line_count"))
      .orderBy("n_name")
  }

  val q14Sql: String =
    """SELECT n_name,
      | cast(sum(cast(l_extendedprice AS decimal(18,2)) * (1 - cast(l_discount AS decimal(18,2)))) AS double) AS revenue,
      | count(*) AS line_count
      |FROM lineitem
      | JOIN orders ON l_orderkey = o_orderkey
      | JOIN customer ON o_custkey = c_custkey
      | JOIN nation ON c_nationkey = n_nationkey
      | JOIN region ON n_regionkey = r_regionkey
      |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND r_name = 'ASIA'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Bucket count for q15's histogram pass. At the rank-lookup stage each
    * candidate bucket holds ~n/QuantileBuckets rows; raise it (or recurse
    * the same histogram step inside the target bucket) if n/B outgrows an
    * executor partition. */
  val QuantileBuckets = 256

  /** q15: exact rank-based percentiles (p50/p95) per event type.
    *
    * Exact DISC quantiles — the result is a raw input value, so it
    * compares bit-exactly across engines (interpolated quantiles differ
    * in the last ulp). NOT a corpus-wide window (`row_number() OVER
    * (PARTITION BY event_type)` sorts the fact table in ≈5 reducer
    * partitions — a scale-killer): delegates to the reusable two-pass
    * bucketed formulation in [[Quantiles.exactGroupedQuantiles]], then
    * pivots the long-format result into the p50/p95 columns. */
  def q15Percentiles(s: SparkSession, dir: String): DataFrame = {
    val long = Quantiles.exactGroupedQuantiles(
      Tables.events(s, dir).select("event_type", "value"),
      key = "event_type", value = "value",
      probs = Seq("p50" -> 0.5, "p95" -> 0.95), buckets = QuantileBuckets)
    long.groupBy("event_type")
      .agg(max(when(col("which") === "p50", col("v"))).as("p50"),
           max(when(col("which") === "p95", col("v"))).as("p95"),
           max(col("n_events")).as("n_events"))
      .orderBy("event_type")
  }

  val q15Sql: String =
    """WITH v AS (
      | SELECT event_type, value,
      |  row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
      |  count(*) OVER (PARTITION BY event_type) AS n
      | FROM events)
      |SELECT event_type,
      | max(CASE WHEN rn = cast(ceil(0.5 * n) AS bigint) THEN value END) AS p50,
      | max(CASE WHEN rn = cast(ceil(0.95 * n) AS bigint) THEN value END) AS p95,
      | count(*) AS n_events
      |FROM v GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q16: rollup hierarchy (day × event_type → day → grand total) in one
    * pass — Spark plans rollup as a single Expand+aggregate, not three
    * scans. Null group keys are coalesced to sentinels so both engines
    * emit identical values. */
  def q16Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(unix_micros(date_trunc("day", col("ts"))).as("day_us"),
              col("event_type"), col("value"))
      .rollup("day_us", "event_type")
      .agg(count(lit(1)).as("cnt"),
           sum(dec(col("value"))).cast("double").as("total_value"))
      .select(coalesce(col("day_us"), lit(-1L)).as("day_us"),
              coalesce(col("event_type"), lit("ALL")).as("event_type"),
              col("cnt"), col("total_value"))
      .orderBy("day_us", "event_type")

  val q16Sql: String =
    """SELECT coalesce(day_us, -1) AS day_us,
      | coalesce(event_type, 'ALL') AS event_type,
      | count(*) AS cnt,
      | cast(sum(cast(value AS decimal(18,2))) AS double) AS total_value
      |FROM (SELECT epoch_us(date_trunc('day', ts)) AS day_us, event_type, value FROM events)
      |GROUP BY ROLLUP(day_us, event_type)
      |ORDER BY day_us, event_type""".stripMargin

  /** q17: JSON field extraction from the props column (the reference
    * stores request metadata as JSON documents in Mongo) — extracted
    * value feeds a grouped aggregate. */
  def q17Json(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select("props", "value")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("cnt"),
           sum(dec(col("value"))).cast("double").as("total_value"))
      .orderBy("k_mod")

  /** q18: AS-OF join — for every event, the timestamp of the user's most
    * recent prior (or same-instant) signup. Expressed as a running
    * last-non-null over the time order instead of an actual join: both
    * "sides" live in one shuffle on user_id, which is the formulation
    * that survives 100 TB (an inequality join would be quadratic per
    * user; Spark has no native as-of join). */
  def q18AsOf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir).select("event_id", "user_id", "event_type", "ts")
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("last_signup_us",
        last(when(col("event_type") === "signup", col("us")), ignoreNulls = true).over(w))
      .filter(col("event_type") =!= "signup")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("us"), coalesce(col("last_signup_us"), lit(-1L)).as("last_signup_us"))
      .orderBy("event_id")
  }

  val q18Sql: String =
    """WITH e AS (
      | SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events),
      |j AS (
      | SELECT *, last_value(CASE WHEN event_type = 'signup' THEN us END IGNORE NULLS)
      |   OVER (PARTITION BY user_id ORDER BY us, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_us
      | FROM e)
      |SELECT event_id, user_id, event_type, us,
      | coalesce(last_signup_us, -1) AS last_signup_us
      |FROM j WHERE event_type <> 'signup'
      |ORDER BY event_id""".stripMargin

  /** q19: rolling 5-event average value per user (dashboard moving
    * metric) — an explicit ROWS frame; one shuffle serves the whole
    * window pass. Decimal rolling sums divided by exact counts keep the
    * doubles bit-identical across engines. */
  def q19MovingAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id")).rowsBetween(-4, 0)
    Tables.events(s, dir).select("event_id", "user_id", "ts", "value")
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("rolling_sum", sum(dec(col("value"))).over(w))
      .withColumn("rolling_n", count(lit(1)).over(w))
      .select(col("event_id"), col("user_id"),
        (col("rolling_sum").cast("double") / col("rolling_n")).as("rolling_avg"))
      .orderBy("event_id")
  }

  val q19Sql: String =
    """WITH e AS (SELECT event_id, user_id, value, epoch_us(ts) AS us FROM events)
      |SELECT event_id, user_id,
      | cast(sum(cast(value AS decimal(18,2))) OVER w AS double)
      |   / count(*) OVER w AS rolling_avg
      |FROM e
      |WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
      |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** q20: set operations between audience segments (INTERSECT/EXCEPT —
    * Mongo-land does this with $setIntersection over arrays): purchasers
    * vs. error-reporters.
    *
    * NOT expressed as intersect/except: that plan scans `events` four
    * times and shuffles five (two distincts, two set-op joins, final
    * sort) — measured 22% of the whole round-1 bench, and at 100 TB it is
    * four full passes over the fact table. The set algebra collapses to
    * ONE scan + ONE group-count-bound shuffle: per-user boolean flags via
    * map-side-combined max(bool), then the segment is a plain projection.
    * intersect  = buyer ∧ errored; except = buyer ∧ ¬errored. */
  def q20SetOps(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select("user_id", "event_type")
      .groupBy("user_id")
      .agg(max(col("event_type") === "purchase").as("is_buyer"),
           max(col("event_type") === "error").as("is_errored"))
      .filter(col("is_buyer"))
      .select(when(col("is_errored"), lit("both")).otherwise(lit("buyers_only")).as("segment"),
              col("user_id"))
      .orderBy("segment", "user_id")

  val q20Sql: String =
    """WITH buyers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
      |errored AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
      |SELECT 'both' AS segment, user_id FROM (SELECT user_id FROM buyers INTERSECT SELECT user_id FROM errored)
      |UNION ALL
      |SELECT 'buyers_only' AS segment, user_id FROM (SELECT user_id FROM buyers EXCEPT SELECT user_id FROM errored)
      |ORDER BY segment, user_id""".stripMargin

  /** q21: per-user sorted distinct tag list (the reference stores
    * per-assistant tag arrays) — collect is unordered on a cluster, so
    * the contract is sort-then-join. */
  def q21ArrayAgg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select("user_id", "event_type")
      .groupBy("user_id")
      .agg(array_join(array_sort(collect_set(col("event_type"))), ",").as("types"),
           count(lit(1)).as("cnt"))
      .orderBy("user_id")

  val q21Sql: String =
    """SELECT user_id,
      | array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
      | count(*) AS cnt
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  val q17Sql: String =
    """SELECT json_extract_string(props, '$.k')::bigint % 10 AS k_mod,
      | count(*) AS cnt,
      | cast(sum(cast(value AS decimal(18,2))) AS double) AS total_value
      |FROM events GROUP BY 1 ORDER BY k_mod""".stripMargin

  /** Known event-type domain for q33's pivot — fixing the columns keeps
    * the pivot a single-pass conditional aggregation (Spark's
    * `pivot(col)` without values would run an extra distinct job to
    * discover them). */
  val PivotTypes = Seq("click", "error", "purchase", "signup", "view")

  /** q33: wide activity matrix — per-user value totals pivoted by event
    * type (the Mongo `$facet`/dashboard shape, one column per metric).
    *
    * Plan: a single map-side-combined aggregate over one scan; each
    * pivot cell is a `sum(when(...))` conditional — no join, no repeated
    * scans, no distinct-discovery job. A user with no events of a type
    * gets SQL's sum-of-empty = NULL (matches the oracle). */
  def q33PivotActivity(s: SparkSession, dir: String): DataFrame = {
    val cells = PivotTypes.map(t =>
      sum(when(col("event_type") === t, col("value").cast("decimal(18,2)")))
        .cast("double").as(s"${t}_value"))
    val agg = cells :+ count(lit(1)).as("n_events")
    Tables.events(s, dir).select("user_id", "event_type", "value")
      .groupBy("user_id")
      .agg(agg.head, agg.tail: _*)
      .orderBy("user_id")
  }

  val q33Sql: String = {
    val cells = PivotTypes.map(t =>
      s"cast(sum(CASE WHEN event_type = '$t' THEN cast(value AS decimal(18,2)) END) AS double) AS ${t}_value")
      .mkString(",\n ")
    s"""SELECT user_id,
       | $cells,
       | count(*) AS n_events
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  /** q34's $bucket boundaries over o_totalprice: [k*50000, (k+1)*50000)
    * for k<4, with bucket 4 the open-ended "default" bucket — the Mongo
    * `$bucket {boundaries, default}` histogram shape (the dashboard
    * aggregations of trackUsageController.js are this family). */
  val BucketWidth = 50000d
  val NumBuckets  = 5

  /** q34: fixed-boundary histogram ($bucket) as ONE map-side-combined
    * aggregation: the bucket id is pure row-local arithmetic
    * (least(floor(price/width), last)) so the plan is a single scan +
    * one group-count-bound shuffle of at most 5 partial rows per
    * partition — no range join against a boundary table, no sort. The
    * double division is IEEE-identical in both engines and prices are
    * far inside the 2^53 exact-integer range. */
  def q34BucketHistogram(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select("o_totalprice")
      .withColumn("bucket",
        least(floor(col("o_totalprice") / BucketWidth), lit(NumBuckets - 1L)).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_orders"),
           sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_price"),
           min(col("o_totalprice")).as("min_price"),
           max(col("o_totalprice")).as("max_price"))
      .orderBy("bucket")

  val q34Sql: String =
    s"""SELECT cast(least(floor(o_totalprice / $BucketWidth), ${NumBuckets - 1}) AS bigint) AS bucket,
       | count(*) AS n_orders,
       | cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS total_price,
       | min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
       |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin

  /** q39: CUBE grouping sets — every (month × event_type) margin of the
    * usage dashboard in ONE pass (the $facet "all breakdowns at once"
    * shape; q16 covers the ROLLUP hierarchy, CUBE adds the
    * (ALL, event_type) margins that a per-type trend widget reads).
    *
    * Scale: Spark plans CUBE as a single scan + Expand(×4 grouping sets)
    * feeding one map-side-combined aggregate — the shuffle is
    * (grouping sets × groups)-bound, never data-bound, and there is no
    * per-margin rescan. Sentinels (-1 / 'ALL') replace the grouping
    * nulls so the output carries no NULL-vs-value ambiguity. */
  def q39Cube(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(month(col("ts")).cast("long").as("mon"), col("event_type"), col("value"))
      .cube("mon", "event_type")
      .agg(count(lit(1)).as("cnt"),
           sum(dec(col("value"))).cast("double").as("total_value"))
      .select(coalesce(col("mon"), lit(-1L)).as("mon"),
              coalesce(col("event_type"), lit("ALL")).as("event_type"),
              col("cnt"), col("total_value"))
      .orderBy("mon", "event_type")

  val q39Sql: String =
    """SELECT coalesce(mon, -1) AS mon,
      | coalesce(event_type, 'ALL') AS event_type,
      | count(*) AS cnt,
      | cast(sum(cast(value AS decimal(18,2))) AS double) AS total_value
      |FROM (SELECT month(ts) AS mon, event_type, value FROM events)
      |GROUP BY CUBE(mon, event_type)
      |ORDER BY mon, event_type""".stripMargin

  /** q40: ratio-to-report — each user's share of their day's total value
    * (the "percent of daily usage" column every tenant dashboard shows),
    * in exact integer ppm so no float ratio crosses the engine boundary.
    *
    * The naive formulation is `sum(value) OVER (PARTITION BY day)` — a
    * window keyed by the LOW-cardinality day, which at 100 TB sorts each
    * day's slice of the corpus in one reducer. Instead: the per-(day,
    * user) aggregate is group-count-bound; day totals are a second agg
    * over that already-bound output (day-count rows); and the totals
    * BROADCAST back onto the per-user rows. No window, no skew, and the
    * fact table shuffles exactly once. Cents/ppm arithmetic is exact
    * int64: day cents < 2^44 at 100 TB-scale values, user_cents ×
    * 1_000_000 < 2^63. */
  def q40ShareOfDay(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.events(s, dir)
      .select(unix_micros(date_trunc("day", col("ts"))).as("day_us"),
              col("user_id"), col("value"))
      .groupBy("day_us", "user_id")
      .agg((sum(dec(col("value"))) * 100).cast("long").as("user_cents"))
    val day = per.groupBy("day_us")
      .agg(sum(col("user_cents")).as("day_cents"))
    per.join(broadcast(day), "day_us")
      .select(col("day_us"), col("user_id"), col("user_cents"),
        expr("user_cents * 1000000L DIV day_cents").as("share_ppm"))
      .orderBy("day_us", "user_id")
  }

  val q40Sql: String =
    """WITH per AS (
      | SELECT epoch_us(date_trunc('day', ts)) AS day_us, user_id,
      |  cast(sum(cast(value AS decimal(18,2))) * 100 AS bigint) AS user_cents
      | FROM events GROUP BY 1, 2),
      |day AS (
      | SELECT day_us, cast(sum(user_cents) AS bigint) AS day_cents
      | FROM per GROUP BY 1)
      |SELECT per.day_us, user_id, user_cents,
      | cast(user_cents * 1000000 // day_cents AS bigint) AS share_ppm
      |FROM per JOIN day ON per.day_us = day.day_us
      |ORDER BY per.day_us, user_id""".stripMargin
}
