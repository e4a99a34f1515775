package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational / pipeline core: the reference's Mongo query + aggregation
  * surface re-expressed as declarative DataFrame plans.
  *
  * Semantics sources (cited, not copied):
  *  - trackUsageController.js:62-135  ($match→$group(y,m,d,user)→$lookup→$project→$sort)
  *  - aggregationService.js:37-60     (per-company totals, sorted desc)
  *  - assistantController.js:325-340  ($regex search, sort+skip+limit pagination)
  *  - postgreService.js:49-63         (SQL passthrough)
  *
  * Determinism rules (see SURVEY §6): money/quantity sums aggregate as
  * DECIMAL (exact, accumulation-order-independent — a must on a cluster
  * where partition order is nondeterministic) and only the final value is
  * cast to double; every result ends in a total ORDER BY with a unique
  * tiebreak.
  */
object Relational {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  /** q1: multi-measure grouped aggregation (TPC-H Q1 shape). Partial
    * aggregation (map-side combine) keeps the shuffle tiny: one row per
    * (flag,status) per partition regardless of input size.
    *
    * Money math is DECIMAL on purpose: long-cents aggregation measures
    * 3x faster locally, but a sum of 2-decimal values overflows int64
    * around 1e16 cent-units — reachable on a 100 TB fact table — while
    * decimal-128 holds to 38 digits and stays accumulation-order
    * independent (double sums are not, under nondeterministic partition
    * order). */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount")
    l.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** q2: $match (range + equality) + $project. Both predicates and the
    * 4-column projection reach the parquet scan (PushedFilters/ReadSchema). */
  def q2FilterProject(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1996-01-01").cast("timestamp") &&
              col("o_orderstatus") === "O")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
      .orderBy("o_orderkey")

  /** q3: the trackUsage daily-rollup pipeline: group events by
    * (year,month,day,user), sum value + count, join user names, sort.
    * The customer dim is broadcast — no shuffle of the fact side for the
    * join; the only shuffle is the groupBy, pre-combined map-side. */
  def q3JoinGroupSort(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select("ts", "user_id", "value")
    val c = Tables.customer(s, dir).select("c_custkey", "c_name")
    e.groupBy(
        year(col("ts")).as("y"), month(col("ts")).as("m"),
        dayofmonth(col("ts")).as("d"), col("user_id"))
      .agg(sum(dec(col("value"))).cast("double").as("total_value"),
           count(lit(1)).as("cnt"))
      .join(broadcast(c), col("user_id") === col("c_custkey"))
      .select("y", "m", "d", "user_id", "c_name", "total_value", "cnt")
      .orderBy("y", "m", "d", "user_id")
  }

  /** q4: $group {_id:null} global rollup. One partial row per partition →
    * single-row final aggregate; no wide shuffle. */
  def q4GlobalRollup(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select("user_id", "value")
      .agg(sum(dec(col("value"))).cast("double").as("total_value"),
           count(lit(1)).as("total_events"),
           countDistinct(col("user_id")).as("distinct_users"))

  /** q5: leaderboard — per-nation event totals, desc, top 10
    * (aggregationService.getCompanyPromptsByDate, minus its O(companies)
    * driver-side loop: here it is one aggregation + two broadcast joins). */
  def q5TopN(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select("user_id", "value")
    val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val n = Tables.nation(s, dir).select("n_nationkey", "n_name")
    e.groupBy("user_id").agg(sum(dec(col("value"))).as("user_total"), count(lit(1)).as("user_cnt"))
      .join(broadcast(c), col("user_id") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(col("user_total")).cast("double").as("total_value"),
           sum(col("user_cnt")).as("total_events"))
      .orderBy(col("total_value").desc, col("n_name"))
      .limit(10)
  }

  /** q6: sort + skip/limit pagination (assistantController list views).
    * Spark's global sort is a range-partitioned exchange; LIMIT+OFFSET is
    * then driver-cheap. Unique tiebreak keeps pages stable. */
  def q6Pagination(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select("o_orderkey", "o_orderdate", "o_totalprice")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").asc)
      .offset(20).limit(10)

  /** q7: case-insensitive $regex search + per-group count
    * (assistantController.js:325 searchQuery). rlike is codegen'd. */
  def q7SearchRegex(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir).select("p_brand", "p_name")
      .filter(lower(col("p_name")).rlike("(green|blue)"))
      .groupBy("p_brand").agg(count(lit(1)).as("cnt"))
      .orderBy("p_brand")

  /** q8: $in semi-join — orders of BUILDING-segment customers. LEFT SEMI
    * with a broadcast right side: no shuffle, no row duplication. */
  def q8SemijoinIn(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_totalprice")
      .join(broadcast(c), col("o_custkey") === col("c_custkey"), "left_semi")
      .orderBy("o_orderkey")
  }

  /** q9: anti-join — customers with no order in the first half of 1995. */
  def q9Antijoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") < lit("1995-07-01").cast("timestamp"))
      .select("o_custkey")
    Tables.customer(s, dir).select("c_custkey", "c_name")
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .orderBy("c_custkey")
  }

  /** q10: distinct counts per group (countDocuments / distinct). Spark
    * plans countDistinct as a two-stage expand+agg — still one shuffle. */
  def q10DistinctCount(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select("event_type", "user_id")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("distinct_users"), count(lit(1)).as("cnt"))
      .orderBy("event_type")

  /** q11: latest event per user (assistantController.js:270
    * mostRecentMessage).
    *
    * Written as window row_number, but the sort keys are coalesced to
    * non-null sentinels (epoch / Long.MinValue — both rank null LAST
    * under DESC, matching the window default, and no real data predates
    * 1970): with provably non-nullable keys the WindowTopKRewrite rule
    * replaces the window with the bounded TopKRowsByScore aggregate, so
    * the shuffle carries ONE row per user per input partition instead of
    * the whole events table. Under a session without the extensions the
    * window form runs unchanged and returns identical results. */
  def q11LatestPerKey(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(
      coalesce(col("ts"), timestamp_micros(lit(0L))).desc,
      coalesce(col("event_id"), lit(Long.MinValue)).desc)
    Tables.events(s, dir).select("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "event_type", "value")
      .orderBy("user_id")
  }

  /** q37: last-N history per key — the conversation-history window
    * (conversationController / assistantThreadController return the
    * latest messages of a thread, not just the newest one): rank <= 3
    * of the (ts, event_id) DESC order per user. Same rewrite-eligible
    * shape as q11 (non-nullable-proof sort keys, literal rank bound):
    * under the driver session WindowTopKRewrite turns the window into
    * the bounded TopKRowsByScore aggregate, so the shuffle carries at
    * most 3 rows per (input partition, user) instead of every event —
    * asserted in EntrySpec alongside q11. */
  def q37LastNPerKey(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(
      coalesce(col("ts"), timestamp_micros(lit(0L))).desc,
      coalesce(col("event_id"), lit(Long.MinValue)).desc)
    Tables.events(s, dir).select("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("user_id", "rn", "event_id", "event_type", "value")
      .orderBy("user_id", "rn")
  }

  val q37Sql: String =
    """SELECT user_id, rn, event_id, event_type, value FROM (
      | SELECT user_id, event_id, event_type, value,
      |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      | FROM events)
      |WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin

  /** q12: token/cost calculation — the FULL reference formula
    * (trackUsageService.calculateCostFromTokenCounts, :90-108): price
    * lookup with an unknown-model DEFAULT row
    * (`tokenPrices[model] || {input: 0.01, output: 0.01}`, :91) and
    * per-provider branching — `openai` divides the blended token cost
    * by 1000, `gemini` charges it directly, any other provider costs 0
    * (the fall-through the reference's claude branch documents).
    *
    * Stand-ins: event_type = model; provider is the reference's static
    * model→provider routing expressed as a CASE; value = input tokens,
    * floor(value/2) = output tokens. The price table deliberately omits
    * `signup` so one group exercises the default-price coalesce, and
    * `error` routes to the zero-cost provider branch. Price table is a
    * broadcast LEFT join (the `||` default must not drop unknown
    * models, so inner is wrong); formula in exact decimals, one
    * group-count-bound rollup. */
  def q12CostCalc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val prices = Seq(
      ("click", 0.50, 1.50), ("view", 0.25, 0.75), ("purchase", 5.00, 15.00))
      .toDF("model", "in_price", "out_price")
    val e = Tables.events(s, dir).select("event_type", "value")
      .withColumn("provider",
        when(col("event_type").isin("click", "view", "purchase"), "openai")
          .when(col("event_type") === "signup", "gemini")
          .otherwise("claude"))
      .withColumn("in_tok", dec(col("value")))
      .withColumn("out_tok", dec(floor(col("value") / 2)))
    val blended = (col("in_tok") * col("in_price").cast("decimal(18,4)")
      + col("out_tok") * col("out_price").cast("decimal(18,4)")).cast("decimal(28,6)")
    e.join(broadcast(prices), col("event_type") === col("model"), "left")
      .withColumn("in_price", coalesce(col("in_price"), lit(0.01)))
      .withColumn("out_price", coalesce(col("out_price"), lit(0.01)))
      .groupBy("event_type", "provider")
      .agg(
        sum((col("in_tok") + col("out_tok")).cast("decimal(28,6)")).cast("double")
          .as("total_tokens"),
        sum(blended).cast("decimal(28,6)").as("blended_sum"))
      // the provider branch applies to the GROUP total (provider is a
      // function of the model): the /1000 is an exact scale-3 decimal
      // multiply, so both engines round once, at the final double cast
      .select(col("event_type"), col("provider"), col("total_tokens"),
        when(col("provider") === "openai",
            (col("blended_sum") * lit(0.001).cast("decimal(4,3)")).cast("double"))
          .when(col("provider") === "gemini", col("blended_sum").cast("double"))
          .otherwise(lit(0.0)).as("total_cost"))
      .orderBy("event_type")
  }

  /** q22: $or compound predicate + $exists field-presence filter — the
    * reference's most common search shape after plain $match
    * (userController.js:30-36 `deletedEmail: {$exists: false}` with a
    * name-OR-email case-insensitive $regex; assistantController.js:577-589
    * builds the same $or array).
    *
    * The tables have no optional fields (parquet is schema-full), so the
    * sometimes-present fields are derived deterministically from customer
    * — same derivation in the oracle SQL; the OPERATOR under test is the
    * OR-of-regexes + IS NULL presence filter, with Mongo's three-valued
    * null semantics (a null email fails its regex arm without poisoning
    * the OR). rlike is codegen'd; on stored columns the IsNull/IsNotNull
    * arm is pushable to the scan (regex predicates are not parquet-
    * pushable in any engine — they evaluate in the first map stage). */
  def q22OrExists(s: SparkSession, dir: String): DataFrame = {
    val u = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        when(col("c_custkey") % 3 === 0,
          concat(lower(col("c_name")), lit("@corp.example"))).as("email"),
        when(col("c_custkey") % 11 === 0, lit("tombstone")).as("deleted_marker"))
    u.filter(col("deleted_marker").isNull &&
        (lower(col("c_name")).rlike("1[0-9][0-9]$") || col("email").rlike("4[0-9]@")))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        coalesce(col("email"), lit("")).as("email"))
      .orderBy("c_custkey")
  }

  val q22Sql: String =
    """WITH u AS (
      |  SELECT c_custkey, c_name, c_mktsegment,
      |    CASE WHEN c_custkey % 3 = 0 THEN lower(c_name) || '@corp.example' END AS email,
      |    CASE WHEN c_custkey % 11 = 0 THEN 'tombstone' END AS deleted_marker
      |  FROM customer)
      |SELECT c_custkey, c_name, c_mktsegment, coalesce(email, '') AS email
      |FROM u
      |WHERE deleted_marker IS NULL
      |  AND (regexp_matches(lower(c_name), '1[0-9][0-9]$')
      |       OR regexp_matches(email, '4[0-9]@'))
      |ORDER BY c_custkey""".stripMargin

  /** q13: SQL passthrough (postgreService.getCompanyData) — arbitrary SQL
    * over registered views, here a join+agg exercising the SQL surface. */
  def q13Sql(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    Tables.nation(s, dir).createOrReplaceTempView("nation")
    s.sql(
      """SELECT n.n_name AS nation, count(*) AS customers,
        |       cast(sum(cast(c.c_acctbal AS decimal(18,2))) AS double) AS total_acctbal
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin)
  }
}
