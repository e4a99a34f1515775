package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Sketch-based approximate twins of exact operators — the 100 TB
  * fallback when exactness is negotiable and a second pass is not:
  *
  *  - distinct counts → HyperLogLog++ (`approx_count_distinct`): fixed
  *    ~kilobyte sketch per group regardless of cardinality, mergeable →
  *    map-side combined, one shuffle of sketches instead of an Expand
  *    pass over every (group, user) pair (q10's exact plan);
  *  - percentiles → KLL-style quantile sketch (`percentile_approx`):
  *    one pass, bounded memory, mergeable — replaces q15's two-pass
  *    exact formulation when a rank-error tolerance is acceptable.
  *
  * The raw sketch values are deliberately NOT oracle rows (approximate
  * results cannot hash-match DuckDB); instead [[a1HllBounds]] /
  * [[a2QuantileBounds]] put the ERROR-BOUND AUDIT itself in the oracle
  * inventory — exact counts both engines agree on plus an in-contract
  * verdict DuckDB pins to 1 — so the approximate path is driver-gated,
  * not only spec-gated (ApproxSpec keeps the finer-grained bounds).
  */
object Approx {

  /** q10 twin: distinct users per event type via HLL++.
    * rsd = target relative standard deviation (default 5%). */
  def approxDistinctUsers(s: SparkSession, dir: String, rsd: Double = 0.05): DataFrame =
    Tables.events(s, dir).select("event_type", "user_id")
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), rsd).as("distinct_users"),
           count(lit(1)).as("cnt"))
      .orderBy("event_type")

  /** q15 twin: p50/p95 per event type via a quantile sketch.
    * accuracy a ⇒ rank error ≤ n/a per the Spark contract. */
  def approxPercentiles(s: SparkSession, dir: String, accuracy: Int = 10000): DataFrame =
    Tables.events(s, dir).select("event_type", "value")
      .groupBy("event_type")
      .agg(percentile_approx(col("value"), lit(0.5), lit(accuracy)).as("p50"),
           percentile_approx(col("value"), lit(0.95), lit(accuracy)).as("p95"),
           count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** a1: HLL error-bound audit as an ORACLE-ELIGIBLE row. The sketch
    * value itself cannot hash-match DuckDB, so the row carries what CAN:
    * the exact distinct count (both engines compute it) plus a boolean
    * verdict that the HLL estimate landed within the documented bound
    * (|est - exact| ≤ 3·rsd·exact, the 3σ envelope of Spark's rsd
    * contract). DuckDB asserts the verdict column is literally TRUE, so
    * a sketch drifting out of contract fails the driver gate, not just
    * a local spec. One scan: the exact distinct and the sketch ride the
    * same two-phase aggregate. */
  def a1HllBounds(s: SparkSession, dir: String, rsd: Double = 0.05): DataFrame =
    Tables.events(s, dir).select("event_type", "user_id")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_distinct"),
           approx_count_distinct(col("user_id"), rsd).as("est"))
      .select(col("event_type"), col("exact_distinct"),
        (abs(col("est") - col("exact_distinct"))
          <= lit(3 * rsd) * col("exact_distinct")).cast("int").as("within_bound"))
      .orderBy("event_type")

  val a1Sql: String =
    """SELECT event_type, count(DISTINCT user_id) AS exact_distinct,
      | cast(1 AS int) AS within_bound
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** a2: quantile-sketch rank-error audit, oracle-eligible by the same
    * construction as [[a1HllBounds]]: the approximate p50's EXACT rank
    * must sit within the documented ±1/accuracy rank envelope of the
    * true median (with a +1 slack for the duplicate-value mass at the
    * boundary value itself, which any rank definition attributes
    * wholesale). Shape: the sketch and the exact ranks share one
    * group-keyed aggregate each — the rank check joins the (groups)-row
    * sketch sliver broadcast back to the corpus, so nothing
    * corpus-sized shuffles twice. */
  def a2QuantileBounds(s: SparkSession, dir: String, accuracy: Int = 10000): DataFrame = {
    val e = Tables.events(s, dir).select("event_type", "value")
    val sk = e.groupBy("event_type")
      .agg(percentile_approx(col("value"), lit(0.5), lit(accuracy)).as("p50_est"))
    e.join(broadcast(sk), Seq("event_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
           sum(when(col("value") < col("p50_est"), 1L).otherwise(0L)).as("rank_lo"),
           sum(when(col("value") <= col("p50_est"), 1L).otherwise(0L)).as("rank_hi"))
      .select(col("event_type"), col("n"),
        (col("rank_lo") <= (col("n") * 0.5 + col("n") / lit(accuracy.toDouble) + 1) &&
         col("rank_hi") >= (col("n") * 0.5 - col("n") / lit(accuracy.toDouble) - 1))
          .cast("int").as("within_bound"))
      .orderBy("event_type")
  }

  val a2Sql: String =
    """SELECT event_type, count(*) AS n, cast(1 AS int) AS within_bound
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
}
