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
  * These are deliberately NOT in the oracle inventory: approximate
  * results cannot hash-match DuckDB. ApproxSpec instead asserts the
  * documented error bounds against the exact operators — the same gate
  * a production rollout would use.
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
}
