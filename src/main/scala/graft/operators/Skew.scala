package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot keys.
  *
  * A plain `groupBy(key)` sends every row of a hot key to one reducer;
  * with a power-law key distribution (user_id in usage tracking — the
  * reference's trackUsage collection keyed by a handful of heavy tenants)
  * one task runs for hours while 999 executors idle. Salting splits each
  * key into `saltBuckets` sub-keys, aggregates partially, then combines —
  * two short shuffles instead of one unbounded one.
  */
object Skew {

  /** Two-stage salted sum/count:
    * stage 1 groups by (key, salt) — parallelism = keys × saltBuckets;
    * stage 2 combines the partials per key. Associative aggregates only.
    */
  def saltedSumCount(
      df: DataFrame,
      key: String,
      valueCol: Column,
      saltBuckets: Int): DataFrame = {
    // salt by row id, not by key: the goal is to spread ONE key's rows
    // over many reducers; associativity makes the final result identical
    // for any salt assignment (pass a decimal value column so the sum is
    // also accumulation-order independent)
    val salted = df
      .withColumn("_salt", pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(valueCol).as("_psum"), count(lit(1)).as("_pcnt"))
    salted.groupBy(col(key))
      .agg(sum(col("_psum")).as("total"), sum(col("_pcnt")).as("cnt"))
  }
}
