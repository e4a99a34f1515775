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
}
