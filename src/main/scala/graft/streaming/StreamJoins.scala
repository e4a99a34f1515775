package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-STREAM joins — the attribution shape of the reference's usage
  * tracking (trackUsageController correlates a prompt request with the
  * completion that follows it; at stream scale that is an event-time
  * interval join, not a lookup).
  *
  * Both sides carry a watermark and the join condition bounds the event
  * time distance, so Spark can evict join state once the watermark
  * passes the interval: state is O(events inside the interval window),
  * never O(stream). Without the time bound (or with only one watermark)
  * the state store would grow forever — the planner rejects Append-mode
  * stream-stream joins that cannot bound state, which is exactly the
  * guard a 100 TB/day deployment needs.
  */
object StreamJoins {

  /** Purchases attributed to the same user's click at most one hour
    * earlier. Inner interval join: each side watermarked 1h; condition
    * `click_ts <= purchase_ts <= click_ts + 1h` bounds both state
    * stores to one hour of events per side. */
  def attributedPurchases(clicks: DataFrame, purchases: DataFrame): DataFrame =
    clicks.withWatermark("click_ts", "1 hour")
      .join(
        purchases.withWatermark("purchase_ts", "1 hour"),
        expr(
          """click_user = purchase_user AND
            |purchase_ts >= click_ts AND
            |purchase_ts <= click_ts + interval 1 hour""".stripMargin))
      .select(col("purchase_user").as("user_id"),
        col("click_id"), col("purchase_id"),
        unix_micros(col("click_ts")).as("click_us"),
        unix_micros(col("purchase_ts")).as("purchase_us"),
        col("amount"))
}
