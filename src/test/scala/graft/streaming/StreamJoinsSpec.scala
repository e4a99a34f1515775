package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamJoinsSpec extends SparkSpec {

  test("stream-stream interval join attributes purchases only within the hour") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicksMem = MemoryStream[(Long, Long, Long)] // (user, click_id, ts_us)
    val buysMem   = MemoryStream[(Long, Long, Long, Double)] // (user, purchase_id, ts_us, amount)

    val clicks = clicksMem.toDF().toDF("click_user", "click_id", "click_us")
      .withColumn("click_ts", timestamp_micros(col("click_us"))).drop("click_us")
    val buys = buysMem.toDF().toDF("purchase_user", "purchase_id", "buy_us", "amount")
      .withColumn("purchase_ts", timestamp_micros(col("buy_us"))).drop("buy_us")

    val q = StreamJoins.attributedPurchases(clicks, buys)
      .writeStream.format("memory").queryName("attributed").outputMode("append").start()

    val t0 = 1700000000L * 1000000L
    val min = 60L * 1000000L
    clicksMem.addData((1L, 10L, t0), (2L, 11L, t0))
    buysMem.addData(
      (1L, 100L, t0 + 30 * min, 5.0),  // 30 min after user 1's click -> attributed
      (2L, 101L, t0 + 90 * min, 7.0),  // 90 min after user 2's click -> outside window
      (3L, 102L, t0 + 10 * min, 9.0))  // user 3 never clicked -> dropped
    q.processAllAvailable()
    val got = spark.sql(
        "select user_id, click_id, purchase_id, amount from attributed order by purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    q.stop()
    assert(got == Seq((1L, 10L, 100L, 5.0)))
  }

  test("a second click by the same user inside the window yields both attributions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicksMem = MemoryStream[(Long, Long, Long)]
    val buysMem   = MemoryStream[(Long, Long, Long, Double)]
    val clicks = clicksMem.toDF().toDF("click_user", "click_id", "click_us")
      .withColumn("click_ts", timestamp_micros(col("click_us"))).drop("click_us")
    val buys = buysMem.toDF().toDF("purchase_user", "purchase_id", "buy_us", "amount")
      .withColumn("purchase_ts", timestamp_micros(col("buy_us"))).drop("buy_us")
    val q = StreamJoins.attributedPurchases(clicks, buys)
      .writeStream.format("memory").queryName("attributed2").outputMode("append").start()

    val t0 = 1700000000L * 1000000L
    val min = 60L * 1000000L
    clicksMem.addData((5L, 20L, t0), (5L, 21L, t0 + 20 * min))
    buysMem.addData((5L, 200L, t0 + 40 * min, 3.0)) // within 1h of BOTH clicks
    q.processAllAvailable()
    val got = spark.sql("select click_id from attributed2 order by click_id")
      .collect().map(_.getLong(0)).toSeq
    q.stop()
    assert(got == Seq(20L, 21L))
  }
}
