package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class EventStreamsSpec extends SparkSpec {
  import EventStreams._

  test("streaming tumbling counts match the batch rollup on the same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Double)]
    val events = mem.toDF()
      .toDF("event_id", "ts_us", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val q = EventStreams.tumblingCounts(events)
      .writeStream.format("memory").queryName("tumbling").outputMode("complete").start()
    val base = 1700000000L * 1000000L
    mem.addData(
      (1L, base, "click", 1.0), (2L, base + 10L * 60 * 1000000, "click", 2.0),
      (3L, base + 70L * 60 * 1000000, "view", 3.0), (4L, base + 75L * 60 * 1000000, "click", 4.0))
    q.processAllAvailable()
    val got = spark.sql("select event_type, cnt, total_value from tumbling order by hour, event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    q.stop()
    assert(got == Seq(("click", 2L, 3.0), ("click", 1L, 4.0), ("view", 1L, 3.0)))
  }

  test("streaming sessionize closes a session only after the gap passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val sessions = EventStreams.sessionize(mem.toDS())
    val q = sessions.writeStream.format("memory").queryName("sessions").outputMode("append").start()

    val t0 = 1700000000L * 1000000L
    mem.addData(Ev(1L, t0, 1.0), Ev(1L, t0 + 5L * 60 * 1000000, 2.0)) // one open session
    q.processAllAvailable()
    assert(spark.sql("select * from sessions").count() == 0) // still open

    mem.addData(Ev(1L, t0 + 2L * 3600 * 1000000, 3.0)) // 2h later -> closes session 1
    q.processAllAvailable()
    val closed = spark.sql("select user_id, start_us, end_us, n_events, total_value from sessions")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    q.stop()
    assert(closed == Seq((1L, t0, t0 + 5L * 60 * 1000000, 2L, 3.0)))
  }
}
