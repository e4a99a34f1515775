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

  test("streaming anomaly alerts equal the batch e10 rows on the same events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)] // (event_type, ts_us)
    val events = mem.toDF().toDF("event_type", "ts_us")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val q = EventStreams.anomalyAlerts(events)
      .writeStream.format("memory").queryName("anomaly").outputMode("append").start()
    // replay the real corpus in ts order across several micro-batches
    // (the in-order contract the twin documents)
    val corpus = graft.Tables.events(spark, sfDir)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
      .orderBy("us", "event_type")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    corpus.grouped(math.max(1, corpus.length / 5)).foreach { batch =>
      mem.addData(batch.toSeq)
      q.processAllAvailable()
    }
    val got = spark.sql("select event_type, day, c, z_milli, anomaly from anomaly")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4))).toSet
    val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    q.stop()
    // batch rows, minus each type's LAST day (no successor arrives to
    // finalize it online — the one structural difference)
    val batch = graft.operators.Events.e10AnomalyDays(spark, sfDir).collect()
      .map(r => (r.getString(0), java.time.LocalDate.parse(r.getString(1)).toEpochDay,
        r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
    val lastDay = batch.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val expected = batch.filterNot { case (et, d, _, _, _) => d == lastDay(et) }.toSet
    assert(got == expected, s"stream/batch divergence: ${(got diff expected) ++ (expected diff got)}")
    assert(got.nonEmpty)
    // bounded state: one row per event type, regardless of event count
    assert(stateRows == corpus.map(_._1).distinct.length.toLong,
      s"state must be one row per type, got $stateRows")
  }

  test("streaming churn emits churn on quiet timeout and reactivation on return, state bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)] // (user_id, ts_us)
    val events = mem.toDF().toDF("user_id", "ts_us")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val q = EventStreams.churnTransitions(events)
      .writeStream.format("memory").queryName("churn").outputMode("append").start()
    val day = 86400L * 1000000L
    val t0 = 1700000000L * 1000000L

    mem.addData((1L, t0), (2L, t0))
    q.processAllAvailable()
    assert(spark.sql("select * from churn").count() == 0) // everyone active

    // user 1 returns 20 days later: gap >= 14 -> reactivated (emitted now);
    // the same batch advances the watermark past user 2's timeout
    mem.addData((1L, t0 + 20L * day))
    q.processAllAvailable()
    // next batch fires user 2's event-time timeout -> churned
    mem.addData((3L, t0 + 21L * day))
    q.processAllAvailable()

    val got = spark.sql("select user_id, kind, day from churn order by user_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val t0Day = t0 / day
    assert(got == Seq(
      (1L, "reactivated", t0Day + 20),
      (2L, "churned", t0Day + graft.operators.Events.ChurnDays)))
    // bounded state: one row per user ever seen, regardless of event count
    val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    q.stop()
    assert(stateRows == 3, s"state must be one row per user, got $stateRows")
  }
}
