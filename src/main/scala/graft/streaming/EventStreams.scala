package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming forms of the usage analytics (graft.operators.Events):
  * the reference tracks usage per request as rows arrive
  * (trackUsageService.createTrackUsage); at 100 TB/day that is a stream,
  * not a table. Batch and stream share semantics — the batch operators are
  * the oracle-checked twins of these.
  */
object EventStreams {

  /** Hourly tumbling counts/sums per event type, 1h watermark for state
    * eviction: state size is O(open windows × event types), not O(stream). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("cnt"), col("total_value"))

  case class Ev(user_id: Long, ts_us: Long, value: Double)
  case class OpenSession(start_us: Long, end_us: Long, n: Long, total: Double)
  case class ClosedSession(user_id: Long, start_us: Long, end_us: Long, n_events: Long, total_value: Double)

  val GapUs: Long = 30L * 60 * 1000 * 1000

  /** Gap-based sessionization with explicit state: closed sessions are
    * emitted (Append), the open session rides in GroupState — per-key
    * state is one small case class regardless of history length. */
  def sessionize(events: Dataset[Ev]): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[OpenSession]) =>
          val sorted = rows.toSeq.sortBy(_.ts_us)
          var open = state.getOption
          val closed = Seq.newBuilder[ClosedSession]
          sorted.foreach { ev =>
            open match {
              case Some(s) if ev.ts_us - s.end_us <= GapUs =>
                open = Some(s.copy(end_us = ev.ts_us, n = s.n + 1, total = s.total + ev.value))
              case Some(s) =>
                closed += ClosedSession(uid, s.start_us, s.end_us, s.n, s.total)
                open = Some(OpenSession(ev.ts_us, ev.ts_us, 1, ev.value))
              case None =>
                open = Some(OpenSession(ev.ts_us, ev.ts_us, 1, ev.value))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
      }
  }
}
