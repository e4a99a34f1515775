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
  case class ChurnState(last_day: Long, churned: Boolean)
  case class ChurnEvent(user_id: Long, kind: String, day: Long)
  case class AnomalyState(open: Map[Long, Long], tail: Seq[(Long, Long)])
  case class AnomalyAlert(event_type: String, day: Long, c: Long,
    z_milli: Option[Long], anomaly: Boolean)

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

  /** e9's streaming twin: churn/reactivation TRANSITIONS as they happen,
    * instead of the batch report's point-in-time snapshot. Per-user state
    * is one small (last_day, churned) pair regardless of history length —
    * bounded by the user population exactly like e9's per-user aggregate.
    *
    * Mechanics: an event-time timeout is armed at last_day + ChurnDays;
    * when the watermark passes it the user is emitted as "churned"
    * (state kept, flagged). A new event from a churned user — or one
    * whose gap since last_day reaches ChurnDays even if the timeout has
    * not fired yet — emits "reactivated" and re-arms the timeout.
    * Input: a streaming frame with (user_id, ts) columns. */
  /** e10's streaming twin: trailing z-score anomaly ALERTS as days close,
    * instead of the batch report's full-history table. Keyed by
    * event_type; per-key state is the open day counts (normally one
    * entry) plus the last [[graft.operators.Events.ZWin]] finalized
    * (day, count) pairs — bounded regardless of stream length.
    *
    * A day finalizes when a LATER day for the same type arrives
    * (finalize-on-successor), which keeps the twin deterministic and
    * batch-equal under in-order micro-batch replay — the same input
    * contract StreamingNearDup documents. A deployment with genuinely
    * late data would arm an event-time timeout per open day instead
    * (the churnTransitions mechanics); the z-score math is identical
    * either way. Alert rows replicate e10's arithmetic bit-exactly:
    * integer Σc/Σc² over the 7-day tail, one IEEE
    * multiply-divide-sqrt-floor chain (spec asserts equality to the
    * batch operator on the same events). */
  def anomalyAlerts(events: DataFrame): Dataset[AnomalyAlert] = {
    import events.sparkSession.implicits._
    val zwin = graft.operators.Events.ZWin
    val thresh = graft.operators.Events.ZThreshMilli
    events
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[AnomalyState, AnomalyAlert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (et: String, rows: Iterator[(String, Long)], state: GroupState[AnomalyState]) =>
          val st = state.getOption.getOrElse(AnomalyState(Map.empty, Nil))
          val open = rows.foldLeft(st.open) { case (m, (_, d)) =>
            m.updated(d, m.getOrElse(d, 0L) + 1L)
          }
          val maxDay = open.keys.max
          val (toClose, stillOpen) = open.partition(_._1 < maxDay)
          var tail = st.tail
          val out = Seq.newBuilder[AnomalyAlert]
          toClose.toSeq.sortBy(_._1).foreach { case (d, c) =>
            if (tail.size == zwin) {
              val n = zwin.toLong
              val s1 = tail.map(_._2).sum
              val s2 = tail.map(t => t._2 * t._2).sum
              val z = if (n * s2 == s1 * s1) None
                else Some(math.floor(1000.0 * (n * c - s1) /
                  math.sqrt((n * s2 - s1 * s1).toDouble)).toLong)
              out += AnomalyAlert(et, d, c, z, z.exists(v => math.abs(v) >= thresh))
            }
            tail = (tail :+ (d, c)).takeRight(zwin)
          }
          state.update(AnomalyState(stillOpen, tail))
          out.result().iterator
      }
  }

  def churnTransitions(events: DataFrame): Dataset[ChurnEvent] = {
    import events.sparkSession.implicits._
    val DayMs = 86400000L
    val ChurnDays = graft.operators.Events.ChurnDays
    events
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[ChurnState, ChurnEvent](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp)], state: GroupState[ChurnState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.update(st.copy(churned = true)) // no new timeout: quiet users emit once
            Iterator(ChurnEvent(uid, "churned", st.last_day + ChurnDays))
          } else {
            val maxDay = rows.map(_._2.getTime / DayMs).max
            val out = state.getOption match {
              case Some(st) if st.churned || maxDay - st.last_day >= ChurnDays =>
                Iterator(ChurnEvent(uid, "reactivated", maxDay))
              case _ => Iterator.empty
            }
            val newLast = math.max(state.getOption.map(_.last_day).getOrElse(Long.MinValue), maxDay)
            state.update(ChurnState(newLast, churned = false))
            state.setTimeoutTimestamp((newLast + ChurnDays) * DayMs)
            out
          }
      }
  }
}
