package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` stream shape
  * (event_id, ts, user_id, event_type, value). The reference pipeline is
  * batch-only (SURVEY.md §2.9) — these are the streaming-ingest
  * counterparts a continuously-fed KG/training-data pipeline needs:
  * watermarked windowed aggregation and gap-based sessionization with
  * custom state. Both run identically over a static DataFrame (Spark's
  * unified batch/streaming semantics), which is how the specs assert
  * correctness.
  */
object StreamingOps {

  /** per-type event counts over 1-minute tumbling windows with a
    * 2-minute watermark (streaming-safe aggregation). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n_events"))

  final case class Ev(user_id: Long, ts: Timestamp, event_type: String)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class SessionOut(user_id: Long, session_start: Timestamp,
                              session_end: Timestamp, n_events: Int)

  /** gap-based sessionization (30 min inactivity closes a session) via
    * flatMapGroupsWithState — the custom-state streaming primitive. */
  def sessionize(events: Dataset[Ev], gapMs: Long = 30L * 60 * 1000): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, evs, state: GroupState[SessionState]) =>
          // order within the group (batch mode delivers unordered)
          val sorted = evs.toSeq.sortBy(_.ts.getTime)
          val out = scala.collection.mutable.ListBuffer.empty[SessionOut]
          var cur = state.getOption
          for (e <- sorted) {
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.last <= gapMs =>
                cur = Some(s.copy(last = t, n = s.n + 1))
              case Some(s) =>
                out += SessionOut(uid, new Timestamp(s.start), new Timestamp(s.last), s.n)
                cur = Some(SessionState(t, t, 1))
              case None =>
                cur = Some(SessionState(t, t, 1))
            }
          }
          // batch mode: flush the trailing session (a streaming run would
          // keep it in state and use a timeout to emit)
          cur.foreach { s =>
            if (!state.hasTimedOut) {
              out += SessionOut(uid, new Timestamp(s.start), new Timestamp(s.last), s.n)
            }
            state.update(s)
          }
          out.iterator
      }
  }
}
