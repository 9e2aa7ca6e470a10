package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming (SURVEY §2.11 gap the reference worked around
  * by scraping its own logs): per-domain running totals carried as
  * explicit GroupState, emitted once per domain per micro-batch.
  *
  * Scale shape: state is keyed by domain (bounded key space), rows
  * stream through each group without materializing the batch, and the
  * state payload is two longs — the canonical
  * `flatMapGroupsWithState` pattern for cross-batch accumulators that
  * `foreachBatch` snapshots cannot express.
  */
object StatefulStreams {

  case class DomainState(totalDocs: Long, totalChars: Long)

  case class DomainUpdate(
      domain: String,
      batchDocs: Long,
      cumDocs: Long,
      cumChars: Long)

  case class FunnelState(step: Int, lastMicros: Long)

  case class FunnelAdvance(
      userId: Long,
      step: Int,
      eventType: String,
      reachedAtMicros: Long)

  /** STREAMING ordered funnel — the stateful half of
    * [[graft.analytics.ExtraQueries.eventFunnel]]: per-user GroupState
    * carries (current step, entry time); each arriving event advances
    * the user one step when it matches the next step's type strictly
    * after the previous entry, emitting one [[FunnelAdvance]] row per
    * advancement. Greedy first-match in time order IS the batch
    * MIN-after-previous chain (the first qualifying event is the
    * minimum), so under the in-order-across-triggers contract the
    * emitted (user, step, time) set equals the batch funnel's reached
    * frames exactly — asserted in StreamingSpec. Within a micro-batch,
    * rows are sorted by (ts, event_id) before folding, so intra-batch
    * disorder cannot flip an election.
    *
    * Scale shape: state is 12 bytes per ACTIVE user (users who
    * completed or never entered the funnel stay at their terminal
    * step); each trigger streams events through their user group once.
    * `events` must have (user_id, event_type, ts, event_id).
    */
  def streamingFunnel(events: DataFrame,
                      steps: Seq[String] =
                        graft.analytics.ExtraQueries.FunnelSteps): Dataset[FunnelAdvance] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.selectExpr("user_id", "event_type",
        "unix_micros(ts) AS ts_micros", "event_id")
      .as[(Long, String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, String, Long, Long)],
         state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
          val out = scala.collection.mutable.ListBuffer.empty[FunnelAdvance]
          rows.toSeq.sortBy(r => (r._3, r._4)).foreach { case (_, tpe, ts, _) =>
            if (st.step < steps.length && tpe == steps(st.step) &&
                (st.step == 0 || ts > st.lastMicros)) {
              st = FunnelState(st.step + 1, ts)
              out += FunnelAdvance(uid, st.step, tpe, ts)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  case class TouchEvent(tsMicros: Long, eventId: Long, touchType: String)

  case class TouchBuffer(touches: List[TouchEvent])

  case class AttributionCredit(
      userId: Long,
      convId: Long,
      model: String,
      touchType: String,
      touchId: Long)

  /** STREAMING CONVERSION ATTRIBUTION — the stateful half of
    * [[graft.analytics.ExtraQueries.conversionAttribution]]: per-user
    * GroupState buffers the touch events still inside the lookback;
    * each arriving conversion credits its first- and last-touch (tie
    * order (ts, event_id), exactly the batch picks' window order) and
    * emits two [[AttributionCredit]] rows — 'none' with touch_id −1
    * when no in-window touch exists. EVERY event prunes the buffer to
    * the lookback behind its timestamp (safe under the
    * in-order-across-triggers contract: a later conversion's window
    * can only start later), so touch-only users — the common case —
    * hold bounded state, not an ever-growing list. Within a
    * micro-batch rows sort by (ts, TOUCHES-BEFORE-CONVERSIONS,
    * event_id) before folding: the batch picks credit a touch with
    * tts == cts, so an equal-timestamp touch must enter the buffer
    * before the conversion at that instant is attributed (across
    * triggers the in-order contract owns that case, as everywhere in
    * this module). Batch parity is pick-by-pick against
    * [[graft.analytics.ExtraQueries.attributionPicksDf]]
    * (ScaleToolsSpec).
    *
    * Scale shape: state is the per-user in-lookback touch list —
    * bounded by app mechanics (the q_session_stats argument); each
    * trigger streams events through their user group once.
    * `events` must have (user_id, event_type, ts, event_id).
    */
  def streamingAttribution(events: DataFrame,
      lookbackH: Int = graft.analytics.ExtraQueries.AttributionLookbackH,
      convType: String = graft.analytics.ExtraQueries.AttributionConv,
      touchTypes: Seq[String] = graft.analytics.ExtraQueries.AttributionTouch)
      : Dataset[AttributionCredit] = {
    val spark = events.sparkSession
    import spark.implicits._
    val lookbackMicros = lookbackH.toLong * 3600L * 1000000L
    events.selectExpr("user_id", "event_type",
        "unix_micros(ts) AS ts_micros", "event_id")
      .as[(Long, String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, String, Long, Long)],
         state: GroupState[TouchBuffer]) =>
          var buf = state.getOption.getOrElse(TouchBuffer(Nil)).touches
          val out = scala.collection.mutable.ListBuffer.empty[AttributionCredit]
          // ties: touches fold before conversions at the same instant
          // (the batch join's tts <= cts includes equality)
          val ordered = rows.toSeq.sortBy(r =>
            (r._3, if (touchTypes.contains(r._2)) 0 else 1, r._4))
          ordered.foreach { case (_, tpe, ts, id) =>
            // prune on EVERY event: a later conversion's window starts
            // no earlier, and touch-only users must not grow unbounded
            buf = buf.filter(_.tsMicros >= ts - lookbackMicros)
            if (touchTypes.contains(tpe)) {
              buf = TouchEvent(ts, id, tpe) :: buf
            } else if (tpe == convType) {
              val inWin = buf.filter(t =>
                t.tsMicros <= ts && t.tsMicros >= ts - lookbackMicros)
              if (inWin.isEmpty) {
                out += AttributionCredit(uid, id, "first", "none", -1L)
                out += AttributionCredit(uid, id, "last", "none", -1L)
              } else {
                val f = inWin.minBy(t => (t.tsMicros, t.eventId))
                val l = inWin.maxBy(t => (t.tsMicros, t.eventId))
                out += AttributionCredit(uid, id, "first", f.touchType, f.eventId)
                out += AttributionCredit(uid, id, "last", l.touchType, l.eventId)
              }
            }
          }
          state.update(TouchBuffer(buf))
          out.iterator
      }
  }

  /** docs must have (domain: string, content: string). */
  def runningDomainTotals(docs: DataFrame): Dataset[DomainUpdate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.selectExpr("domain", "content").as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (domain: String, rows: Iterator[(String, String)], state: GroupState[DomainState]) =>
          var batchDocs = 0L
          var batchChars = 0L
          rows.foreach { case (_, content) =>
            batchDocs += 1
            batchChars += (if (content == null) 0 else content.length)
          }
          val prev = state.getOption.getOrElse(DomainState(0L, 0L))
          val next = DomainState(prev.totalDocs + batchDocs, prev.totalChars + batchChars)
          state.update(next)
          Iterator(DomainUpdate(domain, batchDocs, next.totalDocs, next.totalChars))
      }
  }
}
