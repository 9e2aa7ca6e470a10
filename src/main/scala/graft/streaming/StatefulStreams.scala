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
