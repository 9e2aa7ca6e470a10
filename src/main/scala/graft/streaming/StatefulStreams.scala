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
