package graft.ext

import org.apache.spark.sql.DataFrame

/** One-shot materialization of a derived table a streaming sink scores
  * every micro-batch against. A lazy DataFrame passed into a
  * foreachBatch closure is NOT frozen: each trigger re-runs its whole
  * lineage (and re-reads its source files, so the "static" table
  * silently tracks live data). `freeze` pins the semantics the sink
  * scaladocs promise — persist + count before the stream starts, so
  * every batch joins one precomputed, truly static table.
  *
  * Lifecycle: the cache is held for the stream's lifetime. Sinks pin
  * their frozen tables under a SCOPE (their checkpoint path — unique
  * per sink by Structured Streaming's own contract) via [[scoped]],
  * and callers release the pins after stopping the stream with
  * `Freeze.release(checkpoint)` — without it the frames stay cached
  * for the session (the pre-release behavior; harmless for one-shot
  * jobs, a leak for long sessions cycling many sinks).
  */
object Freeze {
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, List[DataFrame]]()

  def apply(df: DataFrame): DataFrame = {
    val pinned = df.persist()
    pinned.count()
    pinned
  }

  /** Freeze `df` and register the pinned frame under `scope` so
    * [[release]] can unpersist it once the scope's stream has stopped.
    */
  private[ext] def scoped(scope: String, df: DataFrame): DataFrame = {
    val pinned = apply(df)
    registry.merge(scope, List(pinned), (older, newer) => newer ::: older)
    pinned
  }

  /** Unpersist every table frozen under `scope` (a sink's checkpoint
    * path). Call after `query.stop()`/`awaitTermination` — a running
    * stream would silently re-run the full lineage per trigger on a
    * released table. Idempotent; unknown scopes are a no-op.
    */
  def release(scope: String): Unit =
    Option(registry.remove(scope)).foreach(_.foreach(_.unpersist()))
}
