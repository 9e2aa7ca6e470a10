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
  * The cache is held for the stream's lifetime; the caller unpersists
  * after the stream stops (or lets the session GC it).
  */
private[ext] object Freeze {
  def apply(df: DataFrame): DataFrame = {
    val pinned = df.persist()
    pinned.count()
    pinned
  }
}
