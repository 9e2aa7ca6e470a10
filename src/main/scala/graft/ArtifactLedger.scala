package graft

/** Build-price ledger for the session-artifact program: every
  * session-scoped cache (the shared edge checkpoints, LM blocks,
  * Lloyd fits, trained embeddings, …) times its ONE-TIME build here,
  * so the bench can decompose its warm-priced total into resident
  * cost + one-time artifact builds — the "what does a cold pipeline
  * pay?" number the warm min-of-2 methodology structurally discards
  * (the r14 judge's warm-pricing finding). Prices are wall-clock
  * seconds of the cache-miss body, summed per artifact name if a
  * keyed cache builds several variants (e.g. the 5-gram blocks per
  * key width).
  *
  * Thread-safe; Bench snapshots and resets around its sweep so the
  * sidecar reflects exactly the builds that run inside the bench
  * session.
  */
object ArtifactLedger {
  private val builds =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  /** Run `f`, billing its wall-clock to `name` (summed on repeats). */
  def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    val secs = (System.nanoTime() - t0) / 1e9
    builds.merge(name, Double.box(secs),
      (a: java.lang.Double, b: java.lang.Double) => Double.box(a + b))
    r
  }

  /** Artifact-name → summed build seconds, insertion-independent. */
  def snapshot: Map[String, Double] = {
    val it = builds.entrySet().iterator()
    var m = Map.empty[String, Double]
    while (it.hasNext) { val e = it.next(); m += e.getKey -> e.getValue.doubleValue() }
    m
  }

  def reset(): Unit = builds.clear()
}
