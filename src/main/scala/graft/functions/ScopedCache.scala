package graft.functions

import scala.util.Try

import org.apache.spark.sql.DataFrame

/** Bounded persist() scope: query functions that cache a doubly-referenced
  * subtree register it under a stable key. Re-invoking the same query
  * (Verify, repeated tests in one session) reuses the already-materialized
  * generation when the new plan is semantically identical (`sameResult`)
  * and its session is still live; otherwise the previous generation is
  * unpersisted before caching the new one — at most one live cached plan
  * per scope, never a leak.
  */
object ScopedCache {
  private val live = scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  private def isLive(df: DataFrame): Boolean =
    Try(!df.sparkSession.sparkContext.isStopped).getOrElse(false)

  def persist(scope: String, df: DataFrame): DataFrame = synchronized {
    live.get(scope) match {
      case Some(old) if isLive(old) && (old.sparkSession eq df.sparkSession) &&
          old.queryExecution.analyzed.sameResult(df.queryExecution.analyzed) =>
        old
      case maybeOld =>
        maybeOld.filter(isLive).foreach(o => Try(o.unpersist(blocking = false)))
        live.put(scope, df)
        df.persist()
    }
  }

  /** Drop every cached generation (benchmarks call this between passes so
    * steady-state timings include the cached subtree's recomputation).
    * `blocking = true` waits for block eviction to finish — benchmarks need
    * this, or one query's cached blocks and the GC pressure of evicting
    * them bleed into the next query's timed pass (the round-3 q90/q91
    * anomaly: both ran right after q84's persisted subtree was dropped
    * asynchronously). */
  def clear(blocking: Boolean = false): Unit = synchronized {
    live.values.filter(isLive).foreach(o => Try(o.unpersist(blocking)))
    live.clear()
  }
}
