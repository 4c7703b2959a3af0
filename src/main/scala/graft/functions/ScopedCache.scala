package graft.functions

import org.apache.spark.sql.DataFrame

/** Bounded persist() scope: query functions that cache a doubly-referenced
  * subtree register it under a stable key; re-invoking the same query
  * (Bench best-of-2, Verify, repeated tests in one session) unpersists the
  * previous generation instead of leaking a new cached plan each call.
  */
object ScopedCache {
  private val live = scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  def persist(scope: String, df: DataFrame): DataFrame = {
    live.put(scope, df).foreach(_.unpersist(blocking = false))
    df.persist()
  }
}
