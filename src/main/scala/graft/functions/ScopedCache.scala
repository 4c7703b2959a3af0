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
  // per-scope-family insertion order, for LRU eviction across variants
  private val order = scala.collection.mutable.LinkedHashSet.empty[String]

  /** Max live generations per scope family. >1 so alternating
    * mixed-parameter callers (the ADVICE r5 thrash: q72 vs q76 with a
    * non-default maxDF, or a 1x/10x probe loop) each keep their own
    * generation; bounded so a session that shingles many corpora (test
    * suites, probes) cannot accumulate pinned executor blocks without
    * limit — the oldest variant in the family is unpersisted first. */
  val MaxVariantsPerFamily = 4

  private def isLive(df: DataFrame): Boolean =
    Try(!df.sparkSession.sparkContext.isStopped).getOrElse(false)

  def persist(scope: String, df: DataFrame): DataFrame =
    persist(scope, "", df)

  /** Cache `df` under (family, variant). Same variant + semantically
    * identical plan → reuse the live generation; same variant + new plan
    * → replace it; new variant → cache alongside the family's other
    * variants, evicting the family's least-recently-persisted one beyond
    * [[MaxVariantsPerFamily]]. */
  def persist(family: String, variant: String, df: DataFrame): DataFrame = synchronized {
    val key = if (variant.isEmpty) family else s"$family#$variant"
    live.get(key) match {
      case Some(old) if isLive(old) && (old.sparkSession eq df.sparkSession) &&
          old.queryExecution.analyzed.sameResult(df.queryExecution.analyzed) =>
        order.remove(key); order.add(key) // refresh recency
        old
      case maybeOld =>
        maybeOld.filter(isLive).foreach(o => Try(o.unpersist(blocking = false)))
        live.put(key, df)
        order.remove(key); order.add(key)
        val familyKeys = order.iterator
          .filter(k => k == family || k.startsWith(family + "#")).toSeq
        familyKeys.dropRight(MaxVariantsPerFamily).foreach { k =>
          live.remove(k).filter(isLive).foreach(o => Try(o.unpersist(blocking = false)))
          order.remove(k)
        }
        df.persist()
    }
  }

  /** Release the cached blocks of a `localCheckpoint`'d DataFrame once a
    * successor that superseded it is materialized (ContextCleaner would
    * get there eventually via GC, but long sessions running iterative
    * operators — q77/q78 label propagation, q100/q101 training loops —
    * should not accumulate dead rdd blocks in the meantime).
    *
    * The TERMINAL model each training loop returns (k×dim / blocks×k×dim
    * rows — a few KB) is deliberately NOT released here or by its
    * consumers: the returned DataFrame is lazy, so the consumer cannot
    * know when the caller has materialized its last downstream use, and
    * an eager release would truncate a live plan (the lineage is gone
    * after localCheckpoint). ContextCleaner reclaims it once the
    * reference drops — the right trade for a k-row block (ADVICE r6). */
  def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        // blocking: the eviction must finish inside the RELEASING
        // query's own pass — non-blocking drains the dead blocks (and
        // their GC pressure) into whatever the bench times NEXT, the
        // round-3 q90/q91 anomaly re-created by the r17 loop
        // checkpoints (q217 measured 1.7x its band right after q215's
        // release until this flip)
        r.rdd.unpersist(blocking = true); ()
      case _ =>
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
    order.clear()
  }
}
