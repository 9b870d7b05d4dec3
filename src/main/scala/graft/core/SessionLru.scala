package graft.core

import org.apache.spark.sql.SparkSession

/** Bounded access-order LRU for session-owned cached values (pinned
  * DataFrames, IVF indexes), shared by the operator-level caches so the
  * lifetime policy exists exactly once:
  *
  *  - entries whose owning SparkSession has stopped are swept on every
  *    access — a dead session's cached relation must never be served
  *    again (and cannot be unpersisted);
  *  - past `maxEntries`, the least-recently-USED entry is evicted and
  *    `onEvict` releases its resources (skipped for stopped sessions);
  *  - `mk` runs OUTSIDE the lock (it may launch Spark jobs — unrelated
  *    keys must not serialize behind it); a losing racer's value is
  *    released via `onDiscard` and the winner returned.
  *
  * `onDiscard` defaults to `onEvict` but MUST be a no-op when two
  * concurrently-built values share underlying resources: Spark's
  * CacheManager dedupes `df.cache()` by semantic plan, so for
  * deterministic builders the loser's DataFrame IS the winner's cache
  * entry — unpersisting the loser would uncache the winner.
  */
/** Stable per-live-session discriminator for cache keys. The classic
  * SparkSession API exposes no session UUID, and
  * `System.identityHashCode` can collide across sessions in one JVM
  * (and is recycled after GC) — two live sessions must never share a
  * cache key (VERDICT r6 #7). A random UUID is installed per session
  * object on first use; the WeakHashMap compares keys by identity
  * (SparkSession does not override equals) and lets a dead session's
  * entry vanish with the session.
  */
object SessionTag {
  private val tags = new java.util.WeakHashMap[SparkSession, String]()

  def of(spark: SparkSession): String = tags.synchronized {
    var t = tags.get(spark)
    if (t == null) { t = java.util.UUID.randomUUID().toString; tags.put(spark, t) }
    t
  }
}

final class SessionLru[K, V](maxEntries: Int,
                             sessionOf: V => SparkSession,
                             onEvict: V => Unit,
                             onDiscard: Option[V => Unit] = None) {

  private val discard: V => Unit = onDiscard.getOrElse(onEvict)

  private val m = new java.util.LinkedHashMap[K, V](16, 0.75f, true)

  private def sweepDead(): Unit = {
    val it = m.values().iterator()
    while (it.hasNext) if (sessionOf(it.next()).sparkContext.isStopped) it.remove()
  }

  /** Drop (and release via `onEvict`) every entry owned by `spark` —
    * the explicit-invalidation handle for sessions that rewrite a
    * cached value's input files in place.
    */
  def dropSession(spark: SparkSession): Unit = m.synchronized {
    val it = m.values().iterator()
    while (it.hasNext) {
      val v = it.next()
      if (sessionOf(v) eq spark) {
        it.remove()
        if (!spark.sparkContext.isStopped) onEvict(v)
      }
    }
  }

  def getOrBuild(key: K)(mk: => V): V = {
    m.synchronized {
      sweepDead()
      Option(m.get(key))
    } match {
      case Some(v) => v
      case None =>
        val built = mk
        m.synchronized {
          Option(m.get(key)) match {
            case Some(winner) => // lost a race; release ours
              discard(built)
              winner
            case None =>
              m.put(key, built)
              while (m.size() > maxEntries) {
                val eldest = m.keySet().iterator().next()
                val ev = m.remove(eldest)
                if (!sessionOf(ev).sparkContext.isStopped) onEvict(ev)
              }
              built
          }
        }
    }
  }
}
