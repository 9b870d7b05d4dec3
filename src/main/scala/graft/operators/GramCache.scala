package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Bounded lifecycle for the vocab-sized gram tables that
  * [[Lexical.pmiBigrams]] and [[CorpusClean.bigramCrossEntropy]] pin:
  * a bare `persist()` per invocation would accumulate one cache entry
  * per distinct input frame for the life of the session (the repo
  * convention is explicit lifecycle — CosineTopK's release handle,
  * Dedup's SessionLru). Keyed by (session, semantic plan), so
  * repeated invocations over the same input reuse one pinned table
  * and the least-recently-used table is unpersisted past the cap.
  *
  * onDiscard is a NO-OP (Dedup's argument): Spark's CacheManager
  * dedupes persist() by semantic plan, so a racing loser's DataFrame
  * IS the winner's cache entry — unpersisting it would uncache the
  * winner. Eviction still unpersists.
  *
  * IMMUTABLE-INPUT ASSUMPTION (ADVICE r12): the key is the semantic
  * PLAN, not the data — if the underlying files are rewritten within
  * a session, cached callers (q71/q74 gram tables, bm25's per-doc
  * frame) serve the counts read at first materialization while
  * uncached queries see fresh data. That matches Spark's own
  * `Dataset.persist` contract (a pinned table never re-reads its
  * source); sessions that rewrite inputs in place should call
  * [[invalidate]] — the explicit-lifecycle release handle, matching
  * CosineTopK's convention.
  */
private[operators] final class PlanCache(maxEntries: Int) {
  import PlanCache.Entry

  private val lru = new graft.core.SessionLru[(String, Int), Entry](
    maxEntries, _.session, _.df.unpersist(false),
    onDiscard = Some(_ => ()))

  def cached(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val key = (graft.core.SessionTag.of(spark),
      df.queryExecution.analyzed.semanticHash())
    lru.getOrBuild(key) {
      Entry(df.persist(StorageLevel.MEMORY_AND_DISK), spark)
    }.df
  }

  /** Drop every table pinned for `spark` (unpersists each). For
    * sessions that rewrite input files in place — see the
    * immutable-input note above.
    */
  def invalidate(spark: SparkSession): Unit = lru.dropSession(spark)
}

private[operators] object PlanCache {
  final case class Entry(df: DataFrame, session: SparkSession)
}

private[operators] object GramCache {
  private val shared = new PlanCache(maxEntries = 8)
  def cached(df: DataFrame): DataFrame = shared.cached(df)

  /** Flushes EVERY plan cache for `spark` — the gram tables here AND
    * bm25's separate per-doc LRU ([[Lexical.bm25Cache]]), so the
    * immutable-input note above keeps one release handle after the
    * bm25 cache split (review r13: invalidating only the gram side
    * would leave bm25 serving pre-rewrite tf/df counts).
    */
  def invalidate(spark: SparkSession): Unit = {
    shared.invalidate(spark)
    Lexical.bm25Cache.invalidate(spark)
  }
}
