package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Plan-cache analog of the reference's
  * `andb/sql/optimizer/plan_cache/__init__.py` (an LRU of optimized
  * plans keyed by statement text).
  *
  * On Spark the expensive per-statement work is parse + analyze +
  * optimize; a `DataFrame` IS the reusable plan. Caching the DataFrame
  * object per (session, statement text) makes repeated submissions of
  * the same text skip the whole front end — execution still runs fresh
  * each time (same as the reference, which caches plans, not results).
  * For result caching, the Spark-native seat is `df.persist()` /
  * materialized views — deliberately NOT conflated with this.
  *
  * Bounded LRU (`maxEntries` per session) so a statement-generating
  * workload can't grow the driver without bound; parameterized
  * statements ([[graft.operators.RelationalSql.bind]]) should be cached
  * UNBOUND — one entry per text, not per binding — which callers get by
  * caching the text and binding afterwards.
  */
class PlanCache(maxEntries: Int = 128) {
  private case class Key(sessionId: String, text: String)
  private val lru = new java.util.LinkedHashMap[Key, DataFrame](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[Key, DataFrame]): Boolean =
      this.size() > maxEntries
  }
  private var hitCount = 0L
  private var missCount = 0L

  /** The cached analyzed/optimizable plan for `text`, building it on
    * first sight. Thread-safe; same text ⇒ same DataFrame object. */
  def sql(spark: SparkSession, text: String): DataFrame = synchronized {
    val key = Key(System.identityHashCode(spark).toString, text)
    val cached = lru.get(key)
    if (cached != null) { hitCount += 1; cached }
    else {
      missCount += 1
      val df = spark.sql(text)
      lru.put(key, df)
      df
    }
  }

  def hits: Long = synchronized(hitCount)
  def misses: Long = synchronized(missCount)
  def size: Int = synchronized(lru.size())
  def clear(): Unit = synchronized { lru.clear(); hitCount = 0; missCount = 0 }
}

object PlanCache extends PlanCache(128)
