package graft.util

/** Thread-safe access-ordered LRU maps — the eviction policy of the
  * reference's per-reader caches (`core/search/LRUQueryCache.java:87`):
  * at capacity only the least-recently-used entry is dropped, so hot
  * entries survive a rotation through many cold ones (a clear-all cache
  * thrashes: one query past the ceiling evicts every hot entry).
  */
object Lru {
  def map[K, V](maxEntries: Int): java.util.Map[K, V] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[K, V](64, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
          size() > maxEntries
      })
}
