package graft.engine

/** Count-bounded LRU memo for session-scoped index artifacts (ANN
  * buckets, IVF assignments, posting lists, trained coefficients).
  *
  * The unbounded TrieMap it replaces pinned one cached frame per
  * (session, dir, kind) forever: a long-lived session scanning many
  * corpora accumulated persisted DataFrames until executor storage
  * filled. This cache keeps at most `capacity` entries in true LRU
  * order (access refreshes recency) and calls `release` on each
  * evicted value so its persisted blocks are freed at eviction time.
  *
  * Eviction is TRANSPARENT to callers: every value held here is a
  * memo of a deterministic build (`getOrElseUpdate` re-runs the build
  * on the next request), and unpersisting a Spark frame never breaks
  * an in-flight plan that references it — Spark recomputes missing
  * blocks from lineage — so an evicted-then-used frame degrades to a
  * recompute, never to a wrong answer. That recompute-safety is what
  * makes a simple count bound sound here.
  *
  * Builds run OUTSIDE the lock (an IVF fit is seconds of cluster
  * work; serializing distinct-key builds behind one mutex would be a
  * regression). Two racing builders of the same key both build; the
  * loser's value is released and the winner's returned, matching the
  * at-least-once evaluation contract TrieMap.getOrElseUpdate had.
  */
final class IndexCache[K, V <: AnyRef](initialCapacity: Int)(release: V => Unit) {

  @volatile private var cap: Int = initialCapacity

  private val map = new java.util.LinkedHashMap[K, V](16, 0.75f, /*accessOrder=*/ true)

  def getOrElseUpdate(key: K, build: => V): V = {
    val hit = map.synchronized(Option(map.get(key)))
    hit match {
      case Some(v) => v
      case None =>
        val built = build
        // insert-or-adopt under the lock; evict eldest beyond cap
        val (winner, evicted) = map.synchronized {
          val existing = map.get(key)
          if (existing != null) (existing, List(built))
          else {
            map.put(key, built)
            val out = List.newBuilder[V]
            val it = map.entrySet().iterator()
            while (map.size() > cap && it.hasNext) {
              out += it.next().getValue
              it.remove()
            }
            (built, out.result())
          }
        }
        evicted.foreach(release)
        winner
    }
  }

  def size: Int = map.synchronized(map.size())

  /** Shrink/grow the bound; shrinking evicts (and releases) eldest
    * entries immediately. Test hook + deployment tuning knob. */
  def setCapacity(n: Int): Unit = {
    val evicted = map.synchronized {
      cap = n
      val out = List.newBuilder[V]
      val it = map.entrySet().iterator()
      while (map.size() > cap && it.hasNext) {
        out += it.next().getValue
        it.remove()
      }
      out.result()
    }
    evicted.foreach(release)
  }

  def clear(): Unit = {
    val vs = map.synchronized {
      val out = new java.util.ArrayList[V](map.values())
      map.clear()
      out
    }
    vs.forEach(v => release(v))
  }
}
