package graft

import java.util.IdentityHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped memoization of persisted intermediate layers (ordersI,
  * basket, …): the Instacart feature queries share a deep common prefix,
  * and re-persisting it per query would thrash the block manager. One
  * persisted DataFrame per (session, sf dir, layer) — the Spark analogue
  * of the reference recomputing its pandas frames once per notebook run.
  */
object Layer {

  /** Keyed on the SparkSession reference itself (IdentityHashMap) — NOT
    * System.identityHashCode in a string key, which can collide across
    * sessions after GC and would hand a later session a DataFrame bound
    * to a stopped SparkContext. Entries for stopped sessions are purged
    * on every lookup (their cached blocks died with the context) and
    * eagerly via [[clear]]. The memo monitor guards ALL map state —
    * lookups, commits, and clear's iteration — so a clear cannot
    * interleave with a commit (orphaned-map leak) or with iteration
    * (ConcurrentModificationException). Only the build itself runs
    * outside the lock.
    */
  private val memo =
    new IdentityHashMap[SparkSession, java.util.HashMap[String, DataFrame]]()

  private def layerMap(spark: SparkSession): java.util.HashMap[String, DataFrame] =
    memo.synchronized {
      val it = memo.keySet().iterator()
      while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
      var m = memo.get(spark)
      if (m == null) { m = new java.util.HashMap[String, DataFrame](); memo.put(spark, m) }
      m
    }

  /** Memoized build-and-persist. The build runs OUTSIDE the lock:
    * building one layer recursively builds the layers under it (basket →
    * ordersI), and a nested mutation under the lock would deadlock/throw.
    *
    * Race handling — NOTE Spark's unpersist is PLAN-keyed
    * (CacheManager.uncacheQuery matches by sameResult), so unpersisting a
    * duplicate of an already-cached plan would evict the winner's blocks:
    *  - lost race (another thread committed the same key first): the
    *    loser's persist was a no-op on the shared cache entry; return the
    *    winner and do NOT unpersist.
    *  - cleared mid-build (the session map was replaced): do NOT unpersist
    *    either — another thread may already have re-committed the same
    *    plan into the live map (or may persist it between our check and
    *    the unpersist, which no lock can close since persists run outside
    *    the lock), and the plan-keyed unpersist would evict that winner's
    *    entry while leaving it memoized — the exact contract violation
    *    the recursion exists to prevent. The recursion re-memoizes the
    *    key, so the persisted entry is always owned by the live map and
    *    the next clear() releases it; nothing is leaked by skipping the
    *    eager unpersist.
    */
  def cached(spark: SparkSession, dir: String, key: String)(build: => DataFrame): DataFrame = {
    val m = layerMap(spark)
    val k = s"$dir|$key"
    val existing = memo.synchronized(m.get(k))
    if (existing != null) existing
    else {
      val df = build.persist(StorageLevel.MEMORY_AND_DISK)
      val (orphaned, prev) = memo.synchronized {
        if (memo.get(spark) ne m) (true, null)
        else {
          val p = m.get(k)
          if (p == null) m.put(k, df)
          (false, p)
        }
      }
      if (orphaned) {
        // a clear() raced this build: re-enter so the caller still gets a
        // persisted, memoized frame (the documented contract of e.g.
        // Dedup.dupClusters) instead of an unpersisted one whose first
        // downstream use silently re-runs the whole computation. No
        // unpersist here — see the race-handling note above: it would be
        // plan-keyed and could evict a concurrently re-committed winner.
        cached(spark, dir, key)(build)
      }
      else if (prev != null) prev // shared cache entry stays live — no unpersist
      else df
    }
  }

  /** Evict (and unpersist) every layer memoized for `spark`. Call before
    * spark.stop() in long-lived drivers; harmless if the session is
    * already stopped (unpersist is then a no-op on a dead context).
    * Iterates a map already detached from the memo, under the memo lock,
    * so no commit can interleave.
    */
  def clear(spark: SparkSession): Unit = {
    val layers = memo.synchronized {
      val m = memo.remove(spark)
      if (m == null) Nil
      else {
        val vs = new java.util.ArrayList[DataFrame](m.values())
        m.clear()
        scala.jdk.CollectionConverters.IteratorHasAsScala(vs.iterator()).asScala.toList
      }
    }
    layers.foreach { df =>
      try df.unpersist() catch { case _: Throwable => () }
    }
  }
}
