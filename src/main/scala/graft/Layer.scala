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
    * eagerly via [[clear]]. All access synchronizes on the map.
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

  /** Memoized build-and-persist. The build runs OUTSIDE the map lock:
    * building one layer recursively builds the layers under it (basket →
    * ordersI), and a nested mutation under the lock would deadlock/throw.
    * On a lost race, drop the duplicate and keep the winner. If [[clear]]
    * removed this session's map mid-build, the freshly-persisted frame
    * would land in an orphaned map nothing can evict — detect that under
    * the memo lock and hand back the frame unpersisted instead.
    */
  def cached(spark: SparkSession, dir: String, key: String)(build: => DataFrame): DataFrame = {
    val m = layerMap(spark)
    val k = s"$dir|$key"
    val existing = m.synchronized(m.get(k))
    if (existing != null) existing
    else {
      val df = build.persist(StorageLevel.MEMORY_AND_DISK)
      val orphaned = memo.synchronized(memo.get(spark) ne m)
      if (orphaned) { df.unpersist(); df }
      else {
        val prev = m.synchronized {
          val p = m.get(k)
          if (p == null) m.put(k, df)
          p
        }
        if (prev != null) { df.unpersist(); prev } else df
      }
    }
  }

  /** Evict (and unpersist) every layer memoized for `spark`. Call before
    * spark.stop() in long-lived drivers; harmless if the session is
    * already stopped (unpersist is then a no-op on a dead context).
    */
  def clear(spark: SparkSession): Unit = {
    val m = memo.synchronized(memo.remove(spark))
    if (m != null) m.values().forEach { df =>
      try df.unpersist() catch { case _: Throwable => () }
    }
  }
}
