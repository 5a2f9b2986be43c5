package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped memo for shared derived layers (ordersI, basket, the
  * feature aggregates). Verify/Bench run dozens of queries that all re-derive
  * the same intermediates; memoizing + persisting them turns that into one
  * computation per layer per (session, sf-dir).
  *
  * Scale posture: the persisted layers are either dimension-grain (users,
  * products) or aggregate-grain (user×product) — proportionally small at any
  * scale. The one fact-grain layer (basket) uses MEMORY_AND_DISK so it
  * spills rather than OOMs; on a real 100 TB deployment the same layer would
  * be a materialized bucketed table, of which this memo is the
  * single-session analogue.
  */
object Layer {
  private val memo = new ConcurrentHashMap[String, DataFrame]()

  def cached(spark: SparkSession, dir: String, key: String)(build: => DataFrame): DataFrame =
    memo.computeIfAbsent(s"${System.identityHashCode(spark)}|$dir|$key",
      _ => build.persist(StorageLevel.MEMORY_AND_DISK))
}
