package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** x145: MERGE INTO semantics without a table format — the upsert batch a
  * warehouse applies nightly (update matched, insert unmatched, delete
  * tombstoned), expressed as ONE key-shuffled FULL OUTER join + row-level
  * CASE: exactly the reconciliation plan Delta/Iceberg run under their
  * MERGE syntax, minus the transaction log (x99's SCD2 keeps history;
  * this produces the current-state table). The change batch is carved
  * deterministically from orders with mutually exclusive ops (tombstones
  * win over updates by construction; insert keys are offset past the
  * OBSERVED key domain — max(o_orderkey), a one-row broadcast — so they
  * cannot collide at any SF, where a fixed constant offset would be
  * overtaken once keys outgrow it), prices ride as exact integer cents,
  * and the join is unhinted — AQE broadcasts a small change batch,
  * shuffles a large one on the key both sides already need.
  */
object Merge {

  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.orders(spark, dir).select(
      col("o_orderkey").as("k"), col("o_orderstatus").as("s"),
      round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
    val deletes = t.filter(col("k") % 11 === 0)
      .select(col("k"), lit("D").as("op"),
        lit(null).cast("string").as("src_s"), lit(null).cast("long").as("src_cents"))
    val updates = t.filter(col("k") % 7 === 0 && col("k") % 11 =!= 0)
      .select(col("k"), lit("U").as("op"),
        lit("U").as("src_s"), (col("cents") + 150L).as("src_cents"))
    // max+1, not max: key 0 exists in the fixture domain, and k + max
    // would map it straight onto the max key itself
    val off = t.agg((max(col("k")) + 1L).as("off"))
    val inserts = t.filter(col("k") % 13 === 0)
      .crossJoin(broadcast(off))
      .select((col("k") + col("off")).as("k"), lit("I").as("op"),
        lit("N").as("src_s"), col("cents").as("src_cents"))
    val src = deletes.unionByName(updates).unionByName(inserts)
    t.join(src, Seq("k"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(col("k").as("o_orderkey"),
        when(col("op") === "U" || col("op") === "I", col("src_s"))
          .otherwise(col("s")).as("o_orderstatus"),
        when(col("op") === "U" || col("op") === "I", col("src_cents"))
          .otherwise(col("cents")).as("price_cents"))
      .orderBy("o_orderkey")
  }

  /** DuckDB twin: the same carve, the same FULL OUTER reconciliation. */
  val mergeOracle: String =
    """WITH t AS (SELECT o_orderkey AS k, o_orderstatus AS s,
      |                  CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
      |           FROM orders),
      |src AS (
      |  SELECT k, 'D' AS op, CAST(NULL AS VARCHAR) AS src_s,
      |         CAST(NULL AS BIGINT) AS src_cents
      |  FROM t WHERE k % 11 = 0
      |  UNION ALL
      |  SELECT k, 'U', 'U', cents + 150 FROM t WHERE k % 7 = 0 AND k % 11 <> 0
      |  UNION ALL
      |  SELECT k + (SELECT MAX(k) + 1 FROM t), 'I', 'N', cents FROM t WHERE k % 13 = 0)
      |SELECT COALESCE(t.k, src.k) AS o_orderkey,
      |       CASE WHEN src.op IN ('U', 'I') THEN src.src_s ELSE t.s END AS o_orderstatus,
      |       CASE WHEN src.op IN ('U', 'I') THEN src.src_cents ELSE t.cents END AS price_cents
      |FROM t FULL OUTER JOIN src ON t.k = src.k
      |WHERE src.op IS NULL OR src.op <> 'D'
      |ORDER BY o_orderkey""".stripMargin

  /** x151: incremental aggregate maintenance — the materialized-view
    * refresh that makes per-key rollups affordable at 100 TB: history is
    * NEVER rescanned. The per-customer (count, cents-sum) state and the
    * arrival batch are staged to parquet (here carved from orders by
    * o_orderkey % 10; in production the state is yesterday's refresh
    * output and the arrivals are today's landed files), and the refresh
    * plan reads ONLY those two: aggregate the delta (map-side partials →
    * |delta-keys| rows), FULL OUTER merge with the |keys|-row state, and
    * coalesce-add the mergeable components. Count and sum are the
    * self-mergeable algebra; avg/stddev ride the same pattern as
    * (n, Σx, Σx²) triples. The FULL OUTER is what admits brand-new keys
    * (delta-only customers) and carries untouched ones through — and the
    * whole refresh is O(|state| + |delta|), not O(history). OpsSpec
    * asserts the refresh plan touches zero base-table files and that a
    * delta-only key lands with exactly its delta aggregate; the DuckDB
    * oracle is the from-scratch recompute the refresh must equal.
    */
  def incrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
    val statePath = s"${graft.RunScoped.ioDir}/x151_state"
    val deltaPath = s"${graft.RunScoped.ioDir}/x151_delta"
    orders.filter(col("o_orderkey") % 10 =!= 7)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("cents_sum"))
      .write.mode("overwrite").parquet(statePath)
    orders.filter(col("o_orderkey") % 10 === 7)
      .write.mode("overwrite").parquet(deltaPath)
    val state = spark.read.parquet(statePath)
    val deltaAgg = spark.read.parquet(deltaPath)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("d_n"), sum(col("cents")).as("d_cents"))
    state.join(deltaAgg, Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        (coalesce(col("n_orders"), lit(0L)) + coalesce(col("d_n"), lit(0L)))
          .as("n_orders"),
        (coalesce(col("cents_sum"), lit(0L)) + coalesce(col("d_cents"), lit(0L)))
          .as("cents_sum"))
      .orderBy("o_custkey")
  }

  /** DuckDB twin: the from-scratch recompute the incremental refresh must
    * reproduce exactly.
    */
  val incrementalAggOracle: String =
    """SELECT o_custkey,
      |       CAST(COUNT(*) AS BIGINT) AS n_orders,
      |       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents_sum
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin
}
