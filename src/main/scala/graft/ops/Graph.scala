package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Iterative graph analytics beyond connected components (the x63
  * machinery): weighted PageRank over a graph DERIVED from the fact
  * tables — the "important suppliers/domains" signal a pipeline computes
  * over link or trade graphs. Fixed iteration count, exact integer
  * arithmetic, so the result is oracle-checkable by unrolling the same
  * iterations in SQL.
  */
object Graph {

  /** x110: weighted PageRank over the nation-level trade graph (edge
    * src→dst weighted by order lines a customer nation places with a
    * supplier nation; built from lineitem⋈orders⋈customer⋈supplier).
    *
    * Exactness: rank lives in integer MICRO-units. Each iteration is
    * pr'(v) = (base + 850·Σ_{u→v} (pr(u)·w ÷ wout(u))) ÷ 1000 with ÷ the
    * integer floor division on both engines (`div` / `//`) and
    * base = 150000000 ÷ n — the damping-0.85 update with dangling/flooring
    * mass dropped, deterministic to the last digit. n (node count) is a
    * driver control scalar exactly like the CC convergence count.
    *
    * Scale shape: the edge aggregate is the only fact-sized work (partial
    * agg → one (src,dst)-keyed exchange); each iteration then joins the
    * |nodes|-row rank frame into the |edges|-row frame by src and
    * re-aggregates by dst — at web scale that is the standard
    * edge-partitioned PageRank round (rank frames broadcast when small,
    * key-shuffled when not; AQE decides, nothing is hinted). The fixed
    * iteration count keeps the plan static; a convergence-driven variant
    * would add the localCheckpoint round-bounding [[graft.ext.Dedup]]'s CC
    * loop demonstrates.
    */
  def nationTradeRank(spark: SparkSession, dir: String, iters: Int = 3): DataFrame = {
    val edges = graft.Layer.cached(spark, dir, "nationTradeEdges") {
      Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
        .agg(count(lit(1)).as("w"))
    }
    val out = edges.groupBy("src").agg(sum(col("w")).as("wout"))
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
    val n = nodes.count() // control-plane scalar (like the CC convergence count)
    val base = 150000000L / n
    var pr = nodes.withColumn("pr", lit(1000000L / n))
    for (_ <- 1 to iters) {
      val contrib = edges.join(out, "src").join(pr, col("src") === col("id"))
        .select(col("dst"), expr("(pr * w) div wout").as("c"))
      val sums = contrib.groupBy("dst").agg(sum(col("c")).as("s"))
      pr = nodes.join(sums, col("id") === col("dst"), "left_outer")
        .select(col("id"), expr(s"($base + 850 * coalesce(s, 0)) div 1000").as("pr"))
    }
    pr.join(broadcast(Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))),
        col("id") === col("n_nationkey"))
      .select(col("id").cast("long").as("nationkey"), col("n_name").as("nation"),
        col("pr").cast("long").as("pr_micro"))
      .orderBy(col("pr_micro").desc, col("nationkey"))
  }

  /** DuckDB twin: the identical three update rounds unrolled as CTEs —
    * `//` is DuckDB's integer floor division, matching Spark's `div` on
    * the all-positive operands.
    */
  val tradeRankOracle: String =
    """WITH e AS (
      |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  GROUP BY 1, 2),
      |outs AS (SELECT src, SUM(w) AS wout FROM e GROUP BY 1),
      |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
      |nn AS (SELECT COUNT(*) AS n FROM nodes),
      |pr0 AS (SELECT id, (1000000 // n) AS pr FROM nodes, nn),
      |c1 AS (SELECT e.dst, SUM((p.pr * e.w) // o.wout) AS s
      |       FROM e JOIN outs o USING (src) JOIN pr0 p ON p.id = e.src GROUP BY 1),
      |pr1 AS (SELECT nodes.id, (((150000000 // n) + 850 * COALESCE(c1.s, 0)) // 1000) AS pr
      |        FROM nodes CROSS JOIN nn LEFT JOIN c1 ON c1.dst = nodes.id),
      |c2 AS (SELECT e.dst, SUM((p.pr * e.w) // o.wout) AS s
      |       FROM e JOIN outs o USING (src) JOIN pr1 p ON p.id = e.src GROUP BY 1),
      |pr2 AS (SELECT nodes.id, (((150000000 // n) + 850 * COALESCE(c2.s, 0)) // 1000) AS pr
      |        FROM nodes CROSS JOIN nn LEFT JOIN c2 ON c2.dst = nodes.id),
      |c3 AS (SELECT e.dst, SUM((p.pr * e.w) // o.wout) AS s
      |       FROM e JOIN outs o USING (src) JOIN pr2 p ON p.id = e.src GROUP BY 1),
      |pr3 AS (SELECT nodes.id, (((150000000 // n) + 850 * COALESCE(c3.s, 0)) // 1000) AS pr
      |        FROM nodes CROSS JOIN nn LEFT JOIN c3 ON c3.dst = nodes.id)
      |SELECT CAST(pr3.id AS BIGINT) AS nationkey, n.n_name AS nation,
      |       CAST(pr3.pr AS BIGINT) AS pr_micro
      |FROM pr3 JOIN nation n ON n.n_nationkey = pr3.id
      |ORDER BY pr_micro DESC, nationkey""".stripMargin
}
