package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-14 SQL-surface gates: the remaining "new in Spark 4" query
  * spellings a migrating warehouse user reaches for, each hash-checked
  * against a DuckDB twin (reference F.py computes everything in pandas;
  * these are the §2.11 warehouse-surface extensions — VARIANT/x284,
  * WITH RECURSIVE/x285, SQL UDFs/x286, LISTAGG/x287 landed in r13; pipe
  * syntax and GROUP BY ALL close out the 4.x SQL ladder).
  */
object SqlSurfaces {

  /** x288: SQL PIPE syntax (Spark 4's `|>` operators, SPARK-49555 — the
    * linear query spelling popularized by GoogleSQL): scan |> WHERE |>
    * AGGREGATE … GROUP BY |> ORDER BY over lineitem pricing. The pipe
    * form is pure PARSER surface — it must plan exactly the ANSI
    * aggregate (same pushdown, same partial agg), which the hash against
    * DuckDB's ANSI twin plus the shared plan-contract sweep verify.
    * Money stays in exact cents BIGINT.
    */
  def pipeSyntaxPricing(spark: SparkSession, dir: String): DataFrame =
    spark.sql(
      s"""FROM parquet.`$dir/lineitem.parquet`
         ||> WHERE l_quantity < 10
         ||> AGGREGATE COUNT(*) AS n_lines,
         |             CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
         |                  AS BIGINT) AS rev_e2
         |   GROUP BY l_returnflag, l_linestatus
         ||> ORDER BY l_returnflag, l_linestatus""".stripMargin)

  val pipeSyntaxPricingOracle: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_lines,
      |       CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
      |            AS BIGINT) AS rev_e2
      |FROM lineitem WHERE l_quantity < 10
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** x289: `GROUP BY ALL` + `ORDER BY ALL` — the "group by every
    * non-aggregate select item" shorthand both engines support natively,
    * so the GATE TEXT IS THE ORACLE TEXT: any divergence in which
    * columns the shorthand binds (or in the ALL ordering) breaks the
    * hash. Priority-by-status order counts with exact cents.
    */
  def groupByAllCounts(spark: SparkSession, dir: String): DataFrame =
    spark.sql(
      s"""SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
         |       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
         |            AS BIGINT) AS rev_e2
         |FROM parquet.`$dir/orders.parquet`
         |GROUP BY ALL ORDER BY ALL""".stripMargin)

  val groupByAllCountsOracle: String =
    """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
      |       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
      |            AS BIGINT) AS rev_e2
      |FROM orders
      |GROUP BY ALL ORDER BY ALL""".stripMargin
}
