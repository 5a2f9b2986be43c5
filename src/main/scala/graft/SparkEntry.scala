package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * "Which products get reordered most": the reference's product-feature
    * block (F.py:69–74) joined to the products dim, top-20 by reorder count.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    insta.Insta.productFeatures(spark, dir)
      .join(broadcast(insta.Insta.productsDim(spark, dir)), "productID")
      .orderBy(col("numreorders").desc, col("productID"))
      .limit(20)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Core.all ++ graft.queries.Ext.all ++ graft.queries.Analytics.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Core.oracles ++ graft.queries.Ext.oracles ++ graft.queries.Analytics.oracles
}
