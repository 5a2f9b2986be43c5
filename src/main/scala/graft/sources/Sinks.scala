package graft.sources

import org.apache.spark.sql.DataFrame

/** Sinks (SURVEY.md §2.1 S6–S8): the reference ended every path in a
  * driver-side collect (toPandas / print / dict). The engine's terminal
  * operations stay distributed — parquet writes with layout control.
  *
  * Layout is the scale lever: partitionBy turns a predicate on the
  * partition column into directory pruning (no files opened), bucketing
  * pre-shuffles by join key so co-bucketed joins skip their Exchange.
  */
object Sinks {

  def parquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Hive-style partition layout: one directory per distinct value tuple.
    * Use for low-cardinality pruning columns (date, eval_set, lang).
    */
  def parquetPartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Bucketed managed table: rows hash-distributed into `n` buckets by
    * `bucketCols` and sorted within each — two tables bucketed the same way
    * join without a shuffle. Requires saveAsTable (bucket metadata lives in
    * the catalog).
    */
  def bucketedTable(df: DataFrame, table: String, bucketCols: Seq[String],
                    n: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(n, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
