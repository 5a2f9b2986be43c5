package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Raw testdata table loaders (TESTDATA.md). Parquet-only: schema travels
  * with the file, so no inference; column pruning + predicate pushdown reach
  * the scan for free (SURVEY.md §1.4, §4).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  /** events.ts is nanosecond-precision parquet, which Spark 4 cannot read
    * as a timestamp; sessions set spark.sql.legacy.parquet.nanosAsLong so
    * it arrives as an int64 of nanos, normalized here to a µs timestamp
    * (integer DIV — a double round-trip would lose low bits of an int64
    * epoch). DuckDB's epoch_us() truncates ns→µs the same way.
    */
  def events(spark: SparkSession, dir: String): DataFrame     = normalizeTs(load(spark, dir, "events"))

  def normalizeTs(df: DataFrame): DataFrame =
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
