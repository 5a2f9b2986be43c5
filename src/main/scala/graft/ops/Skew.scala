package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling patterns for 100 TB posture. AQE's skew-join splitting
  * handles join-side skew automatically; these cover the aggregation-side
  * heavy-hitter case AQE does not: a groupBy where a handful of keys own a
  * large share of all rows, so one reducer drags the stage.
  */
object Skew {

  /** Two-phase salted aggregation: rows are spread over `salt` sub-keys,
    * partially aggregated per (key, salt), then the partials are combined
    * per key. The heavy key's rows land on `salt` reducers instead of one.
    * Works for any algebraic aggregate supplied as (partial, combine)
    * pairs; the count/sum convenience below covers the common case.
    *
    * The salt is a deterministic per-row hash of every column (xxhash64) —
    * NOT spark_partition_id/monotonically_increasing_id, whose row→salt
    * assignment varies across runs and would make floating-point sums
    * run-dependent (partial-sum order changes) for non-integral doubles.
    */
  def saltedAgg(df: DataFrame, key: Seq[String], salt: Int,
                partial: Seq[Column], combine: Seq[Column]): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salt.toLong)))
      .groupBy((key.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(key.map(col): _*)
      .agg(combine.head, combine.tail: _*)

  /** Salted count + sum — equivalent to
    * groupBy(key).agg(count(*) as n, sum(valueCol) as total).
    */
  def saltedCountSum(df: DataFrame, key: Seq[String], valueCol: String,
                     salt: Int = 16): DataFrame =
    saltedAgg(df, key, salt,
      partial = Seq(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s")),
      combine = Seq(sum(col("__n")).as("n"), sum(col("__s")).as("total")))
}
