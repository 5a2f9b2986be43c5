package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact global ranking. `row_number().over(Window.orderBy(v))`
  * is THE classic Spark scale-killer: no partition key means every row
  * moves to ONE task. This helper keeps the rank exact while staying
  * parallel: value-derived range buckets (monotone in v, so bucket
  * boundaries respect the global order), a per-bucket window, and a
  * bucket-offset join — the same two-phase algebra Spark's own global
  * sort uses, expressed declaratively.
  */
object Ranking {

  /** Exact global row_number ordered by (value asc, tieBreak asc).
    *
    * Phase 1: bucket = floor((v − min)/span · B) clamped to [0, B−1] —
    * min/max arrive as a one-row broadcast, the bucket map is monotone so
    * every row of bucket b sorts before every row of bucket b+1, and equal
    * values (tie-break territory) always share a bucket. Phase 2:
    * row_number within each bucket (parallel across B ≈ hundreds of
    * buckets). Phase 3: each bucket's global offset is the running count
    * of lower buckets — a B-row frame whose single-partition window is
    * trivially cheap — broadcast back. Skewed values degrade gracefully:
    * a hot bucket bounds parallelism but never exceeds its value-range
    * population (and B can scale with the cluster).
    *
    * Returns the input plus `rankCol` (1-based global rank as BIGINT).
    */
  def globalRowNumber(df: DataFrame, value: Column, tieBreak: Column,
                      rankCol: String, buckets: Int = 256): DataFrame = {
    val stats = df.agg(min(value.cast("double")).as("v_min"),
      max(value.cast("double")).as("v_max"))
    val bucketed = df.crossJoin(broadcast(stats))
      .withColumn("g_bucket",
        when(col("v_max") === col("v_min"), lit(0L))
          .otherwise(least(
            floor((value.cast("double") - col("v_min")) /
              (col("v_max") - col("v_min")) * buckets),
            lit(buckets - 1).cast("long"))).cast("long"))
      .drop("v_min", "v_max")
    val within = bucketed.withColumn("g_rn",
      row_number().over(Window.partitionBy(col("g_bucket")).orderBy(value, tieBreak))
        .cast("long"))
    val offsets = within.groupBy("g_bucket").agg(count(lit(1)).as("g_n"))
      .withColumn("g_offset",
        coalesce(sum(col("g_n")).over(
          Window.orderBy(col("g_bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("g_bucket", "g_offset")
    within.join(broadcast(offsets), "g_bucket")
      .withColumn(rankCol, col("g_rn") + col("g_offset"))
      .drop("g_bucket", "g_rn", "g_offset")
  }

  /** Exact global running total of `weight` in the (order asc, tieBreak
    * asc) sequence — `sum(w).over(Window.orderBy(...))` without the
    * single-task exchange that global window would force on the fact.
    * Same three-phase algebra as [[globalRowNumber]]: monotone value
    * buckets, a per-bucket cumulative window (parallel), and a B-row
    * bucket-offset frame (per-bucket weight totals, prefix-summed on the
    * driver-sized side) broadcast back. `weight` must be integral —
    * BIGINT addition is associative, so bucket-local sums + offsets equal
    * the global scan exactly.
    *
    * Returns the input plus `cumCol` = inclusive running total as BIGINT.
    */
  def globalCumSum(df: DataFrame, order: Column, tieBreak: Column,
                   weight: Column, cumCol: String, buckets: Int = 256): DataFrame = {
    val stats = df.agg(min(order.cast("double")).as("v_min"),
      max(order.cast("double")).as("v_max"))
    val bucketed = df.crossJoin(broadcast(stats))
      .withColumn("c_bucket",
        when(col("v_max") === col("v_min"), lit(0L))
          .otherwise(least(
            floor((order.cast("double") - col("v_min")) /
              (col("v_max") - col("v_min")) * buckets),
            lit(buckets - 1).cast("long"))).cast("long"))
      .drop("v_min", "v_max")
    val within = bucketed.withColumn("c_cum",
      sum(weight.cast("long")).over(
        Window.partitionBy(col("c_bucket")).orderBy(order, tieBreak)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offsets = bucketed.groupBy("c_bucket")
      .agg(sum(weight.cast("long")).as("c_w"))
      .withColumn("c_offset",
        coalesce(sum(col("c_w")).over(
          Window.orderBy(col("c_bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("c_bucket", "c_offset")
    within.join(broadcast(offsets), "c_bucket")
      .withColumn(cumCol, col("c_cum") + col("c_offset"))
      .drop("c_bucket", "c_cum", "c_offset")
  }

  /** Exact global running MAX of `value` in (order asc, tieBreak asc) —
    * STRICTLY-PRECEDING frame (the current row is excluded, so the first
    * row gets NULL): the scan behind out-of-orderness audits ("had
    * anything later already arrived when this row did?"). Same
    * three-phase algebra as [[globalCumSum]] — max is associative, so
    * bucket-local prefix maxes combined with a B-row bucket-prefix
    * frame equal the global scan exactly; the strictly-preceding
    * semantics compose as greatest(bucket-local strict prefix max,
    * max of all LOWER buckets).
    *
    * Returns the input plus `maxCol` = running max of value over all
    * strictly-preceding rows (BIGINT; NULL for the global first row).
    */
  def globalCumMaxPrev(df: DataFrame, order: Column, tieBreak: Column,
                       value: Column, maxCol: String, buckets: Int = 256): DataFrame = {
    val stats = df.agg(min(order.cast("double")).as("v_min"),
      max(order.cast("double")).as("v_max"))
    val bucketed = df.crossJoin(broadcast(stats))
      .withColumn("m_bucket",
        when(col("v_max") === col("v_min"), lit(0L))
          .otherwise(least(
            floor((order.cast("double") - col("v_min")) /
              (col("v_max") - col("v_min")) * buckets),
            lit(buckets - 1).cast("long"))).cast("long"))
      .drop("v_min", "v_max")
    val within = bucketed.withColumn("m_local",
      max(value.cast("long")).over(
        Window.partitionBy(col("m_bucket")).orderBy(order, tieBreak)
          .rowsBetween(Window.unboundedPreceding, -1)))
    val offsets = bucketed.groupBy("m_bucket")
      .agg(max(value.cast("long")).as("m_w"))
      .withColumn("m_offset",
        max(col("m_w")).over(
          Window.orderBy(col("m_bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)))
      .select("m_bucket", "m_offset")
    within.join(broadcast(offsets), "m_bucket")
      .withColumn(maxCol, greatest(col("m_local"), col("m_offset")))
      .drop("m_bucket", "m_local", "m_offset")
  }
}
