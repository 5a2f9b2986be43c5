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
                   weight: Column, cumCol: String, buckets: Int = 256): DataFrame =
    globalCumSums(df, order, tieBreak, Seq(weight -> cumCol), buckets)

  /** Multi-weight [[globalCumSum]]: ALL running totals over the SAME
    * (order, tieBreak) sequence in ONE two-phase pass. Chaining two
    * globalCumSum calls instead would feed the second call's three
    * self-references (stats, within, offsets) the first call's whole
    * tree — ~3× recomputation per chained level (the a36 chained-rank
    * lesson); here the extra weights are just extra window/aggregate
    * columns riding the one bucket shuffle.
    */
  /** @param bucketHint optional SKEW dial: a column MONOTONE
    *   NON-DECREASING in the (order, tieBreak) sort sequence but finer
    *   than `order` — e.g. order·C + tieProxy with C above the proxy's
    *   range. When the order value repeats heavily (a per-product score
    *   fanned out to a candidate grain: few distinct values, millions of
    *   rows each), bucketing on the raw value piles whole tie-groups
    *   into single buckets and the per-bucket window SERIALIZES on the
    *   hot ones; a finer monotone hint spreads a tie-group across
    *   buckets while keeping every bucket boundary order-respecting, so
    *   the ranks are bit-identical (the within-bucket sort still uses
    *   the true (order, tieBreak) key). Monotone-in-order is the ONLY
    *   correctness requirement; collisions just share a bucket.
    */
  def globalCumSums(df: DataFrame, order: Column, tieBreak: Column,
                    weights: Seq[(Column, String)],
                    buckets: Int = 256,
                    totals: Seq[String] = Nil,
                    bucketHint: Option[Column] = None): DataFrame = {
    require(weights.nonEmpty, "globalCumSums needs at least one weight")
    require(totals.isEmpty || totals.size == weights.size,
      s"totals must be empty or align 1:1 with weights (${totals.size} vs ${weights.size})")
    val bv = bucketHint.getOrElse(order)
    val stats = df.agg(min(bv.cast("double")).as("v_min"),
      max(bv.cast("double")).as("v_max"))
    val bucketed = df.crossJoin(broadcast(stats))
      .withColumn("c_bucket",
        when(col("v_max") === col("v_min"), lit(0L))
          .otherwise(least(
            floor((bv.cast("double") - col("v_min")) /
              (col("v_max") - col("v_min")) * buckets),
            lit(buckets - 1).cast("long"))).cast("long"))
      .drop("v_min", "v_max")
    val w = Window.partitionBy(col("c_bucket")).orderBy(order, tieBreak)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // all cumulants in ONE projection: chained withColumn calls re-alias
    // the sort expressions per window, so Catalyst planned one Window
    // operator (and one FULL SORT of the fact) per weight — a single
    // select collapses every same-spec window function into one Window
    // node over one sort (plan-asserted in OpsSpec)
    val within = bucketed.select(
      col("*") +: weights.zipWithIndex.map { case ((weight, _), i) =>
        sum(weight.cast("long")).over(w).as(s"c_cum_$i")
      }: _*)
    val wOff = Window.orderBy(col("c_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketTotals = bucketed.groupBy("c_bucket")
      .agg(sum(weights.head._1.cast("long")).as("c_w_0"),
        weights.tail.zipWithIndex.map { case ((weight, _), i) =>
          sum(weight.cast("long")).as(s"c_w_${i + 1}")
        }: _*)
    // the GRAND totals ride the same B-row frame the offsets need — an
    // unbounded window beside the preceding-only one, so a caller that
    // needs "cum / total" (deciles, normalized CDFs) gets the totals
    // attached for free instead of re-aggregating the whole input tree
    // (a third recomputation of a fact-sized join — the r10 x265 lesson)
    val wAll = Window.orderBy(col("c_bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets0 = weights.indices.foldLeft(bucketTotals) { (acc, i) =>
      acc.withColumn(s"c_offset_$i",
        coalesce(sum(col(s"c_w_$i")).over(wOff), lit(0L)))
    }
    val offsets1 = totals.zipWithIndex.foldLeft(offsets0) {
      case (acc, (totalCol, i)) =>
        acc.withColumn(totalCol, sum(col(s"c_w_$i")).over(wAll))
    }
    val offsets = offsets1.select(col("c_bucket") +:
      (weights.indices.map(i => col(s"c_offset_$i")) ++ totals.map(col)): _*)
    val joined = within.join(broadcast(offsets), "c_bucket")
    weights.zipWithIndex.foldLeft(joined) {
      case (acc, ((_, cumCol), i)) =>
        acc.withColumn(cumCol, col(s"c_cum_$i") + col(s"c_offset_$i"))
    }.drop("c_bucket")
      .drop(weights.indices.flatMap(i => Seq(s"c_cum_$i", s"c_offset_$i")): _*)
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
