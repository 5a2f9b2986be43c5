package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    * Two salt modes — reproducibility vs spread, an inherent trade-off:
    *
    *  - `deterministicSalt = true` (default): salt = xxhash64 of every
    *    column. Row→salt never depends on partition layout, so the
    *    row→partial-sum GROUPING is run-stable (the old positional salt
    *    regrouped rows every run). Combine ORDER within a reducer can
    *    still follow shuffle-fetch arrival on a real cluster, so strict
    *    bit-for-bit double reproduction additionally needs an
    *    order-independent accumulator (decimal/integral sums) — in
    *    local mode fetch order is stable and sums reproduce exactly.
    *    Caveat: IDENTICAL rows share a salt, so a hot key whose rows are
    *    duplicates (e.g. a projected key-only frame) still lands on one
    *    reducer — content hashing cannot distinguish identical content.
    *    That duplicate-heavy shape is exactly what positional mode is
    *    for: pass `deterministicSalt = false` there (counts/integer sums
    *    are order-independent, so nothing is lost). Deterministic stays
    *    the DEFAULT because a silently layout-dependent aggregation is
    *    the worse failure mode for the hash-checked pipeline this
    *    library feeds; mixing a position term into the content hash
    *    would just be positional mode with extra steps.
    *  - `deterministicSalt = false`: salt = round-robin over physical row
    *    position (partition id + local id). Spreads even duplicate rows
    *    uniformly, but row→salt varies across runs/layouts, so use it
    *    only when the aggregates are order-independent (counts, integer /
    *    decimal sums, min/max) — which covers most heavy-hitter cases.
    */
  def saltedAgg(df: DataFrame, key: Seq[String], salt: Int,
                partial: Seq[Column], combine: Seq[Column],
                deterministicSalt: Boolean = true): DataFrame = {
    val saltCol =
      if (deterministicSalt)
        pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salt.toLong))
      else
        pmod(spark_partition_id().cast("long") + monotonically_increasing_id(),
          lit(salt.toLong))
    df.withColumn("__salt", saltCol)
      .groupBy((key.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(key.map(col): _*)
      .agg(combine.head, combine.tail: _*)
  }

  /** Salted count + sum — equivalent to
    * groupBy(key).agg(count(*) as n, sum(valueCol) as total).
    */
  def saltedCountSum(df: DataFrame, key: Seq[String], valueCol: String,
                     salt: Int = 16, deterministicSalt: Boolean = true): DataFrame =
    saltedAgg(df, key, salt,
      partial = Seq(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s")),
      combine = Seq(sum(col("__n")).as("n"), sum(col("__s")).as("total")),
      deterministicSalt = deterministicSalt)

  /** Zipf-skewed grouping domain derived from lineitem: k = ⌊log₂ p⌋ over
    * the uniform part key, so bucket j holds 2ʲ parts and the heaviest
    * bucket owns ~40–50% of all rows (49% at sf0.01's 2000-part domain,
    * 41% at sf0.1's 20000) — the classic heavy-hitter shape.
    * (The +0.5 keeps the float log off exact power-of-two boundaries so
    * Spark's ln(x)/ln 2 and DuckDB's log2 floor identically; the margin to
    * the nearest integer is ≥ 0.72/2ᵏ ≈ 4e-5 at k = 14, vs ~1e-13 float
    * error.) v is a 4096-ary value domain for the distinct-set pair.
    */
  private[graft] def zipfBase(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.lineitem(spark, dir).select(
      floor(log(2.0, col("l_partkey") + 0.5d)).cast("long").as("k"),
      pmod(col("l_orderkey"), lit(4096L)).as("v"),
      col("l_quantity"))

  /** Plain count/sum over the zipf key — the control for x42. Algebraic
    * aggregates are ALREADY skew-immune in Spark: partial HashAggregate
    * collapses the hot key to one row per map partition before the
    * exchange, so the reducer receives ≤ #partitions rows per key no
    * matter how hot it is. The bench pair exists to demonstrate that, not
    * to strawman it (see docs/PLANS.md x41–x44).
    */
  def skewSumPlain(spark: SparkSession, dir: String): DataFrame =
    zipfBase(spark, dir)
      .groupBy("k")
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 4).as("total"))
      .orderBy("k")

  /** saltedCountSum over the same zipf key — must equal [[skewSumPlain]]. */
  def skewSumSalted(spark: SparkSession, dir: String): DataFrame =
    saltedCountSum(zipfBase(spark, dir).select(col("k"), col("l_quantity")),
      Seq("k"), "l_quantity", salt = 16)
      .withColumn("total", round(col("total"), 4))
      .orderBy("k")

  /** Plain distinct-set assembly over the zipf key — the case where salting
    * DOES pay. collect_set's partial buffers dedup only locally, so every
    * map partition ships its own copy of the hot key's value set: the
    * exchange moves ~#partitions·|D| values for the hot key, and ONE
    * reducer hash-merges them all.
    */
  def skewSetPlain(spark: SparkSession, dir: String): DataFrame =
    zipfBase(spark, dir)
      .groupBy("k")
      .agg(sort_array(collect_set(col("v"))).as("arr"))
      .select(col("k"), size(col("arr")).cast("long").as("n_distinct"),
        array_join(transform(col("arr"), _.cast("string")), " ").as("vals"))
      .orderBy("k")

  /** Salted twin of [[skewSetPlain]] via [[saltedAgg]]: the deterministic
    * salt is a hash of (k, v), so it PARTITIONS the value domain — each
    * distinct v lives in exactly one salt slice, making phase-1 slices
    * disjoint and phase 2 a pure concatenation of pre-deduped arrays.
    * Total exchange volume is unchanged (partial collect_set still dedups
    * only within its map partition), but the hot key's merge spreads over
    * `salt` reducers instead of one: the max shuffle volume into any
    * single task — the thing that makes one reducer drag the stage —
    * drops by the salt factor (asserted via task metrics in OpsSpec).
    */
  def skewSetSalted(spark: SparkSession, dir: String): DataFrame =
    saltedAgg(zipfBase(spark, dir).select(col("k"), col("v")),
      Seq("k"), salt = 16,
      partial = Seq(collect_set(col("v")).as("__s")),
      combine = Seq(array_sort(flatten(collect_list(col("__s")))).as("arr")))
      .select(col("k"), size(col("arr")).cast("long").as("n_distinct"),
        array_join(transform(col("arr"), _.cast("string")), " ").as("vals"))
      .orderBy("k")

  val skewSumOracle: String =
    """SELECT CAST(floor(log2(l_partkey + 0.5)) AS BIGINT) AS k,
      |       COUNT(*) AS n, ROUND(SUM(l_quantity), 4) AS total
      |FROM lineitem GROUP BY 1 ORDER BY k""".stripMargin

  val skewSetOracle: String =
    """WITH b AS (
      |  SELECT CAST(floor(log2(l_partkey + 0.5)) AS BIGINT) AS k,
      |         l_orderkey % 4096 AS v
      |  FROM lineitem)
      |SELECT k, CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
      |       array_to_string(list_transform(list_sort(list(DISTINCT v)),
      |                                      x -> CAST(x AS VARCHAR)), ' ') AS vals
      |FROM b GROUP BY k ORDER BY k""".stripMargin
}
