package graft.ops

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Data-quality observability for pipeline runs: row counts, null counts,
  * and range violations collected AS the job runs via Spark's
  * `Observation` API — aggregates piggyback on the existing pass (an
  * `CollectMetrics` node in the plan), so a 100 TB ingest is never
  * re-scanned just to know how many rows it had. This is the mechanism a
  * production pipeline uses to gate a write ("abort if > 0.1% of rows
  * dropped a key") without a second action.
  */
object Quality {

  /** Attach an observation measuring row count plus per-column null
    * counts. Returns the instrumented frame and the Observation; metrics
    * become available once ONE action has run over the frame.
    */
  def observed(df: DataFrame, name: String, nullCols: Seq[String]): (DataFrame, Observation) = {
    val obs = Observation(name)
    val metrics =
      count(lit(1)).as("n_rows") +:
        nullCols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** x124: table statistics collection — the ANALYZE-TABLE surface a
    * cost-based planner (and every data catalog) feeds on: per column,
    * null count, exact distinct count, and lexicographic min/max over the
    * string image (one type-stable representation for a heterogeneous
    * column list). ALL columns' statistics compute in ONE aggregate pass —
    * the multiple exact distincts compile to a single Expand (×|cols|
    * row multiplication before partial aggregation, the documented
    * trade: at 100 TB swap `countDistinct` for `approx_count_distinct`
    * t-digest-style mergeable HLL state and the Expand disappears) —
    * and the 1×(4·|cols|) result row pivots to |cols| rows by exploding
    * a struct array built at plan time: no second scan, no shuffle after
    * the aggregate.
    */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__ndv"),
        min(col(c).cast("string")).as(s"${c}__min"),
        max(col(c).cast("string")).as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = array(cols.map { c =>
      struct(lit(c).as("column_name"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__ndv").as("n_distinct"),
        col(s"${c}__min").as("min_str"),
        col(s"${c}__max").as("max_str"))
    }: _*)
    one.select(explode(stacked).as("s"))
      .select(col("s.column_name"), col("s.n_nulls"), col("s.n_distinct"),
        col("s.min_str"), col("s.max_str"))
      .orderBy("column_name")
  }
}
