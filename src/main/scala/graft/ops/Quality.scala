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
}
