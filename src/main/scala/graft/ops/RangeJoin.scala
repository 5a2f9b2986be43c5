package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Range (interval) join — pair rows whose timestamps fall within a bounded
  * window of each other. A naive theta-join degenerates to a per-key cross
  * product; the scale formulation buckets time into window-sized cells and
  * equi-joins on (key, cell), probing each left row's cell and its
  * predecessor, then applies the exact range predicate. The shuffle is an
  * equi-join on (key, bucket) — the join product never exceeds
  * 2 × (rows per cell) per probe.
  */
object RangeJoin {

  private val windowUs = 10L * 60 * 1000000 // 10 minutes

  /** For every error event: how many clicks the same user made in the
    * preceding 10 minutes (exclusive of the error instant, inclusive of
    * ts − 10min). Errors with no clicks keep count 0 (left join).
    */
  def clicksBeforeErrors(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("us"),
        explode(array((col("us") / windowUs).cast("long") - 1,
          (col("us") / windowUs).cast("long"))).as("bucket"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id"),
        col("us").as("c_us"), (col("us") / windowUs).cast("long").as("bucket"))
    errors.join(clicks,
        errors("user_id") === clicks("user_id") &&
          errors("bucket") === clicks("bucket") &&
          clicks("c_us") >= errors("us") - windowUs &&
          clicks("c_us") < errors("us"),
        "left_outer")
      .groupBy(errors("event_id"))
      .agg(count(col("c_id")).as("clicks_before"))
      .orderBy("event_id")
  }

  val oracle: String =
    """SELECT e.event_id, COUNT(c.event_id) AS clicks_before
      |FROM events e
      |LEFT JOIN events c
      |  ON e.user_id = c.user_id AND c.event_type = 'click'
      | AND c.ts >= e.ts - INTERVAL 10 MINUTE AND c.ts < e.ts
      |WHERE e.event_type = 'error'
      |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin
}
