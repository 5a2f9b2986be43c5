package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-table operators (SURVEY.md §2.11 X5–X8): JSON column ops and
  * batch tumbling / sliding / session window aggregations. Window starts
  * are emitted as epoch seconds/micros (BIGINT) so the oracle compare never
  * depends on timestamp-precision round-trips.
  */
object Events {

  /** X5: JSON field extraction from the props column. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy("event_id")

  /** X5 via schema'd parse: from_json projects the JSON column into a
    * typed struct in one codegen'd pass — the right shape when several
    * fields are consumed (get_json_object re-parses per field).
    */
  def jsonSchema(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    Tables.events(spark, dir)
      .select(col("event_id"),
        from_json(col("props"), StructType(Seq(StructField("k", LongType))))
          .getField("k").as("k"))
      .orderBy("event_id")
  }

  /** X6: tumbling 1-hour window per event_type. The groupBy(window(...))
    * is a single hash-aggregate — window assignment is a projection, so
    * partial aggregation happens map-side before the shuffle.
    */
  def tumblingOf(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))
      .select(col("window.start").cast("long").as("ws"),
        col("event_type"), col("n"), col("total_value"))
      .orderBy("ws", "event_type")

  def tumbling(spark: SparkSession, dir: String): DataFrame =
    tumblingOf(Tables.events(spark, dir))

  /** X7: sliding 1-hour window every 15 minutes — each event lands in 4
    * windows (Spark expands via an internal generator; row count ×4 before
    * the aggregate, map-side partials keep the shuffle small).
    */
  def sliding(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))
      .select(col("window.start").cast("long").as("ws"), col("n"), col("total_value"))
      .orderBy("ws")

  /** X8: 30-minute-gap session windows per user. session_window merges
    * events where ts < previous session end (strict); end = last ts + gap.
    * Emitted in epoch micros.
    */
  def sessionsOf(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("total_value"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("session_start"),
        unix_micros(col("sw.end")).as("session_end"),
        col("n_events"), col("total_value"))
      .orderBy("user_id", "session_start")

  def sessions(spark: SparkSession, dir: String): DataFrame =
    sessionsOf(Tables.events(spark, dir))

  /** Pivot: per-user event-type counts as columns (wide feature layout). */
  val pivotTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  def pivotCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id")
      .pivot("event_type", pivotTypes)
      .agg(count(lit(1)))
      .na.fill(0, pivotTypes)
      .orderBy("user_id")

  /** Unpivot (melt): the wide per-user feature layout back to long
    * (user_id, event_type, n) — Spark's native `unpivot`, which compiles
    * to an Expand (one output row per value column per input row, no
    * shuffle, no join). Round-trips [[pivotCounts]] including the
    * zero-filled absent combinations.
    */
  def unpivotCounts(spark: SparkSession, dir: String): DataFrame =
    pivotCounts(spark, dir)
      .unpivot(Array(col("user_id")), pivotTypes.map(col).toArray, "event_type", "n")
      .orderBy("user_id", "event_type")
}
