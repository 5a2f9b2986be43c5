package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** As-of join — for each left row, the latest right row with
  * right.time <= left.time on the same key. Spark has no native operator;
  * per the preference order this composes built-ins rather than adding a
  * custom SparkPlan: tag and union both inputs, sort within each key
  * partition, and carry the most recent right-side payload forward with a
  * last-non-null running window. One shuffle on the key, one sort —
  * exactly the cost of the sort-merge formulation a native operator would
  * use, and it scales with Σ rows, never the join product.
  */
object AsOf {

  /** Events as-of-joined to the issuing user's most recent order
    * (inclusive on equal timestamps). Emits the matched order DATE —
    * date-equal ties collapse to one deterministic answer. Events whose
    * user has no prior order are dropped (inner as-of).
    */
  def eventsToLatestOrder(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("user_id"), col("event_id"), col("ts"),
      lit(null).cast("timestamp").as("odate"),
      lit(1).as("kind"))
    val or = Tables.orders(spark, dir).select(
      col("o_custkey").as("user_id"),
      lit(null).cast("long").as("event_id"),
      col("o_orderdate").cast("timestamp").as("ts"),
      col("o_orderdate").cast("timestamp").as("odate"),
      lit(0).as("kind"))
    // kind 0 sorts before kind 1 at the same instant → an order dated
    // exactly at the event's timestamp is visible to it (inclusive as-of)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.unionByName(or)
      .withColumn("last_odate", last(col("odate"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1 && col("last_odate").isNotNull)
      .select(col("event_id"), col("user_id"),
        date_format(col("last_odate"), "yyyy-MM-dd").as("order_date"))
      .orderBy("event_id")
  }

  val oracle: String =
    """SELECT e.event_id, e.user_id,
      |       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date
      |FROM events e
      |ASOF JOIN orders o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
      |ORDER BY e.event_id""".stripMargin

  /** x138: the FORWARD as-of — for each order, the customer's FIRST event
    * at or after the order date (the "time-to-next-action" direction that
    * attribution and label-generation pipelines need; a backward as-of
    * cannot express it). Same union + one-key-shuffle composition as
    * [[eventsToLatestOrder]], with the window frame reversed:
    * first-non-null over (currentRow, unboundedFollowing), and the kind
    * tags arranged so an event at exactly the order's instant sorts AFTER
    * the order row and is therefore visible to it (inclusive forward
    * as-of). Orders whose customer never acts again are dropped (inner).
    * Timestamp-equal ties collapse by emitting the matched INSTANT (µs),
    * mirroring x50's date-only tie treatment.
    */
  def ordersToNextEvent(spark: SparkSession, dir: String): DataFrame = {
    val or = Tables.orders(spark, dir).select(
      col("o_custkey").as("user_id"), col("o_orderkey"),
      col("o_orderdate").cast("timestamp").as("ts"),
      lit(null).cast("timestamp").as("ets"),
      lit(0).as("kind"))
    val ev = Tables.events(spark, dir).select(
      col("user_id"),
      lit(null).cast("long").as("o_orderkey"),
      col("ts"),
      col("ts").as("ets"),
      lit(1).as("kind"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("kind"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    or.unionByName(ev)
      .withColumn("next_ets", first(col("ets"), ignoreNulls = true).over(w))
      .filter(col("kind") === 0 && col("next_ets").isNotNull)
      .select(col("o_orderkey"), col("user_id"),
        unix_micros(col("next_ets")).as("next_event_us"))
      .orderBy("o_orderkey")
  }

  val forwardOracle: String =
    """SELECT o.o_orderkey, o.o_custkey AS user_id,
      |       CAST(epoch_us(e.ts) AS BIGINT) AS next_event_us
      |FROM orders o
      |ASOF JOIN events e ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
      |ORDER BY o.o_orderkey""".stripMargin
}
