package graft

import org.apache.spark.sql.functions._

import graft.insta.Insta

/** Semantics corners of the reference-parity pipeline (SURVEY.md §5.1):
  * encode rules, existence-join label survival, candidate counts,
  * duplicated-feature parity, submission None-fill.
  */
class InstaSpec extends SparkSuite {

  test("ordersI eval_set encoding covers exactly {0,1,2} and days_since >= 0") {
    val oi = Insta.ordersI(spark, sf).cache()
    val sets = oi.select("eval_set").distinct().collect().map(_.getLong(0)).sorted
    assert(sets.sameElements(Array(0L, 1L, 2L)))
    assert(oi.filter(col("days_since") < 0).count() === 0)
    // order_number is a dense per-user sequence starting at 1
    val bad = oi.groupBy("userID")
      .agg(count(lit(1)).as("n"), max("order_number").as("mx"), min("order_number").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1)
    assert(bad.count() === 0)
  }

  test("reordered flag: first order of a (user, product) is never a reorder") {
    val b = Insta.basket(spark, sf)
    val firsts = b.groupBy("userID", "productID")
      .agg(min("order_number").as("first_on"))
    val joined = b.join(firsts, Seq("userID", "productID"))
    assert(joined.filter(col("order_number") === col("first_on")
      && col("reordered") === 1).count() === 0)
    assert(joined.filter(col("order_number") > col("first_on")
      && col("reordered") === 0).count() === 0)
  }

  test("product reorder_ratio stays within [0,1]") {
    val pf = Insta.productFeatures(spark, sf)
    assert(pf.filter(col("reorder_ratio") < 0 || col("reorder_ratio") > 1).count() === 0)
  }

  test("candidate count equals sum of user distinct-item counts over train/test orders") {
    val cand = Insta.candidates(spark, sf, Seq(1L, 2L))
    val expected = Insta.ordersI(spark, sf)
      .filter(col("eval_set").isin(1L, 2L))
      .join(Insta.userPriorFeatures(spark, sf).select("userID", "distinct_items"), "userID")
      .agg(sum("distinct_items")).collect()(0).getLong(0)
    assert(cand.count() === expected)
  }

  test("existence-join label keeps false rows and label=1 implies train membership") {
    val cand = Insta.candidates(spark, sf, Seq(1L, 2L))
    val labeled = Insta.withLabel(spark, sf, cand).cache()
    assert(labeled.count() === cand.count()) // left join: no row loss
    assert(labeled.select("label").distinct().count() === 2)
    val trainPairs = Insta.basket(spark, sf).filter(col("eval_set") === 1)
      .select("orderID", "productID").distinct()
    val bad = labeled.filter(col("label") === 1)
      .join(trainPairs, Seq("orderID", "productID"), "left_anti")
    assert(bad.count() === 0)
  }

  test("feature matrix carries the reference's duplicated ratio feature") {
    val fm = Insta.featureMatrix(spark, sf, Seq(1L))
    assert(fm.filter(col("userProduct_ordersRatio") =!=
      col("userProduct_reorderProportion")).count() === 0)
  }

  test("submission covers every test order exactly once, None for empty") {
    val sub = graft.queries.Core.q15Submission(spark, sf).cache()
    val testOrders = Insta.ordersI(spark, sf).filter(col("eval_set") === 2)
    assert(sub.count() === testOrders.count())
    assert(sub.select("orderID").distinct().count() === sub.count())
    val withPreds = sub.filter(col("products") =!= "None")
    // products strings are space-joined positive ints
    assert(withPreds.filter(!col("products").rlike("^[0-9]+( [0-9]+)*$")).count() === 0)
  }

  test("max_by final_orderId matches window-based last-per-group") {
    import org.apache.spark.sql.expressions.Window
    val b = Insta.priorBasket(spark, sf)
    val w = Window.partitionBy("userID", "productID")
      .orderBy(col("order_number").desc, col("orderID").desc)
    val viaWindow = b.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("userID", "productID", "orderID")
      .withColumnRenamed("orderID", "final_w")
    val viaMaxBy = Insta.userProductFeatures(spark, sf)
      .select("userID", "productID", "final_orderId")
    val diff = viaMaxBy.join(viaWindow, Seq("userID", "productID"))
      .filter(col("final_orderId") =!= col("final_w"))
    assert(diff.count() === 0)
  }
}
