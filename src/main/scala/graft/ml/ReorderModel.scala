package graft.ml

import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.feature.{Binarizer, VectorAssembler}
import org.apache.spark.ml.regression.{DecisionTreeRegressor, GBTRegressor, RandomForestRegressor}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.insta.Insta

/** Reference ML pipeline (SURVEY.md §2.9 M1–M7) on spark.ml: the 17-feature
  * vector (F.py:181–185) → seeded tree-ensemble regressors with the
  * reference hyperparameters (F.py:219–225) → 0.19 binarization
  * (F.py:241–244) → multiclass metrics (F.py:247–276). Differences from the
  * reference are deliberate: predictions stay aligned as a column (no
  * fragile RDD zip, F.py:242), everything is seeded, and each model's
  * submission comes from its own predictions (the reference's resultDT is
  * built from the GBT dict — copy-paste bug at F.py:390).
  */
object ReorderModel {

  val featureCols: Array[String] = Array(
    "user_SumOrders", "user_items_purchased_total", "distinct_items",
    "user_avg_orderingGap", "user_average_items", "order_dow", "order_hod",
    "days_since", "days_sinceProportion", "numorders", "numreorders",
    "prod_reorderProportion", "userProduct_orders", "userProduct_ordersRatio",
    "userProduct_average_cartOrder", "userProduct_reorderProportion",
    "userProduct_orders_sinceFinal")

  val threshold = 0.19
  val seed = 42L

  /** M1: assemble the 17 features into a dense vector column. */
  def assemble(df: DataFrame): DataFrame =
    new VectorAssembler()
      .setInputCols(featureCols).setOutputCol("features")
      .transform(df.withColumn("label", col("label").cast("double")))

  def rf: RandomForestRegressor = new RandomForestRegressor() // M2, F.py:219–221
    .setNumTrees(3).setFeatureSubsetStrategy("auto")
    .setImpurity("variance").setMaxDepth(4).setMaxBins(32).setSeed(seed)

  def gbt: GBTRegressor = new GBTRegressor() // M3, F.py:222–223
    .setMaxIter(3).setSeed(seed)

  def dt: DecisionTreeRegressor = new DecisionTreeRegressor() // M4, F.py:224–225
    .setImpurity("variance").setMaxDepth(5).setMaxBins(32).setSeed(seed)

  /** M6: threshold regressor output at 0.19 into a 0/1 class column. */
  def binarize(pred: DataFrame): DataFrame =
    new Binarizer().setThreshold(threshold)
      .setInputCol("prediction").setOutputCol("predicted_label")
      .transform(pred)

  /** Train RF on the train matrix, predict the test matrix, emit the
    * submission table (M2+M5+M6 + F.py:296–315 formatting).
    */
  def rfSubmission(spark: SparkSession, dir: String): DataFrame = {
    val train = assemble(Insta.featureMatrix(spark, dir, Seq(1L)))
    val test = assemble(Insta.featureMatrix(spark, dir, Seq(2L)))
    val model = rf.fit(train)
    val scored = model.transform(test).select("orderID", "productID", "prediction")
    val testOrders = Insta.ordersI(spark, dir).filter(col("eval_set") === 2)
    Insta.submission(testOrders, scored, "prediction", threshold).orderBy("orderID")
  }

  /** M7: train RF/GBT/DT on a seeded 0.7/0.3 split of the train matrix
    * (F.py:214) and report per-model metrics on the holdout. The
    * reference's no-arg MulticlassMetrics precision()/recall()/fMeasure()
    * all equal micro accuracy — reported here as `accuracy` plus the
    * weighted variants the reference believed it was printing.
    */
  def metrics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val all = assemble(Insta.featureMatrix(spark, dir, Seq(1L)))
    val Array(fit, holdout) = all.randomSplit(Array(0.7, 0.3), seed)
    def evalOne(name: String, model: org.apache.spark.ml.Model[_]): (String, Double, Double, Double, Double) = {
      val scored = binarize(model.transform(holdout))
        .select(col("predicted_label"), col("label"))
      def m(metric: String): Double = {
        val v = new MulticlassClassificationEvaluator()
          .setPredictionCol("predicted_label").setLabelCol("label")
          .setMetricName(metric).evaluate(scored)
        math.rint(v * 10000) / 10000
      }
      (name, m("accuracy"), m("weightedPrecision"), m("weightedRecall"), m("f1"))
    }
    Seq(
      evalOne("rf", rf.fit(fit)),
      evalOne("gbt", gbt.fit(fit)),
      evalOne("dt", dt.fit(fit)),
    ).toDF("model", "accuracy", "weightedPrecision", "weightedRecall", "f1")
      .orderBy("model")
  }
}
