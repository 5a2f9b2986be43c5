package graft

import org.apache.spark.sql.functions._

import graft.ml.ReorderModel

/** M1–M7: seeded determinism and metric sanity bands (the reference's own
  * correctness methodology — SURVEY.md §5.4). Oracle-excluded by design.
  */
class MlSpec extends SparkSuite {

  test("metrics are deterministic under the fixed seed and within (0, 1]") {
    val a = ReorderModel.metrics(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(4))).toSeq
    val b = ReorderModel.metrics(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(4))).toSeq
    assert(a === b)
    assert(a.map(_._1).sorted === Seq("dt", "gbt", "rf"))
    a.foreach { case (m, acc, f1) =>
      assert(acc > 0.0 && acc <= 1.0, s"$m accuracy=$acc")
      assert(f1 > 0.0 && f1 <= 1.0, s"$m f1=$f1")
    }
  }

  test("rf submission covers every test order and parses as id lists") {
    val sub = ReorderModel.rfSubmission(spark, sf).cache()
    val nTest = graft.insta.Insta.ordersI(spark, sf)
      .filter(col("eval_set") === 2).count()
    assert(sub.count() === nTest)
    assert(sub.filter(col("products") =!= "None")
      .filter(!col("products").rlike("^[0-9]+( [0-9]+)*$")).count() === 0)
  }
}
