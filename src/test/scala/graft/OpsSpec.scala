package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Skew
import graft.sources.Sinks

/** Scale-pattern utilities: salted aggregation equivalence, partitioned
  * sink layout + pruning.
  */
class OpsSpec extends SparkSuite {

  test("salted count/sum equals direct groupBy on a skewed input") {
    import spark.implicits._
    // 10k rows on one heavy key + scattered tail
    val rows = (1 to 10000).map(i => ("hot", i.toDouble)) ++
      (1 to 500).map(i => (s"k${i % 50}", i.toDouble))
    val df = rows.toDF("k", "v").repartition(8)
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.saltedCountSum(df, Seq("k"), "v", salt = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted === direct)
  }

  test("partitioned parquet sink prunes directories on the partition predicate") {
    val out = Files.createTempDirectory("graft_sink").toString + "/docs"
    Sinks.parquetPartitioned(Tables.documents(spark, sf), out, Seq("lang"))
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.count(_.startsWith("lang=")) >= 3)
    val back = spark.read.parquet(out).filter(col("lang") === "en")
    // partition filter appears in the scan, not as a data filter
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"))
    val total = Tables.documents(spark, sf).filter(col("lang") === "en").count()
    assert(back.count() === total)
  }
}
