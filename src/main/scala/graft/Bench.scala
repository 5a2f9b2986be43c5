package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_BENCH: "both" (default) runs a WARM pass (shared Layer
    // intermediates amortize across queries — the round-over-round trend
    // line) and then a COLD pass (Layer.clear before every query, so no
    // per-query regression can hide inside another query's warm-up);
    // "warm" / "cold" run just that pass.
    val mode = sys.env.getOrElse("SPARK_GRAFT_BENCH", "both")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def pass(cold: Boolean): Map[String, Double] =
      SparkEntry.queries.map { case (name, fn) =>
        if (cold) Layer.clear(spark)
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }
    def fmt(m: Map[String, Double]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val warm = if (mode != "cold") pass(cold = false) else Map.empty[String, Double]
    val cold = if (mode != "warm") pass(cold = true) else Map.empty[String, Double]
    // "value" stays the warm total for continuity with earlier rounds.
    // Scalars precede the long per-query maps: the driver has truncated
    // bench JSON tails before, and truncation should cost detail rows,
    // never the headline totals.
    val primary = if (warm.nonEmpty) warm else cold
    println(s"""{"metric":"total","value":${primary.values.sum},"unit":"sec","sf":"$sfDir","warm_total":${warm.values.sum},"cold_total":${cold.values.sum},"queries":${fmt(primary)},"cold_queries":${fmt(cold)}}""")
    spark.stop()
  }
}
