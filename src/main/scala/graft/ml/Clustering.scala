package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative, exactly-reproducible clustering (x177) — the clustering
  * class the m-family's spark.ml ensembles don't cover, built so every
  * arithmetic step is INTEGER and the whole fit is DuckDB-oracle-checkable
  * (seeded spark.ml KMeans is deterministic only per partitioning; this
  * formulation is deterministic, period).
  *
  * Lloyd's algorithm over the (lifetime cents, order count) customer
  * plane, min-max normalized to the [0, 1e6] integer grid:
  *  - init: k centroids at the exact rank quantiles ((2i+1)·n) DIV 2k of
  *    the (x, custkey) total order — deterministic spread, no RNG;
  *  - assign: arg-min of the exact integer squared distance (coords ≤ 1e6
  *    so dist² ≤ 2·10¹², comparisons never touch a double), ties to the
  *    lowest centroid id;
  *  - update: component-wise mean rounded half-up in pure integer form,
  *    (2·Σ + n) DIV (2·n) on nonnegative operands (identical floor in
  *    both engines); empty clusters carry their previous centroid.
  *
  * Scale shape: per iteration, ONE pass over the Layer-cached normalized
  * frame — a map-side arg-min against k broadcast centroid literals —
  * plus one k-row aggregate collected at the driver (the x149
  * aggregate-sized boundary: k rows, never the fact). That is textbook
  * distributed KMeans; iterations add scans, never shuffles of the fact.
  * The (value−lo)·10⁶ normalization stays in BIGINT while the per-metric
  * range is < ~9·10¹² — beyond that, widen to DECIMAL (documented bound,
  * not reachable by lifetime customer cents at the gate scales).
  */
object Clustering {

  val K = 4
  val Iters = 5

  /** Normalized (o_custkey, x, y) on the [0, 1e6] grid, Layer-cached:
    * scanned `Iters + 1` times by the fit, and derived from the same
    * customer profile Layer a35/a36 share — one orders scan per run.
    */
  private def normalized(spark: SparkSession, dir: String): DataFrame =
    graft.Layer.cached(spark, dir, "custKmeansNorm") {
      val prof = graft.queries.Analytics.custOrderProfile(spark, dir)
      val stats = prof.agg(
        min("cents").as("lox"), max("cents").as("hix"),
        min("n_orders").as("loy"), max("n_orders").as("hiy"))
      prof.crossJoin(broadcast(stats)).select(col("o_custkey"),
        when(col("hix") === col("lox"), lit(0L))
          .otherwise(expr("((cents - lox) * 1000000) DIV (hix - lox)")).as("x"),
        when(col("hiy") === col("loy"), lit(0L))
          .otherwise(expr("((n_orders - loy) * 1000000) DIV (hiy - loy)")).as("y"))
    }

  /** cluster = arg-min over centroid literals of the exact integer dist²,
    * ties to the lowest id; also emits the winning dist² for WCSS.
    */
  private def assign(norm: DataFrame, cs: Array[(Long, Long, Long)]): DataFrame = {
    def d2(cx: Long, cy: Long): Column =
      (col("x") - cx) * (col("x") - cx) + (col("y") - cy) * (col("y") - cy)
    val (best, bestD) = cs.tail.foldLeft(
      (lit(cs.head._1), d2(cs.head._2, cs.head._3))) {
      case ((b, bd), (i, cx, cy)) =>
        val di = d2(cx, cy)
        (when(di < bd, lit(i)).otherwise(b), when(di < bd, di).otherwise(bd))
    }
    norm.select(col("o_custkey"), col("x"), col("y"),
      best.as("cluster"), bestD.as("dist2"))
  }

  /** x177: the fitted clustering report — one row per centroid with its
    * final coordinates, population, and exact WCSS contribution.
    */
  def kmeansCustomers(spark: SparkSession, dir: String): DataFrame = {
    val norm = normalized(spark, dir)
    val ranked = graft.ops.Ranking.globalRowNumber(
      norm, col("x"), col("o_custkey"), "rnk")
    val nRow = norm.agg(count(lit(1)).as("n"))
    val positions = nRow.select(
      explode(sequence(lit(0L), lit(K - 1L))).as("i"), col("n"))
      .select(col("i"), expr(s"((2 * i + 1) * n) DIV ${2 * K}").as("r"))
    // init + each update collect exactly K rows — the documented
    // aggregate-sized driver boundary, never the fact
    var centroids: Array[(Long, Long, Long)] = ranked
      .join(broadcast(positions), col("rnk") === col("r"))
      .select(col("i"), col("x"), col("y")).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2)))
      .sortBy(_._1)
    (1 to Iters).foreach { _ =>
      val upd = assign(norm, centroids)
        .groupBy("cluster")
        .agg(count(lit(1)).as("cnt"), sum(col("x")).as("sx"), sum(col("y")).as("sy"))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      centroids = centroids.map { case (i, px, py) =>
        upd.get(i) match {
          case Some((cnt, sx, sy)) =>
            (i, (2 * sx + cnt) / (2 * cnt), (2 * sy + cnt) / (2 * cnt))
          case None => (i, px, py) // empty cluster keeps its centroid
        }
      }
    }
    val stats = assign(norm, centroids)
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_cust"),
        sum(col("dist2").cast("decimal(38,0)")).as("wcss"))
    import spark.implicits._
    val cdf = centroids.toSeq.toDF("i", "cx_e6", "cy_e6")
    broadcast(cdf).join(stats, col("cluster") === col("i"), "left")
      .select(col("i").as("cluster"), col("cx_e6"), col("cy_e6"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("wcss"), lit(0L)).cast("long").as("wcss"))
      .orderBy("cluster")
  }

  /** DuckDB twin: the same init / `Iters`× (assign, update) / report
    * pipeline unrolled as chained CTEs — generated by the same loop count
    * so the two fits cannot drift in iteration count.
    */
  val kmeansOracle: String = {
    def assignCte(name: String, prev: String): String =
      s"""$name AS (SELECT o_custkey, x, y, i AS cluster,
         |            (x - cx) * (x - cx) + (y - cy) * (y - cy) AS dist2
         |     FROM (SELECT n.o_custkey, n.x, n.y, c.i, c.cx, c.cy,
         |                  ROW_NUMBER() OVER (PARTITION BY n.o_custkey
         |                    ORDER BY (n.x - c.cx) * (n.x - c.cx)
         |                           + (n.y - c.cy) * (n.y - c.cy), c.i) AS rk
         |           FROM norm n CROSS JOIN $prev c)
         |     WHERE rk = 1)""".stripMargin
    def updateCte(name: String, prevC: String, prevA: String): String =
      s"""$name AS (SELECT p.i,
         |            COALESCE((2 * s.sx + s.cnt) // (2 * s.cnt), p.cx) AS cx,
         |            COALESCE((2 * s.sy + s.cnt) // (2 * s.cnt), p.cy) AS cy
         |     FROM $prevC p LEFT JOIN (SELECT cluster, COUNT(*) AS cnt,
         |                                     SUM(x) AS sx, SUM(y) AS sy
         |                              FROM $prevA GROUP BY 1) s ON s.cluster = p.i)""".stripMargin
    val iterations = (1 to Iters).map { t =>
      val prevC = if (t == 1) "c0" else s"c${t - 1}"
      assignCte(s"a$t", prevC) + ",\n" + updateCte(s"c$t", prevC, s"a$t")
    }.mkString(",\n")
    s"""WITH prof AS (SELECT o_custkey,
       |                     SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS cents,
       |                     COUNT(*) AS n_orders
       |              FROM orders GROUP BY 1),
       |st AS (SELECT MIN(cents) AS lox, MAX(cents) AS hix,
       |              MIN(n_orders) AS loy, MAX(n_orders) AS hiy FROM prof),
       |norm AS (SELECT o_custkey,
       |                CASE WHEN hix = lox THEN 0
       |                     ELSE ((cents - lox) * 1000000) // (hix - lox) END AS x,
       |                CASE WHEN hiy = loy THEN 0
       |                     ELSE ((n_orders - loy) * 1000000) // (hiy - loy) END AS y
       |         FROM prof, st),
       |rk AS (SELECT o_custkey, x, y,
       |              ROW_NUMBER() OVER (ORDER BY x, o_custkey) AS rnk,
       |              (SELECT COUNT(*) FROM norm) AS n
       |       FROM norm),
       |pos AS (SELECT i, ((2 * i + 1) * n) // ${2 * K} AS r
       |        FROM (SELECT unnest(generate_series(0, ${K - 1})) AS i,
       |                     (SELECT COUNT(*) FROM norm) AS n) t),
       |c0 AS (SELECT pos.i, rk.x AS cx, rk.y AS cy
       |       FROM pos JOIN rk ON rk.rnk = pos.r),
       |$iterations,
       |${assignCte("aFin", s"c$Iters")}
       |SELECT c.i AS cluster, CAST(c.cx AS BIGINT) AS cx_e6,
       |       CAST(c.cy AS BIGINT) AS cy_e6,
       |       CAST(COALESCE(s.n_cust, 0) AS BIGINT) AS n_cust,
       |       CAST(COALESCE(s.wcss, 0) AS BIGINT) AS wcss
       |FROM c$Iters c
       |LEFT JOIN (SELECT cluster, COUNT(*) AS n_cust, SUM(dist2) AS wcss
       |           FROM aFin GROUP BY 1) s ON s.cluster = c.i
       |ORDER BY cluster""".stripMargin
  }
}
