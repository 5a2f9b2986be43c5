package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Categorical feature encoding (x181) — the leakage-prone feature-
  * engineering step done right: smoothed target (mean) encoding of a
  * high-cardinality categorical, the alternative to one-hot when the
  * domain is unbounded (micikevicius/target-encoding folklore, formalized
  * in Micci-Barreca SIGKDD Expl. '01). The additive-smoothing estimate
  * enc = (n⁺ + m·prior)/(n + m) shrinks rare categories toward the global
  * prior so a 3-row brand can't memorize its labels.
  */
object Encoding {

  /** x181: encode part brand by lineitem return rate (target =
    * l_returnflag = 'R'), smoothing m = 100. Exactness: prior and enc
    * are rationals, so both are carried CROSS-MULTIPLIED in exact
    * integers — num = n⁺·N + m·R, den = (n+m)·N — widened to
    * DECIMAL(38,0) per product (n⁺·N ≈ 10¹⁷ already at sf0.1's row
    * counts; DuckDB's BIGINT products hold at oracle scale, HUGEINT
    * sums beyond), then converted to double ONCE each and rounded once
    * to e6. Scale shape: one fact scan, brand dim broadcast, |brands|-row
    * aggregate; the global totals are a one-row broadcast. The encoding
    * table this emits is itself broadcast-joinable back to the fact —
    * the production application pattern.
    */
  def targetEncodeBrand(spark: SparkSession, dir: String, m: Int = 100): DataFrame = {
    val d38: Column => Column = _.cast("decimal(38,0)")
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), (col("l_returnflag") === "R").cast("long").as("y"))
    val part = Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"))
    val grp = li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
    val tot = grp.agg(sum(col("n")).as("n_tot"), sum(col("n_pos")).as("pos_tot"))
    grp.crossJoin(broadcast(tot))
      .select(col("p_brand"), col("n"), col("n_pos"),
        floor((d38(col("n_pos")) * d38(col("n_tot"))
            + d38(lit(m.toLong)) * d38(col("pos_tot"))).cast("double")
          / (d38(col("n") + m.toLong) * d38(col("n_tot"))).cast("double")
          * 1000000d + 0.5d).cast("long").as("enc_e6"),
        floor(col("pos_tot").cast("double") / col("n_tot").cast("double")
          * 1000000d + 0.5d).cast("long").as("prior_e6"))
      .orderBy("p_brand")
  }

  /** x221: OUT-OF-FOLD smoothed target encoding — the leakage-FREE form
    * of x181 a training pipeline must actually use: a row's encoding may
    * never see its own label, so each (brand, fold) cell is encoded from
    * the OTHER folds only — counts n−n_f / pos−pos_f and the OOF prior
    * (P−P_f)/(N−N_f), all derived by SUBTRACTION from one fold-grain
    * aggregate (never k re-scans of the fact — the k-fold trick that
    * makes OOF encoding O(1) passes at any k). Fold assignment is the
    * x70 content-addressed discipline (md5 bucket of the line's
    * composite key — layout-independent, reproducible); the smoothed
    * estimate is carried cross-multiplied in DECIMAL(38,0) exactly like
    * x181 and converts to double once. OpsSpec pins the leakage law
    * literally: each cell equals x181's formula recomputed on the
    * corpus WITH THAT FOLD DELETED.
    */
  def oofTargetEncode(spark: SparkSession, dir: String,
                      m: Int = 100, k: Int = 3): DataFrame = {
    val d38: Column => Column = _.cast("decimal(38,0)")
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        (col("l_returnflag") === "R").cast("long").as("y"),
        pmod(graft.ops.Sampling.bucket10k(
          col("l_orderkey") * 10L + col("l_linenumber"), 23), lit(k.toLong)).as("fold"))
    val part = Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"))
    val cell = li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "fold")
      .agg(count(lit(1)).as("n_f"), sum(col("y")).as("pos_f"))
    val brand = cell.groupBy("p_brand")
      .agg(sum(col("n_f")).as("n"), sum(col("pos_f")).as("pos"))
    val foldTot = cell.groupBy("fold")
      .agg(sum(col("n_f")).as("nf_tot"), sum(col("pos_f")).as("pf_tot"))
    val tot = cell.agg(sum(col("n_f")).as("n_tot"), sum(col("pos_f")).as("pos_tot"))
    cell.join(broadcast(brand), "p_brand")
      .join(broadcast(foldTot), "fold")
      .crossJoin(broadcast(tot))
      .select(col("p_brand"), col("fold"), col("n_f"),
        floor((d38((col("pos") - col("pos_f")) * (col("n_tot") - col("nf_tot")))
            + d38(lit(m.toLong)) * d38(col("pos_tot") - col("pf_tot"))).cast("double")
          / (d38(col("n") - col("n_f") + m.toLong)
            * d38(col("n_tot") - col("nf_tot"))).cast("double")
          * 1000000d + 0.5d).cast("long").as("enc_oof_e6"),
        floor((col("pos_tot") - col("pf_tot")).cast("double")
          / (col("n_tot") - col("nf_tot")).cast("double")
          * 1000000d + 0.5d).cast("long").as("prior_oof_e6"))
      .orderBy("p_brand", "fold")
  }

  val oofEncodeOracle: String =
    """WITH li AS (SELECT l_partkey,
      |                   CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
      |                   (('0x' || substr(md5((l_orderkey * 10 + l_linenumber) || ':23'), 1, 8))::BIGINT
      |                     % 10000) % 3 AS fold
      |            FROM lineitem),
      |cell AS (SELECT p.p_brand, li.fold,
      |                COUNT(*) AS n_f, CAST(SUM(li.y) AS BIGINT) AS pos_f
      |         FROM li JOIN part p ON p.p_partkey = li.l_partkey
      |         GROUP BY 1, 2),
      |brand AS (SELECT p_brand, CAST(SUM(n_f) AS BIGINT) AS n,
      |                 CAST(SUM(pos_f) AS BIGINT) AS pos
      |          FROM cell GROUP BY 1),
      |ft AS (SELECT fold, CAST(SUM(n_f) AS BIGINT) AS nf_tot,
      |              CAST(SUM(pos_f) AS BIGINT) AS pf_tot
      |       FROM cell GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_f) AS BIGINT) AS n_tot,
      |               CAST(SUM(pos_f) AS BIGINT) AS pos_tot FROM cell)
      |SELECT c.p_brand, c.fold, c.n_f,
      |       CAST(floor(CAST(CAST((b.pos - c.pos_f) * (t.n_tot - ft.nf_tot) AS DECIMAL(38,0))
      |              + CAST(100 AS DECIMAL(38,0)) * (t.pos_tot - ft.pf_tot) AS DOUBLE)
      |            / CAST(CAST(b.n - c.n_f + 100 AS DECIMAL(38,0))
      |              * (t.n_tot - ft.nf_tot) AS DOUBLE)
      |            * 1000000 + 0.5) AS BIGINT) AS enc_oof_e6,
      |       CAST(floor(CAST(t.pos_tot - ft.pf_tot AS DOUBLE)
      |            / CAST(t.n_tot - ft.nf_tot AS DOUBLE)
      |            * 1000000 + 0.5) AS BIGINT) AS prior_oof_e6
      |FROM cell c
      |JOIN brand b ON b.p_brand = c.p_brand
      |JOIN ft ON ft.fold = c.fold
      |CROSS JOIN tot t
      |ORDER BY c.p_brand, c.fold""".stripMargin

  /** x189: 2-D feature density grid — the binned joint distribution of
    * (quantity, price) that feeds interaction features (bin-crossed
    * one-hots) and the dependence eyeball x162's single-number MI
    * summarizes away. The x134 integer binning spine applied per axis
    * (e2 per-ROW quantization, `(v·10) DIV (max+1)` with a LEAST cap),
    * one fact-sized grouped aggregate, and a dense 10×10 grid so empty
    * cells emit — downstream one-hot layouts need the full grid.
    */
  def densityGrid(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(floor(col("l_quantity") * 100d + 0.5d).cast("long").as("q_e2"),
        floor(col("l_extendedprice") * 100d + 0.5d).cast("long").as("p_e2"))
    val mx = li.agg(max(col("q_e2")).as("qmax"), max(col("p_e2")).as("pmax"))
    val counts = li.crossJoin(broadcast(mx))
      .select(least(lit(9L), expr("(q_e2 * 10) DIV (qmax + 1)")).as("qbin"),
        least(lit(9L), expr("(p_e2 * 10) DIV (pmax + 1)")).as("pbin"))
      .groupBy("qbin", "pbin").agg(count(lit(1)).as("n"))
    val qb = spark.range(0, 10).select(col("id").as("qbin"))
    val pb = spark.range(0, 10).select(col("id").as("pbin"))
    qb.crossJoin(pb).join(counts, Seq("qbin", "pbin"), "left")
      .select(col("qbin"), col("pbin"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("qbin", "pbin")
  }

  /** x192: ABC inventory classification — Pareto classes over part
    * revenue (A = parts inside the first 70 % of cumulative revenue in
    * descending order, B to 90 %, C the tail), the purchasing/curation
    * prioritization the a35 Lorenz curve describes but doesn't label.
    * The descending running total is [[Ranking.globalCumSum]] (exact
    * two-phase BIGINT prefix sums — x116's machinery with revenue
    * weights) over the KEY-grain aggregate; class assignment is the
    * exact cross-multiplied compare cum·10 ≤ tot·7 / tot·9 (DECIMAL-
    * widened — cum·10 outgrows long at the 100 TB revenue scale), so no
    * rational ever materializes. Shares convert exact integers to
    * double once. Output: ≤ 3 rows.
    */
  /** The per-part ABC label frame (partkey, rev_e2, abc, tot_e2) — the
    * labeled half of [[abcClasses]], shared with x204's ABC-XYZ matrix.
    */
  private[graft] def abcLabeled(spark: SparkSession, dir: String): DataFrame = {
    val d38: Column => Column = _.cast("decimal(38,0)")
    val rev = Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        floor(col("l_extendedprice") * 100d + 0.5d).cast("long").as("r_e2"))
      .groupBy("l_partkey").agg(sum(col("r_e2")).as("rev_e2"))
    val cum = Ranking.globalCumSum(rev, -col("rev_e2"), col("l_partkey"),
      col("rev_e2"), "cum_e2")
    val tot = rev.agg(sum(col("rev_e2")).as("tot_e2"))
    cum.crossJoin(broadcast(tot))
      .select(col("l_partkey"), col("rev_e2"),
        when(d38(col("cum_e2")) * 10 <= d38(col("tot_e2")) * 7, "A")
          .when(d38(col("cum_e2")) * 10 <= d38(col("tot_e2")) * 9, "B")
          .otherwise("C").as("abc"),
        col("tot_e2"))
  }

  def abcClasses(spark: SparkSession, dir: String): DataFrame =
    abcLabeled(spark, dir)
      .groupBy("abc")
      .agg(count(lit(1)).as("n_parts"), sum(col("rev_e2")).as("rev_e2"),
        floor(sum(col("rev_e2")).cast("double") / max(col("tot_e2")).cast("double")
          * 1000000d + 0.5d).cast("long").as("share_e6"))
      .orderBy("abc")

  val abcOracle: String =
    """WITH rev AS (SELECT l_partkey,
      |                    SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
      |                      AS rev_e2
      |             FROM lineitem GROUP BY 1),
      |c AS (SELECT rev_e2,
      |             SUM(rev_e2) OVER (ORDER BY rev_e2 DESC, l_partkey
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_e2,
      |             (SELECT SUM(rev_e2) FROM rev) AS tot_e2
      |      FROM rev),
      |k AS (SELECT rev_e2, tot_e2,
      |             CASE WHEN cum_e2 * 10 <= tot_e2 * 7 THEN 'A'
      |                  WHEN cum_e2 * 10 <= tot_e2 * 9 THEN 'B'
      |                  ELSE 'C' END AS abc
      |      FROM c)
      |SELECT abc, COUNT(*) AS n_parts, CAST(SUM(rev_e2) AS BIGINT) AS rev_e2,
      |       CAST(floor(CAST(SUM(rev_e2) AS DOUBLE) / CAST(MAX(tot_e2) AS DOUBLE)
      |            * 1000000 + 0.5) AS BIGINT) AS share_e6
      |FROM k GROUP BY 1 ORDER BY 1""".stripMargin

  val densityGridOracle: String =
    """WITH e AS (SELECT CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS q_e2,
      |                  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS p_e2
      |           FROM lineitem),
      |m AS (SELECT MAX(q_e2) AS qmax, MAX(p_e2) AS pmax FROM e),
      |c AS (SELECT LEAST(9, (q_e2 * 10) // (qmax + 1)) AS qbin,
      |             LEAST(9, (p_e2 * 10) // (pmax + 1)) AS pbin, COUNT(*) AS n
      |      FROM e, m GROUP BY 1, 2),
      |qb AS (SELECT unnest(generate_series(0, 9)) AS qbin),
      |pb AS (SELECT unnest(generate_series(0, 9)) AS pbin)
      |SELECT CAST(qb.qbin AS BIGINT) AS qbin, CAST(pb.pbin AS BIGINT) AS pbin,
      |       CAST(COALESCE(c.n, 0) AS BIGINT) AS n
      |FROM qb CROSS JOIN pb
      |LEFT JOIN c ON c.qbin = qb.qbin AND c.pbin = pb.pbin
      |ORDER BY 1, 2""".stripMargin

  val targetEncodeOracle: String =
    """WITH li AS (SELECT l_partkey,
      |                   CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      |            FROM lineitem),
      |g AS (SELECT p.p_brand, COUNT(*) AS n, SUM(li.y) AS n_pos
      |      FROM li JOIN part p ON p.p_partkey = li.l_partkey
      |      GROUP BY 1),
      |t AS (SELECT SUM(n) AS n_tot, SUM(n_pos) AS pos_tot FROM g)
      |SELECT g.p_brand, g.n, CAST(g.n_pos AS BIGINT) AS n_pos,
      |       CAST(floor(CAST(g.n_pos * t.n_tot + 100 * t.pos_tot AS DOUBLE)
      |            / CAST((g.n + 100) * t.n_tot AS DOUBLE)
      |            * 1000000 + 0.5) AS BIGINT) AS enc_e6,
      |       CAST(floor(CAST(t.pos_tot AS DOUBLE) / CAST(t.n_tot AS DOUBLE)
      |            * 1000000 + 0.5) AS BIGINT) AS prior_e6
      |FROM g, t ORDER BY g.p_brand""".stripMargin

  /** x196: equal-FREQUENCY discretization (NTILE deciles) of price —
    * x134's histogram bins equal-WIDTH (skew piles everything into two
    * bins); equal-frequency is what a feature quantizer or a stratified
    * sampler actually wants. Implemented with ANSI NTILE semantics —
    * with n = k·q + r, the first r buckets get q+1 rows — on top of the
    * two-phase [[Ranking.globalRowNumber]] (a fact-sized ORDER BY is
    * exactly the single-task window melt that machinery exists for).
    * The per-bin (count, min, max) report is TIEBREAK-INVARIANT: NTILE
    * splits a tie run across a boundary arbitrarily, but which copies
    * land where never changes any bin's count (fixed by n, k) nor its
    * min/max (order statistics of the value multiset) — so the output
    * is deterministic and oracle-checkable even though the underlying
    * row assignment isn't total-ordered. One fact pass + a one-row
    * broadcast count + a k-row aggregate.
    */
  def quantileBins(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(floor(col("l_extendedprice") * 100d + 0.5d).cast("long").as("v"),
        col("l_orderkey"), col("l_linenumber"))
    val ranked = Ranking.globalRowNumber(li, col("v"),
      struct(col("l_orderkey"), col("l_linenumber")), "rn")
    val n = li.agg(count(lit(1)).as("n_tot"))
    ranked.crossJoin(broadcast(n))
      // NTILE: q = n DIV k, r = n MOD k; buckets 1..r hold q+1 rows —
      // all integer DIV, no rational ever materializes
      .withColumn("ntile_q", expr(s"n_tot DIV $k"))
      .withColumn("ntile_r", col("n_tot") % k)
      .select(col("v"),
        when(col("rn") <= col("ntile_r") * (col("ntile_q") + 1),
          expr("(rn - 1) DIV (ntile_q + 1) + 1"))
          .otherwise(col("ntile_r") +
            expr("(rn - ntile_r * (ntile_q + 1) - 1) DIV ntile_q + 1"))
          .as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), min(col("v")).as("min_e2"), max(col("v")).as("max_e2"))
      .orderBy("bin")
  }

  /** x204: ABC-XYZ inventory matrix — the two-axis stocking policy grid
    * (Silver–Pyke–Peterson): revenue importance (x192's Pareto ABC) ×
    * demand PREDICTABILITY (XYZ by the coefficient of variation of
    * weekly demand: X ≤ 0.5 steady, Y ≤ 1.0 fluctuating, Z erratic).
    * The CV threshold never computes a rational OR a square root: with
    * S = Σx, Q = Σx², n active weeks, Var = (nQ − S²)/n² and mean² =
    * S²/n², so CV² = (nQ − S²)/S² and the class cuts are the exact
    * DECIMAL-widened compares 4·(nQ − S²) ≤ S² (X) and (nQ − S²) ≤ S²
    * (Y). Demand is e2-exact weekly quantity
    * over ACTIVE weeks (a zero-filled grid would peg every sparse part
    * as erratic — documented choice, mirrored in the twin). One fact
    * pass per axis + a part-grain join; output is the ≤9-cell matrix.
    */
  def abcXyz(spark: SparkSession, dir: String): DataFrame = {
    val d38: Column => Column = _.cast("decimal(38,0)")
    val weekly = Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        expr("unix_micros(l_shipdate) div 86400000000 div 7").as("week"),
        floor(col("l_quantity") * 100d + 0.5d).cast("long").as("q_e2"))
      .groupBy("l_partkey", "week").agg(sum(col("q_e2")).as("d"))
    val xyz = xyzOf(weekly)
    abcLabeled(spark, dir).select(col("l_partkey"), col("abc"))
      .join(xyz, "l_partkey")
      .groupBy("abc", "xyz")
      .agg(count(lit(1)).as("n_parts"), sum(col("demand_e2")).as("demand_e2"))
      .orderBy("abc", "xyz")
  }

  /** The XYZ classification kernel over any (l_partkey, week, d) weekly
    * demand frame — split out so the spec can plant steady / fluctuating
    * / erratic fixtures through the exact cross-multiplied class cuts
    * (the synthetic corpus is all-Z, so the X/Y branches need planting).
    */
  private[graft] def xyzOf(weekly: DataFrame): DataFrame = {
    val d38: Column => Column = _.cast("decimal(38,0)")
    weekly.groupBy("l_partkey")
      .agg(count(lit(1)).as("n"), sum(col("d")).as("s"),
        sum(d38(col("d")) * d38(col("d"))).as("q"))
      .select(col("l_partkey"),
        when((d38(col("n")) * col("q") - d38(col("s")) * d38(col("s"))) * 4
          <= d38(col("s")) * d38(col("s")), "X")
          .when(d38(col("n")) * col("q") - d38(col("s")) * d38(col("s"))
            <= d38(col("s")) * d38(col("s")), "Y")
          .otherwise("Z").as("xyz"),
        col("s").as("demand_e2"))
  }

  val abcXyzOracle: String =
    """WITH rev AS (SELECT l_partkey,
      |                    SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
      |                      AS rev_e2
      |             FROM lineitem GROUP BY 1),
      |c AS (SELECT l_partkey, rev_e2,
      |             SUM(rev_e2) OVER (ORDER BY rev_e2 DESC, l_partkey
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_e2,
      |             (SELECT SUM(rev_e2) FROM rev) AS tot_e2
      |      FROM rev),
      |abc AS (SELECT l_partkey,
      |               CASE WHEN cum_e2 * 10 <= tot_e2 * 7 THEN 'A'
      |                    WHEN cum_e2 * 10 <= tot_e2 * 9 THEN 'B'
      |                    ELSE 'C' END AS abc
      |        FROM c),
      |weekly AS (SELECT l_partkey,
      |                  epoch_us(l_shipdate) // 86400000000 // 7 AS week,
      |                  SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS d
      |           FROM lineitem GROUP BY 1, 2),
      |xyz AS (SELECT l_partkey,
      |               CASE WHEN (CAST(n AS HUGEINT) * q
      |                          - CAST(s AS HUGEINT) * s) * 4
      |                         <= CAST(s AS HUGEINT) * s THEN 'X'
      |                    WHEN CAST(n AS HUGEINT) * q
      |                          - CAST(s AS HUGEINT) * s
      |                         <= CAST(s AS HUGEINT) * s THEN 'Y'
      |                    ELSE 'Z' END AS xyz,
      |               s AS demand_e2
      |        FROM (SELECT l_partkey, COUNT(*) AS n, SUM(d) AS s,
      |                     SUM(CAST(d AS HUGEINT) * d) AS q
      |              FROM weekly GROUP BY 1))
      |SELECT abc.abc, xyz.xyz, COUNT(*) AS n_parts,
      |       CAST(SUM(xyz.demand_e2) AS BIGINT) AS demand_e2
      |FROM abc JOIN xyz USING (l_partkey)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** x208: skyline (Pareto-frontier) query — the maximal-vector operator
    * (Börzsönyi et al., ICDE'01): parts not DOMINATED in (total
    * quantity, total revenue), i.e. no other part is ≥ in both and > in
    * one. A genuinely distinct operator class: not expressible as one
    * aggregate or one top-k. 2-D lets the frontier compute as a single
    * scan over the part-grain aggregate: keep the max-revenue parts
    * within each quantity value (ties on BOTH axes are mutually
    * non-dominating and all survive), then a value-RANGE window — max
    * revenue over STRICTLY greater quantities — marks dominated rows.
    * Exactness: both axes exact e2 BIGINTs, comparisons only. Scale
    * shape: the fact reduces to the part grain first; the frontier
    * window runs on the value grain (catalog-sized — the x148-class
    * reduction; a fact-sized skyline would use the block-partitioned
    * local-skyline + merge form, same algebra).
    */
  def skylineParts(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val agg = Tables.lineitem(spark, dir)
      .groupBy("l_partkey")
      .agg(sum(floor(col("l_quantity") * 100d + 0.5d).cast("long")).as("qty_e2"),
        sum(floor(col("l_extendedprice") * 100d + 0.5d).cast("long")).as("rev_e2"))
    // within a quantity value, only the max-revenue rows can be maximal
    val perQty = agg.withColumn("qmax_rev",
        max(col("rev_e2")).over(Window.partitionBy(col("qty_e2"))))
      .filter(col("rev_e2") === col("qmax_rev"))
    // dominated iff some strictly-greater quantity reaches ≥ this revenue
    perQty.withColumn("dom_rev",
        max(col("rev_e2")).over(Window.orderBy(col("qty_e2").desc)
          .rangeBetween(Window.unboundedPreceding, -1)))
      .filter(col("dom_rev").isNull || col("dom_rev") < col("rev_e2"))
      .select(col("l_partkey"), col("qty_e2"), col("rev_e2"))
      .orderBy(col("qty_e2").desc, col("l_partkey"))
  }

  val skylineOracle: String =
    """WITH a AS (SELECT l_partkey,
      |                  SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS qty_e2,
      |                  SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS rev_e2
      |           FROM lineitem GROUP BY 1),
      |q AS (SELECT * FROM a
      |      WHERE rev_e2 = (SELECT MAX(rev_e2) FROM a a2 WHERE a2.qty_e2 = a.qty_e2)),
      |s AS (SELECT l_partkey, qty_e2, rev_e2,
      |             MAX(rev_e2) OVER (ORDER BY qty_e2 DESC
      |               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS dom_rev
      |      FROM q)
      |SELECT l_partkey, CAST(qty_e2 AS BIGINT) AS qty_e2,
      |       CAST(rev_e2 AS BIGINT) AS rev_e2 FROM s
      |WHERE dom_rev IS NULL OR dom_rev < rev_e2
      |ORDER BY qty_e2 DESC, l_partkey""".stripMargin

  /** x209: decile lift / gains table — the model-eval companion to
    * x194's single-number AUC: bin by score decile (x196's exact NTILE
    * allocation over the two-phase rank), then per decile the response
    * rate, its lift over the base rate, and the cumulative share of all
    * positives captured (the gains curve). Score = price, response =
    * returned — the same leakage-audit pairing as x194 (lifts ≈ 1 and
    * gains ≈ diagonal certify the column carries no label signal).
    * Counts are exact; rate/lift/gain take one identically-written
    * double each.
    */
  def liftTable(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(spark, dir)
      .select(floor(col("l_extendedprice") * 100d + 0.5d).cast("long").as("v"),
        (col("l_returnflag") === "R").cast("long").as("y"),
        col("l_orderkey"), col("l_linenumber"))
    // tie-break INCLUDES y: a score-tie run split across a decile
    // boundary must be y-homogeneous within each (v, y) block, or the
    // per-bin positive counts would depend on which engine's NTILE takes
    // which copies — with y in the key, interchangeable rows carry the
    // same label and every bin's n_pos is tie-invariant
    val ranked = Ranking.globalRowNumber(li, col("v"),
      struct(col("y"), col("l_orderkey"), col("l_linenumber")), "rn")
    val n = li.agg(count(lit(1)).as("n_tot"), sum(col("y")).as("pos_tot"))
    val binned = ranked.crossJoin(broadcast(n))
      .withColumn("ntile_q", expr(s"n_tot DIV $k"))
      .withColumn("ntile_r", col("n_tot") % k)
      .select(col("y"), col("n_tot"), col("pos_tot"),
        when(col("rn") <= col("ntile_r") * (col("ntile_q") + 1),
          expr("(rn - 1) DIV (ntile_q + 1) + 1"))
          .otherwise(col("ntile_r") +
            expr("(rn - ntile_r * (ntile_q + 1) - 1) DIV ntile_q + 1"))
          .as("decile"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        max(col("n_tot")).as("n_tot"), max(col("pos_tot")).as("pos_tot"))
    binned
      .withColumn("cum_pos", sum(col("n_pos")).over(
        Window.orderBy(col("decile").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("decile"), col("n"), col("n_pos"),
        floor(col("n_pos").cast("double") / col("n").cast("double")
          * 1000000d + 0.5d).cast("long").as("rate_e6"),
        floor(col("n_pos").cast("double") * col("n_tot").cast("double")
          / (col("n").cast("double") * col("pos_tot").cast("double"))
          * 1000000d + 0.5d).cast("long").as("lift_e6"),
        floor(col("cum_pos").cast("double") / col("pos_tot").cast("double")
          * 1000000d + 0.5d).cast("long").as("cum_gain_e6"))
      .orderBy(col("decile").desc)
  }

  val liftTableOracle: String =
    """WITH li AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v,
      |                   CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
      |                   l_orderkey, l_linenumber
      |            FROM lineitem),
      |b AS (SELECT y, NTILE(10) OVER (ORDER BY v, y, l_orderkey, l_linenumber)
      |               AS decile FROM li),
      |t AS (SELECT COUNT(*) AS n_tot, SUM(y) AS pos_tot FROM li),
      |g AS (SELECT decile, COUNT(*) AS n, SUM(y) AS n_pos FROM b GROUP BY 1),
      |c AS (SELECT g.decile, g.n, g.n_pos, t.n_tot, t.pos_tot,
      |             SUM(g.n_pos) OVER (ORDER BY g.decile DESC
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos
      |      FROM g, t)
      |SELECT CAST(decile AS BIGINT) AS decile, n, CAST(n_pos AS BIGINT) AS n_pos,
      |       CAST(floor(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)
      |            * 1000000 + 0.5) AS BIGINT) AS rate_e6,
      |       CAST(floor(CAST(n_pos AS DOUBLE) * CAST(n_tot AS DOUBLE)
      |            / (CAST(n AS DOUBLE) * CAST(pos_tot AS DOUBLE))
      |            * 1000000 + 0.5) AS BIGINT) AS lift_e6,
      |       CAST(floor(CAST(cum_pos AS DOUBLE) / CAST(pos_tot AS DOUBLE)
      |            * 1000000 + 0.5) AS BIGINT) AS cum_gain_e6
      |FROM c ORDER BY decile DESC""".stripMargin

  val quantileBinsOracle: String =
    """WITH li AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
      |            FROM lineitem),
      |b AS (SELECT v, NTILE(10) OVER (ORDER BY v) AS bin FROM li)
      |SELECT CAST(bin AS BIGINT) AS bin, COUNT(*) AS n,
      |       MIN(v) AS min_e2, MAX(v) AS max_e2
      |FROM b GROUP BY 1 ORDER BY 1""".stripMargin
}
