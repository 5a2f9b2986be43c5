package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Data-quality observability for pipeline runs: row counts, null counts,
  * and range violations collected AS the job runs via Spark's
  * `Observation` API — aggregates piggyback on the existing pass (an
  * `CollectMetrics` node in the plan), so a 100 TB ingest is never
  * re-scanned just to know how many rows it had. This is the mechanism a
  * production pipeline uses to gate a write ("abort if > 0.1% of rows
  * dropped a key") without a second action.
  */
object Quality {

  /** Attach an observation measuring row count plus per-column null
    * counts. Returns the instrumented frame and the Observation; metrics
    * become available once ONE action has run over the frame.
    */
  def observed(df: DataFrame, name: String, nullCols: Seq[String]): (DataFrame, Observation) = {
    val obs = Observation(name)
    val metrics =
      count(lit(1)).as("n_rows") +:
        nullCols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** x124: table statistics collection — the ANALYZE-TABLE surface a
    * cost-based planner (and every data catalog) feeds on: per column,
    * null count, exact distinct count, and lexicographic min/max over the
    * string image (one type-stable representation for a heterogeneous
    * column list). ALL columns' statistics compute in ONE aggregate pass —
    * the multiple exact distincts compile to a single Expand (×|cols|
    * row multiplication before partial aggregation, the documented
    * trade: at 100 TB swap `countDistinct` for `approx_count_distinct`
    * t-digest-style mergeable HLL state and the Expand disappears) —
    * and the 1×(4·|cols|) result row pivots to |cols| rows by exploding
    * a struct array built at plan time: no second scan, no shuffle after
    * the aggregate.
    */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__ndv"),
        min(col(c).cast("string")).as(s"${c}__min"),
        max(col(c).cast("string")).as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = array(cols.map { c =>
      struct(lit(c).as("column_name"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__ndv").as("n_distinct"),
        col(s"${c}__min").as("min_str"),
        col(s"${c}__max").as("max_str"))
    }: _*)
    one.select(explode(stacked).as("s"))
      .select(col("s.column_name"), col("s.n_nulls"), col("s.n_distinct"),
        col("s.min_str"), col("s.max_str"))
      .orderBy("column_name")
  }

  /** x147: the 100 TB mode of [[columnStats]] — identical report shape,
    * but per-column NDV comes from a Datasketches HLL sketch
    * (`hll_sketch_agg`, the x112 mergeable-state machinery) instead of
    * exact `countDistinct`. The difference is the PLAN, and it is the
    * whole point: N exact distincts in one aggregate compile to a single
    * Expand that multiplies every input row ×N before the partial
    * aggregate — at 100 TB that is N× the shuffle write of the scan
    * itself. Sketches are plain mergeable aggregation buffers: no Expand,
    * one map-side pass, |cols|·2^lgK bytes of state per partition, and
    * the relative error is ~1.04/√2^lgK (±1.6 % at the default lgK=12).
    * OpsSpec pins BOTH the error bound against the exact x124 numbers and
    * the plan law (exact compiles to Expand, approx must not).
    */
  def columnStatsApprox(df: DataFrame, cols: Seq[String], lgK: Int = 12): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        hll_sketch_estimate(hll_sketch_agg(col(c).cast("string"), lit(lgK)))
          .as(s"${c}__ndv"),
        min(col(c).cast("string")).as(s"${c}__min"),
        max(col(c).cast("string")).as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = array(cols.map { c =>
      struct(lit(c).as("column_name"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__ndv").as("n_distinct_approx"),
        col(s"${c}__min").as("min_str"),
        col(s"${c}__max").as("max_str"))
    }: _*)
    one.select(explode(stacked).as("s"))
      .select(col("s.column_name"), col("s.n_nulls"), col("s.n_distinct_approx"),
        col("s.min_str"), col("s.max_str"))
      .orderBy("column_name")
  }

  /** x137: snapshot profile drift — x124's ANALYZE surface applied to
    * CHANGE DETECTION: per column, null counts, exact distinct counts,
    * and a range-moved flag for an old vs a new corpus snapshot (the
    * x105 carve convention: old = doc_id % 17 ≠ 0 with the % 13 staleness
    * mutation, new = doc_id % 19 ≠ 0). This is the schema-drift gate a
    * nightly ingest runs before promoting a snapshot — "did a feed stop
    * filling `lang`? did `source` cardinality collapse?" — and the
    * novelty is the plan: BOTH snapshots' statistics for ALL columns
    * compute in ONE pass over the shared base (conditional aggregates
    * gated on the carve flags; the exact distincts compile to the same
    * single Expand as x124), where the naive formulation scans the table
    * once per snapshot. The 1×(8·|cols|) row pivots via a plan-time
    * struct array; the drift ratio is integer basis points.
    */
  def profileDrift(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Column
    val base = graft.Tables.documents(spark, dir).select(
      col("doc_id"), col("lang"), col("source"), col("text"),
      (col("doc_id") % 17 =!= 0).as("in_old"),
      (col("doc_id") % 19 =!= 0).as("in_new"),
      when(col("doc_id") % 13 === 0, concat(col("text"), lit(" [stale]")))
        .otherwise(col("text")).as("text_old"))
    // (column, old-snapshot value, new-snapshot value) — string images,
    // the x124 type-stable representation
    val specs: Seq[(String, Column, Column)] = Seq(
      ("doc_id", col("doc_id").cast("string"), col("doc_id").cast("string")),
      ("lang", col("lang"), col("lang")),
      ("source", col("source"), col("source")),
      ("text", col("text_old"), col("text")))
    val aggs = specs.flatMap { case (n, ov, nv) =>
      Seq(
        sum(when(col("in_old") && ov.isNull, 1L).otherwise(0L)).as(s"${n}__nulls_old"),
        sum(when(col("in_new") && nv.isNull, 1L).otherwise(0L)).as(s"${n}__nulls_new"),
        countDistinct(when(col("in_old"), ov)).as(s"${n}__ndv_old"),
        countDistinct(when(col("in_new"), nv)).as(s"${n}__ndv_new"),
        min(when(col("in_old"), ov)).as(s"${n}__min_old"),
        min(when(col("in_new"), nv)).as(s"${n}__min_new"),
        max(when(col("in_old"), ov)).as(s"${n}__max_old"),
        max(when(col("in_new"), nv)).as(s"${n}__max_new"))
    }
    val one = base.agg(aggs.head, aggs.tail: _*)
    val stacked = array(specs.map { case (n, _, _) =>
      struct(lit(n).as("column_name"),
        col(s"${n}__nulls_old").as("nulls_old"),
        col(s"${n}__nulls_new").as("nulls_new"),
        col(s"${n}__ndv_old").as("ndv_old"),
        col(s"${n}__ndv_new").as("ndv_new"),
        // ndv_old = 0 (a column entirely null in the old snapshot — a
        // drift case this report exists to catch) emits sentinel -1:
        // Spark's div would yield NULL while DuckDB errors on // 0, so an
        // unguarded denominator is a cross-engine divergence
        when(col(s"${n}__ndv_old") === 0, lit(-1L))
          .otherwise(expr(s"${n}__ndv_new * 10000 div ${n}__ndv_old"))
          .as("ndv_ratio_bp"),
        (col(s"${n}__min_old") =!= col(s"${n}__min_new") ||
          col(s"${n}__max_old") =!= col(s"${n}__max_new")).cast("long")
          .as("range_changed"))
    }: _*)
    one.select(explode(stacked).as("s"))
      .select(col("s.column_name"), col("s.nulls_old"), col("s.nulls_new"),
        col("s.ndv_old"), col("s.ndv_new"), col("s.ndv_ratio_bp"),
        col("s.range_changed"))
      .orderBy("column_name")
  }

  /** DuckDB twin: the same conditional aggregates per column, unioned. */
  val driftOracle: String = {
    def block(n: String, ov: String, nv: String): String =
      s"""SELECT '$n' AS column_name,
         |  CAST(SUM(CASE WHEN in_old AND $ov IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_old,
         |  CAST(SUM(CASE WHEN in_new AND $nv IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_new,
         |  CAST(COUNT(DISTINCT CASE WHEN in_old THEN $ov END) AS BIGINT) AS ndv_old,
         |  CAST(COUNT(DISTINCT CASE WHEN in_new THEN $nv END) AS BIGINT) AS ndv_new,
         |  CAST((MIN(CASE WHEN in_old THEN $ov END) <> MIN(CASE WHEN in_new THEN $nv END)
         |     OR MAX(CASE WHEN in_old THEN $ov END) <> MAX(CASE WHEN in_new THEN $nv END)) AS BIGINT) AS range_changed
         |FROM base""".stripMargin
    """WITH base AS (
      |  SELECT doc_id, lang, source, text,
      |         (doc_id % 17 <> 0) AS in_old,
      |         (doc_id % 19 <> 0) AS in_new,
      |         CASE WHEN doc_id % 13 = 0 THEN text || ' [stale]' ELSE text END AS text_old
      |  FROM documents),
      |u AS (
      |""".stripMargin +
      Seq(
        block("doc_id", "CAST(doc_id AS VARCHAR)", "CAST(doc_id AS VARCHAR)"),
        block("lang", "lang", "lang"),
        block("source", "source", "source"),
        block("text", "text_old", "text")).mkString("", "\nUNION ALL\n", ")\n") +
      """SELECT column_name, nulls_old, nulls_new, ndv_old, ndv_new,
        |       CAST(CASE WHEN ndv_old = 0 THEN -1
        |                 ELSE ndv_new * 10000 // ndv_old END AS BIGINT) AS ndv_ratio_bp,
        |       range_changed
        |FROM u ORDER BY column_name""".stripMargin
  }

  /** x125: constraint audit — the referential-integrity / key-uniqueness /
    * domain-rule sweep a warehouse runs before trusting a load: FK orphan
    * counts (key-projected LEFT ANTI joins — AQE broadcasts the dim key
    * set while it fits, co-partitioned shuffle join beyond), PK duplicate
    * counts (rows − exact distinct keys, one aggregate each), and row-level
    * domain rules (conditional counts, no shuffle). Each check emits
    * (check_name, n_violations, n_checked); a clean corpus reports zeros
    * WITH its checked denominators — "0 of 60000" is evidence, "0" alone
    * is a silent skip. OpsSpec proves the checks actually fire by feeding
    * corrupted inputs through this same body.
    */
  def constraintAudit(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import graft.Tables
    constraintAuditOf(Tables.orders(spark, dir), Tables.customer(spark, dir),
      Tables.lineitem(spark, dir), Tables.part(spark, dir), Tables.supplier(spark, dir))
  }

  private[graft] def constraintAuditOf(orders: DataFrame, customer: DataFrame,
      lineitem: DataFrame, part: DataFrame, supplier: DataFrame): DataFrame = {
    def check(name: String, violations: DataFrame, checked: DataFrame): DataFrame =
      violations.agg(count(lit(1)).as("n_violations"))
        .crossJoin(checked.agg(count(lit(1)).as("n_checked")))
        .select(lit(name).as("check_name"), col("n_violations"), col("n_checked"))
    def fk(name: String, fact: DataFrame, key: String,
           dim: DataFrame, dimKey: String): DataFrame =
      check(name,
        fact.select(col(key)).join(dim.select(col(dimKey)),
          col(key) === col(dimKey), "left_anti"),
        fact)
    def pkDup(name: String, df: DataFrame, keys: Seq[String]): DataFrame =
      df.agg((count(lit(1)) - countDistinct(keys.head, keys.tail: _*)).as("n_violations"),
          count(lit(1)).as("n_checked"))
        .select(lit(name).as("check_name"), col("n_violations"), col("n_checked"))
    Seq(
      fk("fk_lineitem_orders", lineitem, "l_orderkey", orders, "o_orderkey"),
      fk("fk_lineitem_part", lineitem, "l_partkey", part, "p_partkey"),
      fk("fk_lineitem_supplier", lineitem, "l_suppkey", supplier, "s_suppkey"),
      fk("fk_orders_customer", orders, "o_custkey", customer, "c_custkey"),
      pkDup("pk_orders", orders, Seq("o_orderkey")),
      pkDup("pk_lineitem", lineitem, Seq("l_orderkey", "l_linenumber")),
      check("chk_lineitem_qty_positive",
        lineitem.filter(col("l_quantity") <= 0), lineitem),
      check("chk_lineitem_discount_range",
        lineitem.filter(col("l_discount") < 0 || col("l_discount") > 1), lineitem))
      .reduce(_ unionByName _)
      .orderBy("check_name")
  }

  val auditOracle: String =
    """SELECT 'chk_lineitem_qty_positive' AS check_name,
      |       CAST((SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0) AS BIGINT) AS n_violations,
      |       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_checked
      |UNION ALL
      |SELECT 'chk_lineitem_discount_range',
      |       (SELECT COUNT(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1),
      |       (SELECT COUNT(*) FROM lineitem)
      |UNION ALL
      |SELECT 'fk_lineitem_orders',
      |       (SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o
      |          ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL),
      |       (SELECT COUNT(*) FROM lineitem)
      |UNION ALL
      |SELECT 'fk_lineitem_part',
      |       (SELECT COUNT(*) FROM lineitem l LEFT JOIN part p
      |          ON l.l_partkey = p.p_partkey WHERE p.p_partkey IS NULL),
      |       (SELECT COUNT(*) FROM lineitem)
      |UNION ALL
      |SELECT 'fk_lineitem_supplier',
      |       (SELECT COUNT(*) FROM lineitem l LEFT JOIN supplier s
      |          ON l.l_suppkey = s.s_suppkey WHERE s.s_suppkey IS NULL),
      |       (SELECT COUNT(*) FROM lineitem)
      |UNION ALL
      |SELECT 'fk_orders_customer',
      |       (SELECT COUNT(*) FROM orders o LEFT JOIN customer c
      |          ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL),
      |       (SELECT COUNT(*) FROM orders)
      |UNION ALL
      |SELECT 'pk_lineitem',
      |       (SELECT COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) FROM lineitem),
      |       (SELECT COUNT(*) FROM lineitem)
      |UNION ALL
      |SELECT 'pk_orders',
      |       (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders),
      |       (SELECT COUNT(*) FROM orders)
      |ORDER BY check_name""".stripMargin

  /** x166: Benford leading-digit audit — the fabrication/corruption
    * fingerprint an ingest gate runs over any organically-grown monetary
    * column (synthetic or truncated feeds flunk it; naturally multiplicative
    * ones follow log₁₀(1+1/d)). The leading digit is extracted with NO
    * floating log: values floor once to e2 cents (positive by the x125
    * price constraint) and the first character of the integer's decimal
    * string is the digit — pure string arithmetic, identical in both
    * engines. Per digit d ∈ 1..9: observed count (exact), observed and
    * Benford-expected shares in e6 fixed point (one double division of
    * exact integers each, rounded once), and the absolute deviation in
    * exact integer e6. One map-combinable aggregate to 9 rows; the dense
    * digit grid is built from a 9-row range so a never-occurring digit
    * still reports (the x134 zero-fill posture).
    */
  def benfordAudit(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val digits = graft.Tables.orders(spark, dir)
      .select(substring(floor(col("o_totalprice") * 100d + 0.5d).cast("long")
        .cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_d"))
    val total = digits.agg(sum(col("n_d")).as("n"))
    spark.range(1, 10).select(col("id").as("digit"))
      .join(digits, Seq("digit"), "left")
      .crossJoin(broadcast(total))
      .select(col("digit"), coalesce(col("n_d"), lit(0L)).as("n_d"), col("n"))
      .select(col("digit"), col("n_d"),
        floor((col("n_d") * lit(1000000L)) / col("n") + 0.5d).cast("long").as("obs_e6"),
        floor(log(lit(1d) + lit(1d) / col("digit")) / log(lit(10d)) * 1000000d + 0.5d)
          .cast("long").as("exp_e6"))
      .withColumn("dev_e6", abs(col("obs_e6") - col("exp_e6")))
      .orderBy("digit")
  }

  val benfordOracle: String =
    """WITH d AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
      |                               AS VARCHAR), 1, 1) AS BIGINT) AS digit
      |           FROM orders),
      |c AS (SELECT digit, COUNT(*) AS n_d FROM d GROUP BY 1),
      |t AS (SELECT SUM(n_d) AS n FROM c),
      |grid AS (SELECT unnest(generate_series(1, 9)) AS digit)
      |SELECT g.digit, CAST(COALESCE(c.n_d, 0) AS BIGINT) AS n_d,
      |       CAST(floor((COALESCE(c.n_d, 0) * 1000000) / t.n + 0.5) AS BIGINT) AS obs_e6,
      |       CAST(floor(ln(1 + 1.0 / g.digit) / ln(10) * 1000000 + 0.5) AS BIGINT) AS exp_e6,
      |       abs(CAST(floor((COALESCE(c.n_d, 0) * 1000000) / t.n + 0.5) AS BIGINT) -
      |           CAST(floor(ln(1 + 1.0 / g.digit) / ln(10) * 1000000 + 0.5) AS BIGINT)) AS dev_e6
      |FROM grid g LEFT JOIN c ON c.digit = g.digit CROSS JOIN t
      |ORDER BY g.digit""".stripMargin

  /** x167: k-anonymity audit — the privacy gate a curation pipeline runs
    * beside the x75 PII scrub: any quasi-identifier combination shared by
    * fewer than k individuals re-identifies them under linkage, so the
    * release report is exactly those risky groups. QID = (nationkey,
    * mktsegment) over customers; ONE map-combinable aggregate, the k
    * filter on the aggregate output (never fact-sized), plus each risky
    * group's share of the population in e6 fixed point. At 100 TB this
    * is a groupBy on the QID columns and a broadcast total — nothing else.
    */
  def kAnonymityAudit(spark: org.apache.spark.sql.SparkSession, dir: String,
                      k: Long = 8L): DataFrame = {
    val groups = graft.Tables.customer(spark, dir)
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("n"))
    val total = groups.agg(sum(col("n")).as("pop"))
    groups.filter(col("n") < k)
      .crossJoin(broadcast(total))
      .select(col("c_nationkey").cast("long").as("nationkey"), col("c_mktsegment"),
        col("n"),
        floor((col("n") * lit(1000000L)) / col("pop") + 0.5d).cast("long").as("share_e6"),
        lit(k).as("k"))
      .orderBy("nationkey", "c_mktsegment")
  }

  val kAnonymityOracle: String =
    """WITH g AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
      |           FROM customer GROUP BY 1, 2),
      |t AS (SELECT SUM(n) AS pop FROM g)
      |SELECT CAST(c_nationkey AS BIGINT) AS nationkey, c_mktsegment,
      |       CAST(n AS BIGINT) AS n,
      |       CAST(floor((n * 1000000) / t.pop + 0.5) AS BIGINT) AS share_e6,
      |       CAST(8 AS BIGINT) AS k
      |FROM g, t WHERE n < 8
      |ORDER BY nationkey, c_mktsegment""".stripMargin

  /** x210: duplicate-payment detection — the finance-audit classic
    * (same customer, same amount, within a short window ⇒ candidate
    * double-charge). The scale discipline is the point: the naive form
    * is a fact self-join banded on dates (quadratic in the worst key);
    * here candidates group by the (customer, amount-band) key first —
    * a pair can only be a candidate within a group — and the window
    * scan is a bounded (cust, band)-partitioned LAG over order day
    * (the x207 shape): consecutive same-band orders ≤ 30 days apart
    * flag, so an m-order group costs m·log m, never m². The $10k
    * amount band and 30-day window are fixture-driven fuzz (this
    * corpus has no EXACT amount repeats; a production ledger keys on
    * the exact amount with the identical plan). Day gaps are exact
    * integers; output is each flagged LATER order with its
    * predecessor — a total-ordered audit list.
    */
  def dupPayments(spark: org.apache.spark.sql.SparkSession, dir: String,
                  windowDays: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        expr("floor(o_totalprice * 100 + 0.5) DIV 1000000").cast("long").as("amt_band"),
        expr("unix_micros(o_orderdate) div 86400000000").as("day"))
    val w = Window.partitionBy(col("o_custkey"), col("amt_band"))
      .orderBy(col("day"), col("o_orderkey"))
    o.withColumn("prev_day", lag(col("day"), 1).over(w))
      .withColumn("prev_key", lag(col("o_orderkey"), 1).over(w))
      .filter(col("prev_day").isNotNull &&
        col("day") - col("prev_day") <= windowDays)
      .select(col("o_custkey"), col("amt_band"),
        col("prev_key").as("first_orderkey"), col("o_orderkey").as("dup_orderkey"),
        (col("day") - col("prev_day")).as("gap_days"))
      .orderBy("o_custkey", "amt_band", "dup_orderkey")
  }

  val dupPaymentsOracle: String =
    """WITH o AS (SELECT o_orderkey, o_custkey,
      |                  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 1000000
      |                    AS amt_band,
      |                  epoch_us(o_orderdate) // 86400000000 AS day
      |           FROM orders),
      |l AS (SELECT o_custkey, amt_band, o_orderkey, day,
      |             LAG(day) OVER w AS prev_day,
      |             LAG(o_orderkey) OVER w AS prev_key
      |      FROM o
      |      WINDOW w AS (PARTITION BY o_custkey, amt_band ORDER BY day, o_orderkey))
      |SELECT o_custkey, amt_band, prev_key AS first_orderkey,
      |       o_orderkey AS dup_orderkey,
      |       CAST(day - prev_day AS BIGINT) AS gap_days
      |FROM l WHERE prev_day IS NOT NULL AND day - prev_day <= 30
      |ORDER BY o_custkey, amt_band, dup_orderkey""".stripMargin

  /** x201: two-proportion A/B test report — the experimentation
    * readout (assignment → conversion → pooled z) every growth team
    * runs; x131's Wilson bounds give per-arm intervals, this is the
    * BETWEEN-arm significance. Unit = active user-DAY (conversion =
    * that day contained a purchase — the user grain saturates at 100%
    * conversion on this fixture, a degenerate pooled variance),
    * assignment = user_id parity — the deterministic stand-in for a
    * hash-bucketed experiment assignment (x70's split machinery is the
    * production path). Counts reduce exactly (one user-day-grain
    * aggregate off one fact pass, then a 2-row reduction);
    * rates, lift, and the pooled two-proportion z convert to double
    * once each, identical formulas both engines. z ≈ 0 certifies the
    * parity split is unbiased — the A/A-test reading.
    */
  def abTest(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val users = graft.Tables.events(spark, dir)
      .groupBy(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
      .groupBy((col("user_id") % 2).as("arm"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
    // one-row conditional reduction, NOT a crossJoin of two filtered
    // frames: an empty arm there returns ZERO rows (silently no report);
    // here it surfaces as NULL counts, and the guarded stats below go
    // NULL with it. Degenerate pooled rates (0 or 1 — variance 0) and a
    // zero control rate (lift undefined) also null their stat instead of
    // dividing by zero — ANSI mode would throw, and Infinity→long casts
    // diverge between engines anyway. The mannKendall posture.
    val w = users.agg(
      sum(when(col("arm") === 0, col("n"))).as("n_a"),
      sum(when(col("arm") === 0, col("c"))).as("c_a"),
      sum(when(col("arm") === 1, col("n"))).as("n_b"),
      sum(when(col("arm") === 1, col("c"))).as("c_b"))
    val pPool = (col("c_a") + col("c_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val varTerm = pPool * (lit(1d) - pPool) *
      (lit(1d) / col("n_a").cast("double") + lit(1d) / col("n_b").cast("double"))
    w.select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
        floor(col("c_a").cast("double") / col("n_a").cast("double")
          * 1000000d + 0.5d).cast("long").as("rate_a_e6"),
        floor(col("c_b").cast("double") / col("n_b").cast("double")
          * 1000000d + 0.5d).cast("long").as("rate_b_e6"),
        when(col("c_a") > 0,
          floor((col("c_b").cast("double") * col("n_a").cast("double")
            / (col("c_a").cast("double") * col("n_b").cast("double")) - 1d)
            * 1000000d + 0.5d).cast("long")).as("lift_e6"),
        when(varTerm > 0d,
          floor((col("c_a").cast("double") / col("n_a").cast("double")
            - col("c_b").cast("double") / col("n_b").cast("double"))
            / sqrt(varTerm)
            * 10000d + 0.5d).cast("long")).as("z_e4"))
  }

  val abTestOracle: String =
    """WITH u AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
      |                  MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      |           FROM events GROUP BY 1, 2),
      |g AS (SELECT user_id % 2 AS arm, COUNT(*) AS n, SUM(conv) AS c
      |      FROM u GROUP BY 1),
      |w AS (SELECT
      |        CAST(SUM(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n_a,
      |        CAST(SUM(CASE WHEN arm = 0 THEN c END) AS BIGINT) AS c_a,
      |        CAST(SUM(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n_b,
      |        CAST(SUM(CASE WHEN arm = 1 THEN c END) AS BIGINT) AS c_b
      |      FROM g),
      |v AS (SELECT *,
      |        CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)
      |          * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
      |          * (1.0 / n_a + 1.0 / n_b) AS var_term
      |      FROM w)
      |SELECT n_a, c_a, n_b, c_b,
      |       CAST(floor(CAST(c_a AS DOUBLE) / n_a * 1000000 + 0.5) AS BIGINT) AS rate_a_e6,
      |       CAST(floor(CAST(c_b AS DOUBLE) / n_b * 1000000 + 0.5) AS BIGINT) AS rate_b_e6,
      |       CASE WHEN c_a > 0 THEN
      |         CAST(floor((CAST(c_b AS DOUBLE) * n_a / (CAST(c_a AS DOUBLE) * n_b) - 1)
      |              * 1000000 + 0.5) AS BIGINT) END AS lift_e6,
      |       CASE WHEN var_term > 0 THEN
      |         CAST(floor((CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
      |              / sqrt(var_term)
      |              * 10000 + 0.5) AS BIGINT) END AS z_e4
      |FROM v""".stripMargin

  /** x198: functional-dependency audit — data profiling's "which keys
    * really determine which columns" (Papenbrock et al., VLDB'15 frame
    * this as FD discovery; this is the VALIDATION side over a candidate
    * list, which is what a pipeline contract actually pins). Per
    * candidate lhs → rhs: distinct lhs count, count of VIOLATING lhs
    * (those mapping to >1 rhs), and the classic g₃ error (Kivinen &
    * Mannila '95): the minimum fraction of rows to delete to make the
    * FD hold = 1 − Σ_lhs max_rhs cnt / n. Everything is exact integer
    * counts off ONE (lhs, rhs)-grain aggregate per candidate — two
    * map-combinable reductions, no joins; the fact-sized candidate
    * (l_orderkey → l_suppkey) reduces at the first groupBy, so 100 TB
    * cost is the grain's cardinality, not a shuffle of the fact.
    * Includes both HOLDING FDs (the PK laws a contract asserts) and
    * violated ones (g₃ says HOW broken).
    */
  def fdAudit(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    def profile(df: DataFrame, fd: String, lhs: String, rhs: String): DataFrame = {
      val g = df.groupBy(col(lhs).cast("string").as("l"),
          col(rhs).cast("string").as("r"))
        .agg(count(lit(1)).as("cnt"))
      g.groupBy("l")
        .agg(count(lit(1)).as("n_rhs"), sum(col("cnt")).as("tot"),
          max(col("cnt")).as("mx"))
        .agg(sum(col("tot")).as("n_rows"), count(lit(1)).as("n_lhs"),
          sum(when(col("n_rhs") > 1, 1L).otherwise(0L)).as("n_violating"),
          sum(col("mx")).as("keep"))
        .select(lit(fd).as("fd"), col("n_rows"), col("n_lhs"),
          col("n_violating"),
          floor((col("n_rows") - col("keep")).cast("double")
            / col("n_rows").cast("double") * 1000000d + 0.5d)
            .cast("long").as("g3_e6"))
    }
    val li = graft.Tables.lineitem(spark, dir)
    val o = graft.Tables.orders(spark, dir)
    val c = graft.Tables.customer(spark, dir)
    val p = graft.Tables.part(spark, dir)
    profile(li, "lineitem.l_orderkey->l_suppkey", "l_orderkey", "l_suppkey")
      .unionAll(profile(o, "orders.o_orderkey->o_custkey", "o_orderkey", "o_custkey"))
      .unionAll(profile(c, "customer.c_custkey->c_nationkey", "c_custkey", "c_nationkey"))
      .unionAll(profile(p, "part.p_brand->p_type", "p_brand", "p_type"))
      .unionAll(profile(c, "customer.c_mktsegment->c_nationkey", "c_mktsegment", "c_nationkey"))
      .orderBy("fd")
  }

  val fdAuditOracle: String = {
    def block(tbl: String, fd: String, lhs: String, rhs: String): String =
      s"""SELECT '$fd' AS fd, n_rows, n_lhs, n_violating, g3_e6 FROM (
         |  SELECT CAST(SUM(tot) AS BIGINT) AS n_rows, COUNT(*) AS n_lhs,
         |         CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_violating,
         |         CAST(floor(CAST(SUM(tot) - SUM(mx) AS DOUBLE)
         |              / CAST(SUM(tot) AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS g3_e6
         |  FROM (SELECT l, COUNT(*) AS n_rhs, SUM(cnt) AS tot, MAX(cnt) AS mx
         |        FROM (SELECT CAST($lhs AS VARCHAR) AS l, CAST($rhs AS VARCHAR) AS r,
         |                     COUNT(*) AS cnt FROM $tbl GROUP BY 1, 2)
         |        GROUP BY 1))""".stripMargin
    Seq(
      block("lineitem", "lineitem.l_orderkey->l_suppkey", "l_orderkey", "l_suppkey"),
      block("orders", "orders.o_orderkey->o_custkey", "o_orderkey", "o_custkey"),
      block("customer", "customer.c_custkey->c_nationkey", "c_custkey", "c_nationkey"),
      block("part", "part.p_brand->p_type", "p_brand", "p_type"),
      block("customer", "customer.c_mktsegment->c_nationkey", "c_mktsegment", "c_nationkey"),
    ).mkString("", "\nUNION ALL\n", "\nORDER BY fd")
  }

  /** x194: exact ROC AUC of a score against a binary label, computed as
    * the tie-corrected Mann–Whitney rank-sum — the model-eval metric
    * (m02 reports spark.ml's) re-expressed as pure relational algebra so
    * it is (a) exact, (b) DuckDB-oracle-checkable, and (c) 100 TB-shaped:
    * AUC = Σ over positives of P(score > negative) + ½P(tie), which on
    * the DISTINCT-VALUE grain is Σ_v np_v·(2·negBelow_v + nn_v) / (2·P·N)
    * — one grouped aggregate to the value grain, one two-phase
    * [[graft.ops.Ranking.globalCumSum]] for negBelow (no single-task
    * window melt), one map-combinable reduction. Everything up to the
    * single final division is exact BIGINT/DECIMAL.
    *
    * Demonstrated on "does price predict a return?" (score =
    * l_extendedprice e2, label = l_returnflag = 'R') — an audit shape:
    * AUC ≈ ½ certifies the label leaks nothing through that column.
    * Also emits Somers' D = 2·AUC − 1 as (U2 − P·N)/(P·N).
    */
  def aucRankSum(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    aucOf(graft.Tables.lineitem(spark, dir)
      .select(floor(col("l_extendedprice") * 100d + 0.5d).cast("long").as("v"),
        (col("l_returnflag") === "R").as("pos")), col("v"), col("pos"))

  /** The reusable exact-AUC kernel behind x194 — any (score, label) frame
    * reduces to the distinct-score grain and through one two-phase
    * cumsum; m08 feeds it model probabilities (spark.ml's own
    * binarySummary AUC bins/samples and is NOT run-stable at 1e-6 —
    * this is, which is what lets MlSpec pin refit equality exactly).
    */
  def aucOf(scored: DataFrame, score: Column, label: Column): DataFrame = {
    val d38: Column => Column = _.cast("decimal(38,0)")
    val g = scored.select(score.as("v"), label.as("pos"))
      .groupBy("v")
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("np"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("nn"))
    Ranking.globalCumSum(g, col("v"), col("v"), col("nn"), "cnn")
      .agg(sum(d38(col("np")) * (lit(2) * (col("cnn") - col("nn")) + col("nn")))
          .as("u2"),
        sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        floor(col("u2").cast("double")
          / (lit(2d) * col("n_pos").cast("double") * col("n_neg").cast("double"))
          * 1000000d + 0.5d).cast("long").as("auc_e6"),
        floor((col("u2") - d38(col("n_pos")) * d38(col("n_neg"))).cast("double")
          / (col("n_pos").cast("double") * col("n_neg").cast("double"))
          * 1000000d + 0.5d).cast("long").as("somers_d_e6"))
  }

  val aucOracle: String =
    """WITH g AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v,
      |                  SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS np,
      |                  SUM(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) AS nn
      |           FROM lineitem GROUP BY 1),
      |c AS (SELECT np, nn,
      |             SUM(nn) OVER (ORDER BY v
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnn
      |      FROM g),
      |s AS (SELECT SUM(CAST(np AS HUGEINT) * (2 * (cnn - nn) + nn)) AS u2,
      |             SUM(np) AS n_pos, SUM(nn) AS n_neg
      |      FROM c)
      |SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
      |       CAST(floor(CAST(u2 AS DOUBLE)
      |            / (2 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
      |            * 1000000 + 0.5) AS BIGINT) AS auc_e6,
      |       CAST(floor(CAST(u2 - CAST(n_pos AS HUGEINT) * n_neg AS DOUBLE)
      |            / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
      |            * 1000000 + 0.5) AS BIGINT) AS somers_d_e6
      |FROM s""".stripMargin

  /** x195: two-sample Kolmogorov–Smirnov statistic between the returned
    * and kept lines' price distributions — the distribution-equality
    * audit behind split validation ("did my train/test halves draw from
    * the same distribution?") and drift detection (the nonparametric
    * sibling of x168's binned PSI: KS needs no bin choice). D =
    * max_v |F₁(v) − F₂(v)| evaluated on the distinct-value grain with
    * BOTH ECDFs as exact integer cumulative counts (ONE two-phase
    * multi-weight cumsum), compared cross-multiplied — |c₁·n₂ − c₂·n₁| over n₁·n₂ —
    * so the max is taken over exact integers and the one division
    * happens once, on the argmax row. The argmax location (lowest such
    * v) is reported: that's the price where the two CDFs diverge most.
    */
  def ksTest(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val d38: Column => Column = _.cast("decimal(38,0)")
    val g = graft.Tables.lineitem(spark, dir)
      .select(floor(col("l_extendedprice") * 100d + 0.5d).cast("long").as("v"),
        (col("l_returnflag") === "R").as("pos"))
      .groupBy("v")
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("n2"))
    val c2 = Ranking.globalCumSums(g, col("v"), col("v"),
      Seq(col("n1") -> "c1", col("n2") -> "c2"))
    val tot = g.agg(sum(col("n1")).as("t1"), sum(col("n2")).as("t2"))
    c2.crossJoin(broadcast(tot))
      .select(col("v"), col("t1"), col("t2"),
        abs(d38(col("c1")) * d38(col("t2")) - d38(col("c2")) * d38(col("t1")))
          .as("gap"))
      .orderBy(col("gap").desc, col("v"))
      .limit(1)
      .select(col("t1").as("n_returned"), col("t2").as("n_kept"),
        col("v").as("argmax_v"),
        floor(col("gap").cast("double")
          / (col("t1").cast("double") * col("t2").cast("double"))
          * 1000000d + 0.5d).cast("long").as("ks_d_e6"))
  }

  /** x218: CUPED variance reduction (Deng et al., WSDM'13) — the
    * industry-standard experiment readout x201's raw two-proportion z
    * lacks: each user's post-period metric is adjusted by their
    * PRE-period covariate (Y − θ·(X − X̄)), which removes the
    * between-user variance component that assignment randomized away
    * and typically halves the sample needed for the same power. Unit =
    * user; X = first-15-day spend (exact e2 cents), Y = remaining-span
    * spend; arms = user parity (the x201 assignment). θ =
    * cov(X,Y)/var(X) is POOLED (computed blind to arm — the unbiasedness
    * requirement), from one exact integer moment row (Σx, Σy, Σxy, Σx²,
    * Σy² DECIMAL-widened, n), so every emitted statistic is a pinned-
    * order double over exact integers, floored once. var_reduction_e6 =
    * ρ²·10⁶ is the classic "fraction of variance CUPED removes".
    * Null-guarded like abTest: a degenerate pre-period (var X = 0)
    * nulls θ-dependent columns instead of dividing by zero. Scale
    * shape: ONE events pass → user grain → one 1-row moment reduction +
    * a 2-row arm reduction; nothing after the first groupBy exceeds
    * |users|.
    */
  def cuped(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val dec: Column => Column = _.cast("decimal(38,0)")
    val ev = graft.Tables.events(spark, dir)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") * 100d + 0.5d).cast("long").as("v_e2"))
    val lo = ev.agg(min(col("day")).as("d0"))
    val users = ev.crossJoin(broadcast(lo))
      .groupBy("user_id")
      .agg(sum(when(col("day") < col("d0") + 15L, col("v_e2")).otherwise(0L)).as("x"),
        sum(when(col("day") >= col("d0") + 15L, col("v_e2")).otherwise(0L)).as("y"))
      .withColumn("arm", col("user_id") % 2)
    val mom = users.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(dec(col("x")) * col("y")).as("sxy"),
      sum(dec(col("x")) * col("x")).as("sxx"),
      sum(dec(col("y")) * col("y")).as("syy"))
    val arms = users.groupBy("arm")
      .agg(count(lit(1)).as("na"), sum(col("x")).as("ax"), sum(col("y")).as("ay"))
    val w = arms.agg(
      sum(when(col("arm") === 0, col("na"))).as("n_a"),
      sum(when(col("arm") === 0, col("ax"))).as("x_a"),
      sum(when(col("arm") === 0, col("ay"))).as("y_a"),
      sum(when(col("arm") === 1, col("na"))).as("n_b"),
      sum(when(col("arm") === 1, col("ax"))).as("x_b"),
      sum(when(col("arm") === 1, col("ay"))).as("y_b"))
    val nD = col("n").cast("double")
    val covN = col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double") / nD
    val varxN = col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double") / nD
    val varyN = col("syy").cast("double") - col("sy").cast("double") * col("sy").cast("double") / nD
    val theta = covN / varxN
    val xbar = col("sx").cast("double") / nD
    def mean(s: Column, n: Column): Column = s.cast("double") / n.cast("double")
    val adjA = mean(col("y_a"), col("n_a")) -
      theta * (mean(col("x_a"), col("n_a")) - xbar)
    val adjB = mean(col("y_b"), col("n_b")) -
      theta * (mean(col("x_b"), col("n_b")) - xbar)
    w.crossJoin(broadcast(mom))
      .select(col("n_a"), col("n_b"),
        when(varxN > 0d, floor(theta * 1000000d + 0.5d).cast("long")).as("theta_e6"),
        floor((mean(col("y_b"), col("n_b")) - mean(col("y_a"), col("n_a")))
          * 100d + 0.5d).cast("long").as("diff_raw_e4"),
        when(varxN > 0d, floor((adjB - adjA) * 100d + 0.5d).cast("long")).as("diff_cuped_e4"),
        when(varxN > 0d && varyN > 0d,
          floor(covN * covN / (varxN * varyN) * 1000000d + 0.5d).cast("long"))
          .as("var_reduction_e6"))
  }

  val cupedOracle: String =
    """WITH ev AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
      |                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_e2
      |            FROM events),
      |lo AS (SELECT MIN(day) AS d0 FROM ev),
      |u AS (SELECT user_id,
      |             CAST(SUM(CASE WHEN day < d0 + 15 THEN v_e2 ELSE 0 END) AS BIGINT) AS x,
      |             CAST(SUM(CASE WHEN day >= d0 + 15 THEN v_e2 ELSE 0 END) AS BIGINT) AS y,
      |             user_id % 2 AS arm
      |      FROM ev, lo GROUP BY user_id),
      |mom AS (SELECT COUNT(*) AS n,
      |               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |               SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
      |               SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
      |               SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy
      |        FROM u),
      |arms AS (SELECT
      |           CAST(SUM(CASE WHEN arm = 0 THEN 1 END) AS BIGINT) AS n_a,
      |           CAST(SUM(CASE WHEN arm = 0 THEN x END) AS BIGINT) AS x_a,
      |           CAST(SUM(CASE WHEN arm = 0 THEN y END) AS BIGINT) AS y_a,
      |           CAST(SUM(CASE WHEN arm = 1 THEN 1 END) AS BIGINT) AS n_b,
      |           CAST(SUM(CASE WHEN arm = 1 THEN x END) AS BIGINT) AS x_b,
      |           CAST(SUM(CASE WHEN arm = 1 THEN y END) AS BIGINT) AS y_b
      |         FROM u),
      |st AS (SELECT *,
      |         CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS covn,
      |         CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS varxn,
      |         CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS varyn,
      |         CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar
      |       FROM arms, mom)
      |SELECT n_a, n_b,
      |       CASE WHEN varxn > 0 THEN
      |         CAST(floor(covn / varxn * 1000000 + 0.5) AS BIGINT) END AS theta_e6,
      |       CAST(floor((CAST(y_b AS DOUBLE) / CAST(n_b AS DOUBLE)
      |            - CAST(y_a AS DOUBLE) / CAST(n_a AS DOUBLE)) * 100 + 0.5) AS BIGINT)
      |         AS diff_raw_e4,
      |       CASE WHEN varxn > 0 THEN
      |         CAST(floor(((CAST(y_b AS DOUBLE) / CAST(n_b AS DOUBLE)
      |              - covn / varxn * (CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) - xbar))
      |            - (CAST(y_a AS DOUBLE) / CAST(n_a AS DOUBLE)
      |              - covn / varxn * (CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) - xbar)))
      |            * 100 + 0.5) AS BIGINT) END AS diff_cuped_e4,
      |       CASE WHEN varxn > 0 AND varyn > 0 THEN
      |         CAST(floor(covn * covn / (varxn * varyn) * 1000000 + 0.5) AS BIGINT)
      |       END AS var_reduction_e6
      |FROM st""".stripMargin

  /** x219: the multiple-testing report x195 needs once it runs as a
    * FAMILY — per event type, the two-sample KS statistic of that type's
    * value distribution against the complement, with Benjamini–Hochberg
    * step-up FDR control (q = 0.05) across the m = |types| tests. The
    * emitted statistic is λ = 2·n_e·D² (the asymptotic KS p-value's
    * exponent argument, p = 2e^(−λ)) — a pinned-order double over exact
    * integers with NO libm call on the value path; the BH comparison
    * p_(i) ≤ i·q/m transforms monotonically to λ_(i) ≥ −ln(i·q/(2m)),
    * where the ln is of a literal both engines evaluate once. Step-up
    * means EVERY rank up to the largest passing rank flags significant,
    * including any non-passing ranks below it — the part naive per-test
    * thresholding gets wrong. ECDF gaps are exact cross-multiplied
    * integers on the union value grid (a type's CDF must be evaluated
    * at OTHER types' step points too, hence the grid crossJoin — |v
    * domain|·m rows, value-domain-bounded like every e2 price grain).
    * The per-type cumsum window partitions by type (bounded by the
    * value domain, never the event count).
    */
  def ksBhReport(spark: org.apache.spark.sql.SparkSession, dir: String,
                 q: Double = 0.05): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38: Column => Column = _.cast("decimal(38,0)")
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_type"), floor(col("value") * 100d + 0.5d).cast("long").as("v"))
    val cnt = ev.groupBy("event_type", "v").agg(count(lit(1)).as("c"))
    val grid = cnt.select("v").distinct()
      .crossJoin(cnt.select("event_type").distinct())
      .join(cnt, Seq("event_type", "v"), "left")
      .select(col("event_type"), col("v"), coalesce(col("c"), lit(0L)).as("c"))
    val tot = ev.groupBy("event_type").agg(count(lit(1)).as("n_t"))
      .crossJoin(broadcast(ev.agg(count(lit(1)).as("n_all"),
        countDistinct(col("event_type")).as("m"))))
    // the all-types cumulative lives at the DISTINCT-v grain (the grid
    // has m rows per v, so a row-framed global cumsum over it would be
    // order-ambiguous within equal v) and joins back by v
    val vcum = cnt.groupBy("v").agg(sum(col("c")).as("cv"))
      .withColumn("call",
        sum(col("cv")).over(Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("v", "call")
    val cum = grid.withColumn("ct",
      sum(col("c")).over(Window.partitionBy(col("event_type")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(vcum, "v")
    val gap = cum.join(broadcast(tot), "event_type")
      .select(col("event_type"), col("v"), col("n_t"), col("n_all"), col("m"),
        abs(d38(col("ct")) * (col("n_all") - col("n_t"))
          - d38(col("call") - col("ct")) * col("n_t")).as("g"))
    val best = gap
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("g").desc, col("v"))))
      .filter(col("rk") === 1)
    val nr = (col("n_all") - col("n_t")).cast("double")
    val d = col("g").cast("double") / (col("n_t").cast("double") * nr)
    val ne = col("n_t").cast("double") * nr / col("n_all").cast("double")
    val lam = lit(2.0d) * ne * d * d
    val scored = best.select(col("event_type"), col("n_t"),
      (col("n_all") - col("n_t")).as("n_rest"), col("v").as("argmax_v"), col("m"),
      floor(d * 1000000d + 0.5d).cast("long").as("d_e6"),
      floor(lam * 10000d + 0.5d).cast("long").as("lambda_e4"),
      lam.as("lam"))
    val ranked = scored.withColumn("bh_rank",
      row_number().over(Window.orderBy(col("lam").desc, col("event_type"))).cast("long"))
      .withColumn("pass",
        when(col("lam") >= -log(col("bh_rank").cast("double") * q / 2d
          / col("m").cast("double")), col("bh_rank")))
    ranked
      .withColumn("kstar", max(col("pass")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("event_type"), col("n_t"), col("n_rest"), col("argmax_v"),
        col("d_e6"), col("lambda_e4"), col("bh_rank"),
        (col("bh_rank") <= coalesce(col("kstar"), lit(0L))).as("significant"))
      .orderBy("bh_rank")
  }

  val ksBhOracle: String =
    """WITH ev AS (SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
      |            FROM events),
      |cnt AS (SELECT event_type, v, COUNT(*) AS c FROM ev GROUP BY 1, 2),
      |grid AS (SELECT t.event_type, vv.v, COALESCE(cnt.c, 0) AS c
      |         FROM (SELECT DISTINCT v FROM cnt) vv
      |         CROSS JOIN (SELECT DISTINCT event_type FROM cnt) t
      |         LEFT JOIN cnt ON cnt.event_type = t.event_type AND cnt.v = vv.v),
      |tot AS (SELECT g.event_type, CAST(COUNT(*) AS BIGINT) AS n_t
      |        FROM ev g GROUP BY 1),
      |alln AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
      |                CAST(COUNT(DISTINCT event_type) AS BIGINT) AS m FROM ev),
      |vcum AS (SELECT v, SUM(cv) OVER (ORDER BY v
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS call
      |         FROM (SELECT v, SUM(c) AS cv FROM cnt GROUP BY 1)),
      |cum AS (SELECT g.event_type, g.v,
      |          SUM(g.c) OVER (PARTITION BY g.event_type ORDER BY g.v
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ct,
      |          vc.call
      |        FROM grid g JOIN vcum vc ON vc.v = g.v),
      |gap AS (SELECT c.event_type, c.v, t.n_t, a.n_all, a.m,
      |          abs(CAST(c.ct AS HUGEINT) * (a.n_all - t.n_t)
      |            - CAST(c.call - c.ct AS HUGEINT) * t.n_t) AS g
      |        FROM cum c JOIN tot t ON t.event_type = c.event_type, alln a),
      |best AS (SELECT * FROM (SELECT *,
      |           ROW_NUMBER() OVER (PARTITION BY event_type
      |             ORDER BY g DESC, v) AS rk FROM gap) WHERE rk = 1),
      |sc AS (SELECT event_type, n_t, n_all - n_t AS n_rest, v AS argmax_v, m,
      |         CAST(floor(CAST(g AS DOUBLE)
      |           / (CAST(n_t AS DOUBLE) * CAST(n_all - n_t AS DOUBLE))
      |           * 1000000 + 0.5) AS BIGINT) AS d_e6,
      |         2.0 * (CAST(n_t AS DOUBLE) * CAST(n_all - n_t AS DOUBLE)
      |                / CAST(n_all AS DOUBLE))
      |             * (CAST(g AS DOUBLE) / (CAST(n_t AS DOUBLE) * CAST(n_all - n_t AS DOUBLE)))
      |             * (CAST(g AS DOUBLE) / (CAST(n_t AS DOUBLE) * CAST(n_all - n_t AS DOUBLE)))
      |           AS lam
      |       FROM best),
      |rnk AS (SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY lam DESC, event_type) AS BIGINT) AS bh_rank
      |        FROM sc),
      |ks AS (SELECT MAX(CASE WHEN lam >= -ln(CAST(bh_rank AS DOUBLE) * 0.05 / 2 / CAST(m AS DOUBLE))
      |                       THEN bh_rank END) AS kstar
      |       FROM rnk)
      |SELECT event_type, n_t, CAST(n_rest AS BIGINT) AS n_rest, argmax_v,
      |       d_e6,
      |       CAST(floor(lam * 10000 + 0.5) AS BIGINT) AS lambda_e4,
      |       bh_rank,
      |       bh_rank <= COALESCE(ks.kstar, 0) AS significant
      |FROM rnk, ks ORDER BY bh_rank""".stripMargin

  val ksOracle: String =
    """WITH g AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v,
      |                  SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n1,
      |                  SUM(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) AS n2
      |           FROM lineitem GROUP BY 1),
      |c AS (SELECT v,
      |             SUM(n1) OVER (ORDER BY v
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
      |             SUM(n2) OVER (ORDER BY v
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2
      |      FROM g),
      |t AS (SELECT SUM(n1) AS t1, SUM(n2) AS t2 FROM g),
      |d AS (SELECT v, t1, t2,
      |             abs(CAST(c1 AS HUGEINT) * t2 - CAST(c2 AS HUGEINT) * t1) AS gap
      |      FROM c, t
      |      ORDER BY gap DESC, v LIMIT 1)
      |SELECT CAST(t1 AS BIGINT) AS n_returned, CAST(t2 AS BIGINT) AS n_kept,
      |       v AS argmax_v,
      |       CAST(floor(CAST(gap AS DOUBLE)
      |            / (CAST(t1 AS DOUBLE) * CAST(t2 AS DOUBLE))
      |            * 1000000 + 0.5) AS BIGINT) AS ks_d_e6
      |FROM d""".stripMargin

  /** x226: Wald SPRT sequential monitor — the always-valid companion to
    * [[abTest]]'s fixed-horizon z: an experimenter who peeks daily at a
    * z-score inflates false positives, while the SPRT's likelihood-ratio
    * boundaries (Wald 1945) license stopping at ANY day. Testing the
    * treatment arm's (user, day) conversion against H₀: p = 0.40 vs
    * H₁: p = 0.45 at α = β = 0.05: after day d, with cumulative (N, C),
    *
    *   LLR = C·ln(p₁/p₀) + (N−C)·ln((1−p₁)/(1−p₀));  stop when
    *   LLR ≥ ln((1−β)/α) (accept H₁) or ≤ ln(β/(1−α)) (accept H₀).
    *
    * Exactness: the two per-trial log terms and the two boundaries are
    * CONSTANTS — each quantized ONCE to micro-nats (the only libm calls,
    * on literals both engines evaluate identically) — so every daily LLR
    * is exact BIGINT arithmetic C·L1 + (N−C)·L0 and the crossing decision
    * is an integer comparison; no accumulated float ever decides. Plan
    * shape: (user, day) presence grain → day grain (tiny) → one
    * unbounded-preceding window pass for the cumulative counts and the
    * first-crossing day. The monitor's full daily trajectory is emitted
    * (decision + the sticky stop_day), so the oracle hash-checks the
    * WHOLE sequential path, not just the endpoint.
    */
  def sprtMonitor(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // quantized once: ln(0.45/0.40), ln(0.55/0.60), ln(19), ln(1/19.0)
    val l1 = floor(log(lit(0.45d) / lit(0.40d)) * 1000000d + 0.5d).cast("long")
    val l0 = floor(log(lit(0.55d) / lit(0.60d)) * 1000000d + 0.5d).cast("long")
    val hi = floor(log(lit(19.0d)) * 1000000d + 0.5d).cast("long")
    val lo = floor(log(lit(1.0d) / lit(19.0d)) * 1000000d + 0.5d).cast("long")
    val daily = graft.Tables.events(spark, dir)
      .groupBy(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
      .filter(col("user_id") % 2 === 1)
      .groupBy("day").agg(count(lit(1)).as("n_day"), sum(col("conv")).as("c_day"))
    val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    val cum = daily
      .select(col("day"), col("n_day"), col("c_day"),
        sum(col("n_day")).over(w).as("n_cum"),
        sum(col("c_day")).over(w).as("c_cum"))
      .select(col("day"), col("n_day"), col("c_day"), col("n_cum"), col("c_cum"),
        (col("c_cum") * l1 + (col("n_cum") - col("c_cum")) * l0).as("llr_e6"))
      .select(col("*"),
        when(col("llr_e6") >= hi, lit("accept_h1"))
          .when(col("llr_e6") <= lo, lit("accept_h0"))
          .otherwise(lit("continue")).as("decision"))
    cum.select(col("*"),
        min(when(col("decision") =!= "continue", col("day"))).over(w).as("stop_day"))
      .orderBy("day")
  }

  val sprtOracle: String =
    """WITH u AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
      |                  MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      |           FROM events GROUP BY 1, 2),
      |d AS (SELECT day, COUNT(*) AS n_day, CAST(SUM(conv) AS BIGINT) AS c_day
      |      FROM u WHERE user_id % 2 = 1 GROUP BY 1),
      |k AS (SELECT CAST(floor(ln(0.45 / 0.40) * 1000000 + 0.5) AS BIGINT) AS l1,
      |             CAST(floor(ln(0.55 / 0.60) * 1000000 + 0.5) AS BIGINT) AS l0,
      |             CAST(floor(ln(19.0) * 1000000 + 0.5) AS BIGINT) AS hi,
      |             CAST(floor(ln(1.0 / 19.0) * 1000000 + 0.5) AS BIGINT) AS lo),
      |c AS (SELECT day, n_day, c_day,
      |             CAST(SUM(n_day) OVER (ORDER BY day) AS BIGINT) AS n_cum,
      |             CAST(SUM(c_day) OVER (ORDER BY day) AS BIGINT) AS c_cum
      |      FROM d),
      |s AS (SELECT c.*, c_cum * l1 + (n_cum - c_cum) * l0 AS llr_e6,
      |             CASE WHEN c_cum * l1 + (n_cum - c_cum) * l0 >= hi THEN 'accept_h1'
      |                  WHEN c_cum * l1 + (n_cum - c_cum) * l0 <= lo THEN 'accept_h0'
      |                  ELSE 'continue' END AS decision
      |      FROM c, k)
      |SELECT day, n_day, c_day, n_cum, c_cum, llr_e6, decision,
      |       MIN(CASE WHEN decision <> 'continue' THEN day END)
      |         OVER (ORDER BY day) AS stop_day
      |FROM s ORDER BY day""".stripMargin

  /** x227: stratified ATE (standardization / g-formula with exact
    * propensities) — the observational-causal counterpart to [[abTest]]'s
    * randomized z and a49's DiD: treatment here is NOT randomized (T =
    * "user clicked that day"), and activity confounds it (busier days
    * have more clicks AND more purchases), so the naive treated-minus-
    * control difference is biased. Stratifying on the confounder
    * (events-per-day tier, capped at 5) and weighting each stratum's
    * difference by its population share gives the IPW/standardization
    * estimate — algebraically identical to inverse-propensity weighting
    * when the propensity is the exact in-stratum rate n_t/n. Per-stratum
    * output (the ATE is the exact sum of contrib_e9): propensity and the
    * treated−control difference are single pinned-double expressions per
    * row (no cross-row float sums), e6/e9-quantized; the [[abTest]] guard
    * posture nulls a stratum with an empty arm rather than dividing by
    * zero. One events pass, |strata| rows.
    */
  def stratifiedAte(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val units = graft.Tables.events(spark, dir)
      .groupBy(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n_ev"),
        max(when(col("event_type") === "click", 1L).otherwise(0L)).as("t"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      .select(least(col("n_ev"), lit(5L)).as("stratum"), col("t"), col("y"))
    val g = units.groupBy("stratum").agg(
      count(lit(1)).as("n"),
      sum(col("t")).as("n_t"),
      sum(col("t") * col("y")).as("c_t"),
      sum((lit(1L) - col("t")) * col("y")).as("c_c"))
    val tot = g.agg(sum(col("n")).as("n_all"))
    val d: Column => Column = _.cast("double")
    val diff = d(col("c_t")) / d(col("n_t")) -
      d(col("c_c")) / d(col("n") - col("n_t"))
    g.crossJoin(broadcast(tot))
      .select(col("stratum"), col("n"), col("n_t"), col("c_t"), col("c_c"),
        floor(d(col("n_t")) / d(col("n")) * 1000000d + 0.5d)
          .cast("long").as("propensity_e6"),
        when(col("n_t") > 0L && col("n_t") < col("n"),
          floor(diff * 1000000d + 0.5d).cast("long")).as("diff_e6"),
        when(col("n_t") > 0L && col("n_t") < col("n"),
          floor(d(col("n")) / d(col("n_all")) * diff * 1000000000d + 0.5d)
            .cast("long")).as("contrib_e9"))
      .orderBy("stratum")
  }

  val stratifiedAteOracle: String =
    """WITH u AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
      |                  COUNT(*) AS n_ev,
      |                  MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS t,
      |                  MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
      |           FROM events GROUP BY 1, 2),
      |s AS (SELECT LEAST(n_ev, 5) AS stratum, t, y FROM u),
      |g AS (SELECT stratum, COUNT(*) AS n,
      |             CAST(SUM(t) AS BIGINT) AS n_t,
      |             CAST(SUM(t * y) AS BIGINT) AS c_t,
      |             CAST(SUM((1 - t) * y) AS BIGINT) AS c_c
      |      FROM s GROUP BY 1),
      |w AS (SELECT CAST(SUM(n) AS BIGINT) AS n_all FROM g)
      |SELECT stratum, n, n_t, c_t, c_c,
      |       CAST(floor(CAST(n_t AS DOUBLE) / n * 1000000 + 0.5) AS BIGINT)
      |         AS propensity_e6,
      |       CASE WHEN n_t > 0 AND n_t < n THEN
      |         CAST(floor((CAST(c_t AS DOUBLE) / n_t
      |                     - CAST(c_c AS DOUBLE) / (n - n_t))
      |              * 1000000 + 0.5) AS BIGINT) END AS diff_e6,
      |       CASE WHEN n_t > 0 AND n_t < n THEN
      |         CAST(floor(CAST(n AS DOUBLE) / n_all
      |                    * (CAST(c_t AS DOUBLE) / n_t
      |                       - CAST(c_c AS DOUBLE) / (n - n_t))
      |              * 1000000000 + 0.5) AS BIGINT) END AS contrib_e9
      |FROM g, w ORDER BY stratum""".stripMargin

  /** x237: delete-a-group jackknife SE for a RATIO metric (Quenouille
    * 1956; the production A/B-platform standard for metrics like
    * conversion = Σconv/Σusers where the naive binomial SE is wrong
    * under any clustering): split units into K = 20 content-addressed
    * buckets (user_id % 20 — the x70 no-RNG discipline), recompute the
    * ratio leaving each bucket out, and
    *
    *   SE² = (K−1)/K · Σ_k (R₋ₖ − R̄)².
    *
    * Exactness: every leave-one-out ratio is a single division of exact
    * integer COMPLEMENTS (C−cₖ)/(N−nₖ) — the x221 subtraction trick, no
    * K re-scans — e9-quantized per bucket BEFORE the spread is measured,
    * so Σ and Σ² are exact integer sums (Σ² cross-multiplied in
    * DECIMAL(19,0)², the Neyman discipline ≡ DuckDB HUGEINT) and the
    * K·S2 − S1² sum-of-squares identity is computed EXACTLY before the
    * one sqrt. Fully declarative: fact → K-row bucket grid → 1 row.
    */
  def jackknifeRatio(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val units = graft.Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      .select((col("user_id") % 20L).as("bk"), col("y"))
    val bk = units.groupBy("bk")
      .agg(count(lit(1)).as("n_k"), sum(col("y")).as("c_k"))
    val tot = bk.agg(sum(col("n_k")).as("n"), sum(col("c_k")).as("c"),
      count(lit(1)).as("k"))
    val rk = bk.crossJoin(broadcast(tot))
      .select(floor((col("c") - col("c_k")).cast("double")
        / (col("n") - col("n_k")).cast("double") * 1000000000d + 0.5d)
        .cast("long").as("rk_e9"))
    val s = rk.agg(sum(col("rk_e9")).as("s1"),
      sum(col("rk_e9").cast("decimal(19,0)") * col("rk_e9").cast("decimal(19,0)"))
        .as("s2"))
    val x = (col("k").cast("decimal(19,0)") * col("s2")
      - col("s1").cast("decimal(19,0)") * col("s1").cast("decimal(19,0)"))
    s.crossJoin(broadcast(tot))
      .select(col("k"), col("n").as("n_units"), col("c").as("conversions"),
        floor(col("c").cast("double") / col("n").cast("double")
          * 1000000000d + 0.5d).cast("long").as("ratio_e9"),
        floor(sqrt((col("k") - lit(1L)).cast("double") * x.cast("double"))
          / col("k").cast("double") + 0.5d).cast("long").as("se_jack_e9"))
  }

  val jackknifeOracle: String =
    """WITH u AS (SELECT user_id,
      |                  MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
      |           FROM events GROUP BY 1),
      |bk AS (SELECT user_id % 20 AS bk, COUNT(*) AS n_k,
      |              CAST(SUM(y) AS BIGINT) AS c_k
      |       FROM u GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_k) AS BIGINT) AS n, CAST(SUM(c_k) AS BIGINT) AS c,
      |               COUNT(*) AS k FROM bk),
      |rk AS (SELECT CAST(floor(CAST(c - c_k AS DOUBLE) / CAST(n - n_k AS DOUBLE)
      |                * 1000000000 + 0.5) AS BIGINT) AS rk_e9
      |       FROM bk, tot),
      |s AS (SELECT CAST(SUM(rk_e9) AS BIGINT) AS s1,
      |             SUM(CAST(rk_e9 AS HUGEINT) * rk_e9) AS s2
      |      FROM rk)
      |SELECT k, n AS n_units, c AS conversions,
      |       CAST(floor(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
      |         * 1000000000 + 0.5) AS BIGINT) AS ratio_e9,
      |       CAST(floor(sqrt(CAST(k - 1 AS DOUBLE)
      |           * CAST(k * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE))
      |         / CAST(k AS DOUBLE) + 0.5) AS BIGINT) AS se_jack_e9
      |FROM s, tot""".stripMargin

  /** x245: Cochran–Mantel–Haenszel test (Mantel & Haenszel 1959) — the
    * STRATIFIED 2×2 association test that pairs with [[stratifiedAte]]:
    * x227 ESTIMATES the click→purchase effect adjusting for activity;
    * this TESTS it, combining each activity stratum's hypergeometric
    * surprise so a confounder-driven marginal association (Simpson's
    * setup) can't fake significance:
    *
    *   χ²_CMH = (|Σ aᵢ − Σ Eᵢ| − ½)² / Σ Vᵢ,
    *   Eᵢ = n_tᵢ·cᵢ/nᵢ,  Vᵢ = n_tᵢ·cᵢ·(nᵢ−n_tᵢ)·(nᵢ−cᵢ)/(nᵢ²(nᵢ−1)).
    *
    * The x228 exactness posture: every stratum's E and V are single
    * pinned-double expressions on exact integer 2×2 margins, e6-floored
    * BEFORE the cross-stratum sums (which are then exact BIGINT), and
    * the final statistic is one pinned expression with the abTest
    * V = 0 → null guard. Per-stratum rows are emitted with the combined
    * χ² so the whole table is hash-checked, not just the scalar.
    */
  def cmhTest(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val units = graft.Tables.events(spark, dir)
      .groupBy(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n_ev"),
        max(when(col("event_type") === "click", 1L).otherwise(0L)).as("t"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      .select(least(col("n_ev"), lit(5L)).as("stratum"), col("t"), col("y"))
    val g = units.groupBy("stratum").agg(
      count(lit(1)).as("n"),
      sum(col("t")).as("n_t"),
      sum(col("y")).as("c"),
      sum(col("t") * col("y")).as("a"))
    val d: Column => Column = _.cast("double")
    val e = d(col("n_t")) * d(col("c")) / d(col("n"))
    val v = d(col("n_t")) * d(col("c")) * d(col("n") - col("n_t")) *
      d(col("n") - col("c")) /
      (d(col("n")) * d(col("n")) * d(col("n") - lit(1L)))
    val rows = g.select(col("stratum"), col("n"), col("n_t"), col("c"), col("a"),
      floor(e * 1000000d + 0.5d).cast("long").as("e_e6"),
      when(col("n") > 1L, floor(v * 1000000d + 0.5d).cast("long"))
        .otherwise(lit(0L)).as("v_e6"))
    val tot = rows.agg(sum(col("a")).as("sa"), sum(col("e_e6")).as("se"),
      sum(col("v_e6")).as("sv"))
    val dev = abs(col("sa").cast("double") -
      col("se").cast("double") / lit(1000000.0d)) - lit(0.5d)
    rows.crossJoin(broadcast(tot))
      .select(col("stratum"), col("n"), col("n_t"), col("c"), col("a"),
        col("e_e6"), col("v_e6"),
        when(col("sv") > 0L,
          floor(dev * dev / (col("sv").cast("double") / lit(1000000.0d))
            * 1000000d + 0.5d).cast("long")).as("cmh_chi2_e6"))
      .orderBy("stratum")
  }

  val cmhOracle: String =
    """WITH u AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
      |                  COUNT(*) AS n_ev,
      |                  MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS t,
      |                  MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
      |           FROM events GROUP BY 1, 2),
      |s AS (SELECT LEAST(n_ev, 5) AS stratum, t, y FROM u),
      |g AS (SELECT stratum, COUNT(*) AS n,
      |             CAST(SUM(t) AS BIGINT) AS n_t,
      |             CAST(SUM(y) AS BIGINT) AS c,
      |             CAST(SUM(t * y) AS BIGINT) AS a
      |      FROM s GROUP BY 1),
      |r AS (SELECT stratum, n, n_t, c, a,
      |             CAST(floor(CAST(n_t AS DOUBLE) * CAST(c AS DOUBLE)
      |               / CAST(n AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS e_e6,
      |             CASE WHEN n > 1 THEN
      |               CAST(floor(CAST(n_t AS DOUBLE) * CAST(c AS DOUBLE)
      |                 * CAST(n - n_t AS DOUBLE) * CAST(n - c AS DOUBLE)
      |                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
      |                    * CAST(n - 1 AS DOUBLE))
      |                 * 1000000 + 0.5) AS BIGINT)
      |             ELSE 0 END AS v_e6
      |      FROM g),
      |tot AS (SELECT CAST(SUM(a) AS BIGINT) AS sa,
      |               CAST(SUM(e_e6) AS BIGINT) AS se,
      |               CAST(SUM(v_e6) AS BIGINT) AS sv FROM r)
      |SELECT stratum, CAST(n AS BIGINT) AS n, n_t, c, a, e_e6, v_e6,
      |       CASE WHEN sv > 0 THEN
      |         CAST(floor((abs(CAST(sa AS DOUBLE) - CAST(se AS DOUBLE) / 1000000.0)
      |                     - 0.5)
      |           * (abs(CAST(sa AS DOUBLE) - CAST(se AS DOUBLE) / 1000000.0) - 0.5)
      |           / (CAST(sv AS DOUBLE) / 1000000.0)
      |           * 1000000 + 0.5) AS BIGINT) END AS cmh_chi2_e6
      |FROM r, tot ORDER BY stratum""".stripMargin

  /** x246: Chapman capture–recapture estimate (Chapman 1951's
    * bias-corrected Lincoln–Petersen) — "how many distinct entities
    * exist that we have NOT seen": draw two independent
    * content-addressed samples of the ordering-customer population (the
    * x70 md5 discipline, seeds 3 and 11 — deterministic, layout-free),
    * and estimate the total from the overlap:
    *
    *   N̂ = (n₁+1)(n₂+1)/(m+1) − 1,
    *   V̂(N̂) = (n₁+1)(n₂+1)(n₁−m)(n₂−m)/((m+1)²(m+2)).
    *
    * The data-quality use is auditing coverage: compare N̂ against the
    * (here knowable) true distinct count to see the estimator's error —
    * on a 100 TB store where COUNT(DISTINCT key) across silos is
    * infeasible, two cheap hash-samples and one semi-join ARE feasible.
    * All margins are exact integer counts; N̂ and V̂ are single pinned
    * expressions e3/e0-floored once.
    */
  def chapmanEstimate(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val cust = graft.Tables.orders(spark, dir).select(col("o_custkey")).distinct()
    val s1 = Sampling.bucket10k(col("o_custkey"), 3) < 3000L
    val s2 = Sampling.bucket10k(col("o_custkey"), 11) < 3000L
    val agg = cust.select(
      s1.cast("long").as("in1"), s2.cast("long").as("in2"))
      .agg(sum(col("in1")).as("n1"), sum(col("in2")).as("n2"),
        sum(col("in1") * col("in2")).as("m"), count(lit(1)).as("true_n"))
    val d: Column => Column = _.cast("double")
    val nh = d(col("n1") + lit(1L)) * d(col("n2") + lit(1L)) /
      d(col("m") + lit(1L)) - lit(1.0d)
    val vh = d(col("n1") + lit(1L)) * d(col("n2") + lit(1L)) *
      d(col("n1") - col("m")) * d(col("n2") - col("m")) /
      (d(col("m") + lit(1L)) * d(col("m") + lit(1L)) * d(col("m") + lit(2L)))
    agg.select(col("n1"), col("n2"), col("m"), col("true_n"),
      floor(nh * 1000d + 0.5d).cast("long").as("n_hat_e3"),
      floor(vh + 0.5d).cast("long").as("var_hat"),
      floor(sqrt(vh) * 1000d + 0.5d).cast("long").as("se_e3"))
  }

  val chapmanOracle: String =
    """WITH c AS (SELECT DISTINCT o_custkey FROM orders),
      |f AS (SELECT
      |        CASE WHEN (('0x' || substr(md5(o_custkey || ':3'), 1, 8))::BIGINT
      |                   % 10000) < 3000 THEN 1 ELSE 0 END AS in1,
      |        CASE WHEN (('0x' || substr(md5(o_custkey || ':11'), 1, 8))::BIGINT
      |                   % 10000) < 3000 THEN 1 ELSE 0 END AS in2
      |      FROM c),
      |a AS (SELECT CAST(SUM(in1) AS BIGINT) AS n1, CAST(SUM(in2) AS BIGINT) AS n2,
      |             CAST(SUM(in1 * in2) AS BIGINT) AS m, COUNT(*) AS true_n
      |      FROM f)
      |SELECT n1, n2, m, true_n,
      |       CAST(floor((CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE)
      |         / CAST(m + 1 AS DOUBLE) - 1.0) * 1000 + 0.5) AS BIGINT) AS n_hat_e3,
      |       CAST(floor(CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE)
      |         * CAST(n1 - m AS DOUBLE) * CAST(n2 - m AS DOUBLE)
      |         / (CAST(m + 1 AS DOUBLE) * CAST(m + 1 AS DOUBLE)
      |            * CAST(m + 2 AS DOUBLE)) + 0.5) AS BIGINT) AS var_hat,
      |       CAST(floor(sqrt(CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE)
      |         * CAST(n1 - m AS DOUBLE) * CAST(n2 - m AS DOUBLE)
      |         / (CAST(m + 1 AS DOUBLE) * CAST(m + 1 AS DOUBLE)
      |            * CAST(m + 2 AS DOUBLE))) * 1000 + 0.5) AS BIGINT) AS se_e3
      |FROM a""".stripMargin

  /** x247: deterministic HyperLogLog (Flajolet et al. 2007) — the
    * MIRRORABLE cousin of x112's native `approx_count_distinct` (whose
    * xxhash64 registers no second engine can replay, hence rows-only):
    * build the sketch from scratch on the md5 hash (the x70 cross-engine
    * primitive) so the REGISTERS THEMSELVES are engine-exact and the
    * whole estimator lands on the hash-checked path. m = 256 buckets on
    * the low 8 hash bits; ρ = 1-based position of the first set bit of
    * the remaining 24 (via lpad(bin(w)) + instr — pure string ops both
    * engines own); register M_j = max ρ.
    *
    * The indicator trick that makes it EXACT: every 2^(−M_j) term is a
    * dyadic rational, so Σ 2^(25−M_j) is computed as an exact BIGINT
    * (shifts, no floats) and the harmonic estimate α·m²·2²⁵/denom is ONE
    * pinned double division; the small-range linear-counting branch
    * m·ln(m/V) follows the measured x170 ln discipline. Emitted beside
    * the knowable truth, so the sketch's error is itself gated. One pass
    * over the raw FACT table (no pre-distinct — that is the point), two
    * tiny aggregates after.
    */
  def hllExact(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val h = conv(substring(md5(concat(col("o_custkey").cast("string"),
      lit(":hll"))), 1, 8), 16, 10).cast("long")
    val rows = graft.Tables.orders(spark, dir)
      .select((h % 256L).as("bucket"), (h / 256L).as("w"))
      .select(col("bucket"),
        when(col("w") === 0L, lit(25L))
          .otherwise(instr(lpad(bin(col("w")), 24, "0"), "1").cast("long"))
          .as("rho"))
      .groupBy("bucket").agg(max(col("rho")).as("m_j"))
    val regs = spark.range(256).select(col("id").as("bucket"))
      .join(rows, Seq("bucket"), "left_outer")
      .select(col("bucket"), coalesce(col("m_j"), lit(0L)).as("m_j"))
    val agg = regs.agg(
      sum(expr("CAST(1 AS BIGINT) << CAST(25 - m_j AS INT)")).as("denom_s"),
      sum(when(col("m_j") === 0L, 1L).otherwise(0L)).as("v_zero"))
    val truth = graft.Tables.orders(spark, dir)
      .agg(countDistinct(col("o_custkey")).as("true_n"))
    val alpha = lit(0.7213d) / (lit(1.0d) + lit(1.079d) / lit(256.0d))
    val raw = alpha * lit(65536.0d) * lit(33554432.0d) /
      col("denom_s").cast("double")
    val est = when(raw <= lit(640.0d) && col("v_zero") > 0L,
      lit(256.0d) * log(lit(256.0d) / col("v_zero").cast("double")))
      .otherwise(raw)
    agg.crossJoin(broadcast(truth))
      .select(lit(256L).as("m"), col("v_zero"), col("denom_s"),
        floor(raw * 1000d + 0.5d).cast("long").as("raw_e3"),
        floor(est * 1000d + 0.5d).cast("long").as("est_e3"),
        col("true_n"),
        floor(est / col("true_n").cast("double") * 1000000d + 0.5d)
          .cast("long").as("ratio_e6"))
  }

  val hllOracle: String =
    """WITH h AS (SELECT ('0x' || substr(md5(o_custkey || ':hll'), 1, 8))::BIGINT AS v
      |           FROM orders),
      |r0 AS (SELECT v % 256 AS bucket,
      |              CASE WHEN v // 256 = 0 THEN 25
      |                   ELSE strpos(lpad(bin(v // 256), 24, '0'), '1') END AS rho
      |       FROM h),
      |rg AS (SELECT bucket, MAX(rho) AS m_j FROM r0 GROUP BY 1),
      |regs AS (SELECT g.range AS bucket, COALESCE(rg.m_j, 0) AS m_j
      |         FROM range(256) g LEFT JOIN rg ON rg.bucket = g.range),
      |a AS (SELECT CAST(SUM(CAST(1 AS BIGINT) << CAST(25 - m_j AS INTEGER))
      |               AS BIGINT) AS denom_s,
      |             CAST(SUM(CASE WHEN m_j = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |               AS v_zero
      |      FROM regs),
      |t AS (SELECT COUNT(DISTINCT o_custkey) AS true_n FROM orders),
      |e AS (SELECT denom_s, v_zero, true_n,
      |             (CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
      |                + CAST(1.079 AS DOUBLE) / CAST(256.0 AS DOUBLE)))
      |               * CAST(65536.0 AS DOUBLE) * CAST(33554432.0 AS DOUBLE)
      |               / CAST(denom_s AS DOUBLE) AS raw
      |      FROM a, t),
      |f AS (SELECT *, CASE WHEN raw <= CAST(640.0 AS DOUBLE) AND v_zero > 0
      |                     THEN CAST(256.0 AS DOUBLE)
      |                          * ln(CAST(256.0 AS DOUBLE) / CAST(v_zero AS DOUBLE))
      |                     ELSE raw END AS est
      |      FROM e)
      |SELECT CAST(256 AS BIGINT) AS m, v_zero, denom_s,
      |       CAST(floor(raw * 1000 + 0.5) AS BIGINT) AS raw_e3,
      |       CAST(floor(est * 1000 + 0.5) AS BIGINT) AS est_e3,
      |       CAST(true_n AS BIGINT) AS true_n,
      |       CAST(floor(est / CAST(true_n AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
      |         AS ratio_e6
      |FROM f""".stripMargin

  /** x270: deterministic-HLL MERGEABLE ROLLUP — x112's incremental-
    * maintenance shape (per-(event_type, day) sketch state appended by a
    * daily job, rolled up to per-type distincts with NO re-scan of the
    * event log) rebuilt on [[hllExact]]'s md5 registers so the whole
    * rollup — state, merge, estimate — lands on the hash-checked path.
    * x112's Datasketches blobs stay the production variant (their
    * xxhash64 registers no second engine can replay, hence rows-only);
    * this twin gives the sketch-state family an oracle-checked member.
    *
    * The state is the register TABLE itself: (event_type, day, bucket) →
    * max ρ, at most |types|·|days|·256 rows regardless of fact size.
    * Merge across days is register-wise MAX — associative and
    * commutative, so the merged registers equal the direct single-pass
    * registers bit-for-bit; `merge_exact` compares the merged and direct
    * (denominator, v_zero) pairs to pin that algebra as data, the x112
    * law. Estimation follows x247 exactly: dyadic Σ 2^(25−M_j) as an
    * exact BIGINT, ONE pinned double division for the harmonic estimate,
    * linear-counting branch below 2.5·m. The direct registers and the
    * exact per-type distinct ride along only to expose the estimator's
    * error at test scale; at 100 TB the persisted daily state is the
    * only thing read — that is the operator's point.
    */
  def hllRollup(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val h = conv(substring(md5(concat(col("user_id").cast("string"),
      lit(":hll"))), 1, 8), 16, 10).cast("long")
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_type"),
        floor(unix_micros(col("ts")) / 86400000000L).cast("long").as("day"),
        (h % 256L).as("bucket"),
        when((h / 256L) === 0L, lit(25L))
          .otherwise(instr(lpad(bin(h / 256L), 24, "0"), "1").cast("long"))
          .as("rho"))
    // the persisted per-(type, day) sketch state: register-wise max
    val daily = ev.groupBy("event_type", "day", "bucket")
      .agg(max(col("rho")).as("m_j"))
    // rollup = register-wise max over the daily states (sketch union)
    val merged = daily.groupBy("event_type", "bucket").agg(max(col("m_j")).as("m_j"))
    // direct one-pass registers — test-scale companion for the merge law
    val direct = ev.groupBy("event_type", "bucket").agg(max(col("rho")).as("m_j"))
    val nDays = daily.select("event_type", "day").distinct()
      .groupBy("event_type").agg(count(lit(1)).as("n_days"))
    val types = daily.select("event_type").distinct()
    val grid = spark.range(256).select(col("id").as("bucket"))
      .crossJoin(broadcast(types))
    def denoms(regs: DataFrame, sfx: String): DataFrame =
      grid.join(regs, Seq("event_type", "bucket"), "left_outer")
        .select(col("event_type"), coalesce(col("m_j"), lit(0L)).as("m_j"))
        .groupBy("event_type")
        .agg(sum(expr("CAST(1 AS BIGINT) << CAST(25 - m_j AS INT)"))
          .as(s"denom_$sfx"),
          sum(when(col("m_j") === 0L, 1L).otherwise(0L)).as(s"vzero_$sfx"))
    val exact = graft.Tables.events(spark, dir)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n_exact"))
    val alpha = lit(0.7213d) / (lit(1.0d) + lit(1.079d) / lit(256.0d))
    val raw = alpha * lit(65536.0d) * lit(33554432.0d) /
      col("denom_m").cast("double")
    val est = when(raw <= lit(640.0d) && col("vzero_m") > 0L,
      lit(256.0d) * log(lit(256.0d) / col("vzero_m").cast("double")))
      .otherwise(raw)
    denoms(merged, "m").join(denoms(direct, "d"), "event_type")
      .join(nDays, "event_type").join(exact, "event_type")
      .select(col("event_type"), col("n_days"),
        col("vzero_m").as("v_zero"), col("denom_m").as("denom_s"),
        floor(est * 1000d + 0.5d).cast("long").as("est_e3"),
        col("n_exact"),
        (col("denom_m") === col("denom_d") && col("vzero_m") === col("vzero_d"))
          .cast("long").as("merge_exact"),
        floor(est / col("n_exact").cast("double") * 1000000d + 0.5d)
          .cast("long").as("ratio_e6"))
      .orderBy("event_type")
  }

  val hllRollupOracle: String =
    """WITH ev AS (SELECT event_type,
      |                   CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
      |                   ('0x' || substr(md5(user_id || ':hll'), 1, 8))::BIGINT AS v
      |            FROM events),
      |r0 AS (SELECT event_type, day, v % 256 AS bucket,
      |              CASE WHEN v // 256 = 0 THEN 25
      |                   ELSE strpos(lpad(bin(v // 256), 24, '0'), '1') END AS rho
      |       FROM ev),
      |daily AS (SELECT event_type, day, bucket, MAX(rho) AS m_j
      |          FROM r0 GROUP BY 1, 2, 3),
      |mrg AS (SELECT event_type, bucket, MAX(m_j) AS m_j FROM daily GROUP BY 1, 2),
      |drt AS (SELECT event_type, bucket, MAX(rho) AS m_j FROM r0 GROUP BY 1, 2),
      |nd AS (SELECT event_type, CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days
      |       FROM daily GROUP BY 1),
      |types AS (SELECT DISTINCT event_type FROM daily),
      |grid AS (SELECT t.event_type, g.range AS bucket
      |         FROM range(256) g CROSS JOIN types t),
      |dm AS (SELECT grid.event_type,
      |              CAST(SUM(CAST(1 AS BIGINT)
      |                << CAST(25 - COALESCE(m.m_j, 0) AS INTEGER)) AS BIGINT)
      |                AS denom_m,
      |              CAST(SUM(CASE WHEN COALESCE(m.m_j, 0) = 0 THEN 1 ELSE 0 END)
      |                AS BIGINT) AS vzero_m
      |       FROM grid LEFT JOIN mrg m
      |         ON m.event_type = grid.event_type AND m.bucket = grid.bucket
      |       GROUP BY 1),
      |dd AS (SELECT grid.event_type,
      |              CAST(SUM(CAST(1 AS BIGINT)
      |                << CAST(25 - COALESCE(d.m_j, 0) AS INTEGER)) AS BIGINT)
      |                AS denom_d,
      |              CAST(SUM(CASE WHEN COALESCE(d.m_j, 0) = 0 THEN 1 ELSE 0 END)
      |                AS BIGINT) AS vzero_d
      |       FROM grid LEFT JOIN drt d
      |         ON d.event_type = grid.event_type AND d.bucket = grid.bucket
      |       GROUP BY 1),
      |ex AS (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
      |       FROM events GROUP BY 1),
      |e AS (SELECT dm.event_type, nd.n_days, dm.vzero_m, dm.denom_m,
      |             dd.denom_d, dd.vzero_d, ex.n_exact,
      |             (CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
      |                + CAST(1.079 AS DOUBLE) / CAST(256.0 AS DOUBLE)))
      |               * CAST(65536.0 AS DOUBLE) * CAST(33554432.0 AS DOUBLE)
      |               / CAST(dm.denom_m AS DOUBLE) AS raw
      |      FROM dm
      |      JOIN dd ON dd.event_type = dm.event_type
      |      JOIN nd ON nd.event_type = dm.event_type
      |      JOIN ex ON ex.event_type = dm.event_type),
      |f AS (SELECT *, CASE WHEN raw <= CAST(640.0 AS DOUBLE) AND vzero_m > 0
      |                     THEN CAST(256.0 AS DOUBLE)
      |                          * ln(CAST(256.0 AS DOUBLE) / CAST(vzero_m AS DOUBLE))
      |                     ELSE raw END AS est
      |      FROM e)
      |SELECT event_type, n_days, vzero_m AS v_zero, denom_m AS denom_s,
      |       CAST(floor(est * 1000 + 0.5) AS BIGINT) AS est_e3,
      |       n_exact,
      |       CAST(CASE WHEN denom_m = denom_d AND vzero_m = vzero_d
      |            THEN 1 ELSE 0 END AS BIGINT) AS merge_exact,
      |       CAST(floor(est / CAST(n_exact AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
      |         AS ratio_e6
      |FROM f
      |ORDER BY event_type""".stripMargin

  /** x273: DDSketch quantile rollup (Masson/Lee/Rim, VLDB'19) — the
    * MERGEABLE-QUANTILE member the sketch-state family lacked: HLL
    * ([[hllRollup]]) merges registers by MAX, CMS/Misra–Gries by SUM,
    * KMV by min-set — none answers "p99 latency per type, rolled up
    * daily, no fact re-scan". DDSketch's state is a log-γ bucketed
    * histogram: bucket ⌈ln v/ln γ⌉ guarantees every value in a bucket
    * is within relative error α of every other (γ = (1+α)/(1−α), α = 1%
    * here), counts merge by ADDITION, and the q-quantile is the first
    * bucket whose running count reaches ⌈q·n⌉ — fully deterministic, so
    * unlike t-digest/KLL the whole sketch is hash-checkable.
    *
    * State = (event_type, day, bucket) → (count, min v, max v): three
    * merge algebras riding one row (SUM / MIN / MAX — each associative,
    * so the daily rollup equals the direct sketch; the same x112/x270
    * law). The ln-quotient bucket index is the ONE double op (the
    * measured x170 ln discipline; everything else is exact integers on
    * the e2-quantized value). The guarantee lands as DATA: the exact
    * q-th ORDER STATISTIC (selected as the x243 sort-rank, not an
    * interpolation, via the value-grid cumsum — a ≤|distinct v|-row
    * frame, never a fact sort) is emitted beside the chosen bucket's
    * observed [lo, hi], and `within` pins exact ∈ [lo, hi] — the
    * bucket-capture guarantee DDSketch's α promises. Zero/negative
    * values are outside the log domain and excluded on BOTH sides
    * (the paper's positive-value contract). At 100 TB only the
    * persisted daily state is read; the exact column is the test-scale
    * companion this operator exists to avoid.
    */
  def ddsketchQuantiles(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_type"),
        floor(unix_micros(col("ts")) / 86400000000L).cast("long").as("day"),
        floor(col("value") * 100d + 0.5d).cast("long").as("v_e2"))
      .filter(col("v_e2") >= 1L)
    val bucket = ceil(log(col("v_e2").cast("double")) /
      log(lit(1.01d) / lit(0.99d))).cast("long").as("bucket")
    // the persisted per-(type, day) sketch state — count/min/max per bucket
    val state = ev.select(col("event_type"), col("day"), bucket, col("v_e2"))
      .groupBy("event_type", "day", "bucket")
      .agg(count(lit(1)).as("cnt"), min(col("v_e2")).as("lo_e2"),
        max(col("v_e2")).as("hi_e2"))
    // rollup: SUM counts, MIN lo, MAX hi — three associative merges
    val merged = state.groupBy("event_type", "bucket")
      .agg(sum(col("cnt")).as("cnt"), min(col("lo_e2")).as("lo_e2"),
        max(col("hi_e2")).as("hi_e2"))
    // running count over the bucket grid (≤ ~800 buckets per type —
    // metadata-sized window, the a35 posture)
    val wCum = Window.partitionBy("event_type").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wN = Window.partitionBy("event_type")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = merged.select(col("event_type"), col("bucket"), col("lo_e2"),
      col("hi_e2"), sum(col("cnt")).over(wCum).as("cum"),
      sum(col("cnt")).over(wN).as("n"))
    val qs = spark.range(1).select(
      explode(array(lit(50L), lit(90L), lit(99L))).as("q"))
    // the q-quantile bucket: smallest bucket with cum >= ceil(q*n/100)
    val picked = cum.crossJoin(broadcast(qs))
      .withColumn("k", expr("(n * q + 99) DIV 100"))
      .filter(col("cum") >= col("k"))
      .groupBy("event_type", "q")
      .agg(min_by(struct(col("bucket"), col("lo_e2"), col("hi_e2"),
        col("n"), col("k")), col("bucket")).as("s"))
      .select(col("event_type"), col("q"), col("s.bucket").as("bucket"),
        col("s.lo_e2").as("lo_e2"), col("s.hi_e2").as("hi_e2"),
        col("s.n").as("n"), col("s.k").as("k"))
    // exact q-th order statistic via the value-grid cumsum (x243's
    // sort-rank selection, distributed over the grid, never a fact sort)
    val grid = ev.groupBy("event_type", "v_e2").agg(count(lit(1)).as("c"))
    val wVal = Window.partitionBy("event_type").orderBy("v_e2")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gridCum = grid.select(col("event_type"), col("v_e2"),
      sum(col("c")).over(wVal).as("vcum"))
    val exact = gridCum.crossJoin(broadcast(qs))
      .join(picked.select(col("event_type"), col("q"), col("k")),
        Seq("event_type", "q"))
      .filter(col("vcum") >= col("k"))
      .groupBy("event_type", "q")
      .agg(min(col("v_e2")).as("exact_e2"))
    picked.join(exact, Seq("event_type", "q"))
      .select(col("event_type"), col("q"), col("n"), col("bucket"),
        col("lo_e2"), col("hi_e2"), col("exact_e2"),
        (col("exact_e2") >= col("lo_e2") && col("exact_e2") <= col("hi_e2"))
          .cast("long").as("within"))
      .orderBy("event_type", "q")
  }

  val ddsketchOracle: String =
    """WITH ev AS (SELECT event_type,
      |                   CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
      |                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_e2
      |            FROM events
      |            WHERE CAST(floor(value * 100 + 0.5) AS BIGINT) >= 1),
      |b AS (SELECT event_type, day, v_e2,
      |             CAST(ceil(ln(CAST(v_e2 AS DOUBLE))
      |               / ln(CAST(1.01 AS DOUBLE) / CAST(0.99 AS DOUBLE)))
      |               AS BIGINT) AS bucket
      |      FROM ev),
      |state AS (SELECT event_type, day, bucket, COUNT(*) AS cnt,
      |                 MIN(v_e2) AS lo_e2, MAX(v_e2) AS hi_e2
      |          FROM b GROUP BY 1, 2, 3),
      |mrg AS (SELECT event_type, bucket, CAST(SUM(cnt) AS BIGINT) AS cnt,
      |               MIN(lo_e2) AS lo_e2, MAX(hi_e2) AS hi_e2
      |        FROM state GROUP BY 1, 2),
      |cum AS (SELECT event_type, bucket, lo_e2, hi_e2,
      |               CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket
      |                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |               CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
      |        FROM mrg),
      |qs AS (SELECT unnest([50, 90, 99]) AS q),
      |picked AS (SELECT event_type, q, MIN(bucket) AS bucket
      |           FROM cum CROSS JOIN qs
      |           WHERE cum >= (n * q + 99) // 100
      |           GROUP BY 1, 2),
      |pick2 AS (SELECT p.event_type, p.q, p.bucket, c.lo_e2, c.hi_e2, c.n,
      |                 (c.n * p.q + 99) // 100 AS k
      |          FROM picked p JOIN cum c
      |            ON c.event_type = p.event_type AND c.bucket = p.bucket),
      |grid AS (SELECT event_type, v_e2, COUNT(*) AS c FROM ev GROUP BY 1, 2),
      |gcum AS (SELECT event_type, v_e2,
      |                CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY v_e2
      |                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vcum
      |         FROM grid),
      |ex AS (SELECT g.event_type, p.q, MIN(g.v_e2) AS exact_e2
      |       FROM gcum g JOIN pick2 p ON p.event_type = g.event_type
      |       WHERE g.vcum >= p.k
      |       GROUP BY 1, 2)
      |SELECT p.event_type, CAST(p.q AS BIGINT) AS q, p.n, p.bucket,
      |       p.lo_e2, p.hi_e2, e.exact_e2,
      |       CAST(CASE WHEN e.exact_e2 >= p.lo_e2 AND e.exact_e2 <= p.hi_e2
      |            THEN 1 ELSE 0 END AS BIGINT) AS within
      |FROM pick2 p JOIN ex e ON e.event_type = p.event_type AND e.q = p.q
      |ORDER BY p.event_type, p.q""".stripMargin

  /** x276: quantile DRIFT from the [[ddsketchQuantiles]] daily state —
    * the monitoring query the mergeable rollup exists for: the SAME
    * (type, day, bucket) state rows, sliced at the span-median day (the
    * x260 temporal discipline) and merged per half, give per-type
    * p50/p90/p99 for each period and their shift — NO fact re-scan, two
    * different rollups of one persisted table. A wasserstein-style full
    * distribution distance (x254) answers "did it move"; this answers
    * the operator question "did the p99 move and by how much", per
    * quantile, with DDSketch's α-relative-error bound on each side.
    * The drift is reported on the bucket MIDPOINT COUNTERPART each
    * engine owns exactly: the chosen bucket's observed [lo, hi] and the
    * integer bucket-index delta (each index step ≈ 2α relative shift,
    * so `d_bucket` IS the drift in ~2% units — engine-exact integers,
    * no transcendental at query time).
    *
    * KNOWN SEMANTIC LIMIT (deliberate, oracle-mirrored): the final
    * period-0 × period-1 join is INNER, so an event_type whose events
    * fall entirely within one half of the day span has no counterpart
    * row and is ABSENT from the drift output — "appeared" / "vanished"
    * types are a presence question, not a quantile-shift question, and
    * this operator answers only the latter. A monitor that must flag
    * presence changes pairs this with x260's per-period type counts
    * (one aggregate over the same state); folding nullable counterpart
    * buckets in here via a full outer join would make every downstream
    * consumer null-guard d_bucket for a case a cheaper query already
    * covers.
    */
  def ddsketchDrift(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_type"),
        floor(unix_micros(col("ts")) / 86400000000L).cast("long").as("day"),
        floor(col("value") * 100d + 0.5d).cast("long").as("v_e2"))
      .filter(col("v_e2") >= 1L)
    val med = ev.agg(floor((min(col("day")) + max(col("day"))) / 2L)
      .cast("long").as("mid"))
    val bucket = ceil(log(col("v_e2").cast("double")) /
      log(lit(1.01d) / lit(0.99d))).cast("long").as("bucket")
    // the SAME daily state shape as x273, tagged by period at merge time
    val state = ev.select(col("event_type"), col("day"), bucket, col("v_e2"))
      .groupBy("event_type", "day", "bucket")
      .agg(count(lit(1)).as("cnt"), min(col("v_e2")).as("lo_e2"),
        max(col("v_e2")).as("hi_e2"))
    val merged = state.crossJoin(broadcast(med))
      .withColumn("period", (col("day") > col("mid")).cast("int"))
      .groupBy("event_type", "period", "bucket")
      .agg(sum(col("cnt")).as("cnt"), min(col("lo_e2")).as("lo_e2"),
        max(col("hi_e2")).as("hi_e2"))
    val wCum = Window.partitionBy("event_type", "period").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wN = Window.partitionBy("event_type", "period")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = merged.select(col("event_type"), col("period"), col("bucket"),
      col("lo_e2"), col("hi_e2"), sum(col("cnt")).over(wCum).as("cum"),
      sum(col("cnt")).over(wN).as("n"))
    val qs = spark.range(1).select(
      explode(array(lit(50L), lit(90L), lit(99L))).as("q"))
    val picked = cum.crossJoin(broadcast(qs))
      .filter(col("cum") >= expr("(n * q + 99) DIV 100"))
      .groupBy("event_type", "period", "q")
      .agg(min_by(struct(col("bucket"), col("lo_e2"), col("hi_e2")),
        col("bucket")).as("s"))
      .select(col("event_type"), col("period"), col("q"),
        col("s.bucket").as("bucket"), col("s.lo_e2").as("lo_e2"),
        col("s.hi_e2").as("hi_e2"))
    val a = picked.filter(col("period") === 0)
      .select(col("event_type"), col("q"), col("bucket").as("bucket_a"),
        col("lo_e2").as("lo_a_e2"), col("hi_e2").as("hi_a_e2"))
    val b = picked.filter(col("period") === 1)
      .select(col("event_type"), col("q"), col("bucket").as("bucket_b"),
        col("lo_e2").as("lo_b_e2"), col("hi_e2").as("hi_b_e2"))
    a.join(b, Seq("event_type", "q"))
      .select(col("event_type"), col("q"), col("bucket_a"), col("bucket_b"),
        (col("bucket_b") - col("bucket_a")).as("d_bucket"),
        col("lo_a_e2"), col("hi_a_e2"), col("lo_b_e2"), col("hi_b_e2"))
      .orderBy("event_type", "q")
  }

  val ddsketchDriftOracle: String =
    """WITH ev AS (SELECT event_type,
      |                   CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
      |                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_e2
      |            FROM events
      |            WHERE CAST(floor(value * 100 + 0.5) AS BIGINT) >= 1),
      |md AS (SELECT CAST(floor((MIN(day) + MAX(day)) / 2) AS BIGINT) AS mid FROM ev),
      |b AS (SELECT event_type, day, v_e2,
      |             CAST(ceil(ln(CAST(v_e2 AS DOUBLE))
      |               / ln(CAST(1.01 AS DOUBLE) / CAST(0.99 AS DOUBLE)))
      |               AS BIGINT) AS bucket
      |      FROM ev),
      |state AS (SELECT event_type, day, bucket, COUNT(*) AS cnt,
      |                 MIN(v_e2) AS lo_e2, MAX(v_e2) AS hi_e2
      |          FROM b GROUP BY 1, 2, 3),
      |mrg AS (SELECT event_type,
      |               CAST(CASE WHEN state.day > md.mid THEN 1 ELSE 0 END AS INTEGER)
      |                 AS period,
      |               bucket, CAST(SUM(cnt) AS BIGINT) AS cnt,
      |               MIN(lo_e2) AS lo_e2, MAX(hi_e2) AS hi_e2
      |        FROM state, md GROUP BY 1, 2, 3),
      |cum AS (SELECT event_type, period, bucket, lo_e2, hi_e2,
      |               CAST(SUM(cnt) OVER (PARTITION BY event_type, period
      |                 ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |               CAST(SUM(cnt) OVER (PARTITION BY event_type, period)
      |                 AS BIGINT) AS n
      |        FROM mrg),
      |qs AS (SELECT unnest([50, 90, 99]) AS q),
      |pk AS (SELECT event_type, period, q, MIN(bucket) AS bucket
      |       FROM cum CROSS JOIN qs
      |       WHERE cum >= (n * q + 99) // 100
      |       GROUP BY 1, 2, 3),
      |pick2 AS (SELECT p.event_type, p.period, p.q, p.bucket, c.lo_e2, c.hi_e2
      |          FROM pk p JOIN cum c ON c.event_type = p.event_type
      |            AND c.period = p.period AND c.bucket = p.bucket)
      |SELECT a.event_type, CAST(a.q AS BIGINT) AS q,
      |       a.bucket AS bucket_a, bb.bucket AS bucket_b,
      |       bb.bucket - a.bucket AS d_bucket,
      |       a.lo_e2 AS lo_a_e2, a.hi_e2 AS hi_a_e2,
      |       bb.lo_e2 AS lo_b_e2, bb.hi_e2 AS hi_b_e2
      |FROM pick2 a JOIN pick2 bb
      |  ON bb.event_type = a.event_type AND bb.q = a.q
      |  AND a.period = 0 AND bb.period = 1
      |ORDER BY a.event_type, a.q""".stripMargin

  /** x255: KMV (k-minimum-values) distinct sketch with SET INTERSECTION —
    * the estimator family member HLL ([[hllExact]]) cannot provide: HLL
    * unions losslessly but can only inclusion-exclude intersections
    * (variance explodes when |A∩B| ≪ |A∪B|); a KMV sketch is a uniform
    * sample of the DISTINCT domain, so Jaccard is estimable directly from
    * the k union-minima (Beyer et al., SIGMOD'07). Sets here: customers
    * with a finished ('F') order vs customers with an open ('O') order.
    *
    * Determinism: the same md5-derived 60-bit key on both engines (the
    * x247 discipline), so sketch contents hash-match — the oracle
    * replays the construction, not just the estimate. Estimator: with
    * fewer than k distinct values the sketch IS the set (estimate =
    * exact size); otherwise (k−1)·2⁶⁰/h₍ₖ₎. Intersection = (|{x ∈
    * U_k : x∈K_A ∧ x∈K_B}|/|U_k|) · est(A∪B) — the denominator is the
    * REALIZED union-sketch size min(k, |A∪B|), which keeps the exact
    * path (sketch = set) returning the exact intersection. Truth
    * emitted beside every
    * estimate (the x246 posture). Scale: one fact pass per set to
    * DISTINCT keys, then per-partition top-k + merge (TakeOrdered — no
    * global sort); everything downstream is k-sized.
    */
  def kmvOverlap(spark: org.apache.spark.sql.SparkSession, dir: String,
      k: Int = 256): DataFrame = {
    val orders = graft.Tables.orders(spark, dir)
    def hOf(c: Column): Column =
      conv(substring(md5(concat(c.cast("string"), lit(":kmv"))), 1, 15), 16, 10)
        .cast("long")
    // k-sized sketches are localCheckpoint'd: each feeds three consumers
    // (union, estimator, membership join) and re-deriving would re-run
    // the fact-sized distinct per consumer; checkpoint blocks are
    // GC-reclaimed, so nothing leaks across a long bench session.
    def sketch(status: String): DataFrame =
      orders.filter(col("o_orderstatus") === status)
        .select(hOf(col("o_custkey")).as("h")).distinct()
        .orderBy("h").limit(k).localCheckpoint()
    val ka = sketch("F")
    val kb = sketch("O")
    val ku = ka.union(kb).distinct().orderBy("h").limit(k).localCheckpoint()
    // estimates as one-row frames (no driver math on hash values beyond
    // the k-sized sketch aggregates)
    def estFrame(s: DataFrame, name: String): DataFrame =
      s.agg(count(lit(1)).as("n_s"), max(col("h")).as("hk"))
        .select(
          when(col("n_s") < k, col("n_s").cast("double"))
            .otherwise(lit((k - 1).toDouble)
              * lit(1152921504606846976L).cast("double")
              / col("hk").cast("double")).as(name))
    val estA = estFrame(ka, "est_a")
    val estB = estFrame(kb, "est_b")
    val estU = estFrame(ku, "est_u")
    val rho = ku
      .join(ka.withColumn("ina", lit(1L)), Seq("h"), "left")
      .join(kb.withColumn("inb", lit(1L)), Seq("h"), "left")
      .agg(sum(when(col("ina").isNotNull && col("inb").isNotNull, 1L)
        .otherwise(0L)).as("n_both"), count(lit(1)).as("n_u"))
    val truth = orders
      .groupBy("o_custkey")
      .agg(max(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("fa"),
        max(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("fb"))
      .agg(sum(col("fa")).as("true_a"), sum(col("fb")).as("true_b"),
        sum(col("fa") * col("fb")).as("true_inter"))
    rho.crossJoin(broadcast(estA)).crossJoin(broadcast(estB))
      .crossJoin(broadcast(estU)).crossJoin(broadcast(truth))
      .select(lit(k.toLong).as("k"), col("n_both"), col("n_u"),
        floor(col("est_a") * 1000d + 0.5d).cast("long").as("est_a_e3"),
        floor(col("est_b") * 1000d + 0.5d).cast("long").as("est_b_e3"),
        floor(col("est_u") * 1000d + 0.5d).cast("long").as("est_union_e3"),
        floor(col("n_both").cast("double") / col("n_u").cast("double")
          * 1000000d + 0.5d).cast("long").as("jaccard_e6"),
        floor(col("n_both").cast("double") / col("n_u").cast("double")
          * col("est_u") * 1000d + 0.5d).cast("long").as("est_inter_e3"),
        col("true_a"), col("true_b"), col("true_inter"))
  }

  val kmvOracle: String =
    """WITH ha AS (SELECT DISTINCT ('0x' || substr(md5(o_custkey || ':kmv'), 1, 15))::BIGINT AS h
      |            FROM orders WHERE o_orderstatus = 'F'),
      |hb AS (SELECT DISTINCT ('0x' || substr(md5(o_custkey || ':kmv'), 1, 15))::BIGINT AS h
      |       FROM orders WHERE o_orderstatus = 'O'),
      |ka AS (SELECT h FROM ha ORDER BY h LIMIT 256),
      |kb AS (SELECT h FROM hb ORDER BY h LIMIT 256),
      |ku AS (SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb)
      |       ORDER BY h LIMIT 256),
      |ea AS (SELECT CASE WHEN COUNT(*) < 256 THEN CAST(COUNT(*) AS DOUBLE)
      |                   ELSE CAST(255 AS DOUBLE)
      |                        * CAST(1152921504606846976 AS DOUBLE)
      |                        / CAST(MAX(h) AS DOUBLE) END AS est_a
      |       FROM ka),
      |eb AS (SELECT CASE WHEN COUNT(*) < 256 THEN CAST(COUNT(*) AS DOUBLE)
      |                   ELSE CAST(255 AS DOUBLE)
      |                        * CAST(1152921504606846976 AS DOUBLE)
      |                        / CAST(MAX(h) AS DOUBLE) END AS est_b
      |       FROM kb),
      |eu AS (SELECT CASE WHEN COUNT(*) < 256 THEN CAST(COUNT(*) AS DOUBLE)
      |                   ELSE CAST(255 AS DOUBLE)
      |                        * CAST(1152921504606846976 AS DOUBLE)
      |                        / CAST(MAX(h) AS DOUBLE) END AS est_u
      |       FROM ku),
      |r AS (SELECT CAST(SUM(CASE WHEN ku.h IN (SELECT h FROM ka)
      |                            AND ku.h IN (SELECT h FROM kb)
      |                           THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
      |             CAST(COUNT(*) AS BIGINT) AS n_u
      |      FROM ku),
      |tr AS (SELECT CAST(SUM(fa) AS BIGINT) AS true_a,
      |              CAST(SUM(fb) AS BIGINT) AS true_b,
      |              CAST(SUM(fa * fb) AS BIGINT) AS true_inter
      |       FROM (SELECT o_custkey,
      |                    MAX(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS fa,
      |                    MAX(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS fb
      |             FROM orders GROUP BY 1))
      |SELECT CAST(256 AS BIGINT) AS k, n_both, n_u,
      |       CAST(floor(est_a * 1000 + 0.5) AS BIGINT) AS est_a_e3,
      |       CAST(floor(est_b * 1000 + 0.5) AS BIGINT) AS est_b_e3,
      |       CAST(floor(est_u * 1000 + 0.5) AS BIGINT) AS est_union_e3,
      |       CAST(floor(CAST(n_both AS DOUBLE) / CAST(n_u AS DOUBLE)
      |           * 1000000 + 0.5) AS BIGINT) AS jaccard_e6,
      |       CAST(floor(CAST(n_both AS DOUBLE) / CAST(n_u AS DOUBLE)
      |           * est_u * 1000 + 0.5) AS BIGINT) AS est_inter_e3,
      |       true_a, true_b, true_inter
      |FROM r, ea, eb, eu, tr""".stripMargin

  /** x238: UCB1 bandit replay (Auer et al. 2002) — the adaptive
    * ALLOCATION side of experimentation ([[sprtMonitor]] decides when to
    * STOP; this decides where to SPEND): replay the UCB1 policy over the
    * daily (channel → same-day conversion) cells as a batched bandit —
    * each day the policy plays the channel maximizing mean +
    * √(2·ln T / n), seeded by one round-robin pull per arm, ties to the
    * lowest arm index, and observes ONLY the chosen arm's day (the
    * partial-feedback property that makes it a bandit, not an A/B test).
    *
    * Determinism: all state (per-arm observation and reward counts) is
    * exact integers; the UCB index is one pinned expression per (arm,
    * day) — the x170/x199 data-dependent ln/√ discipline — and the
    * argmax takes the FIRST index attaining the list max, identically in
    * both engines. The day×arm cell table is corpus-reduced in one
    * aggregate (calendar-bounded rows); the replay is driver-side on it
    * (the x229 boundary), and the oracle re-runs the WHOLE trajectory as
    * a recursive CTE over per-day arm lists — every pull, observation,
    * and e9 index hash-checks.
    */
  def ucbReplay(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ud = graft.Tables.events(spark, dir)
      .groupBy(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(max(when(col("event_type") === "click", 1L).otherwise(0L)).as("f1"),
        max(when(col("event_type") === "error", 1L).otherwise(0L)).as("f2"),
        max(when(col("event_type") === "signup", 1L).otherwise(0L)).as("f3"),
        max(when(col("event_type") === "view", 1L).otherwise(0L)).as("f4"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
    val cells = ud.groupBy("day").agg(
        sum(col("f1")).as("n1"), sum(col("f1") * col("y")).as("r1"),
        sum(col("f2")).as("n2"), sum(col("f2") * col("y")).as("r2"),
        sum(col("f3")).as("n3"), sum(col("f3") * col("y")).as("r3"),
        sum(col("f4")).as("n4"), sum(col("f4") * col("y")).as("r4"))
      .collect().map(r => (r.getLong(0),
        Array(r.getLong(1), r.getLong(3), r.getLong(5), r.getLong(7)),
        Array(r.getLong(2), r.getLong(4), r.getLong(6), r.getLong(8))))
      .sortBy(_._1)                              // calendar-bounded driver table
    val arms = Array("click", "error", "signup", "view")
    val n = Array.fill(4)(0L)
    val r = Array.fill(4)(0L)
    val rows = cells.zipWithIndex.map { case ((day, cn, cr), ti) =>
      val choice =
        if (n.contains(0L)) n.indexOf(0L)
        else {
          val t = n.sum
          val u = Array.tabulate(4)(i => r(i).toDouble / n(i).toDouble
            + math.sqrt(2.0 * math.log(t.toDouble) / n(i).toDouble))
          u.indexOf(u.max)
        }
      val ucbE9 =
        if (n.contains(0L)) None
        else {
          val t = n.sum
          Some(math.floor((r(choice).toDouble / n(choice).toDouble
            + math.sqrt(2.0 * math.log(t.toDouble) / n(choice).toDouble))
            * 1e9 + 0.5).toLong)
        }
      n(choice) += cn(choice)
      r(choice) += cr(choice)
      (day, ti + 1L, arms(choice), cn(choice), cr(choice),
        n(choice), r(choice), ucbE9)
    }
    rows.toSeq
      .toDF("day", "t", "arm", "n_day", "r_day", "n_cum", "r_cum", "ucb_e9")
      .orderBy("t")
  }

  val ucbOracle: String =
    """WITH RECURSIVE
      |ud AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
      |         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS f1,
      |         MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS f2,
      |         MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS f3,
      |         MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS f4,
      |         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
      |       FROM events GROUP BY 1, 2),
      |cells AS MATERIALIZED (
      |  SELECT day, row_number() OVER (ORDER BY day) AS t,
      |         [CAST(SUM(f1) AS BIGINT), CAST(SUM(f2) AS BIGINT),
      |          CAST(SUM(f3) AS BIGINT), CAST(SUM(f4) AS BIGINT)] AS cn,
      |         [CAST(SUM(f1 * y) AS BIGINT), CAST(SUM(f2 * y) AS BIGINT),
      |          CAST(SUM(f3 * y) AS BIGINT), CAST(SUM(f4 * y) AS BIGINT)] AS cr
      |  FROM ud GROUP BY day),
      |it AS (
      |  SELECT 0 AS t, CAST(NULL AS BIGINT) AS day,
      |         [CAST(0 AS BIGINT), 0, 0, 0] AS n, [CAST(0 AS BIGINT), 0, 0, 0] AS r,
      |         CAST(NULL AS INTEGER) AS choice,
      |         CAST(NULL AS BIGINT) AS n_day, CAST(NULL AS BIGINT) AS r_day,
      |         CAST(NULL AS BIGINT) AS ucb_e9
      |  UNION ALL
      |  SELECT c.t, c.day,
      |         list_transform(range(1, 5), i ->
      |           n[i] + CASE WHEN i = ch THEN c.cn[i] ELSE 0 END),
      |         list_transform(range(1, 5), i ->
      |           r[i] + CASE WHEN i = ch THEN c.cr[i] ELSE 0 END),
      |         CAST(ch AS INTEGER), c.cn[ch], c.cr[ch],
      |         CASE WHEN list_min(n) > 0 THEN
      |           CAST(floor(u[ch] * 1000000000 + 0.5) AS BIGINT) END
      |  FROM (SELECT it.t AS pt, it.n, it.r,
      |               CASE WHEN list_min(it.n) = 0 THEN list_position(it.n, 0)
      |                    ELSE list_position(u0, list_max(u0)) END AS ch,
      |               u0 AS u
      |        FROM (SELECT *,
      |                list_transform(range(1, 5), i ->
      |                  CASE WHEN n[i] > 0 THEN
      |                    CAST(r[i] AS DOUBLE) / CAST(n[i] AS DOUBLE)
      |                    + sqrt(2.0 * ln(CAST(n[1] + n[2] + n[3] + n[4] AS DOUBLE))
      |                           / CAST(n[i] AS DOUBLE))
      |                  ELSE 0.0 END) AS u0
      |              FROM it) it) s
      |  JOIN cells c ON c.t = s.pt + 1),
      |arms AS (SELECT * FROM (VALUES (1, 'click'), (2, 'error'),
      |                               (3, 'signup'), (4, 'view')) a(i, arm))
      |SELECT it.day, CAST(it.t AS BIGINT) AS t, arms.arm,
      |       it.n_day, it.r_day,
      |       it.n[it.choice] AS n_cum, it.r[it.choice] AS r_cum, it.ucb_e9
      |FROM it JOIN arms ON arms.i = it.choice
      |WHERE it.t >= 1 ORDER BY t""".stripMargin

  /** x264: Mahalanobis-distance outliers over (price, quantity,
    * discount) — the MULTIVARIATE audit x124's per-column z-scores
    * cannot do: a line that is unremarkable on every axis but
    * off-manifold jointly (huge price at deep discount) only shows in
    * the covariance-whitened distance d² = (x−μ)ᵀΣ⁻¹(x−μ). Top-10
    * most-anomalous lines, the triage list a data-quality pipeline
    * feeds to review.
    *
    * Exactness: one fact pass collects the 3-var moment row (Σx_i and
    * all Σx_ix_j DECIMAL(38,0)-widened — exact). The rational mean is
    * cleared the x259 way: with ẑ = n·x − S (exact BIGINT per row) and
    * the n²-scaled scatter C_ij = n·P_ij − S_i·S_j (exact DECIMAL),
    * d² = (n−1)/n · ẑᵀC⁻¹ẑ. The 3×3 inverse is closed-form cofactors —
    * computed ONCE in the broadcast one-row frame as pinned doubles
    * over the exact C entries — and each row's quadratic form is one
    * fixed-order 6-term expression, e6-floored once. Degenerate
    * scatter (det ≤ 0) nulls out, the abTest posture. Scale: one scan,
    * one 1-row broadcast, TakeOrdered(10) — no fact-sized sort.
    */
  def mahalanobisOutliers(spark: org.apache.spark.sql.SparkSession, dir: String,
                          k: Int = 10): DataFrame = {
    val d38: Column => Column = _.cast("decimal(38,0)")
    val d: Column => Column = _.cast("double")
    val li = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("x1"),
        col("l_quantity").cast("long").as("x2"),
        round(col("l_discount") * 100, 0).cast("long").as("x3"))
    val mom = li.agg(count(lit(1)).as("n"),
      sum(col("x1")).as("s1"), sum(col("x2")).as("s2"), sum(col("x3")).as("s3"),
      sum(d38(col("x1")) * d38(col("x1"))).as("p11"),
      sum(d38(col("x2")) * d38(col("x2"))).as("p22"),
      sum(d38(col("x3")) * d38(col("x3"))).as("p33"),
      sum(d38(col("x1")) * d38(col("x2"))).as("p12"),
      sum(d38(col("x1")) * d38(col("x3"))).as("p13"),
      sum(d38(col("x2")) * d38(col("x3"))).as("p23"))
    def cC(p: String, a: String, b: String): Column =
      (d38(col("n")) * col(p) - d38(col(a)) * d38(col(b))).cast("double")
    val inv = mom.select(col("n"), col("s1"), col("s2"), col("s3"),
        cC("p11", "s1", "s1").as("c11"), cC("p22", "s2", "s2").as("c22"),
        cC("p33", "s3", "s3").as("c33"), cC("p12", "s1", "s2").as("c12"),
        cC("p13", "s1", "s3").as("c13"), cC("p23", "s2", "s3").as("c23"))
      .select(col("n"), col("s1"), col("s2"), col("s3"),
        (col("c11") * (col("c22") * col("c33") - col("c23") * col("c23"))
          - col("c12") * (col("c12") * col("c33") - col("c13") * col("c23"))
          + col("c13") * (col("c12") * col("c23") - col("c13") * col("c22")))
          .as("det"),
        (col("c22") * col("c33") - col("c23") * col("c23")).as("i11"),
        (col("c11") * col("c33") - col("c13") * col("c13")).as("i22"),
        (col("c11") * col("c22") - col("c12") * col("c12")).as("i33"),
        (col("c13") * col("c23") - col("c12") * col("c33")).as("i12"),
        (col("c12") * col("c23") - col("c13") * col("c22")).as("i13"),
        (col("c12") * col("c13") - col("c11") * col("c23")).as("i23"))
    def z(i: Int): Column = d(col("n") * col(s"x$i") - col(s"s$i"))
    val quad = (z(1) * z(1) * col("i11") + z(2) * z(2) * col("i22")
      + z(3) * z(3) * col("i33") + lit(2.0d) * z(1) * z(2) * col("i12")
      + lit(2.0d) * z(1) * z(3) * col("i13")
      + lit(2.0d) * z(2) * z(3) * col("i23"))
    li.crossJoin(broadcast(inv))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("x1").as("price_e2"), col("x2").as("qty"), col("x3").as("disc_e2"),
        when(col("det") > 0d,
          floor(d(col("n") - 1L) / d(col("n")) * quad / col("det")
            * 1000000d + 0.5d).cast("long")).as("d2_e6"))
      .orderBy(col("d2_e6").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(k)
  }

  val mahalanobisOracle: String =
    """WITH li AS (SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |                   CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS x1,
      |                   CAST(l_quantity AS BIGINT) AS x2,
      |                   CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS x3
      |            FROM lineitem),
      |mom AS (SELECT COUNT(*) AS n,
      |               CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
      |               CAST(SUM(x3) AS BIGINT) AS s3,
      |               SUM(CAST(x1 AS HUGEINT) * x1) AS p11,
      |               SUM(CAST(x2 AS HUGEINT) * x2) AS p22,
      |               SUM(CAST(x3 AS HUGEINT) * x3) AS p33,
      |               SUM(CAST(x1 AS HUGEINT) * x2) AS p12,
      |               SUM(CAST(x1 AS HUGEINT) * x3) AS p13,
      |               SUM(CAST(x2 AS HUGEINT) * x3) AS p23
      |        FROM li),
      |cm AS (SELECT n, s1, s2, s3,
      |              CAST(n * p11 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE) AS c11,
      |              CAST(n * p22 - CAST(s2 AS HUGEINT) * s2 AS DOUBLE) AS c22,
      |              CAST(n * p33 - CAST(s3 AS HUGEINT) * s3 AS DOUBLE) AS c33,
      |              CAST(n * p12 - CAST(s1 AS HUGEINT) * s2 AS DOUBLE) AS c12,
      |              CAST(n * p13 - CAST(s1 AS HUGEINT) * s3 AS DOUBLE) AS c13,
      |              CAST(n * p23 - CAST(s2 AS HUGEINT) * s3 AS DOUBLE) AS c23
      |       FROM mom),
      |inv AS (SELECT n, s1, s2, s3,
      |               c11 * (c22 * c33 - c23 * c23)
      |                 - c12 * (c12 * c33 - c13 * c23)
      |                 + c13 * (c12 * c23 - c13 * c22) AS det,
      |               c22 * c33 - c23 * c23 AS i11,
      |               c11 * c33 - c13 * c13 AS i22,
      |               c11 * c22 - c12 * c12 AS i33,
      |               c13 * c23 - c12 * c33 AS i12,
      |               c12 * c23 - c13 * c22 AS i13,
      |               c12 * c13 - c11 * c23 AS i23
      |        FROM cm),
      |s AS (SELECT li.l_orderkey, li.l_linenumber,
      |             li.x1 AS price_e2, li.x2 AS qty, li.x3 AS disc_e2,
      |             CASE WHEN inv.det > 0 THEN CAST(floor(
      |               CAST(inv.n - 1 AS DOUBLE) / CAST(inv.n AS DOUBLE)
      |               * (CAST(inv.n * li.x1 - inv.s1 AS DOUBLE) * CAST(inv.n * li.x1 - inv.s1 AS DOUBLE) * inv.i11
      |                  + CAST(inv.n * li.x2 - inv.s2 AS DOUBLE) * CAST(inv.n * li.x2 - inv.s2 AS DOUBLE) * inv.i22
      |                  + CAST(inv.n * li.x3 - inv.s3 AS DOUBLE) * CAST(inv.n * li.x3 - inv.s3 AS DOUBLE) * inv.i33
      |                  + 2.0 * CAST(inv.n * li.x1 - inv.s1 AS DOUBLE) * CAST(inv.n * li.x2 - inv.s2 AS DOUBLE) * inv.i12
      |                  + 2.0 * CAST(inv.n * li.x1 - inv.s1 AS DOUBLE) * CAST(inv.n * li.x3 - inv.s3 AS DOUBLE) * inv.i13
      |                  + 2.0 * CAST(inv.n * li.x2 - inv.s2 AS DOUBLE) * CAST(inv.n * li.x3 - inv.s3 AS DOUBLE) * inv.i23)
      |               / inv.det * 1000000 + 0.5) AS BIGINT) END AS d2_e6
      |      FROM li, inv)
      |SELECT * FROM s ORDER BY d2_e6 DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin
}
