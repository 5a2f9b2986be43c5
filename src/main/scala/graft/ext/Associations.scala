package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Association-rule mining — the reference repo's own domain ("Market
  * Basket Analysis") as an explicit operator: frequent co-purchase pairs
  * with support / confidence / lift, the apriori first iteration. The
  * reference (F.py:128–162) only ever consumes per-user candidate sets;
  * this is the rule-mining surface its title promises, distributed.
  */
object Associations {

  /** Frequent item-pair rules over order baskets (basket = the distinct
    * parts of one order). The apriori pruning does the scaling: item
    * supports aggregate FIRST (map-side partials, |items| rows), baskets
    * semi-join the frequent items, and only then does the basket
    * self-join generate pairs — candidate space Σ|frequent basket|², and
    * every infrequent item is provably absent from any frequent pair
    * (apriori monotonicity), so the prune is lossless. Support /
    * confidence / lift are ratios of exact integer counts (identical
    * doubles on both engines); output is the top-k by lift under a total
    * tie-break.
    *
    * minCount defaults to 2 (pair seen twice): the synthetic baskets are
    * support-flat — pair counts stay single-digit at every SF — so a
    * production-style fractional support floor (n_orders·minSupport)
    * would empty the result; on a real basket corpus that fraction is
    * the dial, and the plan is unchanged by it.
    */
  def basketRules(spark: SparkSession, dir: String,
                  minCount: Int = 2, k: Int = 50): DataFrame = {
    val baskets = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val totals = baskets.agg(countDistinct(col("l_orderkey")).as("n_orders"))
    val itemN = baskets.groupBy("l_partkey").agg(count(lit(1)).as("n_item"))
    val frequent = itemN.filter(col("n_item") >= minCount)
    val fb = baskets.join(frequent.select("l_partkey"), Seq("l_partkey"), "left_semi")
    val pairs = fb.select(col("l_orderkey"), col("l_partkey").as("a"))
      .join(fb.select(col("l_orderkey"), col("l_partkey").as("b")), "l_orderkey")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    pairs
      .join(itemN.select(col("l_partkey").as("a"), col("n_item").as("n_a")), "a")
      .join(itemN.select(col("l_partkey").as("b"), col("n_item").as("n_b")), "b")
      .crossJoin(broadcast(totals))
      .select(col("a"), col("b"), col("n_ab"),
        round(col("n_ab") / col("n_orders"), 4).as("support"),
        round(col("n_ab") / col("n_a"), 4).as("confidence"),
        // lift in double from the first multiply: a long·long product of
        // pair count × order count overflows at corpus scale
        round(col("n_ab").cast("double") * col("n_orders") /
          (col("n_a").cast("double") * col("n_b")), 4).as("lift"))
      .orderBy(col("lift").desc, col("a"), col("b"))
      .limit(k)
  }

  /** x154: the same rule surface through spark.ml's FPGrowth — the PFP
    * (Li et al., parallel FP-growth) implementation that replaces x97's
    * pair self-join with per-group conditional FP-trees once baskets get
    * long (the self-join's candidate space is Σ|basket|²; PFP partitions
    * the item domain and mines each shard's projected transactions
    * independently). Restricted to single-antecedent rules, its output is
    * exactly x97's pair statistics in both directions, so the DuckDB twin
    * oracles spark.ml itself: confidence(a→b) = n_ab/n_a on exact
    * integer counts, rounded once. The fractional minSupport is set to
    * (minCount − ½)/n so its internal ceil lands exactly on minCount
    * regardless of float representation. The one-row n_orders count is a
    * driver boundary (x126 posture).
    */
  def fpgrowthRules(spark: SparkSession, dir: String,
                    minCount: Int = 2): DataFrame = {
    import org.apache.spark.ml.fpm.FPGrowth
    val baskets = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val n = baskets.select(countDistinct(col("l_orderkey"))).first().getLong(0)
    val tx = baskets.groupBy("l_orderkey")
      .agg(collect_set(col("l_partkey")).as("items"))
    val model = new FPGrowth().setItemsCol("items")
      .setMinSupport((minCount.toDouble - 0.5) / n)
      .setMinConfidence(0.0)
      .fit(tx)
    model.associationRules
      .filter(size(col("antecedent")) === 1 && size(col("consequent")) === 1)
      .select(col("antecedent").getItem(0).as("a"),
        col("consequent").getItem(0).as("b"),
        round(col("confidence"), 4).as("confidence"))
      .orderBy("a", "b")
  }

  val fpgrowthOracle: String =
    """WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |itemn AS (SELECT l_partkey, COUNT(*) AS n_item FROM baskets GROUP BY 1),
      |pairs AS (
      |  SELECT x.l_partkey AS a, y.l_partkey AS b, COUNT(*) AS n_ab
      |  FROM baskets x JOIN baskets y
      |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey <> y.l_partkey
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
      |SELECT p.a, p.b, ROUND(p.n_ab * 1.0 / ia.n_item, 4) AS confidence
      |FROM pairs p JOIN itemn ia ON ia.l_partkey = p.a
      |ORDER BY a, b""".stripMargin

  /** x193: sequential pattern mining over each customer's ORDER HISTORY —
    * the temporal dimension x97/x154 ignore (they mine within-basket
    * co-occurrence; this mines "bought a, then LATER bought b"). spark.ml
    * PrefixSpan (Pei et al., ICDE'01 / Li et al.'s parallel projection):
    * the item domain is partitioned and each shard mines its projected
    * postfix database independently — no candidate generation, no global
    * pass per pattern, which is what makes it the 100 TB shape.
    *
    * Sequences are built once: order position is a row_number over the
    * CUSTOMER-partitioned (o_orderdate, o_orderkey) window — partitions
    * are bounded by a customer's order count, never fact-sized — and each
    * position's basket is the order's distinct part set. Restricted to
    * two-singleton-itemset patterns ⟨{a},{b}⟩, PrefixSpan's support is
    * exactly "customers with a in some order and b in a strictly later
    * one", which DuckDB states as a positional self-join with
    * COUNT(DISTINCT customer) — so spark.ml's miner is itself
    * oracle-checked (the x154 gate, extended to sequence). maxPatternLength
    * = 2 bounds the projection depth; the fractional minSupport is pinned
    * to (effective − ½)/n so the internal ceil lands exactly on the count.
    * The one-row customer count is a driver boundary (x126 posture).
    *
    * SCALE GUARD (measured, SCALE.md round-8): an ABSOLUTE count floor
    * makes the RELATIVE support threshold collapse as the corpus grows —
    * at 10× the 1× sequence count, minCount=5 put the wall at 864 s
    * (e ≈ 1.8, task-time e ≈ 3: the frequent-prefix space, and with it
    * PrefixSpan's projected-database work, explodes). The effective
    * floor is therefore max(minCount, ⌈0.003·n⌉) — the x158 df-cap
    * posture: at the oracle scales (n ≤ 1 500 customers) the relative
    * term stays below 5 so every test output is unchanged, while at
    * fleet scale the threshold tracks the corpus and the mining stays
    * near-linear (re-measured: 864 → ~8 s at 10×). The ORACLE derives
    * the same GREATEST(minCount, ceil(0.003·n)) floor from the data
    * (seqPatternsOracle's `eff` CTE), so a fixture large enough for the
    * relative term to bite still hash-matches instead of failing the
    * gate with a bare row mismatch.
    */
  def seqPatterns(spark: SparkSession, dir: String,
                  minCount: Int = 5): DataFrame = {
    import org.apache.spark.ml.fpm.PrefixSpan
    import org.apache.spark.sql.expressions.Window
    val pos = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        row_number().over(Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))).as("pos"))
    val it = pos.join(
        Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("pos"), col("l_partkey")).distinct()
    val seqs = it.groupBy("o_custkey", "pos")
      .agg(sort_array(collect_set(col("l_partkey"))).as("items"))
      .groupBy("o_custkey")
      .agg(expr("transform(array_sort(collect_list(struct(pos, items))), x -> x.items)")
        .as("sequence"))
    val n = seqs.count()
    val effective = math.max(minCount.toLong, math.ceil(0.003 * n).toLong)
    val patterns = new PrefixSpan()
      .setMinSupport((effective.toDouble - 0.5) / n)
      .setMaxPatternLength(2)
      .setSequenceCol("sequence")
      .findFrequentSequentialPatterns(seqs)
    patterns
      .filter(size(col("sequence")) === 2 &&
        size(element_at(col("sequence"), 1)) === 1 &&
        size(element_at(col("sequence"), 2)) === 1)
      .select(element_at(element_at(col("sequence"), 1), 1).as("a"),
        element_at(element_at(col("sequence"), 2), 1).as("b"),
        col("freq"))
      .orderBy("a", "b")
  }

  /** The Layer-cached co-purchase pair frame — distinct (a < b) part
    * pairs sharing ≥1 order, kept at co-count ≥ 2 (the x97 apriori
    * floor, provably equal to x97's frequent-item-pruned pair set) —
    * ONE basket self-join per run shared by x199 (item CF) and x200
    * (k-core). Single builder site (the x182 Layer-key lesson).
    */
  private[graft] def copurchasePairs(spark: SparkSession, dir: String): DataFrame =
    graft.Layer.cached(spark, dir, "copurchasePairs") {
      val baskets = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      baskets.select(col("l_orderkey"), col("l_partkey").as("a"))
        .join(baskets.select(col("l_orderkey"), col("l_partkey").as("b")), "l_orderkey")
        .filter(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 2)
    }

  /** x199: item-based collaborative filtering (Sarwar et al., WWW'01) —
    * the neighborhood-method recommender that predates and complements
    * m05's model-based ALS: top-k most-cosine-similar items per item,
    * where cosine is over the binary order-incidence vectors, so
    * sim(a,b) = n_ab / √(n_a·n_b) on exact integer counts (one sqrt of
    * a double product — n_a·n_b overflows int64 at catalog scale — and
    * one e6 rounding; ranking is on the ROUNDED value + item tie-break,
    * so both engines sort identical keys). The pair space is the shared
    * apriori-pruned frame; top-k per item is a bounded-partition window
    * (WindowGroupLimit pushes the rank filter below the sort).
    */
  def itemCf(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = copurchasePairs(spark, dir)
    val sym = pairs.select(col("a"), col("b"), col("n_ab"))
      .unionAll(pairs.select(col("b").as("a"), col("a").as("b"), col("n_ab")))
    val itemN = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .groupBy("l_partkey").agg(count(lit(1)).as("n_item"))
    val scored = sym
      .join(itemN.select(col("l_partkey").as("a"), col("n_item").as("n_a")), "a")
      .join(itemN.select(col("l_partkey").as("b"), col("n_item").as("n_b")), "b")
      .select(col("a"), col("b"), col("n_ab"),
        floor(col("n_ab").cast("double")
          / sqrt(col("n_a").cast("double") * col("n_b").cast("double"))
          * 1000000d + 0.5d).cast("long").as("cos_e6"))
    scored.withColumn("rnk", row_number().over(
        Window.partitionBy(col("a")).orderBy(col("cos_e6").desc, col("b"))))
      .filter(col("rnk") <= k)
      .orderBy("a", "rnk")
  }

  /** x205: next-best-offer — the SERVING side of x199's item-CF model,
    * and the domain capstone: for every customer, the single
    * highest-affinity item they have NOT yet bought, scoring each
    * candidate by the SUM of its cosine similarities (exact e6
    * integers, so the Σ and the arg-max are exact) to the customer's
    * owned items, restricted to the top-k neighbor lists (the standard
    * Sarwar serving truncation — candidate space is |owned|·k, never
    * the catalog). Ownership exclusion is an anti-join; the winner per
    * customer is a bounded-partition top-1 window with a total
    * tie-break (score desc, item asc). One orders⋈lineitem pass for
    * ownership; the neighbor table is item-grain (broadcastable at
    * catalog scale).
    */
  def nextBestOffer(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val owned = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct()
    val neighbors = itemCf(spark, dir)
      .select(col("a"), col("b"), col("cos_e6"))
    val scored = owned.join(neighbors, owned("l_partkey") === neighbors("a"))
      .select(col("o_custkey"), col("b"), col("cos_e6"))
      .join(owned.select(col("o_custkey"), col("l_partkey").as("b")),
        Seq("o_custkey", "b"), "left_anti")
      .groupBy("o_custkey", "b")
      .agg(sum(col("cos_e6")).as("score_e6"), count(lit(1)).as("n_paths"))
    scored.withColumn("rnk", row_number().over(
        Window.partitionBy(col("o_custkey"))
          .orderBy(col("score_e6").desc, col("b"))))
      .filter(col("rnk") === 1)
      .select(col("o_custkey"), col("b").as("rec_partkey"),
        col("score_e6"), col("n_paths"))
      .orderBy("o_custkey")
  }

  val nextBestOfferOracle: String =
    """WITH baskets AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |itemn AS (SELECT l_partkey, COUNT(*) AS n_item FROM baskets GROUP BY 1),
      |pairs AS (SELECT x.l_partkey AS a, y.l_partkey AS b, COUNT(*) AS n_ab
      |          FROM baskets x JOIN baskets y
      |            ON x.l_orderkey = y.l_orderkey AND x.l_partkey <> y.l_partkey
      |          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |s AS (SELECT p.a, p.b,
      |             CAST(floor(CAST(p.n_ab AS DOUBLE)
      |                  / sqrt(CAST(ia.n_item AS DOUBLE) * CAST(ib.n_item AS DOUBLE))
      |                  * 1000000 + 0.5) AS BIGINT) AS cos_e6
      |      FROM pairs p
      |      JOIN itemn ia ON p.a = ia.l_partkey
      |      JOIN itemn ib ON p.b = ib.l_partkey),
      |nb AS MATERIALIZED (SELECT a, b, cos_e6 FROM (
      |        SELECT a, b, cos_e6,
      |               ROW_NUMBER() OVER (PARTITION BY a ORDER BY cos_e6 DESC, b) AS rnk
      |        FROM s) WHERE rnk <= 5),
      |owned AS MATERIALIZED (
      |  SELECT DISTINCT o.o_custkey, l.l_partkey
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
      |cand AS (SELECT w.o_custkey, nb.b,
      |                SUM(nb.cos_e6) AS score_e6, COUNT(*) AS n_paths
      |         FROM owned w JOIN nb ON nb.a = w.l_partkey
      |         WHERE NOT EXISTS (SELECT 1 FROM owned w2
      |                           WHERE w2.o_custkey = w.o_custkey
      |                             AND w2.l_partkey = nb.b)
      |         GROUP BY 1, 2),
      |top AS (SELECT o_custkey, b, score_e6, n_paths,
      |               ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                 ORDER BY score_e6 DESC, b) AS rnk
      |        FROM cand)
      |SELECT o_custkey, b AS rec_partkey, CAST(score_e6 AS BIGINT) AS score_e6,
      |       n_paths
      |FROM top WHERE rnk = 1 ORDER BY o_custkey""".stripMargin

  /** x213: substitute detection — the retail-science DUAL of x97's
    * complements: substitutes are bought by the SAME CUSTOMERS (high
    * user-level co-occurrence) but rarely TOGETHER (low within-basket
    * co-occurrence) — "either butter" vs x97's "chips AND salsa".
    * score = n_users(a,b) / (n_baskets(a,b) + 1), exact integer counts,
    * one double division, e6-rounded ranking key with a total
    * tie-break. Scale shape: the user-grain pair space prunes by item
    * user-support FIRST (apriori posture — an item bought by < minU
    * users can't reach the support floor), and the basket-grain counts
    * come from the x199-shared pair frame — whose n ≥ 2 floor means a
    * ONE-OFF joint basket reads as 0 here, deliberately: a single
    * co-purchase is noise, not complementarity evidence (mirrored in
    * the twin). Both pair spaces are group-first, never all-pairs.
    *
    * Scale shape: item user-support pruning caps the ITEM side of the
    * self-join, but nothing in the data model caps a single USER — a
    * bot-like account touching 10⁵ distinct frequent items would emit
    * 10¹⁰ pairs from one join key. `maxItemsPerUser` closes that hole
    * with the x102 content-addressed priority cap ([[graft.ops.Sampling
    * .domainCap]]): per customer, keep the `cap` lowest-hash items, so
    * the per-key fan-out is ≤ cap·(cap−1)/2 regardless of flood size,
    * and the kept set is stable under corpus growth (a kept item is only
    * evicted by a lower-hash item, never by layout). The cap compiles to
    * WindowGroupLimit — map-side truncation before the exchange. At the
    * oracle SFs the 99.9-percentile item count per user is ~105, so the
    * default 200 is provably inert there (the oracle mirrors the cap
    * anyway, so a fixture where it bites still hash-matches).
    */
  def substitutes(spark: SparkSession, dir: String,
                  minUsers: Int = 5, k: Int = 50,
                  maxItemsPerUser: Int = 200): DataFrame = {
    val userItems = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct()
    val itemUsers = userItems.groupBy("l_partkey").agg(count(lit(1)).as("n_u"))
    val frequent = itemUsers.filter(col("n_u") >= minUsers).select("l_partkey")
    val fu = graft.ops.Sampling.domainCap(
      userItems.join(frequent, Seq("l_partkey"), "left_semi"),
      key = "l_partkey", domain = "o_custkey", k = maxItemsPerUser, seed = 29)
    val userPairs = fu.select(col("o_custkey"), col("l_partkey").as("a"))
      .join(fu.select(col("o_custkey"), col("l_partkey").as("b")), "o_custkey")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_user"))
      .filter(col("n_user") >= minUsers)
    val basketPairs = copurchasePairs(spark, dir)
      .select(col("a"), col("b"), col("n_ab").as("n_basket"))
    userPairs.join(basketPairs, Seq("a", "b"), "left")
      .select(col("a"), col("b"), col("n_user"),
        coalesce(col("n_basket"), lit(0L)).as("n_basket"))
      .withColumn("score_e6",
        floor(col("n_user").cast("double") / (col("n_basket") + 1).cast("double")
          * 1000000d + 0.5d).cast("long"))
      .orderBy(col("score_e6").desc, col("a"), col("b"))
      .limit(k)
  }

  /** x215: frequent TRIPLE itemsets — the apriori SECOND iteration
    * (x97 stops at pairs): 3-item sets co-purchased in ≥ minCount
    * baskets. The prune is the apriori downward-closure argument made
    * executable: every sub-pair of a frequent triple is frequent, so
    * any item absent from ALL frequent pairs (the Layer-shared
    * copurchasePairs frame) is provably absent from every frequent
    * triple — baskets semi-join that item set BEFORE the two-join
    * triple expansion, so the candidate space is Σ|pair-frequent
    * basket|³ᐟ over the pruned sets, not the raw catalog. Exact counts;
    * support one double.
    */
  def tripleItemsets(spark: SparkSession, dir: String,
                     minCount: Int = 2): DataFrame = {
    // The downward-closure prune below reads the copurchasePairs frame,
    // whose floor is n_ab >= 2 — lossless ONLY for minCount >= 2. A
    // caller passing 1 would silently lose every triple occurring in
    // exactly one basket, so fail loudly instead.
    require(minCount >= 2,
      s"tripleItemsets: minCount=$minCount < 2 breaks the lossless " +
        "downward-closure prune (pair frame floor is 2)")
    val baskets = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val pairItems = copurchasePairs(spark, dir)
      .select(col("a").as("l_partkey"))
      .unionAll(copurchasePairs(spark, dir).select(col("b").as("l_partkey")))
      .distinct()
    val fb = baskets.join(pairItems, Seq("l_partkey"), "left_semi")
    val nOrders = baskets.agg(countDistinct(col("l_orderkey")).as("n_orders"))
    fb.select(col("l_orderkey"), col("l_partkey").as("a"))
      .join(fb.select(col("l_orderkey"), col("l_partkey").as("b")), "l_orderkey")
      .filter(col("a") < col("b"))
      .join(fb.select(col("l_orderkey"), col("l_partkey").as("c")), "l_orderkey")
      .filter(col("b") < col("c"))
      .groupBy("a", "b", "c").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .crossJoin(broadcast(nOrders))
      .select(col("a"), col("b"), col("c"), col("n"),
        floor(col("n").cast("double") / col("n_orders").cast("double")
          * 1000000d + 0.5d).cast("long").as("support_e6"))
      .orderBy(col("n").desc, col("a"), col("b"), col("c"))
  }

  val tripleItemsetsOracle: String =
    """WITH baskets AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |p AS (SELECT x.l_partkey AS a, y.l_partkey AS b
      |      FROM baskets x JOIN baskets y
      |        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |pi AS (SELECT a AS l_partkey FROM p UNION SELECT b FROM p),
      |fb AS MATERIALIZED (SELECT b.* FROM baskets b
      |      WHERE b.l_partkey IN (SELECT l_partkey FROM pi)),
      |no AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM baskets),
      |t AS (SELECT x.l_partkey AS a, y.l_partkey AS b, z.l_partkey AS c,
      |             COUNT(*) AS n
      |      FROM fb x
      |      JOIN fb y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      |      JOIN fb z ON x.l_orderkey = z.l_orderkey AND y.l_partkey < z.l_partkey
      |      GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2)
      |SELECT t.a, t.b, t.c, t.n,
      |       CAST(floor(CAST(t.n AS DOUBLE) / CAST(no.n_orders AS DOUBLE)
      |            * 1000000 + 0.5) AS BIGINT) AS support_e6
      |FROM t, no ORDER BY t.n DESC, t.a, t.b, t.c""".stripMargin

  val substitutesOracle: String =
    """WITH ui AS (SELECT DISTINCT o.o_custkey, l.l_partkey
      |            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      |iu AS (SELECT l_partkey, COUNT(*) AS n_u FROM ui GROUP BY 1),
      |fu0 AS (SELECT ui.* FROM ui JOIN iu USING (l_partkey) WHERE iu.n_u >= 5),
      |fu AS (SELECT o_custkey, l_partkey FROM (
      |        SELECT o_custkey, l_partkey,
      |               row_number() OVER (PARTITION BY o_custkey
      |                 ORDER BY (('0x' || substr(md5(l_partkey || ':29'), 1, 8))::BIGINT % 10000),
      |                          l_partkey) AS rn
      |        FROM fu0) WHERE rn <= 200),
      |up AS (SELECT x.l_partkey AS a, y.l_partkey AS b, COUNT(*) AS n_user
      |       FROM fu x JOIN fu y
      |         ON x.o_custkey = y.o_custkey AND x.l_partkey < y.l_partkey
      |       GROUP BY 1, 2 HAVING COUNT(*) >= 5),
      |baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |bp AS (SELECT x.l_partkey AS a, y.l_partkey AS b, COUNT(*) AS n_basket
      |       FROM baskets x JOIN baskets y
      |         ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      |       GROUP BY 1, 2 HAVING COUNT(*) >= 2)
      |SELECT up.a, up.b, up.n_user,
      |       CAST(COALESCE(bp.n_basket, 0) AS BIGINT) AS n_basket,
      |       CAST(floor(CAST(up.n_user AS DOUBLE)
      |            / CAST(COALESCE(bp.n_basket, 0) + 1 AS DOUBLE)
      |            * 1000000 + 0.5) AS BIGINT) AS score_e6
      |FROM up LEFT JOIN bp ON bp.a = up.a AND bp.b = up.b
      |ORDER BY score_e6 DESC, up.a, up.b LIMIT 50""".stripMargin

  val itemCfOracle: String =
    """WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |itemn AS (SELECT l_partkey, COUNT(*) AS n_item FROM baskets GROUP BY 1),
      |pairs AS (SELECT x.l_partkey AS a, y.l_partkey AS b, COUNT(*) AS n_ab
      |          FROM baskets x JOIN baskets y
      |            ON x.l_orderkey = y.l_orderkey AND x.l_partkey <> y.l_partkey
      |          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |s AS (SELECT p.a, p.b, p.n_ab,
      |             CAST(floor(CAST(p.n_ab AS DOUBLE)
      |                  / sqrt(CAST(ia.n_item AS DOUBLE) * CAST(ib.n_item AS DOUBLE))
      |                  * 1000000 + 0.5) AS BIGINT) AS cos_e6
      |      FROM pairs p
      |      JOIN itemn ia ON p.a = ia.l_partkey
      |      JOIN itemn ib ON p.b = ib.l_partkey),
      |r AS (SELECT a, b, n_ab, cos_e6,
      |             ROW_NUMBER() OVER (PARTITION BY a ORDER BY cos_e6 DESC, b) AS rnk
      |      FROM s)
      |SELECT a, b, n_ab, cos_e6, CAST(rnk AS BIGINT) AS rnk
      |FROM r WHERE rnk <= 5 ORDER BY a, rnk""".stripMargin

  val seqPatternsOracle: String =
    """WITH pos AS (SELECT o_custkey, o_orderkey,
      |                    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                      ORDER BY o_orderdate, o_orderkey) AS pos
      |             FROM orders),
      |it AS MATERIALIZED (SELECT DISTINCT p.o_custkey, p.pos, l.l_partkey
      |       FROM pos p JOIN lineitem l ON l.l_orderkey = p.o_orderkey),
      |eff AS (SELECT GREATEST(5, CAST(ceil(0.003 * COUNT(DISTINCT o_custkey)) AS BIGINT)) AS m
      |        FROM it),
      |pr AS (SELECT x.l_partkey AS a, y.l_partkey AS b,
      |              COUNT(DISTINCT x.o_custkey) AS freq
      |       FROM it x JOIN it y
      |         ON x.o_custkey = y.o_custkey AND x.pos < y.pos
      |       GROUP BY 1, 2 HAVING COUNT(DISTINCT x.o_custkey) >= (SELECT m FROM eff))
      |SELECT a, b, freq FROM pr ORDER BY a, b""".stripMargin

  val basketRulesOracle: String =
    """WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM baskets),
      |itemn AS (SELECT l_partkey, COUNT(*) AS n_item FROM baskets GROUP BY 1),
      |fb AS (SELECT b.* FROM baskets b JOIN itemn USING (l_partkey)
      |       WHERE itemn.n_item >= 2),
      |pairs AS (
      |  SELECT x.l_partkey AS a, y.l_partkey AS b, COUNT(*) AS n_ab
      |  FROM fb x JOIN fb y
      |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
      |SELECT p.a, p.b, p.n_ab,
      |       ROUND(p.n_ab * 1.0 / tot.n_orders, 4) AS support,
      |       ROUND(p.n_ab * 1.0 / ia.n_item, 4) AS confidence,
      |       ROUND(p.n_ab * 1.0 * tot.n_orders / (ia.n_item * ib.n_item), 4) AS lift
      |FROM pairs p
      |JOIN itemn ia ON p.a = ia.l_partkey
      |JOIN itemn ib ON p.b = ib.l_partkey
      |CROSS JOIN tot
      |ORDER BY lift DESC, a, b LIMIT 50""".stripMargin

  /** x229: Bradley–Terry preference ranking (Zermelo 1929; Hunter's 2004
    * MM algorithm) — the model behind chess Elo, search-result judging
    * and RLHF reward-model data: given pairwise outcomes "brand i beat
    * brand j in an order" (higher total quantity, ties dropped), find
    * strengths π with P(i beats j) = πᵢ/(πᵢ+πⱼ). The MM fixed point
    *
    *   πᵢ ← Wᵢ / Σⱼ nᵢⱼ/(πᵢ+πⱼ),  then normalize to Σπ = 1
    *
    * runs `iters` times from the uniform start. Scale shape: the fact
    * collapses to the (order, brand) grain FIRST, so the decisive-pair
    * self-join is per-key bounded at ≤|brands| rows per order (output
    * linear in orders, never quadratic in the fact); the k×k win matrix
    * (k = |brands|, 625 cells) is an aggregate-sized driver boundary —
    * the k-means/eigen discipline — and the iteration is driver-side
    * exact: ascending-j left folds for both the denominator and the
    * normalizer, so the DuckDB oracle replays the ENTIRE trajectory with
    * the same list_reduce folds (the x216 recursion discipline) and the
    * final e9-quantized strengths hash-match. Ranks order by the
    * QUANTIZED strength (engine-stable), brand ascending on ties.
    */
  def bradleyTerry(spark: SparkSession, dir: String, iters: Int = 100): DataFrame = {
    import spark.implicits._
    val q = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_orderkey").as("o"), col("p_brand").as("b"))
      .agg(sum(col("l_quantity")).cast("long").as("qty"))
    val l = q.select(col("o"), col("b").as("b1"), col("qty").as("q1"))
    val r = q.select(col("o").as("o2"), col("b").as("b2"), col("qty").as("q2"))
    val w = l.join(r, col("o") === col("o2") && col("b1") < col("b2")
        && col("q1") =!= col("q2"))
      .select(when(col("q1") > col("q2"), col("b1")).otherwise(col("b2")).as("win"),
        when(col("q1") > col("q2"), col("b2")).otherwise(col("b1")).as("los"))
      .groupBy("win", "los").agg(count(lit(1)).as("n"))
      .collect().map(row => ((row.getString(0), row.getString(1)), row.getLong(2)))
      .toMap                                     // ≤ k² cells — driver boundary
    val brands = w.keysIterator.flatMap { case (a, b) => Iterator(a, b) }
      .toSeq.distinct.sorted
    val k = brands.length
    val idx = brands.zipWithIndex.toMap
    val nm = Array.fill(k, k)(0.0)
    val wv = new Array[Double](k)
    w.foreach { case ((a, b), c) =>
      nm(idx(a))(idx(b)) += c.toDouble; nm(idx(b))(idx(a)) += c.toDouble
      wv(idx(a)) += c.toDouble
    }
    var pi = Array.fill(k)(1.0)
    var t = 0
    while (t < iters) {
      val raw = Array.tabulate(k) { i =>
        var den = 0.0
        var j = 0
        while (j < k) { den = den + nm(i)(j) / (pi(i) + pi(j)); j += 1 }
        if (den > 0) wv(i) / den else pi(i)
      }
      var s = 0.0
      var j = 0
      while (j < k) { s = s + raw(j); j += 1 }
      pi = raw.map(_ / s)
      t += 1
    }
    val rows = brands.indices.map { i =>
      (brands(i), wv(i).toLong, nm(i).sum.toLong,
        math.floor(pi(i) * 1e9 + 0.5).toLong)
    }
    val ranked = rows.sortBy { case (b, _, _, p) => (-p, b) }
      .zipWithIndex.map { case ((b, ws, n, p), rk) => (b, ws, n, p, rk + 1L) }
    ranked.toDF("brand", "wins", "comparisons", "pi_e9", "rnk").orderBy("brand")
  }

  val bradleyTerryOracle: String =
    """WITH RECURSIVE
      |q AS MATERIALIZED (
      |  SELECT l_orderkey o, p_brand b, CAST(SUM(l_quantity) AS BIGINT) qty
      |  FROM lineitem JOIN part ON p_partkey = l_partkey GROUP BY 1, 2),
      |pr AS MATERIALIZED (
      |  SELECT CASE WHEN a.qty > b.qty THEN a.b ELSE b.b END AS win,
      |         CASE WHEN a.qty > b.qty THEN b.b ELSE a.b END AS los
      |  FROM q a JOIN q b ON a.o = b.o AND a.b < b.b AND a.qty <> b.qty),
      |br AS MATERIALIZED (
      |  SELECT b, row_number() OVER (ORDER BY b) AS i
      |  FROM (SELECT DISTINCT win AS b FROM pr UNION SELECT DISTINCT los FROM pr)),
      |w AS (SELECT wi.i AS i, lj.i AS j, COUNT(*) AS w
      |      FROM pr JOIN br wi ON wi.b = pr.win JOIN br lj ON lj.b = pr.los
      |      GROUP BY 1, 2),
      |grid AS (SELECT a.i AS i, b.i AS j FROM br a, br b),
      |nm0 AS (SELECT g.i, g.j,
      |               CAST(COALESCE(wij.w, 0) + COALESCE(wji.w, 0) AS DOUBLE) AS n,
      |               CAST(COALESCE(wij.w, 0) AS DOUBLE) AS w
      |        FROM grid g LEFT JOIN w wij ON wij.i = g.i AND wij.j = g.j
      |                    LEFT JOIN w wji ON wji.i = g.j AND wji.j = g.i),
      |rw AS (SELECT i, list(n ORDER BY j) AS rn,
      |              SUM(w) AS wi, SUM(n) AS ni FROM nm0 GROUP BY i),
      |mat AS MATERIALIZED (SELECT list(rn ORDER BY i) AS nm,
      |                            list(CAST(wi AS DOUBLE) ORDER BY i) AS wv FROM rw),
      |it AS (
      |  SELECT 0 AS t,
      |         [CAST(1.0 AS DOUBLE) for z in range((SELECT COUNT(*) FROM br))] AS pi
      |  UNION ALL
      |  SELECT t + 1, list_transform(raw, x -> x / list_reduce(raw, (a, b) -> a + b))
      |  FROM (SELECT t, list_transform(range(1, len(pi) + 1), i ->
      |            CASE WHEN list_reduce(list_transform(range(1, len(pi) + 1),
      |                        j -> nm[i][j] / (pi[i] + pi[j])), (a, b) -> a + b) > 0
      |                 THEN wv[i] / list_reduce(list_transform(range(1, len(pi) + 1),
      |                        j -> nm[i][j] / (pi[i] + pi[j])), (a, b) -> a + b)
      |                 ELSE pi[i] END) AS raw
      |        FROM it, mat WHERE t < 100)),
      |fin AS (SELECT br.b AS brand,
      |               CAST(rw.wi AS BIGINT) AS wins,
      |               CAST(rw.ni AS BIGINT) AS comparisons,
      |               CAST(floor(pi[br.i] * 1000000000 + 0.5) AS BIGINT) AS pi_e9
      |        FROM (SELECT pi FROM it WHERE t = 100), br JOIN rw ON rw.i = br.i)
      |SELECT brand, wins, comparisons, pi_e9,
      |       row_number() OVER (ORDER BY pi_e9 DESC, brand) AS rnk
      |FROM fin ORDER BY brand""".stripMargin

  /** x260: NDCG@5 of the item-CF recommender under a TEMPORAL holdout —
    * the evaluation the serving pair x199/x205 was missing: train the
    * CF neighborhood on the first half of the order calendar, recommend
    * top-5 unseen items per customer, score against what the customer
    * ACTUALLY bought (new items only) in the second half. This is the
    * leakage-free protocol (x141's purged-split discipline applied to
    * recommendation): similarities never see a holdout basket.
    *
    * Exactness: NDCG is usually a log2 soup; here the five rank
    * discounts 1/log2(r+1) are pre-rounded e9 INTEGER CONSTANTS shared
    * verbatim by both engines (w = [1e9, 630929754, 5e8, 430676558,
    * 386852807]), so per-user DCG is an exact integer dot product, the
    * ideal DCG is a prefix-sum CASE over min(n_rel, 5), and
    * ndcg_e6 = (dcg·10⁶) DIV idcg is an exact integer DIV — no
    * transcendental is ever evaluated at query time. The cut day is
    * lo + (hi−lo) DIV 2 of the order span (corpus-derived, the x219
    * posture). Scale: the CF pair space is basket-bounded (the x199
    * argument) on the train half; recs are |owned|·k per user; the
    * metric reduces to ONE row. Users enter the denominator iff they
    * have BOTH a rec list and ≥1 new holdout item (documented grain).
    */
  def ndcgEval(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        floor(unix_micros(col("o_orderdate")) / 86400000000L).cast("long").as("day"))
    val span = ord.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(expr("lo + (hi - lo) DIV 2").as("cut"))
    val o2 = ord.crossJoin(broadcast(span))
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey"))
    val trainLines = o2.filter(col("day") < col("cut"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
    val trainBaskets = trainLines.select("l_orderkey", "l_partkey").distinct()
    val trainOwned = trainLines.select("o_custkey", "l_partkey").distinct()
    val holdOwned = o2.filter(col("day") >= col("cut"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .select("o_custkey", "l_partkey").distinct()
    val itemN = trainBaskets.groupBy("l_partkey").agg(count(lit(1)).as("n_item"))
    val p0 = trainBaskets.select(col("l_orderkey").as("bk"), col("l_partkey").as("a"))
      .join(trainBaskets.select(col("l_orderkey").as("bk"), col("l_partkey").as("b")), "bk")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 2)
    val sym = p0.unionAll(p0.select(col("b").as("a"), col("a").as("b"), col("n_ab")))
    val nbrs = sym
      .join(itemN.select(col("l_partkey").as("a"), col("n_item").as("n_a")), "a")
      .join(itemN.select(col("l_partkey").as("b"), col("n_item").as("n_b")), "b")
      .select(col("a"), col("b"),
        floor(col("n_ab").cast("double")
          / sqrt(col("n_a").cast("double") * col("n_b").cast("double"))
          * 1000000d + 0.5d).cast("long").as("cos_e6"))
      .withColumn("nrnk", row_number().over(
        Window.partitionBy(col("a")).orderBy(col("cos_e6").desc, col("b"))))
      .filter(col("nrnk") <= k)
      .select("a", "b", "cos_e6")
    val recs = trainOwned.join(nbrs, trainOwned("l_partkey") === nbrs("a"))
      .select(col("o_custkey"), col("b"), col("cos_e6"))
      .join(trainOwned.select(col("o_custkey"), col("l_partkey").as("b")),
        Seq("o_custkey", "b"), "left_anti")
      .groupBy("o_custkey", "b")
      .agg(sum(col("cos_e6")).as("score_e6"))
      .withColumn("r", row_number().over(
        Window.partitionBy(col("o_custkey"))
          .orderBy(col("score_e6").desc, col("b"))))
      .filter(col("r") <= k)
    val relHold = holdOwned
      .join(trainOwned, Seq("o_custkey", "l_partkey"), "left_anti")
    val nRel = relHold.groupBy("o_custkey").agg(count(lit(1)).as("n_rel"))
    val wCase = expr("""CASE r WHEN 1 THEN 1000000000 WHEN 2 THEN 630929754
                        WHEN 3 THEN 500000000 WHEN 4 THEN 430676558
                        ELSE 386852807 END""")
    val perUser = recs
      .join(relHold.select(col("o_custkey"), col("l_partkey").as("b"))
        .withColumn("hit", lit(1L)), Seq("o_custkey", "b"), "left")
      .select(col("o_custkey"), col("r"), coalesce(col("hit"), lit(0L)).as("h"),
        (coalesce(col("hit"), lit(0L)) * wCase).as("g"))
      .groupBy("o_custkey")
      .agg(sum(col("g")).as("dcg_e9"),
        sum(when(col("r") === 1, col("h")).otherwise(0L)).as("h1"),
        sum(when(col("r") === 2, col("h")).otherwise(0L)).as("h2"),
        sum(when(col("r") === 3, col("h")).otherwise(0L)).as("h3"),
        sum(when(col("r") === 4, col("h")).otherwise(0L)).as("h4"),
        sum(when(col("r") === 5, col("h")).otherwise(0L)).as("h5"))
      .join(nRel, "o_custkey") // metric grain: rec list AND >=1 new holdout item
      .withColumn("idcg_e9", expr(
        """CASE least(n_rel, 5) WHEN 1 THEN 1000000000 WHEN 2 THEN 1630929754
           WHEN 3 THEN 2130929754 WHEN 4 THEN 2561606312
           ELSE 2948459119 END"""))
      .withColumn("ndcg_e6", expr("(dcg_e9 * 1000000) DIV idcg_e9"))
    perUser.agg(count(lit(1)).as("n_users"),
        sum(col("h1")).as("hits_at_1"), sum(col("h2")).as("hits_at_2"),
        sum(col("h3")).as("hits_at_3"), sum(col("h4")).as("hits_at_4"),
        sum(col("h5")).as("hits_at_5"),
        sum(col("ndcg_e6")).as("sum_ndcg_e6"))
      .withColumn("mean_ndcg_e6", expr("sum_ndcg_e6 DIV n_users"))
  }

  val ndcgOracle: String =
    """WITH ord AS (SELECT o_orderkey, o_custkey,
      |                    CAST(floor(epoch_us(o_orderdate) / 86400000000) AS BIGINT) AS day
      |             FROM orders),
      |span AS (SELECT MIN(day) + (MAX(day) - MIN(day)) // 2 AS cut FROM ord),
      |tl AS (SELECT o.o_orderkey, o.o_custkey, l.l_partkey
      |       FROM ord o JOIN lineitem l ON l.l_orderkey = o.o_orderkey, span
      |       WHERE o.day < span.cut),
      |tb AS MATERIALIZED (SELECT DISTINCT o_orderkey AS bk, l_partkey FROM tl),
      |town AS MATERIALIZED (SELECT DISTINCT o_custkey, l_partkey FROM tl),
      |hown AS (SELECT DISTINCT o.o_custkey, l.l_partkey
      |         FROM ord o JOIN lineitem l ON l.l_orderkey = o.o_orderkey, span
      |         WHERE o.day >= span.cut),
      |itemn AS (SELECT l_partkey, COUNT(*) AS n_item FROM tb GROUP BY 1),
      |p0 AS (SELECT x.l_partkey AS a, y.l_partkey AS b, COUNT(*) AS n_ab
      |       FROM tb x JOIN tb y ON x.bk = y.bk AND x.l_partkey < y.l_partkey
      |       GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |sym AS (SELECT a, b, n_ab FROM p0
      |        UNION ALL SELECT b, a, n_ab FROM p0),
      |nb AS MATERIALIZED (SELECT a, b, cos_e6 FROM (
      |       SELECT s.a, s.b,
      |              CAST(floor(CAST(s.n_ab AS DOUBLE)
      |                / sqrt(CAST(ia.n_item AS DOUBLE) * CAST(ib.n_item AS DOUBLE))
      |                * 1000000 + 0.5) AS BIGINT) AS cos_e6,
      |              ROW_NUMBER() OVER (PARTITION BY s.a
      |                ORDER BY CAST(floor(CAST(s.n_ab AS DOUBLE)
      |                  / sqrt(CAST(ia.n_item AS DOUBLE) * CAST(ib.n_item AS DOUBLE))
      |                  * 1000000 + 0.5) AS BIGINT) DESC, s.b) AS nrnk
      |       FROM sym s JOIN itemn ia ON s.a = ia.l_partkey
      |                  JOIN itemn ib ON s.b = ib.l_partkey)
      |       WHERE nrnk <= 5),
      |recs AS (SELECT o_custkey, b, r FROM (
      |       SELECT c.o_custkey, c.b, SUM(c.cos_e6) AS score_e6,
      |              ROW_NUMBER() OVER (PARTITION BY c.o_custkey
      |                ORDER BY SUM(c.cos_e6) DESC, c.b) AS r
      |       FROM (SELECT t.o_custkey, nb.b, nb.cos_e6
      |             FROM town t JOIN nb ON nb.a = t.l_partkey
      |             WHERE NOT EXISTS (SELECT 1 FROM town t2
      |               WHERE t2.o_custkey = t.o_custkey AND t2.l_partkey = nb.b)) c
      |       GROUP BY c.o_custkey, c.b)
      |       WHERE r <= 5),
      |rel AS MATERIALIZED (SELECT h.o_custkey, h.l_partkey FROM hown h
      |       WHERE NOT EXISTS (SELECT 1 FROM town t
      |         WHERE t.o_custkey = h.o_custkey AND t.l_partkey = h.l_partkey)),
      |nrel AS (SELECT o_custkey, COUNT(*) AS n_rel FROM rel GROUP BY 1),
      |pu AS (SELECT rc.o_custkey,
      |              SUM(CASE WHEN rl.l_partkey IS NOT NULL THEN
      |                    CASE rc.r WHEN 1 THEN 1000000000 WHEN 2 THEN 630929754
      |                      WHEN 3 THEN 500000000 WHEN 4 THEN 430676558
      |                      ELSE 386852807 END ELSE 0 END) AS dcg_e9,
      |              SUM(CASE WHEN rc.r = 1 AND rl.l_partkey IS NOT NULL THEN 1 ELSE 0 END) AS h1,
      |              SUM(CASE WHEN rc.r = 2 AND rl.l_partkey IS NOT NULL THEN 1 ELSE 0 END) AS h2,
      |              SUM(CASE WHEN rc.r = 3 AND rl.l_partkey IS NOT NULL THEN 1 ELSE 0 END) AS h3,
      |              SUM(CASE WHEN rc.r = 4 AND rl.l_partkey IS NOT NULL THEN 1 ELSE 0 END) AS h4,
      |              SUM(CASE WHEN rc.r = 5 AND rl.l_partkey IS NOT NULL THEN 1 ELSE 0 END) AS h5
      |       FROM recs rc LEFT JOIN rel rl
      |         ON rl.o_custkey = rc.o_custkey AND rl.l_partkey = rc.b
      |       GROUP BY 1),
      |scored AS (SELECT pu.*, nrel.n_rel,
      |                  CASE LEAST(nrel.n_rel, 5) WHEN 1 THEN 1000000000
      |                    WHEN 2 THEN 1630929754 WHEN 3 THEN 2130929754
      |                    WHEN 4 THEN 2561606312 ELSE 2948459119 END AS idcg_e9
      |           FROM pu JOIN nrel USING (o_custkey))
      |SELECT COUNT(*) AS n_users,
      |       CAST(SUM(h1) AS BIGINT) AS hits_at_1,
      |       CAST(SUM(h2) AS BIGINT) AS hits_at_2,
      |       CAST(SUM(h3) AS BIGINT) AS hits_at_3,
      |       CAST(SUM(h4) AS BIGINT) AS hits_at_4,
      |       CAST(SUM(h5) AS BIGINT) AS hits_at_5,
      |       CAST(SUM((dcg_e9 * 1000000) // idcg_e9) AS BIGINT) AS sum_ndcg_e6,
      |       CAST(SUM((dcg_e9 * 1000000) // idcg_e9) // COUNT(*) AS BIGINT) AS mean_ndcg_e6
      |FROM scored""".stripMargin
}
