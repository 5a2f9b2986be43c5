package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Iterative graph analytics beyond connected components (the x63
  * machinery): weighted PageRank over a graph DERIVED from the fact
  * tables — the "important suppliers/domains" signal a pipeline computes
  * over link or trade graphs. Fixed iteration count, exact integer
  * arithmetic, so the result is oracle-checkable by unrolling the same
  * iterations in SQL.
  */
object Graph {

  /** x110: weighted PageRank over the nation-level trade graph (edge
    * src→dst weighted by order lines a customer nation places with a
    * supplier nation; built from lineitem⋈orders⋈customer⋈supplier).
    *
    * Exactness: rank lives in integer MICRO-units. Each iteration is
    * pr'(v) = (base + 850·Σ_{u→v} (pr(u)·w ÷ wout(u))) ÷ 1000 with ÷ the
    * integer floor division on both engines (`div` / `//`) and
    * base = 150000000 ÷ n — the damping-0.85 update with dangling/flooring
    * mass dropped, deterministic to the last digit. n (node count) is a
    * driver control scalar exactly like the CC convergence count.
    *
    * Scale shape: the edge aggregate is the only fact-sized work (partial
    * agg → one (src,dst)-keyed exchange); each iteration then joins the
    * |nodes|-row rank frame into the |edges|-row frame by src and
    * re-aggregates by dst — at web scale that is the standard
    * edge-partitioned PageRank round (rank frames broadcast when small,
    * key-shuffled when not; AQE decides, nothing is hinted). The fixed
    * iteration count keeps the plan static; a convergence-driven variant
    * would add the localCheckpoint round-bounding [[graft.ext.Dedup]]'s CC
    * loop demonstrates.
    */
  /** The weighted nation→nation trade edge list (customer nation places
    * order lines with supplier nation), Layer-shared between x110's
    * PageRank and x136's triangle count — the fact-sized aggregate runs
    * once per session.
    */
  private[graft] def tradeEdges(spark: SparkSession, dir: String): DataFrame =
    graft.Layer.cached(spark, dir, "nationTradeEdges") {
      Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
        .agg(count(lit(1)).as("w"))
    }

  def nationTradeRank(spark: SparkSession, dir: String, iters: Int = 3): DataFrame = {
    val edges = tradeEdges(spark, dir)
    val out = edges.groupBy("src").agg(sum(col("w")).as("wout"))
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
    val n = nodes.count() // control-plane scalar (like the CC convergence count)
    val base = 150000000L / n
    var pr = nodes.withColumn("pr", lit(1000000L / n))
    for (_ <- 1 to iters) {
      val contrib = edges.join(out, "src").join(pr, col("src") === col("id"))
        .select(col("dst"), expr("(pr * w) div wout").as("c"))
      val sums = contrib.groupBy("dst").agg(sum(col("c")).as("s"))
      pr = nodes.join(sums, col("id") === col("dst"), "left_outer")
        .select(col("id"), expr(s"($base + 850 * coalesce(s, 0)) div 1000").as("pr"))
    }
    pr.join(broadcast(Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))),
        col("id") === col("n_nationkey"))
      .select(col("id").cast("long").as("nationkey"), col("n_name").as("nation"),
        col("pr").cast("long").as("pr_micro"))
      .orderBy(col("pr_micro").desc, col("nationkey"))
  }

  /** x283: weighted PageRank over the co-purchase PART graph — x110's
    * integer-exact update transplanted to a REAL node domain (thousands
    * of parts at the gate SFs, millions on scale corpora) where the
    * per-round rank⋈edges join keys on NODE id, so a power-law hub
    * serializes it exactly like x200/x231's rounds (SCALE.md r13). Hub
    * routing (the [[hubNodes]] discipline): the out-weight denominator
    * folds into the edge frame ONCE (static join, checkpointed), so each
    * round is ranks⋈edgesW on src — hub-src rows take a BROADCAST of the
    * ≤|hubs|-row rank slice, the remainder the uniform shuffle join, and
    * the per-dst contribution sum is map-side combinable either way.
    * Arithmetic is the x110 micro-unit discipline: pr'(v) = (base +
    * 850·Σ (pr(u)·w ÷ wout(u))) ÷ 1000, all BIGINT floor division, so
    * DuckDB unrolls the identical three rounds and hash-matches every
    * node's rank.
    */
  def partPagerank(spark: SparkSession, dir: String, iters: Int = 3): DataFrame = {
    val pairs = graft.ext.Associations.copurchasePairs(spark, dir)
    val sym = pairs.select(col("a").as("src"), col("b").as("dst"), col("n_ab").as("w"))
      .unionAll(pairs.select(col("b").as("src"), col("a").as("dst"), col("n_ab").as("w")))
    pagerankRanks(sym, iters, served = Some((spark, dir)))
      .select(col("id").as("l_partkey"), col("pr").cast("long").as("pr_micro"))
      .orderBy(col("pr_micro").desc, col("l_partkey"))
  }

  /** Frame-level x283 rounds over symmetric weighted edges (src, dst, w)
    * → (id, pr) micro-unit ranks; hub routing per the class note above.
    */
  private[graft] def pagerankRanks(sym: DataFrame, iters: Int,
                                   hubBudget: Long = HubDegreeBudget,
                                   served: Option[(SparkSession, String)] = None,
                                   broadcastNodeBudget: Long = GraphBroadcastNodeBudget,
                                   hubMinNodes: Long = HubRoutingMinNodes): DataFrame = {
    val out = sym.groupBy("src").agg(sum(col("w")).as("wout"))
    val nodes = sym.select(col("src").as("id")).distinct().localCheckpoint()
    val n = nodes.count() // control-plane scalar, the x110 posture
    // whole-rank-frame broadcast channel, BAND-GATED (r15): engages only
    // where the per-round join is a REAL exchange (n above the routing
    // floor — below it AQE auto-broadcasts and the explicit hint is
    // measured pure overhead, r14) and the rank frame fits the budget —
    // there BOTH the static wout join and every per-round rank join
    // take the |nodes|-row side as a broadcast, the edge frame never
    // crosses an exchange at all, and only the per-dst partial-agg
    // output shuffles (measured best plan at 2 M nodes, SCALE.md r15).
    // Above the budget the r13 hub routing is the scale path.
    val useBcast = n > hubMinNodes && n <= broadcastNodeBudget
    lazy val hubs = if (n <= hubMinNodes) Seq.empty[Long] else served match {
      case Some((sp, dir)) =>
        hubNodesServed(sp, dir, "pagerank|src", hubBudget)(hubNodes(sym, "src", hubBudget))
      case None => hubNodes(sym, "src", hubBudget)
    }
    // the STATIC wout join is itself src-keyed, so an unrouted shuffle
    // plan would concentrate the hub's whole adjacency on one reducer
    // here too (measured: a 22.9 s task at hub-m100 before this split —
    // the same shape the per-round joins route away). The hub channel
    // takes wout from a broadcast of the ≤|hubs|-row slice and NEVER
    // shuffles on src; the remainder keeps the uniform shuffle join.
    val edgesW =
      (if (useBcast) sym.join(broadcast(out), "src")
       else if (hubs.isEmpty) sym.join(out, "src")
       else sym.filter(col("src").isin(hubs: _*))
         .join(broadcast(out.filter(col("src").isin(hubs: _*))), "src")
         .unionAll(sym.filter(!col("src").isin(hubs: _*)).join(out, "src")))
        .localCheckpoint()
    lazy val (eHub, eRest) =
      if (hubs.isEmpty) (null, edgesW)
      else (edgesW.filter(col("src").isin(hubs: _*)).localCheckpoint(),
        edgesW.filter(!col("src").isin(hubs: _*)).localCheckpoint())
    def contribs(pr: DataFrame): DataFrame = {
      val all =
        if (useBcast) edgesW.join(broadcast(pr), col("src") === col("id"))
        else if (hubs.isEmpty) eRest.join(pr, col("src") === col("id"))
        else eHub.join(broadcast(pr.filter(col("id").isin(hubs: _*))),
          col("src") === col("id"))
          .unionAll(eRest.join(pr, col("src") === col("id")))
      all.select(col("dst"), expr("(pr * w) div wout").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
    }
    val base = 150000000L / n
    var pr = nodes.withColumn("pr", lit(1000000L / n))
    for (_ <- 1 to iters) {
      pr = nodes.join(contribs(pr), col("id") === col("dst"), "left_outer")
        .select(col("id"), expr(s"($base + 850 * coalesce(s, 0)) div 1000").as("pr"))
        .localCheckpoint()
    }
    pr
  }

  val partPagerankOracle: String =
    """WITH baskets AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |p AS MATERIALIZED (SELECT x.l_partkey AS a, y.l_partkey AS b, COUNT(*) AS n_ab
      |      FROM baskets x JOIN baskets y
      |        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |e AS MATERIALIZED (SELECT a AS src, b AS dst, n_ab AS w FROM p
      |      UNION ALL SELECT b, a, n_ab FROM p),
      |o AS MATERIALIZED (SELECT src, SUM(w) AS wout FROM e GROUP BY 1),
      |nodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM e),
      |nn AS (SELECT COUNT(*) AS n FROM nodes),
      |pr0 AS (SELECT id, 1000000 // (SELECT n FROM nn) AS pr FROM nodes),
      |c1 AS (SELECT e.dst, SUM((pr0.pr * e.w) // o.wout) AS s
      |       FROM e JOIN o USING (src) JOIN pr0 ON pr0.id = e.src GROUP BY 1),
      |pr1 AS (SELECT nodes.id,
      |               ((150000000 // (SELECT n FROM nn)) + 850 * COALESCE(c1.s, 0)) // 1000 AS pr
      |        FROM nodes LEFT JOIN c1 ON c1.dst = nodes.id),
      |c2 AS (SELECT e.dst, SUM((pr1.pr * e.w) // o.wout) AS s
      |       FROM e JOIN o USING (src) JOIN pr1 ON pr1.id = e.src GROUP BY 1),
      |pr2 AS (SELECT nodes.id,
      |               ((150000000 // (SELECT n FROM nn)) + 850 * COALESCE(c2.s, 0)) // 1000 AS pr
      |        FROM nodes LEFT JOIN c2 ON c2.dst = nodes.id),
      |c3 AS (SELECT e.dst, SUM((pr2.pr * e.w) // o.wout) AS s
      |       FROM e JOIN o USING (src) JOIN pr2 ON pr2.id = e.src GROUP BY 1),
      |pr3 AS (SELECT nodes.id,
      |               ((150000000 // (SELECT n FROM nn)) + 850 * COALESCE(c3.s, 0)) // 1000 AS pr
      |        FROM nodes LEFT JOIN c3 ON c3.dst = nodes.id)
      |SELECT id AS l_partkey, CAST(pr AS BIGINT) AS pr_micro FROM pr3
      |ORDER BY pr_micro DESC, l_partkey""".stripMargin

  /** x285: RECURSIVE CTE reachability — Spark 4's `WITH RECURSIVE`
    * (UnionLoop) on the correctness path: depth-bounded BFS from the
    * smallest part over the co-purchase graph, the SQL-first idiom a
    * migrating warehouse user writes for hierarchies/reachability before
    * reaching for the driver-loop operators (x63 CC, x110 PageRank). The
    * recursive step is LEVEL-DEDUPED (SELECT DISTINCT per iteration), so
    * each level is ≤ |nodes| rows and the path-count explosion a naive
    * UNION ALL BFS suffers on dense graphs cannot happen; the depth
    * bound terminates the loop identically in both engines, and the
    * final MIN(depth) per node makes the result order-independent.
    * DuckDB runs the recursion over the character-identical pair frame
    * (rebuilt from lineitem in the oracle — the Layer cache is a Spark
    * runtime artifact, not a semantic one).
    *
    * Round-14 (verdict #1): the CTE prologue no longer rebuilds baskets
    * + the co-purchase pair aggregate from raw parquet inside the SQL
    * text — that rebuild was the suite's most expensive plan (14.4 M
    * cold shuffle rows, 24× the median) and re-paid the graph family's
    * one fact-sized aggregate that x283/x200/x231 read from the Layer.
    * The cached frame is spliced in as a dir-keyed temp view; the WITH
    * RECURSIVE UnionLoop stays intact as the surface under test.
    */
  def recursiveReach(spark: SparkSession, dir: String): DataFrame = {
    val pairs = graft.ext.Associations.copurchasePairs(spark, dir)
    // dir-keyed so two dirs in one session can't serve each other's
    // frame — keyed on the dir's md5 (r15 ADVICE: a 32-bit
    // String.hashCode collision between two corpus dirs would silently
    // substitute the wrong pair frame into a hash-checked gate; the
    // Streams scratch-path uses of the hashCode idiom only risk a path
    // clash, this one risks a wrong ANSWER)
    val view = "graft_copairs_" + Stats.md5(dir).take(16)
    pairs.createOrReplaceTempView(view)
    spark.sql(
      s"""WITH RECURSIVE
         |e AS (SELECT a AS src, b AS dst FROM $view
         |      UNION ALL SELECT b, a FROM $view),
         |seed AS (SELECT MIN(a) AS id FROM $view),
         |r(id, depth) AS (
         |  SELECT id, 0 FROM seed
         |  UNION ALL
         |  SELECT DISTINCT e.dst, r.depth + 1
         |  FROM r JOIN e ON e.src = r.id WHERE r.depth < 3)
         |SELECT id AS l_partkey, CAST(MIN(depth) AS BIGINT) AS hops
         |FROM r GROUP BY id ORDER BY l_partkey""".stripMargin)
  }

  val recursiveReachOracle: String =
    """WITH RECURSIVE
      |baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |p AS (SELECT x.l_partkey AS a, y.l_partkey AS b, COUNT(*) AS n_ab
      |      FROM baskets x JOIN baskets y
      |        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |e AS (SELECT a AS src, b AS dst FROM p UNION ALL SELECT b, a FROM p),
      |seed AS (SELECT MIN(a) AS id FROM p),
      |r(id, depth) AS (
      |  SELECT id, 0 FROM seed
      |  UNION ALL
      |  SELECT DISTINCT e.dst, r.depth + 1
      |  FROM r JOIN e ON e.src = r.id WHERE r.depth < 3)
      |SELECT id AS l_partkey, CAST(MIN(depth) AS BIGINT) AS hops
      |FROM r GROUP BY id ORDER BY l_partkey""".stripMargin

  /** x136: per-node triangle participation over the undirected trade
    * graph — the clustering/cohesion signal (a nation inside many trade
    * triangles sits in a dense bloc; spam/collusion detection runs the
    * same count over link graphs). Enumeration is the degree-ordered
    * FORWARD algorithm (Schank & Wagner 2005): orient every undirected
    * edge from the endpoint with the smaller (degree, id) to the larger,
    * making the orientation an acyclic total order in which each triangle
    * has EXACTLY ONE source vertex with out-edges to the other two — so
    * wedges (u→v₁, u→v₂) joined against the undirected closing edge
    * {v₁,v₂} enumerate each triangle once, and per-node out-degree is
    * O(√m), bounding the wedge space at Σ outdeg² ≈ m^1.5 instead of the
    * Σ deg² a plain wedge join pays on hub nodes (THE scale difference on
    * a power-law graph: the hub's deg² explodes, its outdeg² cannot).
    * Node set and counts mirror brute-force x<y<z enumeration, which is
    * exactly what the DuckDB twin does.
    */
  def tradeTriangles(spark: SparkSession, dir: String): DataFrame = {
    val und = tradeEdges(spark, dir)
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val deg = und.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val oriented = und
      .join(deg.toDF("a", "da"), "a")
      .join(deg.toDF("b", "db"), "b")
      .select(when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("u"), col("b").as("v")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    val wedges = oriented.toDF("u", "v1").join(oriented.toDF("u", "v2"), "u")
      .filter(col("v1") < col("v2"))
    val tri = wedges.join(und,
      least(col("v1"), col("v2")) === col("a") &&
        greatest(col("v1"), col("v2")) === col("b"))
      .select(col("u"), col("v1"), col("v2"))
    val perNode = tri
      .select(explode(array(col("u"), col("v1"), col("v2"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
    val nodes = und.select(col("a").as("id"))
      .union(und.select(col("b").as("id"))).distinct()
    nodes.join(perNode, Seq("id"), "left_outer")
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("id") === col("n_nationkey"))
      .select(col("id").cast("long").as("nationkey"), col("n_name").as("nation"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .orderBy("nationkey")
  }

  /** DuckDB twin: brute-force x<y<z triangle enumeration (the right
    * single-node plan; the degree-ordered blocking above is provably
    * exact, so the triangle sets agree), corners unioned for per-node
    * counts.
    */
  val trianglesOracle: String =
    """WITH e AS (
      |  SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey),
      |und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      |        FROM e WHERE src <> dst),
      |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
      |        FROM und e1
      |        JOIN und e2 ON e2.a = e1.b
      |        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
      |corners AS (SELECT x AS id FROM tri
      |            UNION ALL SELECT y FROM tri
      |            UNION ALL SELECT z FROM tri),
      |cnt AS (SELECT id, COUNT(*) AS n_triangles FROM corners GROUP BY 1),
      |nodes AS (SELECT a AS id FROM und UNION SELECT b FROM und)
      |SELECT CAST(nodes.id AS BIGINT) AS nationkey, n.n_name AS nation,
      |       CAST(COALESCE(cnt.n_triangles, 0) AS BIGINT) AS n_triangles
      |FROM nodes
      |LEFT JOIN cnt ON cnt.id = nodes.id
      |JOIN nation n ON n.n_nationkey = nodes.id
      |ORDER BY nationkey""".stripMargin

  /** DuckDB twin: the identical three update rounds unrolled as CTEs —
    * `//` is DuckDB's integer floor division, matching Spark's `div` on
    * the all-positive operands.
    */
  val tradeRankOracle: String =
    """WITH e AS (
      |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  GROUP BY 1, 2),
      |outs AS (SELECT src, SUM(w) AS wout FROM e GROUP BY 1),
      |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
      |nn AS (SELECT COUNT(*) AS n FROM nodes),
      |pr0 AS (SELECT id, (1000000 // n) AS pr FROM nodes, nn),
      |c1 AS (SELECT e.dst, SUM((p.pr * e.w) // o.wout) AS s
      |       FROM e JOIN outs o USING (src) JOIN pr0 p ON p.id = e.src GROUP BY 1),
      |pr1 AS (SELECT nodes.id, (((150000000 // n) + 850 * COALESCE(c1.s, 0)) // 1000) AS pr
      |        FROM nodes CROSS JOIN nn LEFT JOIN c1 ON c1.dst = nodes.id),
      |c2 AS (SELECT e.dst, SUM((p.pr * e.w) // o.wout) AS s
      |       FROM e JOIN outs o USING (src) JOIN pr1 p ON p.id = e.src GROUP BY 1),
      |pr2 AS (SELECT nodes.id, (((150000000 // n) + 850 * COALESCE(c2.s, 0)) // 1000) AS pr
      |        FROM nodes CROSS JOIN nn LEFT JOIN c2 ON c2.dst = nodes.id),
      |c3 AS (SELECT e.dst, SUM((p.pr * e.w) // o.wout) AS s
      |       FROM e JOIN outs o USING (src) JOIN pr2 p ON p.id = e.src GROUP BY 1),
      |pr3 AS (SELECT nodes.id, (((150000000 // n) + 850 * COALESCE(c3.s, 0)) // 1000) AS pr
      |        FROM nodes CROSS JOIN nn LEFT JOIN c3 ON c3.dst = nodes.id)
      |SELECT CAST(pr3.id AS BIGINT) AS nationkey, n.n_name AS nation,
      |       CAST(pr3.pr AS BIGINT) AS pr_micro
      |FROM pr3 JOIN nation n ON n.n_nationkey = pr3.id
      |ORDER BY pr_micro DESC, nationkey""".stripMargin

  /** The k-core peel kernel: repeatedly delete nodes of degree < k until
    * fixpoint. One degree-aggregate + one semi-join per round (the
    * pointer-jumping CC posture: a driver loop of bounded DataFrame
    * jobs, localCheckpoint every round so lineage stays O(1)); an
    * early-exit when no node was removed, a `maxRounds` cap so both
    * engines compute the identical bounded recursion (extra rounds past
    * the fixpoint are provably no-ops, so capping never changes a
    * CONVERGED answer — OpsSpec drives an adversarial chain graph whose
    * peel takes many rounds to pin that the cap is honest). Returns
    * (id, core_deg) for surviving nodes: their degree within the core.
    */
  /** Hot-NODE degree budget for the iterative family's per-round joins
    * (round-13, verdict #2 — the x269/x281 routing discipline applied to
    * GRAPH nodes): a node-id equi-join ships every edge row of a key to
    * one reducer task, so a power-law hub serializes its whole adjacency
    * per round. The r13 hub-corpus measurement exhibited it: x200's
    * longest task grew 4.0 → 25.6 s from m30 → m100 (superlinear; 35% of
    * the stage wall) while the balanced tasks stayed sub-second. Above
    * this per-node edge count the routed plans split the hub off into a
    * BROADCAST channel (hub membership/labels are ≤ |hubs| rows — tiny
    * by construction) and only the uniform remainder shuffles. The
    * budget is where the measured trade flips (SCALE.md r13): at hub
    * degree ~600 k (the hub m30 corpus) the unrouted straggler is
    * ~2–4 s/round and routing's channel-split overhead costs more than
    * it saves; at ~2 M (m100) the straggler is 25.6 s and the routed
    * plan halves BOTH the wall and the task total (the hub rows skip
    * the per-round shuffle join entirely, 900 → 489 task-s). The probe
    * is one map-side-combinable degree aggregate, run once per call,
    * and every gate corpus sits orders of magnitude below the budget so
    * routed and unrouted plans coincide there.
    */
  private[graft] def HubDegreeBudget: Long =
    sys.env.get("SPARK_GRAFT_HUB_BUDGET").map(_.toLong)
      .getOrElse(1000000L) // r14: env dial (PAIR_BUDGET precedent) so the
                           // routed/unrouted A/B can run on the FIXED plan
                           // without a rebuild; default unchanged

  /** Node-count FLOOR below which hub routing never engages (round-14).
    * The hub split's premise is that the per-round state join is a REAL
    * node-keyed shuffle whose hub reducer serializes the adjacency —
    * but below ~625 k nodes the state frame is under Spark's 10 MB
    * auto-broadcast threshold (16 B/node), AQE converts the join to a
    * broadcast at runtime, the exchange the hub would serialize does
    * not exist, and the split is pure overhead. Measured on the FIXED
    * k-core at gh100 (301 k nodes, 2 M-edge hub), matched canaries:
    * routed 88.0 s (1206 task | 52.9 max) vs unrouted 62.2 (801 |
    * 21.7) — the r13 "routing halves k-core" claim was an artifact of
    * the endpoint-swapped plan doing less work. ABOVE the floor the
    * state join is a genuine shuffle, and round 15 finally MEASURED the
    * machinery there (the wide-dial corpus, 2.03 M nodes / 1.48 M-edge
    * hub): hub routing beat the uniform shuffle 1.4–1.7× at matched
    * canaries (x200 44.8 vs 58.8–64.6 s, x231 33.1 vs 57–58, x283 20.7
    * vs 27.4–33.0 with maxtask 10.1 → 2.6 s) — the r13 premise holds in
    * its band. The full default ladder is now: n ≤ floor → plain joins
    * + AQE; floor < n ≤ GraphBroadcastNodeBudget → whole-state-frame
    * broadcast (measured better still); above → hub routing. The
    * planted-fixture laws keep every channel correct by forcing the
    * floor to 0 in tests. Env dial: SPARK_GRAFT_HUB_MIN_NODES.
    */
  private[graft] def HubRoutingMinNodes: Long =
    sys.env.get("SPARK_GRAFT_HUB_MIN_NODES").map(_.toLong)
      .getOrElse(625000L)

  /** Degree-probed hub set: node ids whose symmetric-edge count exceeds
    * the budget. One aggregate + a hub-sized driver boundary (the L3
    * grid-collect posture).
    */
  private[graft] def hubNodes(sym: DataFrame, idCol: String,
                              budget: Long = HubDegreeBudget): Seq[Long] =
    sym.groupBy(col(idCol)).agg(count(lit(1)).as("d"))
      .filter(col("d") > budget).select(col(idCol))
      .collect().map(_.getLong(0)).toSeq

  /** Round-14 (verdict #3): the hub set SERVED FROM TABLE STATISTICS —
    * the X286x discipline the PIT router gained in r13, applied to the
    * graph probe. The degree profile is a pure function of the edge
    * frame's source table (every routed caller's edges derive from
    * `$dir/lineitem.parquet` via the Layer-shared pair frame), so the
    * probe result persists keyed by a metadata-only source signature +
    * the probe context (caller, id column, budget); a fresh entry serves
    * the hub set with NO degree aggregate, a rewritten corpus flips the
    * signature and re-probes. OpsSpec mirrors the PIT store's
    * three-behavior laws (probe-and-persist / serve-without-scan /
    * stale-re-probe) on this entry.
    */
  private[graft] def hubNodesServed(spark: SparkSession, dir: String, key: String,
                                    budget: Long)(probe: => Seq[Long]): Seq[Long] = {
    val sig = Stats.sourceSignature(spark, dir, Seq("lineitem"))
    val fileName = "hub_nodes-" + Stats.md5(s"$dir|$key|$budget").take(16) + ".gstats"
    Stats.served(spark, fileName, sig, "hubs")(probe.mkString(",")) match {
      case "" => Seq.empty
      case s  => s.split(',').toSeq.map(_.trim.toLong)
    }
  }

  private[graft] def kCoreOf(edges: DataFrame, k: Int, maxRounds: Int,
                             hubBudget: Long = HubDegreeBudget,
                             served: Option[(SparkSession, String)] = None,
                             broadcastNodeBudget: Long = GraphBroadcastNodeBudget,
                             hubMinNodes: Long = HubRoutingMinNodes): DataFrame = {
    val sym = edges.select(col("a"), col("b"))
      .unionAll(edges.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    // hub routing (round-13): sym splits ONCE into four STATIC channels
    // by endpoint hub-membership (each checkpointed — the r13 A/B
    // measured this against flag-filters over the one frame, and the
    // channel materialization wins: per-round flag filters re-scan the
    // full 193 M-row frame 4× per round, while the split pays one extra
    // pass total and each round reads only channel-sized blocks). Per
    // round the hub endpoints filter against the ≤|hubs|-row alive set
    // map-side (isin over a driver boundary) while non-hub endpoints
    // keep the uniform alive join — the hub's adjacency never lands on
    // one reducer AND never crosses the per-round exchange at all
    // (gh100: task total 900 → 489 s, maxtask 25.6 → 12.1 s). hubs
    // empty (every gate corpus) degenerates to the exact pre-r13
    // two-join plan.
    var alive = sym.select(col("a").as("id")).distinct().localCheckpoint()
    var n = alive.count()
    // whole-alive-set broadcast channel, BAND-GATED (r15: real exchange
    // above the floor AND frame under budget — see the class note at
    // GraphBroadcastNodeBudget): the alive frame is one BIGINT per node
    // and only SHRINKS, so inside the band both per-round joins are
    // map-side and the edge frame never crosses an exchange — decided
    // once up front (n is monotone)
    val useBcast = n > hubMinNodes && n <= broadcastNodeBudget
    lazy val hubs = if (n <= hubMinNodes) Seq.empty[Long] else served match {
      case Some((sp, dir)) =>
        hubNodesServed(sp, dir, "kcore|a", hubBudget)(hubNodes(sym, "a", hubBudget))
      case None => hubNodes(sym, "a", hubBudget)
    }
    // channels materialize ONLY on the shuffle path (lazy: the broadcast
    // channel needs neither the hub probe nor the split's checkpoints)
    lazy val (cHH, cHx, cxH, cxx) =
      if (hubs.isEmpty) (null, null, null, sym)
      else {
        val ah = col("a").isin(hubs: _*)
        val bh = col("b").isin(hubs: _*)
        (sym.filter(ah && bh).localCheckpoint(),
          sym.filter(ah && !bh).localCheckpoint(),
          sym.filter(!ah && bh).localCheckpoint(),
          sym.filter(!ah && !bh).localCheckpoint())
      }
    def aliveEdges(alive: DataFrame): DataFrame =
      if (useBcast)
        sym.join(broadcast(alive.select(col("id").as("a"))), "a")
          .join(broadcast(alive.select(col("id").as("b"))), "b")
      else if (hubs.isEmpty)
        cxx.join(alive.select(col("id").as("a")), "a")
          .join(alive.select(col("id").as("b")), "b")
      else {
        val aliveHub = alive.filter(col("id").isin(hubs: _*))
          .collect().map(_.getLong(0)).toSeq // ≤ |hubs| rows
        val aIn = col("a").isin(aliveHub: _*)
        val bIn = col("b").isin(aliveHub: _*)
        // USING-joins put the join key FIRST (a join on "b" yields
        // columns (b, a)) and unionAll is POSITIONAL, so every branch
        // must be normalized to (a, b) BY NAME before the union — the
        // round-14 fix for the r13 endpoint-swap bug that collapsed hub
        // degrees to hub-hub edges (OpsSpec pins a hub that must
        // SURVIVE the core, which the swap demonstrably evicts).
        cHH.filter(aIn && bIn).select(col("a"), col("b"))
          .unionAll(cHx.filter(aIn).join(alive.select(col("id").as("b")), "b")
            .select(col("a"), col("b")))
          .unionAll(cxH.filter(bIn).join(alive.select(col("id").as("a")), "a")
            .select(col("a"), col("b")))
          .unionAll(cxx.join(alive.select(col("id").as("a")), "a")
            .join(alive.select(col("id").as("b")), "b")
            .select(col("a"), col("b")))
      }
    var rounds = 0
    var done = false
    while (!done && rounds < maxRounds) {
      val deg = aliveEdges(alive).groupBy("a").agg(count(lit(1)).as("deg"))
      val next = deg.filter(col("deg") >= k).select(col("a").as("id"))
        .localCheckpoint()
      val m = next.count()
      done = m == n
      alive = next
      n = m
      rounds += 1
    }
    aliveEdges(alive)
      .groupBy("a").agg(count(lit(1)).as("core_deg"))
      .select(col("a").as("id"), col("core_deg"))
  }

  /** x200: 3-core of the co-purchase graph — the density-peeling
    * community backbone (Seidman '83; Batagelj–Zaveršnik's peel is the
    * distributed-friendly formulation): parts that survive iterated
    * removal of degree-<3 nodes, i.e. the subgraph where every item has
    * ≥3 co-purchase partners THAT THEMSELVES qualify. The recursion the
    * flat x97 pair counts can't see: a part with 3 weak partners peels
    * once the partners do. Edges are the Layer-shared apriori-pruned
    * pair frame; 12 peel rounds bound the recursion in BOTH engines
    * (measured fixpoint: 10 rounds at sf0.01, 2 at sf0.1, 0 at
    * sf0.001), and the DuckDB twin unrolls the identical 12 rounds.
    */
  def kCoreParts(spark: SparkSession, dir: String): DataFrame =
    kCoreOf(graft.ext.Associations.copurchasePairs(spark, dir), 3, 12,
      served = Some((spark, dir)))
      .select(col("id").as("l_partkey"), col("core_deg"))
      .orderBy("l_partkey")

  val kCoreOracle: String = {
    // MATERIALIZED: each round references the previous CTE twice — the
    // default inlining would expand the 12-round chain into 2^12 scans
    // of the base table (observed as fd exhaustion in DuckDB)
    val base =
      """WITH baskets AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |p AS MATERIALIZED (SELECT x.l_partkey AS a, y.l_partkey AS b, COUNT(*) AS n_ab
        |      FROM baskets x JOIN baskets y
        |        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |sym AS MATERIALIZED (SELECT a, b FROM p UNION ALL SELECT b, a FROM p),
        |a0 AS MATERIALIZED (SELECT DISTINCT a AS id FROM sym)""".stripMargin
    val rounds = (1 to 12).map { i =>
      s"""a$i AS MATERIALIZED (SELECT s.a AS id FROM sym s
         |  JOIN a${i - 1} x ON x.id = s.a JOIN a${i - 1} y ON y.id = s.b
         |  GROUP BY 1 HAVING COUNT(*) >= 3)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$rounds
       |SELECT s.a AS l_partkey, COUNT(*) AS core_deg
       |FROM sym s JOIN a12 x ON x.id = s.a JOIN a12 y ON y.id = s.b
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** x231: label-propagation communities (Raghavan et al. 2007,
    * synchronous variant) over the weighted co-purchase graph — the
    * cheap community detector that complements x200's density backbone
    * (k-core says WHO is in a dense region; LPA says WHICH region): each
    * node adopts the label with the largest co-purchase weight among its
    * neighbors, ties to the SMALLEST label, all nodes in lockstep, 10
    * rounds from label = own id.
    *
    * Exactness: weights and labels are integers, so each round's argmax
    * collapses to ONE integer key — score·2³² + (2³²−1 − label) — whose
    * plain `max` both engines evaluate identically: no structs, no
    * floats, no order-dependence anywhere, which is what lets the DuckDB
    * oracle run the SAME 10 rounds as a recursive CTE with GROUP BY and
    * hash-match every node's final community. Scale shape: edges are the
    * Layer-shared apriori-pruned pair frame (linear in orders); each
    * round is one join + two integer aggregates shuffled on node id, and
    * `localCheckpoint` bounds lineage per round (the kCoreOf
    * discipline). The synchronous update is exactly the
    * bulk-synchronous-parallel step a 1000-executor Pregel run executes.
    */
  def labelPropagation(spark: SparkSession, dir: String, rounds: Int = 10): DataFrame = {
    val pairs = graft.ext.Associations.copurchasePairs(spark, dir)
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"), col("n_ab").as("w"))
      .unionAll(pairs.select(col("b").as("src"), col("a").as("dst"), col("n_ab").as("w")))
      .localCheckpoint()
    val labels = lpaLabels(edges, rounds, served = Some((spark, dir)))
    val sizes = labels.groupBy("label").agg(count(lit(1)).as("community_size"))
    labels.join(sizes, "label")
      .select(col("node").as("l_partkey"), col("label").as("community"),
        col("community_size"))
      .orderBy("l_partkey")
  }

  /** Frame-level LPA rounds over symmetrized weighted edges
    * (src, dst, w) → converged (node, label). Hub routing (round-13, the
    * kCoreOf discipline): the per-round join keys on dst, so a power-law
    * hub's whole adjacency lands on one reducer task. Edges split ONCE
    * by dst hub-membership; per round the hub channel joins a BROADCAST
    * of the ≤|hubs|-row label slice while the uniform remainder keeps
    * the shuffle join. Empty hubs (every gate corpus) = the exact
    * pre-r13 single-join plan. Output identical either way: the
    * union-then-aggregate sees the same (src, label, w) multiset.
    */
  /** Node-count budget for the iterative family's WHOLE-STATE-FRAME
    * broadcast channel (round-14, verdict #7): every per-round join in
    * this family pairs the |edges|-row frame against a per-NODE state
    * frame (LPA labels, k-core alive set, PageRank ranks — each ≤ two
    * BIGINTs/row), and when the state side is too big to broadcast the
    * join ships the EDGE frame through a node-keyed exchange — at
    * hub-m100 that is ~190 M edge rows shuffled PER ROUND, and it is
    * why r13's hub routing halved the maxtask but left totals ~par
    * (the hub's rows skipped the join, everyone else's still crossed
    * the exchange).
    *
    * BAND-GATED, CALIBRATED FROM MEASUREMENT (SCALE.md r14+r15). Two
    * measurements bound the channel from both sides:
    *  - BELOW the routing floor (r14, gh100: 301 k nodes, state
    *    ~2.4 MB) the state frame is under Spark's 10 MB auto-broadcast
    *    threshold, AQE already converts every per-round join to a
    *    broadcast at runtime, and the explicit hint measured 2.3×
    *    WORSE on k-core (2313 vs 936 task-s) — it duplicates AQE's
    *    decision while discarding AQE's runtime re-planning of the
    *    downstream aggregate exchanges. The channel must stay OFF
    *    there, which is why the gate requires n > hubMinNodes.
    *  - ABOVE the floor (r15, the wide-dial corpus: 2.03 M nodes /
    *    9.9 M sym edges / 1.48 M-edge hub — the first corpus in the
    *    band the r14 comment said this box could not build) the
    *    per-round join is a REAL node-keyed exchange and the channel
    *    is the measured BEST plan: vs the uniform shuffle it read
    *    x200 37.5 vs 58.8–64.6 s (task 298 vs 507–585 s), x231 36.2
    *    vs 57–58 s, x283 19.1 vs 27.4–33.0 s with the hub straggler
    *    gone (maxtask 1.5 vs 10.1 s) — and it matched-or-beat hub
    *    routing on every query (routing: 44.8/33.1/20.7 s). Shuffle
    *    volume tells the why: 102 M vs 247–268 M rows on k-core.
    *
    * Default 4 M nodes (~64 MB state frame): inside (floor, 4 M] the
    * explicit broadcast is the plan; above it per-round re-broadcast
    * cost and executor memory take over and HUB ROUTING is the scale
    * path (measured winning 1.4–1.7× over unrouted at 2 M and 5 M
    * nodes — SCALE.md r15). Env dial: SPARK_GRAFT_GRAPH_BCAST_BUDGET.
    * Three-channel row-for-row equivalence is pinned in OpsSpec
    * regardless of the dial.
    */
  private[graft] def GraphBroadcastNodeBudget: Long =
    sys.env.get("SPARK_GRAFT_GRAPH_BCAST_BUDGET").map(_.toLong)
      .getOrElse(4000000L)

  private[graft] def lpaLabels(edges: DataFrame, rounds: Int,
                               hubBudget: Long = HubDegreeBudget,
                               served: Option[(SparkSession, String)] = None,
                               broadcastNodeBudget: Long = GraphBroadcastNodeBudget,
                               hubMinNodes: Long = HubRoutingMinNodes): DataFrame = {
    val base = 4294967296L // 2^32 > any partkey; score·base + label stays < 2^63
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint()
    val nNodes = labels.count() // control-plane scalar, the x110 posture
    lazy val hubs = if (nNodes <= hubMinNodes) Seq.empty[Long] else served match {
      case Some((sp, dir)) =>
        hubNodesServed(sp, dir, "lpa|dst", hubBudget)(hubNodes(edges, "dst", hubBudget))
      case None => hubNodes(edges, "dst", hubBudget)
    }
    // channels materialize ONLY on the shuffle path (lazy: the broadcast
    // channel needs neither the hub probe nor the split's checkpoints)
    lazy val (eHub, eRest) =
      if (hubs.isEmpty) (null, edges)
      else (edges.filter(col("dst").isin(hubs: _*)).localCheckpoint(),
        edges.filter(!col("dst").isin(hubs: _*)).localCheckpoint())
    def joined(labels: DataFrame): DataFrame =
      // band-gated like kCoreOf/pagerankRanks (r15): explicit broadcast
      // only where the exchange is real (above the floor) and the label
      // frame fits the budget
      if (nNodes > hubMinNodes && nNodes <= broadcastNodeBudget)
        edges.join(broadcast(labels), col("dst") === col("node"))
      else if (hubs.isEmpty) eRest.join(labels, col("dst") === col("node"))
      else eHub.join(broadcast(labels.filter(col("node").isin(hubs: _*))),
          col("dst") === col("node"))
        .unionAll(eRest.join(labels, col("dst") === col("node")))
    (0 until rounds).foreach { _ =>
      labels = joined(labels)
        .groupBy(col("src"), col("label")).agg(sum(col("w")).as("s"))
        .groupBy(col("src"))
        .agg(max(col("s") * lit(base) + (lit(base - 1L) - col("label"))).as("key"))
        .select(col("src").as("node"),
          (lit(base - 1L) - (col("key") % lit(base))).as("label"))
        .localCheckpoint()
    }
    labels
  }

  /** x241: harmonic closeness centrality (Marchiori & Latora 2000 — the
    * closeness variant that stays well-defined on disconnected graphs)
    * over the undirected nation trade graph: C_H(s) = Σ_{v≠s} 1/d(s,v),
    * the "how quickly can s reach everyone" complement to x110's
    * PageRank (prestige), x136's triangles (cohesion), x200's k-core
    * (density) and x231's LPA (membership). All-pairs distances come
    * from 6 Bellman–Ford rounds run as ONE relational iteration: the
    * state is the full (src, node, dist) table and each round is a join
    * against the hop-augmented edge list (self-loops at hop 0 make the
    * step a single MIN aggregate — no second recursive reference), which
    * is exactly the Pregel/BSP shape at cluster scale. Everything is
    * integer: distances are hop counts, and each 1/d term quantizes as
    * the exact integer division 10⁶ div d BEFORE the sum, so the
    * centrality is an exact BIGINT — both engines run the identical six
    * rounds and hash-match every score.
    */
  def harmonicCentrality(spark: SparkSession, dir: String, rounds: Int = 6): DataFrame = {
    val dirEdges = tradeEdges(spark, dir)
    val und = dirEdges.select(col("src"), col("dst"))
      .unionAll(dirEdges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val hopEdges = und.withColumn("hop", lit(1L))
      .unionAll(und.select(col("src")).distinct()
        .select(col("src"), col("src").as("dst"), lit(0L).as("hop")))
      .localCheckpoint()
    var state = und.select(col("src")).distinct()
      .select(col("src").as("s"), col("src").as("node"), lit(0L).as("dist"))
      .localCheckpoint()
    (0 until rounds).foreach { _ =>
      state = state.join(hopEdges, col("node") === col("src"))
        .groupBy(col("s"), col("dst"))
        .agg(min(col("dist") + col("hop")).as("dist"))
        .select(col("s"), col("dst").as("node"), col("dist"))
        .localCheckpoint()
    }
    state.filter(col("dist") > 0L)
      .groupBy(col("s"))
      .agg(count(lit(1)).as("n_reached"),
        sum(expr("1000000 div dist")).as("harm_e6"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))), col("s") === col("n_nationkey"))
      .select(col("s").cast("long").as("nationkey"), col("n_name").as("nation"),
        col("n_reached"), col("harm_e6"))
      .orderBy("nationkey")
  }

  val harmonicOracle: String =
    """WITH RECURSIVE
      |de AS (SELECT c.c_nationkey AS src, s.s_nationkey AS dst
      |       FROM lineitem l
      |       JOIN orders o ON l.l_orderkey = o.o_orderkey
      |       JOIN customer c ON o.o_custkey = c.c_custkey
      |       JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |       GROUP BY 1, 2),
      |und AS (SELECT DISTINCT src, dst FROM
      |        (SELECT src, dst FROM de UNION ALL SELECT dst, src FROM de)),
      |nodes AS (SELECT DISTINCT src FROM und),
      |ee AS MATERIALIZED (
      |  SELECT src, dst, 1 AS hop FROM und
      |  UNION ALL SELECT src, src, 0 FROM nodes),
      |it AS (
      |  SELECT 0 AS t, src AS s, src AS node, 0 AS dist FROM nodes
      |  UNION ALL
      |  SELECT t + 1, s, ee.dst AS node, MIN(dist + hop) AS dist
      |  FROM it JOIN ee ON ee.src = it.node
      |  WHERE t < 6 GROUP BY 1, 2, 3)
      |SELECT CAST(f.s AS BIGINT) AS nationkey, n.n_name AS nation,
      |       COUNT(*) AS n_reached,
      |       CAST(SUM(1000000 // dist) AS BIGINT) AS harm_e6
      |FROM (SELECT s, node, dist FROM it WHERE t = 6) f
      |JOIN nation n ON n.n_nationkey = f.s
      |WHERE dist > 0
      |GROUP BY 1, 2 ORDER BY nationkey""".stripMargin

  val labelPropagationOracle: String =
    """WITH RECURSIVE
      |bsk AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |pairs AS MATERIALIZED (
      |  SELECT a.l_partkey AS a, b.l_partkey AS b, COUNT(*) AS n_ab
      |  FROM bsk a JOIN bsk b ON a.l_orderkey = b.l_orderkey
      |                       AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |e AS MATERIALIZED (
      |  SELECT a AS src, b AS dst, n_ab AS w FROM pairs
      |  UNION ALL SELECT b, a, n_ab FROM pairs),
      |it AS (
      |  SELECT src AS node, src AS label, 0 AS t FROM (SELECT DISTINCT src FROM e)
      |  UNION ALL
      |  SELECT node, 4294967295 - (MAX(key) % 4294967296) AS label, t + 1
      |  FROM (SELECT e.src AS node, it.t AS t,
      |               SUM(e.w) * 4294967296 + (4294967295 - it.label) AS key
      |        FROM e JOIN it ON it.node = e.dst
      |        GROUP BY e.src, it.t, it.label) g
      |  WHERE t < 10 GROUP BY node, t),
      |fin AS (SELECT node, label FROM it WHERE t = 10),
      |sz AS (SELECT label, COUNT(*) AS community_size FROM fin GROUP BY 1)
      |SELECT CAST(node AS BIGINT) AS l_partkey,
      |       CAST(fin.label AS BIGINT) AS community,
      |       CAST(community_size AS BIGINT) AS community_size
      |FROM fin JOIN sz USING (label) ORDER BY l_partkey""".stripMargin
}
