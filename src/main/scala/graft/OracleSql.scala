package graft

/** DuckDB oracle SQL for `SparkEntry.oracleSql`. Each CTE mirrors one
  * derivation in [[graft.insta.Insta]] exactly (same key ordering, same
  * casts, same ROUND placement) so the driver's hash compare matches
  * byte-for-byte. DuckDB specifics: `/` on integers is float division (same
  * as Spark), SUM(BIGINT) → HUGEINT so every integer SUM is cast back to
  * BIGINT, dayofweek() is 0=Sunday..6 (Spark dayofweek() is 1..7, shifted on
  * the Spark side).
  */
object OracleSql {

  /** ≙ Insta.ordersI (F.py:24–26 semantics). */
  val ordersI: String =
    """orders_i AS (
      |  SELECT o_orderkey AS orderID, o_custkey AS userID,
      |         CAST(CASE WHEN o_orderstatus = 'F' THEN 0
      |                   WHEN o_orderstatus = 'O' THEN 1
      |                   ELSE 2 END AS BIGINT) AS eval_set,
      |         CAST(ROW_NUMBER() OVER w AS BIGINT) AS order_number,
      |         CAST(dayofweek(o_orderdate) AS BIGINT) AS order_dow,
      |         CAST(hour(o_orderdate) AS BIGINT) AS order_hod,
      |         CAST(COALESCE(date_diff('day', LAG(o_orderdate) OVER w, o_orderdate), 0) AS BIGINT) AS days_since
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))""".stripMargin

  /** ≙ Insta.basket. */
  val basket: String =
    """basket AS (
      |  SELECT l.l_orderkey AS orderID, o.userID, l.l_partkey AS productID,
      |         CAST(l.l_linenumber AS BIGINT) AS cart_order, o.eval_set, o.order_number,
      |         CAST(CASE WHEN o.order_number >
      |                MIN(o.order_number) OVER (PARTITION BY o.userID, l.l_partkey)
      |              THEN 1 ELSE 0 END AS BIGINT) AS reordered
      |  FROM lineitem l JOIN orders_i o ON l.l_orderkey = o.orderID)""".stripMargin

  /** ≙ Insta.productFeatures (A1–A3). */
  val productFeats: String =
    """product_feats AS (
      |  SELECT productID, COUNT(*) AS numorders,
      |         CAST(SUM(reordered) AS DOUBLE) AS numreorders,
      |         ROUND(CAST(SUM(reordered) AS DOUBLE) / COUNT(*), 4) AS reorder_ratio
      |  FROM basket WHERE eval_set = 0 GROUP BY productID)""".stripMargin

  /** ≙ Insta.userOrderFeatures (A4–A5). */
  val userOrderFeats: String =
    """user_order_feats AS (
      |  SELECT userID, ROUND(AVG(days_since), 4) AS avg_orderingGap,
      |         COUNT(*) AS total_orders
      |  FROM orders_i GROUP BY userID)""".stripMargin

  /** ≙ Insta.userPriorFeatures (A6–A8). */
  val userPriorFeats: String =
    """user_prior_feats AS (
      |  SELECT userID, COUNT(*) AS items_purchased_total,
      |         list_sort(list_distinct(list(productID))) AS all_items,
      |         COUNT(DISTINCT productID) AS distinct_items
      |  FROM basket WHERE eval_set = 0 GROUP BY userID)""".stripMargin

  /** ≙ Insta.usersFinal (J3 + A9). */
  val usersFinal: String =
    """users_final AS (
      |  SELECT p.userID, p.items_purchased_total, p.all_items, p.distinct_items,
      |         o.avg_orderingGap, o.total_orders,
      |         ROUND(p.items_purchased_total / o.total_orders, 4) AS average_items
      |  FROM user_prior_feats p LEFT JOIN user_order_feats o ON p.userID = o.userID)""".stripMargin

  /** ≙ Insta.userProductFeatures (A10/W2 via arg_max ≙ max_by). */
  val userProductFeats: String =
    """up_feats AS (
      |  SELECT userID, productID, COUNT(*) AS up_numorders,
      |         arg_max(orderID, order_number) AS final_orderId,
      |         CAST(SUM(cart_order) AS BIGINT) AS sum_cartOrder
      |  FROM basket WHERE eval_set = 0 GROUP BY userID, productID)""".stripMargin

  /** ≙ Insta.candidates for eval sets given as a SQL IN-list (J6). */
  def candidates(evalSets: String): String =
    s"""user_items AS (
       |  SELECT DISTINCT userID, productID FROM basket WHERE eval_set = 0),
       |cand AS (
       |  SELECT o.orderID, o.userID, u.productID, o.order_dow, o.order_hod, o.days_since
       |  FROM orders_i o JOIN user_items u USING (userID)
       |  WHERE o.eval_set IN ($evalSets))""".stripMargin

  val trainPairs: String =
    """train_pairs AS (
      |  SELECT DISTINCT orderID, productID FROM basket WHERE eval_set = 1)""".stripMargin

  private def withCtes(ctes: String*)(body: String): String =
    "WITH " + ctes.mkString(",\n") + "\n" + body

  // ---- per-query oracle SQL -------------------------------------------

  val q01_scan_project: String =
    """SELECT l_orderkey, l_partkey, CAST(l_linenumber AS BIGINT) AS l_linenumber
      |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey""".stripMargin

  val q02_ingest_orders: String = withCtes(ordersI)(
    "SELECT * FROM orders_i ORDER BY orderID")

  val q03_filter_prior: String = withCtes(ordersI)(
    "SELECT orderID, userID, order_number, days_since FROM orders_i WHERE eval_set = 0 ORDER BY orderID")

  val q04_semi_join: String = withCtes(ordersI)(
    """SELECT l_orderkey AS orderID, l_partkey AS productID, CAST(l_linenumber AS BIGINT) AS cart_order
      |FROM lineitem
      |WHERE l_orderkey IN (SELECT orderID FROM orders_i WHERE eval_set = 0)
      |ORDER BY orderID, cart_order, productID""".stripMargin)

  val q05_product_features: String = withCtes(ordersI, basket, productFeats)(
    "SELECT * FROM product_feats ORDER BY productID")

  val q06_products_dim_join: String = withCtes(ordersI, basket, productFeats)(
    """SELECT p.p_partkey AS productID, CAST(p.p_size AS BIGINT) AS aisle_id,
      |       CAST(substr(p.p_brand, 7) AS BIGINT) AS dep_id,
      |       f.numorders, f.reorder_ratio
      |FROM part p JOIN product_feats f ON p.p_partkey = f.productID
      |ORDER BY productID""".stripMargin)

  val q07_fact_join: String = withCtes(ordersI, basket)(
    """SELECT b.orderID, b.productID, b.cart_order, b.reordered,
      |       o.order_dow, o.order_hod, o.days_since
      |FROM basket b JOIN orders_i o ON b.orderID = o.orderID
      |WHERE b.eval_set = 0
      |ORDER BY b.orderID, b.cart_order, b.productID""".stripMargin)

  val q08_user_order_features: String = withCtes(ordersI, userOrderFeats)(
    "SELECT * FROM user_order_feats ORDER BY userID")

  /** all_items compares as a canonical space-joined string (array cells
    * break the driver's pandas sort; the layer stays array-typed).
    */
  val q09_user_prior_features: String = withCtes(ordersI, basket, userPriorFeats)(
    """SELECT userID, items_purchased_total,
      |       array_to_string(all_items, ' ') AS all_items, distinct_items
      |FROM user_prior_feats ORDER BY userID""".stripMargin)

  val q10_users_final: String =
    withCtes(ordersI, basket, userOrderFeats, userPriorFeats, usersFinal)(
      """SELECT userID, items_purchased_total, distinct_items, avg_orderingGap,
        |       total_orders, average_items
        |FROM users_final ORDER BY userID""".stripMargin)

  val q11_userproduct_features: String = withCtes(ordersI, basket, userProductFeats)(
    "SELECT * FROM up_feats ORDER BY userID, productID")

  val q12_candidates: String = withCtes(ordersI, basket, candidates("1, 2"))(
    "SELECT orderID, userID, productID FROM cand ORDER BY orderID, productID")

  val q13_labels: String =
    withCtes(ordersI, basket, candidates("1, 2"), trainPairs)(
      """SELECT c.orderID, c.productID,
        |       CAST(CASE WHEN t.orderID IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS label
        |FROM cand c LEFT JOIN train_pairs t
        |  ON c.orderID = t.orderID AND c.productID = t.productID
        |ORDER BY c.orderID, c.productID""".stripMargin)

  val q14_feature_matrix: String =
    withCtes(ordersI, basket, productFeats, userOrderFeats, userPriorFeats,
      usersFinal, userProductFeats, candidates("1"), trainPairs)(
      """SELECT c.orderID, c.productID,
        |       CAST(CASE WHEN t.orderID IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS label,
        |       uf.total_orders AS user_SumOrders,
        |       uf.items_purchased_total AS user_items_purchased_total,
        |       uf.distinct_items,
        |       uf.avg_orderingGap AS user_avg_orderingGap,
        |       uf.average_items AS user_average_items,
        |       c.order_dow, c.order_hod, c.days_since,
        |       CASE WHEN uf.avg_orderingGap = 0 THEN 0.0
        |            ELSE ROUND(c.days_since / uf.avg_orderingGap, 4) END AS days_sinceProportion,
        |       pf.numorders, pf.numreorders,
        |       pf.reorder_ratio AS prod_reorderProportion,
        |       up.up_numorders AS userProduct_orders,
        |       ROUND(up.up_numorders / uf.total_orders, 4) AS userProduct_ordersRatio,
        |       ROUND(up.sum_cartOrder / up.up_numorders, 4) AS userProduct_average_cartOrder,
        |       ROUND(up.up_numorders / uf.total_orders, 4) AS userProduct_reorderProportion,
        |       uf.total_orders - oi.order_number AS userProduct_orders_sinceFinal
        |FROM cand c
        |JOIN users_final uf ON c.userID = uf.userID
        |JOIN product_feats pf ON c.productID = pf.productID
        |JOIN up_feats up ON c.userID = up.userID AND c.productID = up.productID
        |JOIN orders_i oi ON up.final_orderId = oi.orderID
        |LEFT JOIN train_pairs t ON c.orderID = t.orderID AND c.productID = t.productID
        |ORDER BY c.orderID, c.productID""".stripMargin)

  val q15_submission: String =
    withCtes(ordersI, basket, productFeats, candidates("2"))(
      """SELECT o.orderID,
        |       COALESCE(a.products, 'None') AS products
        |FROM (SELECT orderID FROM orders_i WHERE eval_set = 2) o
        |LEFT JOIN (
        |  SELECT c.orderID,
        |         string_agg(CAST(c.productID AS VARCHAR), ' ' ORDER BY c.productID) AS products
        |  FROM cand c JOIN product_feats pf ON c.productID = pf.productID
        |  WHERE pf.reorder_ratio > 0.19
        |  GROUP BY c.orderID) a USING (orderID)
        |ORDER BY o.orderID""".stripMargin)

  val q16_limit: String = withCtes(ordersI)(
    "SELECT orderID, userID, eval_set FROM orders_i ORDER BY orderID LIMIT 10000")

  val q17_counts: String = withCtes(ordersI)(
    "SELECT eval_set, COUNT(*) AS n FROM orders_i GROUP BY eval_set ORDER BY eval_set")

  /** Reads the CSV file the q18 query exports (run-scoped path from
    * [[RunScoped.ioDir]], interpolated in this JVM at dump time, so the
    * oracle sees the same run's dump at any sf and concurrent runners
    * stay isolated). ignore_errors mirrors Spark's DROPMALFORMED: the
    * three planted bad lines must vanish on both sides.
    */
  /** ≙ ReorderModel.gainsTable (x265): the same cand/train_pairs CTEs as
    * q13, the integer heuristic score, and the full rank → decile →
    * rate/lift/cumulative-gain pipeline in integer arithmetic.
    */
  val x265_gains_table: String =
    withCtes(ordersI, basket, productFeats, candidates("1, 2"), trainPairs,
      """scored AS (
        |  SELECT c.orderID, c.productID,
        |         CASE WHEN t.orderID IS NOT NULL THEN 1 ELSE 0 END AS label,
        |         (CAST(pf.numreorders AS BIGINT) * 1000000) // pf.numorders AS score_e6
        |  FROM cand c
        |  JOIN product_feats pf ON pf.productID = c.productID
        |  LEFT JOIN train_pairs t
        |    ON t.orderID = c.orderID AND t.productID = c.productID)""".stripMargin,
      """rk AS (SELECT *, ROW_NUMBER() OVER (ORDER BY score_e6 DESC, orderID, productID) AS rnk
        |       FROM scored)""".stripMargin,
      """tot AS (SELECT COUNT(*) AS n_total, CAST(SUM(label) AS BIGINT) AS pos_total
        |        FROM scored)""".stripMargin,
      """dd AS (SELECT ((rnk - 1) * 10) // n_total AS decile,
        |              COUNT(*) AS n_rows, CAST(SUM(label) AS BIGINT) AS n_pos
        |       FROM rk, tot GROUP BY 1)""".stripMargin,
      """cg AS (SELECT dd.decile, dd.n_rows, dd.n_pos,
        |              SUM(dd.n_pos) OVER (ORDER BY dd.decile) AS cum_pos,
        |              t.n_total, t.pos_total
        |       FROM dd, tot t)""".stripMargin)(
      """SELECT CAST(decile AS BIGINT) AS decile, n_rows, n_pos,
        |       CAST((n_pos * 1000000) // n_rows AS BIGINT) AS rate_e6,
        |       CAST((CAST(n_pos AS HUGEINT) * n_total * 1000000)
        |            // (CAST(n_rows AS HUGEINT) * pos_total) AS BIGINT) AS lift_e6,
        |       CAST((cum_pos * 1000000) // pos_total AS BIGINT) AS cum_gain_e6
        |FROM cg ORDER BY decile""".stripMargin)

  /** ≙ ReorderModel.averagePrecision (x267): same scored frame and total
    * order as x265; each AP term is the exact integer (cumPos·10⁹) // k.
    */
  val x267_avg_precision: String =
    withCtes(ordersI, basket, productFeats, candidates("1, 2"), trainPairs,
      """scored AS (
        |  SELECT c.orderID, c.productID,
        |         CASE WHEN t.orderID IS NOT NULL THEN 1 ELSE 0 END AS label,
        |         (CAST(pf.numreorders AS BIGINT) * 1000000) // pf.numorders AS score_e6
        |  FROM cand c
        |  JOIN product_feats pf ON pf.productID = c.productID
        |  LEFT JOIN train_pairs t
        |    ON t.orderID = c.orderID AND t.productID = c.productID)""".stripMargin,
      """cm AS (
        |  SELECT label,
        |         ROW_NUMBER() OVER wo AS rnk,
        |         SUM(label) OVER (ORDER BY score_e6 DESC, orderID, productID
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumpos
        |  FROM scored
        |  WINDOW wo AS (ORDER BY score_e6 DESC, orderID, productID))""".stripMargin)(
      """SELECT COUNT(*) AS n, CAST(SUM(label) AS BIGINT) AS n_pos,
        |       CAST(SUM(CASE WHEN label = 1
        |                     THEN (cumpos * 1000000000) // rnk ELSE 0 END)
        |            // SUM(label) AS BIGINT) AS ap_e9,
        |       CAST((CAST(SUM(label) AS HUGEINT) * 1000000000) // COUNT(*) AS BIGINT)
        |         AS prevalence_e9
        |FROM cm""".stripMargin)

  val q18_csv_roundtrip: String =
    s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |       o_orderdate, o_orderpriority
      |FROM read_csv('${RunScoped.ioDir}/orders/part-*',
      |  header = true, delim = ',', auto_detect = false,
      |  columns = {'o_orderkey': 'BIGINT', 'o_custkey': 'BIGINT',
      |             'o_orderstatus': 'VARCHAR', 'o_totalprice': 'DOUBLE',
      |             'o_orderdate': 'DATE', 'o_orderpriority': 'VARCHAR'},
      |  ignore_errors = true)
      |ORDER BY o_orderkey""".stripMargin

  /** JSONL twin of q18. DuckDB's ignore_errors NULLs failing values where
    * Spark's DROPMALFORMED drops the whole line, so the oracle drops rows
    * whose key came back NULL — every planted bad line nulls doc_id, every
    * valid line has one.
    */
  val q19_jsonl_roundtrip: String =
    s"""SELECT doc_id, text, lang, source, n_chars
      |FROM read_json('${RunScoped.ioDir}/documents/part-*',
      |  format = 'newline_delimited',
      |  columns = {'doc_id': 'BIGINT', 'text': 'VARCHAR', 'lang': 'VARCHAR',
      |             'source': 'VARCHAR', 'n_chars': 'BIGINT'},
      |  ignore_errors = true)
      |WHERE doc_id IS NOT NULL
      |ORDER BY doc_id""".stripMargin
}
