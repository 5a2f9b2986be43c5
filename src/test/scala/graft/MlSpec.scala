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

  test("cross-validation folds partition the matrix; metrics in range; deterministic") {
    val a = ReorderModel.crossValidation(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(a.map(_._1).toSeq === Seq(0L, 1L, 2L))
    // content-addressed folds are disjoint + exhaustive: holdout sizes sum
    // to the full matrix, and every fold is non-degenerate
    val total = graft.insta.Insta.featureMatrix(spark, sf, Seq(1L)).count()
    assert(a.map(_._2).sum === total)
    a.foreach { case (f, n, acc, f1) =>
      assert(n > 0, s"fold $f is empty")
      assert(acc > 0.0 && acc <= 1.0, s"fold $f accuracy=$acc")
      assert(f1 >= 0.0 && f1 <= 1.0, s"fold $f f1=$f1")
    }
    // hash folds + seeded fits ⇒ byte-identical report on a second run
    val b = ReorderModel.crossValidation(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(b.toSeq === a.toSeq, "cross-validation not deterministic")
  }

  test("calibration buckets partition the holdout with in-range means, deterministically") {
    val a = graft.ml.ReorderModel.calibration(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // buckets partition the seeded holdout: same split, same total
    val holdout = graft.ml.ReorderModel.assemble(
      graft.insta.Insta.featureMatrix(spark, sf, Seq(1L)))
      .randomSplit(Array(0.7, 0.3), graft.ml.ReorderModel.seed)(1).count()
    assert(a.map(_._2).sum === holdout)
    a.foreach { case (b, n, nPos, meanP) =>
      assert(nPos >= 0 && nPos <= n)
      // the bucket's mean predicted prob must lie in the bucket's range
      // (half-ulp slack for the e4 rounding at the edges)
      assert(meanP >= b * 1000 - 1 && meanP <= (b + 1) * 1000 + 1,
        s"bucket $b mean $meanP out of range")
    }
    // seeded fit + seeded split ⇒ byte-identical report on a second run
    val b2 = graft.ml.ReorderModel.calibration(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(b2.toSeq === a.toSeq, "calibration not deterministic under the seed")
  }

  test("ALS recommendations cover every user with history, draw from observed items, deterministically") {
    val k = 3
    val recs = ReorderModel.alsRecommendations(spark, sf, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ratings = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("user"), col("l_partkey").as("item"))
    val users = ratings.select("user").distinct().collect().map(_.getLong(0)).toSet
    val items = ratings.select("item").distinct().collect().map(_.getLong(0)).toSet
    // every user with purchase history gets exactly k ranked recs
    assert(recs.map(_._1).toSet === users)
    recs.groupBy(_._1).foreach { case (u, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (1L to k), s"user $u ranks ${rs.toSeq}")
    }
    // recommended items exist in the observed item domain
    recs.foreach { case (_, _, i) => assert(items.contains(i), s"unknown item $i") }
    // same seed, same session, same layout ⇒ identical ranking
    val again = ReorderModel.alsRecommendations(spark, sf, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq === recs.toSeq, "ALS not deterministic under the seed")
  }

  test("ALS dense-id reindex carries key domains past 2^31 (m05 production path)") {
    import spark.implicits._
    // keys deliberately above Int.MaxValue: feeding these to ALS directly
    // would throw (ids are Int); the denseIds dictionary must absorb them
    val big = 5000000000L
    val ratings = Seq(
      (big + 1, big + 10, 3f), (big + 1, big + 11, 1f), (big + 1, big + 12, 2f),
      (big + 2, big + 10, 2f), (big + 2, big + 13, 4f),
      (big + 3, big + 11, 5f), (big + 3, big + 13, 1f), (big + 3, big + 12, 2f))
      .toDF("user_key", "item_key", "rating")
    val recs = ReorderModel.alsRecsFromRatings(spark, ratings, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // coverage: every user with history, exactly k dense ranks, and every
    // recommendation inverse-maps to an ORIGINAL observed item key
    assert(recs.map(_._1).toSet === Set(big + 1, big + 2, big + 3))
    recs.groupBy(_._1).foreach { case (u, rs) =>
      assert(rs.map(_._2).sorted.toSeq === Seq(1L, 2L), s"user $u ranks ${rs.toSeq}")
    }
    val itemDomain = Set(big + 10, big + 11, big + 12, big + 13)
    recs.foreach { case (_, _, i) => assert(itemDomain.contains(i), s"unknown item $i") }
    // the dictionary itself: dense [0, n), order-isomorphic to the keys
    val d = ReorderModel.denseIds(ratings, "user_key", "id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(d.values.toSet === Set(0, 1, 2))
    assert(d(big + 1) < d(big + 2) && d(big + 2) < d(big + 3))
  }

  test("integer k-means matches a full driver-side Lloyd recomputation") {
    import graft.ml.Clustering.{K, Iters}
    val got = graft.ml.Clustering.kmeansCustomers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.map(_._1).toSeq === (0L until K.toLong).toSeq)
    // rebuild the normalized plane via the operator's own quantization
    val prof = graft.Tables.orders(spark, sf)
      .select(col("o_custkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      .groupBy("o_custkey")
      .agg(sum("cents").as("cents"), count(lit(1)).as("n_orders"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val (lox, hix) = (prof.map(_._2).min, prof.map(_._2).max)
    val (loy, hiy) = (prof.map(_._3).min, prof.map(_._3).max)
    val pts = prof.map { case (k, c, o) =>
      (k, if (hix == lox) 0L else (c - lox) * 1000000L / (hix - lox),
        if (hiy == loy) 0L else (o - loy) * 1000000L / (hiy - loy))
    }
    val n = pts.length.toLong
    val byRank = pts.sortBy(p => (p._2, p._1))
    var cs = (0 until K).map { i =>
      val r = ((2L * i + 1) * n) / (2 * K) // 1-based rank of the i-th seed
      val p = byRank((r - 1).toInt)
      (i.toLong, p._2, p._3)
    }.toArray
    def assignAll(): Array[(Long, Long, Long, Long)] = pts.map { case (_, x, y) =>
      val (ci, d2) = cs.map { case (i, cx, cy) =>
        (i, (x - cx) * (x - cx) + (y - cy) * (y - cy))
      }.minBy { case (i, d) => (d, i) }
      (x, y, ci, d2)
    }
    (1 to Iters).foreach { _ =>
      val byC = assignAll().groupBy(_._3)
      cs = cs.map { case (i, px, py) =>
        byC.get(i) match {
          case Some(rows) =>
            val cnt = rows.length.toLong
            (i, (2 * rows.map(_._1).sum + cnt) / (2 * cnt),
              (2 * rows.map(_._2).sum + cnt) / (2 * cnt))
          case None => (i, px, py)
        }
      }
    }
    val fin = assignAll().groupBy(_._3)
    got.foreach { case (i, cx, cy, nCust, wcss) =>
      val (_, ex, ey) = cs(i.toInt)
      assert(cx === ex && cy === ey, s"cluster $i centroid")
      val rows = fin.getOrElse(i, Array.empty)
      assert(nCust === rows.length.toLong, s"cluster $i population")
      assert(BigInt(wcss) === rows.map(r => BigInt(r._4)).sum, s"cluster $i wcss")
    }
    assert(got.map(_._4).sum === n, "populations must cover every customer")
    // the fit is deterministic: a second run returns the identical table
    val again = graft.ml.Clustering.kmeansCustomers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(again.toSeq === got.toSeq)
  }

  test("isotonic calibration is monotone, bounded, and deterministic") {
    val rows = ReorderModel.isotonicCalibration(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq === rows.indices.map(_.toLong), "dense idx")
    rows.sliding(2).foreach {
      case Array(a, b) =>
        // PAVA boundaries strictly increase; pooled predictions never
        // decrease (that is the isotonic constraint itself)
        assert(a._2 < b._2, s"boundaries not increasing at idx ${b._1}")
        assert(a._3 <= b._3, s"predictions decrease at idx ${b._1}")
      case _ =>
    }
    rows.foreach { case (i, _, p) =>
      assert(p >= 0L && p <= 1000000L, s"idx $i prediction outside [0, 1]")
    }
    val again = ReorderModel.isotonicCalibration(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq === rows.toSeq, "PAVA must be deterministic")
  }

  test("feature importances are nonnegative, normalized, and deterministic") {
    val rows = ReorderModel.featureImportance(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._2).toSeq === ReorderModel.featureCols.toSeq,
      "one row per engineered feature, in order")
    rows.foreach { case (_, f, v) =>
      assert(v >= 0L && v <= 1000000L, s"$f importance out of [0, 1]") }
    // Gini importances normalize to 1; each of the |features| roundings
    // moves the e6 sum by at most half a unit
    val total = rows.map(_._3).sum
    assert(math.abs(total - 1000000L) <= rows.length.toLong,
      s"importances sum to $total, not ~1e6")
    val again = ReorderModel.featureImportance(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(again.toSeq === rows.toSeq, "seeded fit must be deterministic")
  }

  test("logistic coefficients are finite, complete, deterministic, and the fit separates") {
    val rows = ReorderModel.logisticCoefficients(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._2).toSeq ===
      ("(intercept)" +: ReorderModel.featureCols.toSeq),
      "intercept then one row per engineered feature, in order")
    // LBFGS converged to something finite and sane (the e6 image of a
    // diverged coefficient would be astronomically large)
    rows.foreach { case (_, f, v, _) =>
      assert(math.abs(v) < 100000000L, s"$f coefficient diverged") }
    // the model actually separates on its own training data: AUC well
    // above coin-flip (regularized LR on these features sits ~0.77)
    val auc = rows.head._4
    assert(auc > 600000L && auc <= 1000000L, s"train AUC $auc out of band")
    // no RNG anywhere in the LBFGS path — refit must reproduce exactly
    val again = ReorderModel.logisticCoefficients(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(again.toSeq === rows.toSeq, "LBFGS refit must be deterministic")
  }

  test("ridge normal equations: residual vanishes against driver moments; fit beats the mean") {
    val rows = ReorderModel.ridgeCoefficients(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._2).toSeq ===
      ("(intercept)" +: ReorderModel.featureCols.toSeq))
    val beta = rows.map(_._3.toDouble / 1e6)
    // driver-side moments from the raw matrix — independent of the
    // operator's aggregate pass
    val feats = ReorderModel.trainFeatures(spark, sf)
      .select((org.apache.spark.sql.functions.lit(1.0d).as("__one") +:
        ReorderModel.featureCols.toIndexedSeq.map(c =>
          org.apache.spark.sql.functions.col(c).cast("double"))) :+
        org.apache.spark.sql.functions.col("label").cast("double").as("label"): _*)
      .collect()
      .map(r => (Array.tabulate(rows.length)(i => r.getDouble(i)), r.getDouble(rows.length)))
    val d = rows.length
    val n = feats.length
    val a = Array.ofDim[Double](d, d); val b = new Array[Double](d)
    feats.foreach { case (x, y) =>
      for (i <- 0 until d; j <- 0 until d) a(i)(j) += x(i) * x(j)
      for (i <- 0 until d) b(i) += x(i) * y
    }
    val lam = 0.001 * n
    for (i <- 1 until d) a(i)(i) += lam
    // (XᵀX + λI)β − Xᵀy ≈ 0 — the e6 rounding of β is the error floor
    val scale = (0 until d).map(i => math.abs(a(i)(i))).max
    for (i <- 0 until d) {
      val r = (0 until d).map(j => a(i)(j) * beta(j)).sum - b(i)
      assert(math.abs(r) <= scale * 1e-5,
        s"normal-equation residual row $i: $r (scale $scale)")
    }
    // the fit explains something: rmse strictly below the label stddev
    val rmse = rows.head._4.toDouble / 1e6
    val mean = feats.map(_._2).sum / n
    val sd = math.sqrt(feats.map(f => (f._2 - mean) * (f._2 - mean)).sum / n)
    assert(rmse < sd, s"ridge rmse $rmse not below label sd $sd")
    // no RNG, closed form — refit must reproduce exactly
    val again = ReorderModel.ridgeCoefficients(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(again.toSeq === rows.toSeq, "closed-form refit must be deterministic")
  }

  test("LOOCV hat-matrix identity equals brute-force leave-one-out refits") {
    val got = ReorderModel.ridgeLoocv(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // brute force: for every row, refit WITHOUT it and score it — the
    // identity the operator replaces with 2 passes, done the hard way
    val xs = ReorderModel.featureCols.toIndexedSeq
    val feats = ReorderModel.trainFeatures(spark, sf)
      .select((org.apache.spark.sql.functions.lit(1.0d).as("__one") +:
        xs.map(c => org.apache.spark.sql.functions.col(c).cast("double"))) :+
        org.apache.spark.sql.functions.col("label").cast("double").as("label"): _*)
      .collect()
      .map(r => (Array.tabulate(xs.length + 1)(i => r.getDouble(i)),
        r.getDouble(xs.length + 1)))
    val d = xs.length + 1; val n = feats.length
    val a0 = Array.ofDim[Double](d, d); val b0 = new Array[Double](d)
    feats.foreach { case (x, y) =>
      for (i <- 0 until d; j <- 0 until d) a0(i)(j) += x(i) * x(j)
      for (i <- 0 until d) b0(i) += x(i) * y
    }
    got.foreach { case (lamE6, rmseE6, _) =>
      val lam = lamE6.toDouble / 1e6 * n
      var sse = 0.0
      feats.foreach { case (x, y) =>
        val a = Array.tabulate(d, d)((i, j) =>
          a0(i)(j) - x(i) * x(j) + (if (i == j && i > 0) lam else 0.0))
        val b = Array.tabulate(d)(i => b0(i) - x(i) * y)
        val beta = ReorderModel.solve(a, b)
        val e = y - (0 until d).map(i => x(i) * beta(i)).sum
        sse += e * e
      }
      val exp = math.floor(math.sqrt(sse / n) * 1e6 + 0.5).toLong
      assert(math.abs(rmseE6 - exp) <= 1L,
        s"λ=$lamE6: hat-trick $rmseE6 vs brute refits $exp")
    }
    // exactly one argmin flag, on the smallest-RMSE λ
    assert(got.count(_._3) === 1)
    val best = got.filter(_._3).head
    assert(got.forall(r => best._2 <= r._2))
  }

  test("gains table: deciles partition the scored set, cumulative gain closes at 1") {
    import org.apache.spark.sql.functions._
    val rows = graft.ml.ReorderModel.gainsTable(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq === (0L to 9L), "ten deciles, in order")
    // partition laws against the independently-recomputed totals
    val labeled = graft.insta.Insta.withLabel(spark, sf,
        graft.insta.Insta.candidates(spark, sf, Seq(1L, 2L)))
      .agg(count(lit(1)), sum(col("label"))).collect()(0)
    assert(rows.map(_._2).sum === labeled.getLong(0), "decile rows != candidate count")
    assert(rows.map(_._3).sum === labeled.getLong(1), "decile positives != label total")
    // rates and cumulative gain are proper fractions; the gain closes at 1
    rows.foreach { r =>
      assert(r._4 >= 0L && r._4 <= 1000000L, s"rate out of [0,1]: $r")
      assert(r._6 >= 0L && r._6 <= 1000000L, s"cum gain out of [0,1]: $r")
    }
    assert(rows.last._6 === 1000000L, "cumulative gain must close at exactly 1")
    // cumulative gain is non-decreasing in decile order
    assert(rows.map(_._6).toSeq === rows.map(_._6).sorted.toSeq)
    // decile sizes are the integer-grid cut: they differ by at most 1
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1L)
  }

  test("average precision replays the integer-term sum and beats prevalence") {
    import org.apache.spark.sql.functions._
    val Array(row) = graft.ml.ReorderModel.averagePrecision(spark, sf).collect()
    val scored = graft.insta.Insta.withLabel(spark, sf,
        graft.insta.Insta.candidates(spark, sf, Seq(1L, 2L)))
      .join(graft.insta.Insta.productFeatures(spark, sf)
        .select(col("productID"),
          expr("(CAST(numreorders AS BIGINT) * 1000000) DIV numorders").as("s")),
        "productID")
      .select(col("orderID"), col("productID"), col("label"), col("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ranked = scored.sortBy(r => (-r._4, r._1, r._2))
    var cum = 0L
    var sum = BigInt(0)
    ranked.zipWithIndex.foreach { case (r, i) =>
      cum += r._3
      if (r._3 == 1L) sum += (BigInt(cum) * 1000000000L) / (i + 1L)
    }
    val nPos = ranked.map(_._3).sum
    assert(row.getLong(0) === ranked.length.toLong, "n")
    assert(row.getLong(1) === nPos, "n_pos")
    assert(BigInt(row.getLong(2)) === sum / nPos, "AP mismatch vs driver replay")
    assert(row.getLong(3) === nPos * 1000000000L / ranked.length, "prevalence")
    // AP of the reorder-propensity scorer must beat the random baseline
    assert(row.getLong(2) > row.getLong(3), "scorer no better than random")
    assert(row.getLong(2) <= 1000000000L, "AP out of [0, 1]")
  }
}
