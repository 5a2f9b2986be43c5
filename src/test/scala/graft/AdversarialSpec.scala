package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.ops.Curation

/** Adversarial-input hardening: pathological corpora through the
  * dedup / connected-components / curation-packing paths, asserting
  * graceful degradation — bounded iteration, no OOM-shaped explosion,
  * correct EMPTY results instead of errors. Each corpus is written as a
  * real `documents.parquet` under a fresh temp dir so the exact
  * (spark, dir) entry points the gate runs are what is exercised (Layer
  * keys are dir-scoped, so nothing pollutes the shared fixtures).
  */
class AdversarialSpec extends SparkSuite {

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-adv").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("adv"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("all-empty-string corpus: dedup collapses to one, packing is empty, funnel stays monotone") {
    val dir = writeDocs((1L to 200L).map(i => (i, "")))
    // every norm is identical: exactly one representative, 200 copies
    val ex = Dedup.exact(spark, dir).collect()
    assert(ex.length === 1 && ex(0).getLong(1) === 200L)
    // no document reaches 3 tokens: the shingle stream, and hence the
    // pair set and every cluster, must be EMPTY — not an error
    assert(Dedup.ngramJaccardPairs(spark, dir).count() === 0L)
    assert(Dedup.dupClusters(spark, dir).count() === 0L)
    // the 30-token quality gate removes everything: zero packs, and the
    // funnel still reports all six stages, monotone, with stage 1 honest
    assert(Curation.curatedPacks(spark, dir).count() === 0L)
    val f = Curation.curationFunnel(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(f.map(_._1).toSeq === (1L to 6L))
    assert(f.head._2 === 180L, "train carve must still count the empty docs")
    f.sliding(2).foreach { case Array(a, b) => assert(b._2 <= a._2 && b._3 <= a._3) }
    assert(f.last._2 === 0L)
  }

  test("a million-token document passes through without OOM and pairs with nobody") {
    // 30 normal docs with disjoint 40-token vocabularies + one 10^6-token
    // doc from a 50-word vocabulary (ttr_bp ~ 0 → quality-gated out)
    val giantId = 1000L
    val normal = (1L to 30L).map(i => (i, (0 until 40).map(j => s"d${i}w$j").mkString(" ")))
    val giant = (giantId, Array.tabulate(1000000)(k => s"g${k % 50}").mkString(" "))
    val dir = writeDocs(normal :+ giant)
    // shingling the giant doc is one wide row, not a row explosion the
    // pair join amplifies: disjoint vocabularies → zero candidate pairs
    assert(Dedup.ngramJaccardPairs(spark, dir).count() === 0L)
    val packs = Curation.curatedPacks(spark, dir).collect().map(_.getLong(0))
    assert(packs.nonEmpty, "normal docs must still pack")
    assert(!packs.contains(giantId), "the degenerate-ttr giant must be gated out")
  }

  test("all-identical corpus: full pair clique, ONE cluster in bounded rounds, lone survivor") {
    // 60 identical high-quality docs (40 distinct tokens → ttr 10000)
    val text = (0 until 40).map(j => s"same$j").mkString(" ")
    val dir = writeDocs((1L to 60L).map(i => (i, text)))
    val pairs = Dedup.ngramJaccardPairs(spark, dir)
    assert(pairs.count() === 60L * 59L / 2L, "identical docs must form the full clique")
    // the clique has diameter 1: min-label + pointer jumping must
    // converge in a handful of rounds, far under the 64-round guard
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(pairs.select("a", "b"))
    assert(rounds <= 6, s"clique CC took $rounds rounds")
    assert(labels.select("rep").distinct().count() === 1L)
    labels.unpersist()
    assert(Dedup.dupClusters(spark, dir).select("cluster_rep").distinct().count() === 1L)
    // pipeline end state: exact dedup keeps doc 1; the token budget is
    // half of the one clean doc's tokens, so the budget cut keeps ZERO
    // packs — the correct empty result, not an error
    assert(Curation.curatedPacks(spark, dir).count() === 0L)
    val f = Curation.curationFunnel(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(f.find(_._1 === 3L).get._2 === 1L, "exact dedup must keep one doc")
    assert(f.last._2 === 0L)
  }

  test("zero-width-space corpus: single-token docs are gated and shingle-free, never crash") {
    // words joined by U+200B — split(' ') sees ONE token per doc, and
    // Java's \\s does NOT match ZWSP, so normalization keeps texts distinct
    val dir = writeDocs((1L to 40L).map(i =>
      (i, (0 until 35).map(j => s"z${i}w$j").mkString("​"))))
    val ex = Dedup.exact(spark, dir).collect()
    assert(ex.length === 40 && ex.forall(_.getLong(1) === 1L),
      "ZWSP-distinct texts must NOT collapse under whitespace normalization")
    assert(Dedup.ngramJaccardPairs(spark, dir).count() === 0L)
    assert(Curation.curatedPacks(spark, dir).count() === 0L)
    val f = Curation.curationFunnel(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(f.map(_._1).toSeq === (1L to 6L))
    // every surviving train doc counts exactly ONE token
    assert(f.head._2 === f.head._3, "each ZWSP doc must tokenize to a single token")
    assert(f.find(_._1 === 2L).get._2 === 0L, "single-token docs must fail the 30-token gate")
  }

  test("heavy hitters: degenerate single-token corpus yields one exact hitter; uniform spread yields EMPTY") {
    // vocab = 1 ≪ k: the sketch never decrements, the lone token owns
    // every count, and the verified output is exactly (token, n)
    val mono = writeDocs((0L until 20L).map(i => i -> "spam spam spam spam spam"))
    val got = graft.ext.TextAnalysis.heavyHitters(spark, mono).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got.toSeq === Seq("spam" -> 100L))
    // 100 equal-mass tokens against k = 40: every true frequency is
    // n/100 < n/41, so the correct answer is EMPTY — candidates may
    // survive the sketch, but exact verification must kill them all
    val uniform = writeDocs((0L until 100L).map(i => i -> s"tok$i tok$i tok$i"))
    assert(graft.ext.TextAnalysis.heavyHitters(spark, uniform).count() === 0L)
  }

  test("covariance of an all-identical embedding corpus is exactly zero and the eigen solve survives it") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-adv-emb").toString
    (0L until 50L).map(i => (i, Array.fill(8)(0.25f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val cov = graft.ext.Similarity.covarianceMatrix(spark, dir).collect()
    assert(cov.length === 8 * 9 / 2)
    // zero variance everywhere: the exact integer numerator n·S − s·s
    // cancels perfectly — no float residue allowed
    cov.foreach(r => assert(r.getDouble(3) === 0.0,
      s"cov(${r.getLong(0)},${r.getLong(1)}) = ${r.getDouble(3)} != 0"))
    // power iteration on the zero matrix: the nrm > 0 guard keeps the
    // init vector, lambda lands at exactly 0, nothing divides by zero
    val pc = graft.ext.Similarity.principalComponent(spark, dir).collect()
    assert(pc.length === 3 * 8) // r=3 components × d=8 dims
    pc.foreach(r => assert(r.getDouble(3) === 0.0, "eigval of the zero matrix must be 0"))
  }
}
