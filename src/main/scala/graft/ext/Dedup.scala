package graft.ext

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{functions => gf}

/** Deduplication operators over the documents table (SURVEY.md §2.11
  * X1/X2): exact, MinHash+LSH, SimHash, and n-gram Jaccard. The scale
  * posture: every candidate-pair generator is bucketed (LSH band, SimHash
  * band, lang) so the pair space is Σ bucket² rather than n² — the only
  * formulation that survives 100 TB.
  */
object Dedup {

  /** X1 exact dedup on normalized text: lowercase + collapse whitespace.
    * groupBy(hash-agg) keeps one representative (min doc_id) per content
    * key — fully distributed, one shuffle on the normalized key.
    * At scale, group on a 64-bit content fingerprint instead of the full
    * text to shrink shuffle width: see [[exactByFingerprint]].
    */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("norm", regexp_replace(lower(col("text")), "\\s+", " "))
      .groupBy("norm")
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies")
      .orderBy("doc_id")

  /** X1 at scale: shuffle 8 bytes of fingerprint, not the document. */
  def exactByFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("fp", gf.fnv1a64(regexp_replace(lower(col("text")), "\\s+", " ")))
      .groupBy("fp")
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies")
      .orderBy("doc_id")

  private def shingled(df: DataFrame, n: Int): DataFrame =
    df.withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= n)
      .withColumn("shingles",
        array_distinct(transform(
          sequence(lit(0), size(col("toks")) - n),
          i => concat_ws(" ", slice(col("toks"), i + 1, lit(n))))))
      .drop("toks")

  /** X2 MinHash+LSH near-dup pairs: token 3-shingles → sparse vector
    * (HashingTF) → MinHash signatures → banded self-join (spark.ml
    * approxSimilarityJoin only compares within matching hash buckets).
    * Seeded for determinism. Output: pairs with Jaccard distance ≤ maxDist.
    */
  def minhashPairs(spark: SparkSession, dir: String, maxDist: Double = 0.7): DataFrame = {
    // cache the vectorized docs: the LSH self-join scans this plan twice
    val fed = graft.Layer.cached(spark, dir, "minhashFeatures") {
      val docs = shingled(Tables.documents(spark, dir), 3)
      new HashingTF()
        .setInputCol("shingles").setOutputCol("features").setNumFeatures(1 << 18)
        .transform(docs)
        .select("doc_id", "features")
    }
    val lsh = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes").setNumHashTables(8).setSeed(42L)
    val model = lsh.fit(fed)
    model.approxSimilarityJoin(fed, fed, maxDist, "dist")
      .select(
        col("datasetA.doc_id").as("a"),
        col("datasetB.doc_id").as("b"),
        round(col("dist"), 4).as("jaccard_dist"))
      .filter(col("a") < col("b"))
      .orderBy("a", "b")
  }

  /** X2 SimHash near-dup pairs via the native SimHash64 expression: 4
    * 16-bit bands as join buckets (a pair within Hamming distance 3 must
    * agree on ≥1 band), then exact Hamming verify. The band join is an
    * equi-join — shuffle on band value, never n².
    */
  def simhashPairs(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    // persist the signatures: the banded self-join references this plan
    // twice, and without a materialization the shingle+hash pass runs twice
    val sigs = graft.Layer.cached(spark, dir, "simhashSigs") {
      shingled(Tables.documents(spark, dir), 3)
        .select(col("doc_id"), gf.simhash64(col("shingles")).as("sig"))
    }
    val banded = sigs.select(col("doc_id"), col("sig"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"), shiftright(col("sig"), b * 16).bitwiseAND(lit(0xffffL)).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("sig"), col("bk.band").as("band"), col("bk.key").as("key"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key")
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a"), col("b.doc_id").as("b"),
        gf.hamming64(col("a.sig"), col("b.sig")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .orderBy("a", "b")
  }

  /** X2 n-gram Jaccard near-dup pairs, exact, within-lang: J(a,b) =
    * |A∩B| / |A∪B| over distinct 3-shingles, via an inverted-index join —
    * explode shingles, equi-join on (lang, shingle), count shared shingles
    * per pair, then J = inter / (|A| + |B| − inter). Identical output to
    * the all-pairs formulation (a zero-overlap pair can never reach the
    * threshold) but the join materializes only pairs that actually share a
    * shingle: Σ per-shingle-count² rows instead of per-lang n² array
    * comparisons — the formulation that survives a 100× corpus.
    */
  def ngramJaccardPairs(spark: SparkSession, dir: String, minJaccard: Double = 0.6): DataFrame = {
    val inv = shingled(Tables.documents(spark, dir), 3)
      .select(col("lang"), col("doc_id"), size(col("shingles")).as("sz"),
        explode(col("shingles")).as("s"))
    val a = inv.toDF("lang", "a", "sza", "s")
    val b = inv.toDF("lang", "b", "szb", "s")
    a.join(b, Seq("lang", "s"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b", "sza", "szb")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        round(col("inter") / (col("sza") + col("szb") - col("inter")), 4))
      .filter(col("jaccard") >= minJaccard)
      .select("a", "b", "jaccard")
      .orderBy("a", "b")
  }

  /** The composed corpus-cleaning pipeline a pre-training data flow runs:
    * quality gate (length + lexical diversity) → exact dedup on normalized
    * text (keep min doc_id) → near-dup removal (drop the higher doc_id of
    * every ≥ minJaccard shingle-overlap pair). Returns surviving doc ids.
    * Each stage is the distributed formulation proven above (hash-agg
    * dedup, inverted-index pair generation); the composition is one
    * DataFrame DAG — nothing materializes between stages.
    */
  def cleanCorpus(spark: SparkSession, dir: String, minJaccard: Double = 0.6): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = split(col("text"), " ")
    val quality = docs
      .withColumn("n_tokens", size(toks))
      .withColumn("ttr", round(size(array_distinct(toks)) / size(toks), 4))
      .filter(col("n_tokens") >= 30 && col("ttr") >= 0.3)
    val exactKept = quality
      .withColumn("norm", regexp_replace(lower(col("text")), "\\s+", " "))
      .groupBy("norm").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val nearDupLosers = ngramJaccardPairs(spark, dir, minJaccard)
      .select(col("b").as("doc_id")).distinct()
    exactKept
      .join(nearDupLosers, Seq("doc_id"), "left_anti")
      .orderBy("doc_id")
  }

  /** X2 embedding-cosine near-dup pairs (exact over the full pair space —
    * see Similarity.ivfTopK for the bucketed scale path).
    */
  def embeddingNearDup(spark: SparkSession, dir: String, minCos: Double = 0.4): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val a = e.select(col("vec_id").as("a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("b"), col("embedding").as("vb"))
    a.crossJoin(b)
      .filter(col("a") < col("b"))
      .withColumn("cos", round(gf.cosine_sim(col("va"), col("vb")), 4))
      .filter(col("cos") >= minCos)
      .select("a", "b", "cos")
      .orderBy("a", "b")
  }
}
