package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic, content-addressed sampling and splitting — the
  * training-data-pipeline replacements for `randomSplit`/`sample`
  * (reference F.py:229's seeded randomSplit is the operator being
  * re-expressed; see ml/ReorderModel for the parity version).
  *
  * Spark's `randomSplit`/`sample` draw from a per-partition RNG stream, so
  * membership depends on partition layout: a repartition, a retry, AQE, or
  * a scale-up silently reassigns rows between train and test. At 100 TB a
  * corpus snapshot must be REPRODUCIBLE: membership derives from the row's
  * key alone via a hash, never from physical layout. md5 (not xxhash64) so
  * the DuckDB oracle can mirror the arithmetic bit-for-bit — both x70/x71
  * are on the hash-checked path, which no RNG-based sampler can be.
  *
  * The hash is also the incremental-pipeline contract: a document sampled
  * in today's run stays sampled when the corpus doubles tomorrow —
  * Bernoulli-by-content, the property dataset versioning relies on.
  */
object Sampling {

  /** Uniform bucket in [0, 10000): first 32 bits of md5(key ":" seed),
    * parsed from hex. One codegen'd expression chain — no UDF, no shuffle.
    */
  def bucket10k(key: Column, seed: Int): Column =
    conv(substring(md5(concat(key.cast("string"), lit(s":$seed"))), 1, 8), 16, 10)
      .cast("long") % 10000L

  /** Deterministic train/test split: trainBp basis points (0–10000) go to
    * "train", the rest to "test". The scale-safe randomSplit.
    */
  def hashSplit(df: DataFrame, key: String, trainBp: Int, seed: Int): DataFrame =
    df.withColumn("split",
      when(bucket10k(col(key), seed) < trainBp, lit("train")).otherwise(lit("test")))

  /** Deterministic stratified sample: per-stratum keep rates in basis
    * points (e.g. lang → bp), defaultBp for unlisted strata. The
    * reproducible `df.stat.sampleBy`; thresholds compile to one CASE
    * expression against the shared hash bucket — still no shuffle.
    */
  def stratifiedSample(df: DataFrame, key: String, stratum: String,
                       bp: Map[String, Int], defaultBp: Int, seed: Int): DataFrame = {
    val threshold = bp.foldLeft(lit(defaultBp.toLong)) { case (acc, (v, b)) =>
      when(col(stratum) === v, lit(b.toLong)).otherwise(acc)
    }
    df.filter(bucket10k(col(key), seed) < threshold)
  }

  /** x70: row-level split assignment over documents — every doc_id's
    * train/test membership is hash-compared against DuckDB.
    */
  def docSplit(spark: SparkSession, dir: String): DataFrame =
    hashSplit(Tables.documents(spark, dir), "doc_id", trainBp = 8000, seed = 42)
      .select("doc_id", "split")
      .orderBy("doc_id")

  /** x71: stratified sample by lang (en 50%, de 25%, fr 10%, others 5%). */
  def docStratified(spark: SparkSession, dir: String): DataFrame =
    stratifiedSample(Tables.documents(spark, dir), "doc_id", "lang",
      Map("en" -> 5000, "de" -> 2500, "fr" -> 1000), defaultBp = 500, seed = 7)
      .select("doc_id", "lang")
      .orderBy("doc_id")

  /** DuckDB twin of [[bucket10k]]: '0x'-prefixed hex cast == Spark's
    * conv(hex, 16, 10).
    */
  private[ops] def bucketSql(key: String, seed: Int): String =
    s"(('0x' || substr(md5($key || ':$seed'), 1, 8))::BIGINT % 10000)"

  val splitOracle: String =
    s"""SELECT doc_id,
       |       CASE WHEN ${bucketSql("doc_id", 42)} < 8000
       |            THEN 'train' ELSE 'test' END AS split
       |FROM documents ORDER BY doc_id""".stripMargin

  val stratifiedOracle: String =
    s"""SELECT doc_id, lang FROM documents
       |WHERE ${bucketSql("doc_id", 7)} <
       |      CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 2500
       |                WHEN 'fr' THEN 1000 ELSE 500 END
       |ORDER BY doc_id""".stripMargin
}
