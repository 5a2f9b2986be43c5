package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Sequence packing — the pre-training step that concatenates documents
  * into fixed token-budget training sequences. Semantics: within a shard,
  * documents concatenate in doc_id order and the stream is cut every
  * `budget` tokens; a document belongs to the sequence containing its
  * FIRST token (chunk assignment — the standard streaming approximation;
  * true bin packing is inherently sequential and the trainer pads/splits
  * at the boundary anyway).
  *
  * Scale shape: the shard — a content hash of the doc id — is the unit of
  * parallelism, so packing is embarrassingly parallel across shards and
  * each shard is one window sort (one shuffle, linear). Assignment depends
  * only on (doc_id set, budget, shards), never on partition layout — the
  * same reproducibility contract as [[Sampling]], and the reason the
  * DuckDB oracle can mirror it row for row.
  */
object Packing {

  def packSequences(df: DataFrame, budget: Int, shards: Int, seed: Int): DataFrame = {
    val docs = df
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("shard", Sampling.bucket10k(col("doc_id"), seed) % shards)
    val before = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("start_tok", coalesce(sum(col("n_tokens")).over(before), lit(0L)))
      .withColumn("seq_id", floor(col("start_tok") / budget))
      .select("doc_id", "shard", "seq_id", "n_tokens")
  }

  /** x72: pack the documents table into 2048-token sequences, 4 shards. */
  def docPack(spark: SparkSession, dir: String): DataFrame =
    packSequences(Tables.documents(spark, dir), budget = 2048, shards = 4, seed = 99)
      .orderBy("doc_id")

  // shard arithmetic delegated to Sampling.bucketSql — the single DuckDB
  // twin of bucket10k, so a hash change can't silently diverge here
  val oracle: String =
    s"""WITH d AS (
      |  SELECT doc_id,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |         ${Sampling.bucketSql("doc_id", 99)} % 4 AS shard
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, shard, n_tokens,
      |         COALESCE(SUM(n_tokens) OVER (
      |           PARTITION BY shard ORDER BY doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
      |  FROM d)
      |SELECT doc_id, shard, CAST(floor(start_tok / 2048.0) AS BIGINT) AS seq_id, n_tokens
      |FROM c ORDER BY doc_id""".stripMargin
}
