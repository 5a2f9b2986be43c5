package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{functions => gf}

/** Text-analysis operators over the documents table (SURVEY.md §2.11 X4 +
  * the training-data-pipeline surface): token stats, quality scoring,
  * heuristic language scoring, content fingerprinting. All column-function
  * compositions (codegen'd) — no UDFs.
  */
object TextAnalysis {

  /** Documents are single-space-separated token streams; split(' ') matches
    * DuckDB string_split exactly (no regex-class divergence).
    */
  def withTokens(df: DataFrame): DataFrame =
    df.withColumn("tokens", split(col("text"), " "))

  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** X4 token statistics: token count, type-token ratio, stopword ratio,
    * mean token length. One projection pass, no shuffle.
    */
  def tokenStats(spark: SparkSession, dir: String): DataFrame = {
    val toks = col("tokens")
    val nTok = size(toks)
    withTokens(Tables.documents(spark, dir))
      .select(
        col("doc_id"),
        nTok.cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars_calc"),
        round(size(array_distinct(toks)) / nTok, 4).as("ttr"),
        round(size(filter(toks, t => t.isin(stopwords: _*))) / nTok, 4).as("stop_ratio"),
        round(aggregate(toks, lit(0), (acc, t) => acc + length(t)) / nTok, 4).as("avg_token_len"))
      .orderBy("doc_id")
  }

  /** Quality filter: keep documents passing simple length/diversity gates —
    * the canonical pre-training corpus filter shape.
    */
  def qualityFilter(spark: SparkSession, dir: String): DataFrame = {
    val toks = col("tokens")
    withTokens(Tables.documents(spark, dir))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("ttr", round(size(array_distinct(toks)) / size(toks), 4))
      .filter(col("n_tokens") >= 30 && col("ttr") >= 0.3)
      .select("doc_id", "n_tokens", "ttr")
      .orderBy("doc_id")
  }

  /** Heuristic language scoring (X4 language-ID): count hits from three
    * marker vocabularies and take a deterministic argmax (tie order
    * en > dat > ops). Deliberately a pure column computation so the oracle
    * can replicate it; on this synthetic corpus it demonstrates the
    * operator shape, not linguistic accuracy.
    */
  val enMarkers: Seq[String]  = Seq("the", "a", "of")
  val datMarkers: Seq[String] = Seq("table", "row", "column", "value")
  val opsMarkers: Seq[String] = Seq("scan", "join", "sort", "merge", "agg")

  def langScore(spark: SparkSession, dir: String): DataFrame = {
    val toks = col("tokens")
    def score(words: Seq[String]): Column =
      size(filter(toks, t => t.isin(words: _*))).cast("long")
    withTokens(Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"),
        score(enMarkers).as("s_en"), score(datMarkers).as("s_dat"),
        score(opsMarkers).as("s_ops"))
      .withColumn("pred",
        when(col("s_en") >= col("s_dat") && col("s_en") >= col("s_ops"), "en")
          .when(col("s_dat") >= col("s_ops"), "dat")
          .otherwise("ops"))
      .orderBy("doc_id")
  }

  /** BPE-ish regex token counting: words, numbers, and punctuation runs as
    * separate tokens (the pre-tokenization split BPE vocabularies apply).
    * ASCII-safe pattern so Java regex (Spark) and RE2 (DuckDB oracle)
    * agree byte-for-byte.
    */
  val bpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"

  def bpeTokenCounts(spark: SparkSession, dir: String): DataFrame = {
    val toks = regexp_extract_all(col("text"), lit(bpePattern), lit(0))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(toks).cast("long").as("n_bpe_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct_bpe"))
      .orderBy("doc_id")
  }

  /** X4 document fingerprinting via the native FNV-1a 64 expression. */
  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), gf.fnv1a64(col("text")).as("fp"))
      .orderBy("doc_id")
}
