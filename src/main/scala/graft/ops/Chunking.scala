package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Document chunking — the flip side of [[Packing]]: documents LONGER than
  * the training context are split into overlapping token windows
  * (`maxLen` tokens every `stride`), each chunk carrying its token span
  * and a content hash of the exact token slice.
  *
  * Scale shape: pure per-row compute — tokenize, derive the chunk count
  * with integer arithmetic, `explode` one sequence per document. No
  * shuffle, no state, embarrassingly parallel; output size is
  * Σ ceil(doc_len / stride), linear in corpus tokens. The chunk count and
  * every span bound are derived from (doc content, maxLen, stride) only,
  * so the assignment is layout-independent and the DuckDB oracle mirrors
  * it row for row including the md5 of each slice.
  */
object Chunking {

  /** chunks = 1 + ceil(max(n - maxLen, 0) / stride): one window at 0, then
    * one per stride until the tail fits. Integer arithmetic on both sides
    * (no float ceil) keeps the count oracle-exact.
    */
  def chunkDocs(df: DataFrame, maxLen: Int, stride: Int): DataFrame = {
    val toks = split(col("text"), " ")
    df
      .select(col("doc_id"), toks.as("toks"),
        size(toks).cast("long").as("n"))
      .withColumn("n_chunks",
        lit(1L) + floor((greatest(col("n") - maxLen, lit(0L)) + (stride - 1)) / stride))
      .withColumn("chunk_id", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .withColumn("start_tok", col("chunk_id") * stride)
      .select(
        col("doc_id"), col("chunk_id"), col("start_tok"),
        least(lit(maxLen.toLong), col("n") - col("start_tok")).as("n_chunk_tokens"),
        md5(concat_ws(" ", slice(col("toks"), (col("start_tok") + 1).cast("int"), lit(maxLen))))
          .as("chunk_hash"))
  }

  /** x73: 32-token windows every 24 tokens (8-token overlap) over the
    * documents table — the sf-scaled stand-in for 2048/1536 at training
    * time; the operator takes both as parameters.
    */
  def docChunks(spark: SparkSession, dir: String): DataFrame =
    chunkDocs(Tables.documents(spark, dir), maxLen = 32, stride = 24)
      .orderBy("doc_id", "chunk_id")

  /** Intra-document dedup (the RefinedWeb-style in-doc repetition
    * remover): split each document into non-overlapping `chunkTokens`
    * windows, drop every repeat of an already-seen chunk WITHIN the same
    * document (keep the first occurrence), and emit the kept-chunk count
    * plus a content hash of the deduped reassembly in original order.
    *
    * Scale shape: first-occurrence selection is an AGGREGATE
    * (groupBy(doc, chunk).min(i)), not a window — map-side partials
    * collapse repeats before the (doc, chunk)-keyed exchange; reassembly
    * is one doc-keyed aggregate over the surviving chunks. Both keys are
    * content-derived, so the result is layout-independent.
    */
  def intraDocDedup(spark: SparkSession, dir: String, chunkTokens: Int = 10): DataFrame = {
    val toks = split(col("text"), " ")
    val nChunks = floor((size(toks).cast("long") + (chunkTokens - 1)) / chunkTokens)
    val chunks = transform(sequence(lit(0L), nChunks - 1),
      i => concat_ws(" ", slice(toks, (i * chunkTokens + 1).cast("int"), lit(chunkTokens))))
    Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(chunks).as(Seq("i", "chunk")))
      .groupBy("doc_id", "chunk")
      .agg(min(col("i")).as("i"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("i"), col("chunk")))),
            s => s.getField("chunk")))).as("dedup_hash"))
      .orderBy("doc_id")
  }

  /** Cross-document span dedup (the corpus-wide repeated-span remover —
    * the across-documents counterpart of [[intraDocDedup]], the step that
    * strips boilerplate/licence blocks repeated across millions of pages):
    * tile every document into non-overlapping `chunkTokens` windows, keep
    * each distinct chunk ONLY at its first occurrence in the whole corpus
    * (lowest (doc_id, position)), and emit per surviving document the
    * kept-chunk count plus a content hash of the reassembly in original
    * order. Documents whose every chunk appeared earlier elsewhere vanish
    * — the fully-boilerplate page.
    *
    * Scale shape: ZERO joins. First-occurrence selection is a global
    * min-aggregate keyed by chunk content — `min(doc_id·2²⁰ + i)` packs
    * the lexicographic (doc_id, position) order into one BIGINT so the
    * partial aggregation collapses every corpus-wide repeat map-side
    * before the content-keyed exchange (a chunk repeated a billion times
    * crosses the wire once per input partition — heavy hitters are
    * absorbed, not shuffled). Reassembly is one doc-keyed aggregate over
    * the survivors. Both keys are content-derived, so the result is
    * layout-independent and the DuckDB oracle mirrors it bit for bit.
    */
  def crossDocDedup(spark: SparkSession, dir: String, chunkTokens: Int = 10): DataFrame = {
    val toks = split(col("text"), " ")
    val nChunks = floor((size(toks).cast("long") + (chunkTokens - 1)) / chunkTokens)
    val chunks = transform(sequence(lit(0L), nChunks - 1),
      i => concat_ws(" ", slice(toks, (i * chunkTokens + 1).cast("int"), lit(chunkTokens))))
    // i < 2^20 always holds here: i ≤ n_chars/chunkTokens and the synthetic
    // docs are ≤ ~4k chars; a production corpus with longer docs widens the
    // shift (doc positions fit 2^20 ≈ 1M chunks/doc even at book length).
    Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(chunks).as(Seq("i", "chunk")))
      .groupBy("chunk")
      .agg(min(shiftleft(col("doc_id"), 20) + col("i")).as("k"))
      .select(shiftright(col("k"), 20).as("doc_id"),
        pmod(col("k"), lit(1L << 20)).as("i"), col("chunk"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("i"), col("chunk")))),
            s => s.getField("chunk")))).as("dedup_hash"))
      .orderBy("doc_id")
  }

  val crossDedupOracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
      |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      |           FROM documents),
      |c AS (
      |  SELECT doc_id, u.i,
      |         array_to_string(toks[u.i*10+1 : least(u.i*10+10, n)], ' ') AS chunk
      |  FROM t, UNNEST(range(0, (n + 9) // 10)) u(i)),
      |f AS (SELECT chunk, MIN(doc_id * 1048576 + i) AS k FROM c GROUP BY chunk),
      |kept AS (SELECT k // 1048576 AS doc_id, k % 1048576 AS i, chunk FROM f)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
      |       md5(string_agg(chunk, ' ' ORDER BY i)) AS dedup_hash
      |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val intraDedupOracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
      |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      |           FROM documents),
      |c AS (
      |  SELECT doc_id, u.i,
      |         array_to_string(toks[u.i*10+1 : least(u.i*10+10, n)], ' ') AS chunk
      |  FROM t, UNNEST(range(0, (n + 9) // 10)) u(i)),
      |f AS (SELECT doc_id, chunk, MIN(i) AS i FROM c GROUP BY doc_id, chunk)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
      |       md5(string_agg(chunk, ' ' ORDER BY i)) AS dedup_hash
      |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val oracle: String =
    """WITH d AS (SELECT doc_id, string_split(text,' ') AS toks,
      |                  CAST(len(string_split(text,' ')) AS BIGINT) AS n
      |           FROM documents),
      |c AS (SELECT doc_id, toks, n,
      |             1 + (greatest(n - 32, 0) + 23) // 24 AS n_chunks FROM d)
      |SELECT doc_id, t.chunk_id, t.chunk_id*24 AS start_tok,
      |       least(32, n - t.chunk_id*24) AS n_chunk_tokens,
      |       md5(array_to_string(toks[t.chunk_id*24+1 : least(t.chunk_id*24+32, n)], ' ')) AS chunk_hash
      |FROM c CROSS JOIN UNNEST(range(0, n_chunks)) AS t(chunk_id)
      |ORDER BY doc_id, chunk_id""".stripMargin
}
