package graft

/** DuckDB oracle SQL for the extension tier (events/JSON/windows, text
  * analysis, dedup, similarity, multimodal). Same determinism contract as
  * [[OracleSql]]; window starts compare as epoch BIGINTs to avoid
  * timestamp-precision round-trips (events.ts is ns in parquet, Spark
  * truncates to µs).
  */
object OracleSqlExt {

  val x01_json_extract: String =
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |FROM events ORDER BY event_id""".stripMargin

  val x02_window_tumbling: String =
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ws, event_type,
      |       COUNT(*) AS n, ROUND(SUM(value), 4) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin

  val x03_window_sliding: String =
    """WITH bounds AS (
      |  SELECT date_trunc('day', MIN(ts)) - INTERVAL 1 DAY AS lo,
      |         MAX(ts) + INTERVAL 15 MINUTE AS hi FROM events),
      |starts AS (
      |  SELECT unnest(range((SELECT lo FROM bounds), (SELECT hi FROM bounds),
      |                      INTERVAL 15 MINUTE)) AS ws)
      |SELECT CAST(epoch(s.ws) AS BIGINT) AS ws, COUNT(*) AS n,
      |       ROUND(SUM(e.value), 4) AS total_value
      |FROM events e JOIN starts s ON e.ts >= s.ws AND e.ts < s.ws + INTERVAL 1 HOUR
      |GROUP BY s.ws ORDER BY ws""".stripMargin

  val x04_session_window: String =
    """WITH e AS (
      |  SELECT user_id, ts, value,
      |         CASE WHEN ts > LAG(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts, value,
      |         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |                          ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM e)
      |SELECT user_id,
      |       CAST(epoch_us(MIN(ts)) AS BIGINT) AS session_start,
      |       CAST(epoch_us(MAX(ts)) AS BIGINT) + 1800000000 AS session_end,
      |       COUNT(*) AS n_events, ROUND(SUM(value), 4) AS total_value
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  val x05_event_pivot: String =
    """SELECT user_id,
      |       COUNT(*) FILTER (event_type = 'click') AS click,
      |       COUNT(*) FILTER (event_type = 'error') AS error,
      |       COUNT(*) FILTER (event_type = 'purchase') AS purchase,
      |       COUNT(*) FILTER (event_type = 'signup') AS signup,
      |       COUNT(*) FILTER (event_type = 'view') AS view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  private val stopList = "('the', 'a', 'of', 'and', 'to', 'in')"

  val x10_token_stats: String =
    s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
       |SELECT doc_id,
       |       CAST(len(toks) AS BIGINT) AS n_tokens,
       |       CAST(length(text) AS BIGINT) AS n_chars_calc,
       |       ROUND(len(list_distinct(toks)) / len(toks), 4) AS ttr,
       |       ROUND(len(list_filter(toks, t -> t IN $stopList)) / len(toks), 4) AS stop_ratio,
       |       ROUND(list_sum(list_transform(toks, t -> length(t))) / len(toks), 4) AS avg_token_len
       |FROM t ORDER BY doc_id""".stripMargin

  val x11_quality_filter: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
      |       ROUND(len(list_distinct(toks)) / len(toks), 4) AS ttr
      |FROM t
      |WHERE len(toks) >= 30 AND ROUND(len(list_distinct(toks)) / len(toks), 4) >= 0.3
      |ORDER BY doc_id""".stripMargin

  val x12_langid: String =
    """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
      |s AS (SELECT doc_id, lang,
      |        CAST(len(list_filter(toks, t -> t IN ('the', 'a', 'of'))) AS BIGINT) AS s_en,
      |        CAST(len(list_filter(toks, t -> t IN ('table', 'row', 'column', 'value'))) AS BIGINT) AS s_dat,
      |        CAST(len(list_filter(toks, t -> t IN ('scan', 'join', 'sort', 'merge', 'agg'))) AS BIGINT) AS s_ops
      |      FROM t)
      |SELECT doc_id, lang, s_en, s_dat, s_ops,
      |       CASE WHEN s_en >= s_dat AND s_en >= s_ops THEN 'en'
      |            WHEN s_dat >= s_ops THEN 'dat' ELSE 'ops' END AS pred
      |FROM s ORDER BY doc_id""".stripMargin

  /** DuckDB's float division + ROUND match Spark's here because every
    * operand is an exact small integer (see x10's ttr precedent).
    */
  val x74_repetition: String =
    """WITH d AS (SELECT doc_id, string_split(text,' ') AS toks,
      |                  CAST(len(string_split(text,' ')) AS BIGINT) AS n FROM documents),
      |b AS (SELECT doc_id, n, toks,
      |             CASE WHEN n >= 2
      |                  THEN list_transform(range(1, n), i -> toks[i] || ' ' || toks[i+1])
      |                  ELSE [] END AS bg FROM d),
      |t AS (SELECT doc_id, n, toks, bg,
      |             COALESCE(list_max(list_transform(list_distinct(bg),
      |                        x -> len(list_filter(bg, y -> y = x)))), 0) AS top_n
      |      FROM b)
      |SELECT doc_id, n AS n_tokens,
      |       ROUND(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)/n, 4) AS dup_token_frac,
      |       CAST(top_n AS BIGINT) AS top_bigram_n,
      |       ROUND(CAST(top_n AS DOUBLE) / greatest(len(bg), 1), 4) AS top_bigram_frac
      |FROM t ORDER BY doc_id""".stripMargin

  val x75_pii_scrub: String =
    """WITH p AS (SELECT doc_id,
      |  text || CASE WHEN doc_id % 7 = 0
      |               THEN ' contact user' || doc_id || '@example.com now' ELSE '' END
      |       || CASE WHEN doc_id % 11 = 0 THEN ' call +12-555-0199' ELSE '' END AS t2
      |  FROM documents)
      |SELECT doc_id,
      |       CAST(len(regexp_extract_all(t2, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
      |       CAST(len(regexp_extract_all(t2, '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
      |       md5(regexp_replace(regexp_replace(t2, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
      |           '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS clean_hash
      |FROM p ORDER BY doc_id""".stripMargin

  val x14_dedup_exact: String =
    """WITH n AS (SELECT doc_id, regexp_replace(lower(text), '\s+', ' ', 'g') AS norm
      |           FROM documents)
      |SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
      |FROM n GROUP BY norm ORDER BY doc_id""".stripMargin

  val x15_ngram_jaccard: String =
    """WITH t AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS toks
      |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (
      |  SELECT doc_id, lang,
      |         list_distinct(list_transform(range(1, len(toks) - 1),
      |                                      i -> array_to_string(toks[i:i+2], ' '))) AS s
      |  FROM t),
      |p AS (
      |  SELECT a.doc_id AS a, b.doc_id AS b,
      |         ROUND(len(list_filter(a.s, x -> list_contains(b.s, x))) /
      |               len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard
      |  FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id)
      |SELECT a, b, jaccard FROM p WHERE jaccard >= 0.6 ORDER BY a, b""".stripMargin

  private def dotExpr(u: String, v: String): String =
    s"list_sum(list_transform(range(1, len($u) + 1), i -> $u[i] * $v[i]))"

  private def cosExpr(u: String, v: String): String =
    s"${dotExpr(u, v)} / (sqrt(${dotExpr(u, u)}) * sqrt(${dotExpr(v, v)}))"

  /** x106 twin: x20's exact ranking with the different-label predicate in
    * the scoring CTE — the oracle sees the same candidate set the Spark
    * filter admits.
    */
  val x106_hard_negatives: String =
    s"""WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv, label AS ql
       |           FROM embeddings WHERE vec_id < 10),
       |c AS (SELECT vec_id AS n_id, embedding::DOUBLE[] AS nv, label AS nl
       |      FROM embeddings),
       |s AS (
       |  SELECT q_id, n_id, ${cosExpr("qv", "nv")} AS cos
       |  FROM q, c WHERE nl <> ql),
       |r AS (SELECT q_id, n_id, cos,
       |             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
       |      FROM s)
       |SELECT q_id, n_id, ROUND(cos, 4) AS cos, CAST(rank AS BIGINT) AS rank
       |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  val x20_cosine_topk: String =
    s"""WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
       |           FROM embeddings WHERE vec_id < 10),
       |c AS (SELECT vec_id AS n_id, embedding::DOUBLE[] AS nv FROM embeddings),
       |s AS (
       |  SELECT q_id, n_id, ${cosExpr("qv", "nv")} AS cos
       |  FROM q, c WHERE q_id <> n_id),
       |r AS (SELECT q_id, n_id, cos,
       |             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
       |      FROM s)
       |SELECT q_id, n_id, ROUND(cos, 4) AS cos, CAST(rank AS BIGINT) AS rank
       |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  /** Mirrors TextAnalysis.fingerprints: FNV-1a 64 of the raw text, the
    * x17 list_reduce kernel (HUGEINT multiply wraps mod 2^64, the xor
    * touches only the low byte) re-centered into SIGNED int64 at the end
    * because Spark's Fnv1a64 expression returns LongType — values ≥ 2⁶³
    * wrap negative. Moves x13 from rows-only (r8) to hash-matched: the
    * FunctionsSpec byte-vector law now has a corpus-wide SQL twin.
    */
  val x13_fingerprint: String =
    """SELECT doc_id,
      |       CAST(CASE WHEN h >= 9223372036854775808
      |                 THEN h - 18446744073709551616 ELSE h END AS BIGINT) AS fp
      |FROM (
      |  SELECT doc_id,
      |         list_reduce(
      |           list_prepend(CAST(14695981039346656037 AS HUGEINT),
      |             [CAST(ascii(text[i]) AS HUGEINT) for i in range(1, len(text) + 1)]),
      |           (h, c) -> ((h // 256) * 256
      |                      + CAST(xor(CAST(h % 256 AS BIGINT), CAST(c AS BIGINT)) AS HUGEINT))
      |                     * 1099511628211 % 18446744073709551616) AS h
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Mirrors Dedup.simhashPairs END-TO-END: the banded candidate join is
    * superset-then-verify (any pair at Hamming ≤ h shares a clean band
    * combination), so the OUTPUT is banding-independent — exactly every
    * doc pair whose SimHash-64 signatures differ in ≤ 3 bits. The oracle
    * therefore recomputes the SIGNATURE DERIVATION itself: distinct
    * 3-shingles per doc (list slice ≡ Spark's slice(toks, i+1, 3)),
    * FNV-1a 64 per shingle via list_reduce in HUGEINT (multiply wraps mod
    * 2^64; the xor touches only the low byte, so it runs in BIGINT),
    * per-bit ±1 votes, sign → 64-bit signature as a BOOLEAN[64], and an
    * all-pairs Hamming count (oracle-side O(n²) is fine at gate scale;
    * the Spark side stays bucketed). Corpus is ASCII, so ascii(char) is
    * the UTF-8 byte.
    */
  val x17_simhash_neardup: String =
    """WITH docs AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (
      |  SELECT doc_id,
      |         list_distinct([array_to_string(toks[i:i+2], ' ')
      |                        for i in range(1, len(toks) - 1)]) AS shingles
      |  FROM docs),
      |hs AS (
      |  SELECT doc_id,
      |         list_reduce(
      |           list_prepend(CAST(14695981039346656037 AS HUGEINT),
      |             [CAST(ascii(sg[i]) AS HUGEINT) for i in range(1, len(sg) + 1)]),
      |           (h, c) -> ((h // 256) * 256
      |                      + CAST(xor(CAST(h % 256 AS BIGINT), CAST(c AS BIGINT)) AS HUGEINT))
      |                     * 1099511628211 % 18446744073709551616) AS h
      |  FROM (SELECT doc_id, unnest(shingles) AS sg FROM sh)),
      |bits AS (
      |  SELECT doc_id, t.b,
      |         SUM(CASE WHEN (h // CAST(power(2, t.b) AS HUGEINT)) % 2 = 1
      |                  THEN 1 ELSE -1 END) AS vote
      |  FROM hs CROSS JOIN range(64) t(b)
      |  GROUP BY 1, 2),
      |sig AS (SELECT doc_id, list(vote > 0 ORDER BY b) AS bits FROM bits GROUP BY doc_id),
      |pr AS (
      |  SELECT x.doc_id AS a, y.doc_id AS b,
      |         len([i for i in range(1, 65) if x.bits[i] != y.bits[i]]) AS hamming
      |  FROM sig x JOIN sig y ON x.doc_id < y.doc_id)
      |SELECT a, b, CAST(hamming AS INTEGER) AS hamming
      |FROM pr WHERE hamming <= 3 ORDER BY a, b""".stripMargin

  /** Mirrors Dedup.bandedNearDup bit-for-bit: 8 bands × 8 sign bits over
    * the 64 coordinate axes (deterministic — no random hyperplanes), band
    * equi-join for candidates, exact cosine verify. DuckDB lists are
    * 1-indexed, hence `v[band*8 + j + 1]` for Spark's getItem(b*8+j).
    */
  /** Mirrors Dedup.deriveBands bit-for-bit: bandBits bb = smallest
    * b ∈ [8, 24] with 2^b ≥ count (clamped to dim/2), nBands
    * nb = min(8, dim // bb) — both computed from the SAME table the Spark
    * side derives them from, so the banding stays hash-checked at every
    * sf. DuckDB's range() only takes constants and lambdas reject
    * subqueries, hence the constant 24/8 upper bounds filtered by the
    * derived bb/nb columns (out-of-range list indexes NULL out to the
    * ELSE 0 branch).
    */
  val x21_embedding_neardup: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |m AS (SELECT COUNT(*) AS n, MIN(len(v)) AS dim FROM e),
       |p AS (SELECT GREATEST(1, LEAST(
       |        COALESCE((SELECT MIN(b) FROM range(8, 25) t(b), m
       |                  WHERE (1::BIGINT << b) >= m.n), 24),
       |        (SELECT dim FROM m) // 2)) AS bb),
       |p2 AS (SELECT bb, GREATEST(1, LEAST(8, (SELECT dim FROM m) // bb)) AS nb FROM p),
       |sig AS (
       |  SELECT vec_id, band,
       |         list_sum(list_transform(range(0, 24),
       |           j -> CASE WHEN j < bb AND v[band * bb + j + 1] >= 0
       |                     THEN 1::BIGINT << j ELSE 0 END)) AS key
       |  FROM e CROSS JOIN p2 CROSS JOIN range(0, 8) AS bs(band)
       |  WHERE band < nb),
       |cand AS (
       |  SELECT DISTINCT s.vec_id AS a, t.vec_id AS b
       |  FROM sig s JOIN sig t
       |    ON s.band = t.band AND s.key = t.key AND s.vec_id < t.vec_id),
       |pr AS (
       |  SELECT c.a, c.b, ROUND(${cosExpr("ea.v", "eb.v")}, 4) AS cos
       |  FROM cand c
       |  JOIN e ea ON ea.vec_id = c.a
       |  JOIN e eb ON eb.vec_id = c.b)
       |SELECT a, b, cos FROM pr WHERE cos >= 0.4 ORDER BY a, b""".stripMargin

  val x30_binary_meta: String =
    """WITH m AS (
      |  SELECT doc_id,
      |         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
      |              WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      |  FROM documents)
      |SELECT doc_id, media_type, n_bytes,
      |       n_bytes % 64 + 1 AS width, n_bytes % 48 + 1 AS height
      |FROM m ORDER BY doc_id""".stripMargin

  /** Streaming tumbling twin shares the batch oracle. */
  val s01_stream_tumbling: String = x02_window_tumbling
}
