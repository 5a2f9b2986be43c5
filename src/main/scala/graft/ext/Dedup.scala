package graft.ext

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

  /** Incremental corpus delta — the content-addressed merge step of a
    * continuously-ingesting corpus: of today's arrivals, admit only
    * documents whose normalized content is NOT already in the existing
    * snapshot. A left-anti join on the md5 content key, so only the
    * 32-byte key column of each side shuffles — never the documents —
    * and a re-uploaded duplicate of existing content is dropped even
    * though its doc_id is new. Here "existing" is deterministically
    * carved from the same table (doc_id % 10 ≠ 0) so the oracle can
    * mirror the split.
    */
  def corpusDelta(spark: SparkSession, dir: String): DataFrame = {
    val keyed = Tables.documents(spark, dir)
      .withColumn("content_key", md5(regexp_replace(lower(col("text")), "\\s+", " ")))
    val existing = keyed.filter(col("doc_id") % 10 =!= 0).select("content_key")
    keyed.filter(col("doc_id") % 10 === 0)
      .join(existing, Seq("content_key"), "left_anti")
      .select("doc_id", "content_key")
      .orderBy("doc_id")
  }

  val deltaOracle: String =
    """WITH k AS (SELECT doc_id,
      |                  md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS content_key
      |           FROM documents)
      |SELECT doc_id, content_key FROM k
      |WHERE doc_id % 10 = 0
      |  AND content_key NOT IN (SELECT content_key FROM k WHERE doc_id % 10 <> 0)
      |ORDER BY doc_id""".stripMargin

  /** X-series: corpus snapshot reconciliation — classify every document id
    * across two snapshot versions as added / removed / changed / unchanged,
    * the dataset-versioning diff a corpus release pipeline publishes with
    * each refresh (and the audit trail behind [[corpusDelta]]'s admit
    * decision: delta answers "what do I ingest", diff answers "what
    * happened between v1 and v2").
    *
    * Shape: both sides collapse to (doc_id, md5) BEFORE the join — the
    * content column dies at the scan projection, so the FULL OUTER join
    * (the one operator that must see both sides' keys; semi/anti can
    * express added xor removed but not both plus changed in one pass)
    * exchanges 40 B/row regardless of document size. Classification is
    * null-tests on the two hash columns — no second pass, no UDF. At
    * 100 TB this is a sort-merge full outer on the id; with both
    * snapshots bucketed by doc_id (sources/Sinks bucketed layout) the
    * exchange vanishes entirely.
    *
    * Snapshots are deterministic slices of the documents table (the
    * driver's testdata is a single corpus): old drops `doc_id % 17 == 0`
    * (those become "added"), new drops `% 19 == 0` ("removed"), and the
    * old body for `% 13 == 0` carries a stale-marker suffix ("changed").
    */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val old = base.filter(col("doc_id") % 17 =!= 0)
      .select(col("doc_id"),
        md5(when(col("doc_id") % 13 === 0, concat(col("text"), lit(" [stale]")))
          .otherwise(col("text"))).as("old_md5"))
    val neu = base.filter(col("doc_id") % 19 =!= 0)
      .select(col("doc_id"), md5(col("text")).as("new_md5"))
    old.join(neu, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("old_md5").isNull, lit("added"))
          .when(col("new_md5").isNull, lit("removed"))
          .when(col("old_md5") === col("new_md5"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
      .orderBy("doc_id")
  }

  val snapshotDiffOracle: String =
    """WITH old AS (
      |  SELECT doc_id,
      |         md5(CASE WHEN doc_id % 13 = 0 THEN text || ' [stale]'
      |                  ELSE text END) AS old_md5
      |  FROM documents WHERE doc_id % 17 <> 0),
      |neu AS (
      |  SELECT doc_id, md5(text) AS new_md5
      |  FROM documents WHERE doc_id % 19 <> 0)
      |SELECT COALESCE(old.doc_id, neu.doc_id) AS doc_id,
      |       CASE WHEN old_md5 IS NULL THEN 'added'
      |            WHEN new_md5 IS NULL THEN 'removed'
      |            WHEN old_md5 = new_md5 THEN 'unchanged'
      |            ELSE 'changed' END AS status
      |FROM old FULL OUTER JOIN neu ON old.doc_id = neu.doc_id
      |ORDER BY doc_id""".stripMargin

  /** Bloom-filter corpus delta — [[corpusDelta]] for the regime where the
    * seen-set is too large to broadcast as exact keys and the anti-join's
    * two-sided key shuffle is the bottleneck: at 10⁹ seen documents the
    * exact keys are ~32 GB, but a 1% bloom filter is ~1.2 GB of bits that
    * ships to every executor once; the arrivals side then never shuffles
    * at all — membership is an O(1) map-side probe.
    *
    * Construction is `DataFrameStatFunctions.bloomFilter` (a treeAggregate:
    * each partition ORs into a local filter, the driver holds only the
    * merged bits — constant memory in corpus size). The probe is the
    * native codegen'd [[graft.functions.BloomMightContain]] expression
    * over the broadcast filter (Spark's own might_contain is internal to
    * the runtime-filter rule), so membership stays inside
    * WholeStageCodegen like the other five house expressions.
    *
    * Error direction is the SAFE one for dedup: no false negatives means a
    * true duplicate is NEVER admitted; a false positive (~fpp of genuinely
    * new docs) is over-dropping, recovered on a later ingest if the
    * content reappears. ExtSpec's law pins both: result ⊆ exact delta and
    * the over-drop stays within the fpp budget. Rows-only at the driver
    * (the FP set is a function of Spark's filter internals — no SQL twin).
    */
  def bloomDelta(spark: SparkSession, dir: String, fpp: Double = 0.01): DataFrame = {
    val keyed = Tables.documents(spark, dir)
      .withColumn("content_key", md5(regexp_replace(lower(col("text")), "\\s+", " ")))
    val existing = keyed.filter(col("doc_id") % 10 =!= 0).select("content_key")
    // expectedItems from a count pass here; a production snapshot knows its
    // row count from table stats / ingest metadata, so this job disappears.
    val n = math.max(existing.count(), 1L)
    val bf = existing.stat.bloomFilter("content_key", n, fpp)
    val seen = spark.sparkContext.broadcast(bf)
    keyed.filter(col("doc_id") % 10 === 0)
      .filter(!gf.bloom_might_contain(seen, col("content_key")))
      .select("doc_id", "content_key")
      .orderBy("doc_id")
  }

  /** x277: deterministic-bloom corpus delta — [[bloomDelta]]'s semantics
    * re-expressed on the HASH-CHECKED path, the x270/s19 discipline
    * (md5-derived state the oracle can replay; the JVM-internal
    * Datasketches/BloomFilter build stays the production variant).
    * Construction: k = 7 bit positions per content key, position_j =
    * int(md5(key ':' j)[0:15 hex]) mod 2²⁰; the seen-set's SET BITS
    * materialize as a register table of AT MOST 2²⁰ rows — CONSTANT in
    * corpus size, so it broadcasts at any scale and the arrivals side
    * never shuffles (the same no-shuffle plan shape as x101's broadcast
    * filter probe). An arrival is admitted iff ANY of its k positions is
    * unset — bloom semantics with the SAME safe error direction: a false
    * negative is impossible (a true duplicate's key sets exactly the
    * positions the probe reads), a false positive over-drops a genuinely
    * new document, recoverable on a later ingest. DuckDB computes the
    * identical positions from the identical md5 strings, so the full
    * delta — including any collision-driven drops — is replayable and
    * x277 rides the hash-matched gate that x101 (whose FP set is a
    * function of Spark's filter internals) cannot.
    */
  def deterministicBloomDelta(spark: SparkSession, dir: String,
                              k: Int = 7, mBits: Long = 1L << 20): DataFrame = {
    val keyed = Tables.documents(spark, dir)
      .withColumn("content_key", md5(regexp_replace(lower(col("text")), "\\s+", " ")))
    def positions(c: org.apache.spark.sql.Column) = array((0 until k).map(j =>
      pmod(conv(substring(md5(concat(c, lit(":"), lit(j.toString))), 1, 15), 16, 10)
        .cast("long"), lit(mBits))): _*)
    val seenBits = keyed.filter(col("doc_id") % 10 =!= 0)
      .select(explode(positions(col("content_key"))).as("bit"))
      .distinct()
      .withColumn("set", lit(1))
    keyed.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("content_key"),
        explode(positions(col("content_key"))).as("bit"))
      .join(broadcast(seenBits), Seq("bit"), "left")
      .groupBy("doc_id", "content_key")
      .agg(min(coalesce(col("set"), lit(0))).as("all_set"))
      .filter(col("all_set") === 0)
      .select("doc_id", "content_key")
      .orderBy("doc_id")
  }

  /** x277 oracle: the identical md5 bit derivation, register set, and
    * all-k-set admission test in DuckDB.
    */
  val detBloomDeltaOracle: String =
    """WITH k AS (SELECT doc_id,
      |                  md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS content_key
      |           FROM documents),
      |bits AS (SELECT doc_id, content_key,
      |                ('0x' || substr(md5(content_key || ':' || j), 1, 15))::BIGINT
      |                  % 1048576 AS bit
      |         FROM k CROSS JOIN UNNEST(range(0, 7)) t(j)),
      |seen AS (SELECT DISTINCT bit FROM bits WHERE doc_id % 10 <> 0)
      |SELECT doc_id, content_key FROM bits
      |WHERE doc_id % 10 = 0
      |GROUP BY doc_id, content_key
      |HAVING MIN(CASE WHEN bit IN (SELECT bit FROM seen) THEN 1 ELSE 0 END) = 0
      |ORDER BY doc_id""".stripMargin

  /** Benchmark decontamination — flag training documents sharing any
    * 4-token n-gram with the eval set (the pre-training hygiene step that
    * keeps benchmark text out of the corpus; n-gram collision is the
    * standard formulation). The eval side is deterministically carved here
    * (doc_id % 10 = 0) so the oracle mirrors it; in production the eval
    * suite is tiny relative to the corpus, so its distinct-gram set
    * broadcasts and the check is one map-side semi join per gram — the
    * corpus never shuffles.
    */
  /** Per-doc DISTINCT 4-gram stream — the shared input of decontamination
    * (x62) and corpus novelty scoring (x103), persisted once per session
    * via the Layer so the tokenize+explode pass never repeats.
    */
  private[graft] def grams4(spark: SparkSession, dir: String): DataFrame =
    graft.Layer.cached(spark, dir, "grams4") {
      Tables.documents(spark, dir)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 4)
        .select(col("doc_id"),
          explode(array_distinct(transform(sequence(lit(0), size(col("toks")) - 4),
            i => concat_ws(" ", slice(col("toks"), i + 1, lit(4)))))).as("gram"))
    }

  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    // persisted once: both the bench side and the train side consume this
    // plan, and without the layer the tokenize+explode pass runs twice
    val grams = grams4(spark, dir)
    val bench = grams.filter(col("doc_id") % 10 === 0).select("gram").distinct()
    grams.filter(col("doc_id") % 10 =!= 0)
      .join(broadcast(bench), "gram")
      .groupBy("doc_id")
      .agg(countDistinct(col("gram")).as("n_shared"))
      .orderBy("doc_id")
  }

  val decontaminateOracle: String =
    """WITH d AS (SELECT doc_id, string_split(text,' ') AS toks,
      |                  CAST(len(string_split(text,' ')) AS BIGINT) AS n FROM documents),
      |g AS (SELECT doc_id, u.gram FROM d,
      |        UNNEST(list_distinct(list_transform(range(1, n-2),
      |          i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]||' '||toks[i+3]))) u(gram)
      |      WHERE n >= 4),
      |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 0)
      |SELECT g.doc_id, CAST(COUNT(DISTINCT g.gram) AS BIGINT) AS n_shared
      |FROM g JOIN bench USING (gram)
      |WHERE g.doc_id % 10 <> 0
      |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin

  /** Fuzzy benchmark decontamination — the MinHash complement of
    * [[decontaminate]]: exact n-gram collision misses paraphrased or
    * lightly-edited eval leakage, so this flags training documents whose
    * shingle-set Jaccard distance to ANY eval document is ≤ maxDist,
    * via the same md5 MinHash tables as [[minhashPairs]] (table count
    * from the [[minhashTables]] S-curve, shared [[minhashSigs]] layer).
    * Candidates compare only within a matching (table, minhash) bucket,
    * and the eval side is tiny, so at corpus scale this is |eval-bucket|
    * probes per table — never train × eval. Output: flagged train docs
    * with their closest eval distance (exact shingle-set Jaccard).
    * The md5 hash family makes the candidate set SQL-reproducible, so
    * x87 is now oracle-checked end to end; the planted-near-dup recall
    * law stays in ExtSpec.
    */
  def fuzzyDecontaminate(spark: SparkSession, dir: String, maxDist: Double = 0.5): DataFrame = {
    val keyed = minhashSigs(spark, dir, minhashTables(maxDist))
    val evalK = keyed.filter(col("doc_id") % 10 === 0)
    val trainK = keyed.filter(col("doc_id") % 10 =!= 0)
    val cand = trainK.as("x").join(evalK.as("y"),
        col("x.t") === col("y.t") && col("x.mh") === col("y.mh"))
      .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("e")).distinct()
    val sh = shingled3(spark, dir).select(col("doc_id"), col("shingles"))
    cand
      .join(sh.select(col("doc_id").as("doc_id"), col("shingles").as("st")), "doc_id")
      .join(sh.select(col("doc_id").as("e"), col("shingles").as("se")), "e")
      .select(col("doc_id"),
        round(lit(1.0d) - size(array_intersect(col("st"), col("se"))).cast("double") /
          size(array_union(col("st"), col("se"))), 4).as("dist"))
      .filter(col("dist") <= maxDist)
      .groupBy("doc_id")
      .agg(min(col("dist")).as("closest_eval_dist"))
      .orderBy("doc_id")
  }

  /** x87 oracle: [[fuzzyDecontaminate]] verbatim in DuckDB — shared CTE
    * shape with [[minhashOracle]], restricted to train×eval buckets.
    */
  def fuzzyDecontaminateOracle(maxDist: Double = 0.5): String = {
    val b = minhashTables(maxDist)
    s"""WITH d AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
       |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
       |           FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
       |           WHERE len(toks) >= 3),
       |inv AS (SELECT doc_id, u.s AS s FROM d, UNNEST(sh) u(s)),
       |sig AS (SELECT doc_id, t.t AS t,
       |               MIN(('0x' || substr(md5(t.t || ':' || s), 1, 15))::BIGINT) AS mh
       |        FROM inv CROSS JOIN UNNEST(range(0, $b)) t(t) GROUP BY 1, 2),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_id, y.doc_id AS e
       |         FROM sig x JOIN sig y ON x.t = y.t AND x.mh = y.mh
       |         WHERE x.doc_id % 10 <> 0 AND y.doc_id % 10 = 0),
       |v AS (SELECT cand.doc_id,
       |             ROUND(1.0 - CAST(len(list_intersect(dt.sh, de.sh)) AS DOUBLE) /
       |                   len(list_distinct(dt.sh || de.sh)), 4) AS dist
       |      FROM cand JOIN d dt ON dt.doc_id = cand.doc_id
       |                JOIN d de ON de.doc_id = cand.e)
       |SELECT doc_id, MIN(dist) AS closest_eval_dist
       |FROM v WHERE dist <= $maxDist
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** X1 at scale: shuffle 8 bytes of fingerprint, not the document. */
  def exactByFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("fp", gf.fnv1a64(regexp_replace(lower(col("text")), "\\s+", " ")))
      .groupBy("fp")
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies")
      .orderBy("doc_id")

  /** x223: CONTAINMENT near-dup detection — the asymmetric relation the
    * whole Jaccard family (x15/x16/x17) is blind to: a short document
    * quoted wholesale inside a long one has tiny Jaccard (the union is
    * dominated by the container) but containment |A∩B|/|A| ≈ 1 — the
    * news-syndication / boilerplate-inclusion case a curation pipeline
    * must catch separately. Candidates come from the shared 3-shingle
    * inverted index with the x158 df-cap posture (corpus-hot shingles
    * excluded from candidate GENERATION only, so per-shingle work is
    * bounded by cap² and total volume by O(n·cap); the precise miss
    * condition — a pair surfaces iff it shares ≥ 1 sub-cap shingle — is
    * mirrored in the oracle). The verify step recomputes the EXACT
    * intersection on the full shingle sets and both directional
    * containments as pure integer arithmetic: the threshold compare is
    * cross-multiplied (inter·10⁴ ≥ tBp·|A|) and cont_e6 is an integer
    * DIV — no doubles anywhere in this operator.
    */
  def containmentPairs(spark: SparkSession, dir: String,
                       minCont: Double = 0.8, dfCap: Int = 64): DataFrame = {
    val tBp = math.round(minCont * 10000).toInt
    val sh = shingled3(spark, dir).select(col("doc_id"), col("shingles"))
    val inv = sh.select(col("doc_id"), explode(col("shingles")).as("g"))
    val df = inv.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap)
    val subcap = inv.join(df.select("g"), "g")
    // Count-first candidate generation: groupBy(a,b) over the sub-cap
    // pair stream yields BOTH the candidate set (pairs sharing ≥ 1
    // sub-cap shingle — the identical miss condition as a distinct())
    // and inter_sub = |A∩B restricted to sub-cap shingles|, exactly
    // (a shared shingle is sub-cap for both sides or for neither — df
    // is global). A map-side-combinable count is cheaper than the
    // distinct's dedup shuffle, and it powers the prune below.
    val pairSub = subcap.select(col("g"), col("doc_id").as("a"))
      .join(subcap.select(col("g"), col("doc_id").as("b")), "g")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter_sub"))
    // Per-doc hot-shingle budget: every shared shingle NOT counted by
    // inter_sub has df > dfCap on both sides, so
    // inter ≤ inter_sub + least(hot_a, hot_b) — an exact integer upper
    // bound. A pair that passes EITHER directional threshold satisfies
    // inter·10⁴ ≥ tBp·least(sza, szb), so pruning on the bound is
    // output-lossless, and the expensive array-carrying exact verify
    // runs on the handful of survivors instead of the ~n·cap candidate
    // stream (measured sf0.1: 1.13 M candidates → 512 rows out; the
    // array joins + array_intersect were ~80% of the operator's task
    // time before the prune).
    val stats = sh.select(col("doc_id"), size(col("shingles")).cast("long").as("sz"))
      .join(subcap.groupBy("doc_id").agg(count(lit(1)).as("n_sub")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("sz"),
        (col("sz") - coalesce(col("n_sub"), lit(0L))).as("hot"))
    val pruned = pairSub
      .join(stats.select(col("doc_id").as("a"), col("sz").as("sza_s"),
        col("hot").as("hot_a")), "a")
      .join(stats.select(col("doc_id").as("b"), col("sz").as("szb_s"),
        col("hot").as("hot_b")), "b")
      .filter((col("inter_sub") + least(col("hot_a"), col("hot_b"))) * 10000L >=
        lit(tBp.toLong) * least(col("sza_s"), col("szb_s")))
      .select("a", "b")
    val verified = pruned
      .join(sh.select(col("doc_id").as("a"), col("shingles").as("sa")), "a")
      .join(sh.select(col("doc_id").as("b"), col("shingles").as("sb")), "b")
      .select(col("a"), col("b"),
        size(array_intersect(col("sa"), col("sb"))).cast("long").as("inter"),
        size(col("sa")).cast("long").as("sza"),
        size(col("sb")).cast("long").as("szb"))
    val dirA = verified
      .filter(col("inter") * 10000L >= lit(tBp.toLong) * col("sza"))
      .select(col("a").as("contained"), col("b").as("container"),
        col("inter"), col("sza").as("sz_contained"),
        expr("inter * 1000000 DIV sza").as("cont_e6"))
    val dirB = verified
      .filter(col("inter") * 10000L >= lit(tBp.toLong) * col("szb"))
      .select(col("b").as("contained"), col("a").as("container"),
        col("inter"), col("szb").as("sz_contained"),
        expr("inter * 1000000 DIV szb").as("cont_e6"))
    dirA.unionByName(dirB).orderBy("contained", "container")
  }

  val containmentOracle: String =
    """WITH docs AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (
      |  SELECT doc_id,
      |         list_distinct([array_to_string(toks[i:i+2], ' ')
      |                        for i in range(1, len(toks) - 1)]) AS s
      |  FROM docs),
      |inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
      |df AS (SELECT g, COUNT(*) AS df FROM inv GROUP BY 1 HAVING COUNT(*) <= 64),
      |sub AS (SELECT i.doc_id, i.g FROM inv i JOIN df USING (g)),
      |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      |         FROM sub x JOIN sub y ON x.g = y.g AND x.doc_id < y.doc_id),
      |v AS (SELECT c.a, c.b,
      |        CAST(len(list_filter(sa.s, x -> list_contains(sb.s, x))) AS BIGINT) AS inter,
      |        CAST(len(sa.s) AS BIGINT) AS sza, CAST(len(sb.s) AS BIGINT) AS szb
      |      FROM cand c
      |      JOIN sh sa ON sa.doc_id = c.a
      |      JOIN sh sb ON sb.doc_id = c.b)
      |SELECT contained, container, inter, sz_contained,
      |       CAST(inter * 1000000 // sz_contained AS BIGINT) AS cont_e6
      |FROM (
      |  SELECT a AS contained, b AS container, inter, sza AS sz_contained
      |  FROM v WHERE inter * 10000 >= 8000 * sza
      |  UNION ALL
      |  SELECT b, a, inter, szb FROM v WHERE inter * 10000 >= 8000 * szb)
      |ORDER BY contained, container""".stripMargin

  private def shingled(df: DataFrame, n: Int): DataFrame =
    df.withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= n)
      .withColumn("shingles",
        array_distinct(transform(
          sequence(lit(0), size(col("toks")) - n),
          i => concat_ws(" ", slice(col("toks"), i + 1, lit(n))))))
      .drop("toks")

  /** The 3-shingle pass, persisted once per (session, sf dir): the Jaccard
    * join consumes this plan three times (inverted index + both sides of
    * the verify join) and SimHash/MinHash shingle identically, so without
    * the layer the tokenize+shingle projection re-runs per consumer.
    */
  private def shingled3(spark: SparkSession, dir: String): DataFrame =
    graft.Layer.cached(spark, dir, "shingles3")(
      shingled(Tables.documents(spark, dir), 3))

  /** Derived OR-amplification width for [[minhashPairs]]. Each of the b
    * MinHash tables buckets on one min-wise hash (r = 1 in banding
    * terms), so a pair at Jaccard similarity s becomes a candidate with
    * probability 1 − (1−s)^b — the b·r S-curve at r = 1. Solving for
    * recall target p at the decision threshold s* = 1 − maxDist:
    * b = ⌈ln(1−p) / ln(1−s*)⌉. Unlike the band dials in [[simhashPairs]]
    * and [[deriveBands]] — which must widen with n to keep bucket
    * population O(1) — this derivation is corpus-size INDEPENDENT: the
    * S-curve is a per-pair probability in s only, so (s*, p) fix b at any
    * scale, and candidate-join cost grows linearly in b. Defaults
    * (maxDist = 0.7, p = 0.94) give b = 8, the previously hard-coded
    * value; recall above the threshold only improves (s > s* ⇒ higher
    * candidate probability).
    */
  private[graft] def minhashTables(maxDist: Double, recallTarget: Double = 0.94): Int = {
    val s = 1.0 - maxDist
    require(s > 0 && s < 1, s"maxDist $maxDist must be in (0, 1)")
    require(recallTarget > 0 && recallTarget < 1, s"recall target $recallTarget must be in (0, 1)")
    math.max(1, math.ceil(math.log(1 - recallTarget) / math.log(1 - s)).toInt)
  }

  /** Per-table MinHash keys `(doc_id, t, mh)`: for each of the b tables,
    * mh = min over the doc's distinct shingles of a 60-bit md5-derived
    * hash H(t, s) = int(md5("t:s")[0:15 hex]). One aggregate over the
    * exploded shingle stream (b column-mins, map-side combinable), then a
    * b-way in-row explode — never a per-table corpus pass. md5 INSTEAD OF
    * spark.ml's seeded Random coefficients is what makes the operator
    * oracle-checkable: DuckDB computes the identical hash from the same
    * string, so the full candidate set — not just the verified output —
    * is reproducible in SQL. Statistically it is the same construction
    * (b independent min-wise hashes; P[mh_a = mh_b] = J(a,b) per table).
    */
  private def minhashSigs(spark: SparkSession, dir: String, b: Int): DataFrame =
    graft.Layer.cached(spark, dir, s"minhashSigs@$b") {
      val inv = shingled3(spark, dir)
        .select(col("doc_id"), explode(col("shingles")).as("s"))
      val mins = (0 until b).map(t =>
        min(conv(substring(md5(concat(lit(t.toString), lit(":"), col("s"))), 1, 15), 16, 10)
          .cast("long")).as(s"mh$t"))
      inv.groupBy("doc_id").agg(mins.head, mins.tail: _*)
        .select(col("doc_id"), explode(array((0 until b).map(t =>
          struct(lit(t).as("t"), col(s"mh$t").as("mh"))): _*)).as("k"))
        .select(col("doc_id"), col("k.t").as("t"), col("k.mh").as("mh"))
    }

  /** X2 MinHash+LSH near-dup pairs: token 3-shingles → b md5 MinHash
    * tables ([[minhashSigs]]) → bucket self-join (pairs compare only
    * within a matching (table, minhash) bucket) → exact shingle-set
    * Jaccard verify at the cutoff. Table count derives from the distance
    * cutoff via [[minhashTables]]. Two upgrades over the previous
    * spark.ml formulation: the verify distance is Jaccard over the TRUE
    * shingle sets (no HashingTF modulo-2^18 collision noise), and the
    * md5 hash family makes the whole pipeline DuckDB-mirrorable — x16
    * graduates from rows-only to hash-matched. Output: candidate pairs
    * with exact Jaccard distance ≤ maxDist.
    *
    * BEHAVIORAL NOTE (round-12 change, r12 ADVICE changelog): through
    * round 11 an explicit `budget` argument was enforced as budget/4
    * (the derate applied inside the body); since round 12 the derate
    * lives only in the parameter DEFAULT and an explicit budget B is
    * enforced exactly as B — callers who passed an explicit budget
    * before r12 now get a 4× looser guard than the old behavior and
    * should pass B/4 to reproduce it.
    */
  def minhashPairs(spark: SparkSession, dir: String, maxDist: Double = 0.7,
                   budget: Long = pairBudget / 4): DataFrame = {
    val keyed = minhashSigs(spark, dir, minhashTables(maxDist))
    // bare-channel saturation guard (the x16 twin of x15's m100 abort):
    // Σ c·(c−1)/2 over the (table, minhash) bucket populations is EXACTLY
    // the row count the bucket self-join below will emit before distinct —
    // on a saturated corpus the per-table min-hash collapses to a handful
    // of values and this goes to ~b·n²/2 (the measured 1.92 task exponent).
    // One aggregate over the Layer-cached signature frame, refused before
    // any pair ships. The DEFAULT budget is a QUARTER of the shared dial
    // (derated in the parameter default, so an explicit caller budget is
    // enforced exactly as given — the x15 ngramJaccardPairs convention):
    // unlike x15's df-frame estimate (an upper bound that prefix
    // filtering then shrinks ~3×), this estimate is exact on candidates
    // but each candidate still fans through the distinct exchange and two
    // verify joins — measured at the saturated m100: 7.8·10⁸ estimated
    // candidates shipped 2.3·10⁹ shuffle rows / 66 GiB before aborting.
    // Calibration on the same corpus family: saturated m100 estimates
    // (x15 2.9·10⁹, x16 7.8·10⁸) refuse; the healthy 30× protocol corpus
    // (x15 2.6·10⁸, x16 ~7·10⁷) clears both dials with ≥ 2× margin.
    requirePairBudget(
      candidatePairEstimate(
        keyed.groupBy("t", "mh").agg(count(lit(1)).as("c")), "c"),
      budget, "minhashPairs (x16)")
    val cand = keyed.as("x").join(keyed.as("y"),
        col("x.t") === col("y.t") && col("x.mh") === col("y.mh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
    val sh = shingled3(spark, dir).select(col("doc_id"), col("shingles"))
    cand
      .join(sh.select(col("doc_id").as("a"), col("shingles").as("sa")), "a")
      .join(sh.select(col("doc_id").as("b"), col("shingles").as("sb")), "b")
      .select(col("a"), col("b"),
        round(lit(1.0d) - size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb"))), 4).as("jaccard_dist"))
      .filter(col("jaccard_dist") <= maxDist)
      .orderBy("a", "b")
  }

  /** x16 oracle: the [[minhashPairs]] pipeline verbatim in DuckDB — the
    * same b derived from the same S-curve, the same md5 table hashes, the
    * same exact-Jaccard verify. Band parameters interpolate at library
    * build from [[minhashTables]], the x21 derived-oracle discipline.
    */
  def minhashOracle(maxDist: Double = 0.7): String = {
    val b = minhashTables(maxDist)
    s"""WITH d AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
       |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
       |           FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
       |           WHERE len(toks) >= 3),
       |inv AS (SELECT doc_id, u.s AS s FROM d, UNNEST(sh) u(s)),
       |sig AS (SELECT doc_id, t.t AS t,
       |               MIN(('0x' || substr(md5(t.t || ':' || s), 1, 15))::BIGINT) AS mh
       |        FROM inv CROSS JOIN UNNEST(range(0, $b)) t(t) GROUP BY 1, 2),
       |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |         FROM sig x JOIN sig y
       |           ON x.t = y.t AND x.mh = y.mh AND x.doc_id < y.doc_id),
       |v AS (SELECT cand.a, cand.b,
       |             ROUND(1.0 - CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE) /
       |                   len(list_distinct(da.sh || db.sh)), 4) AS jaccard_dist
       |      FROM cand JOIN d da ON da.doc_id = cand.a
       |                JOIN d db ON db.doc_id = cand.b)
       |SELECT a, b, jaccard_dist FROM v WHERE jaccard_dist <= $maxDist
       |ORDER BY a, b""".stripMargin
  }

  /** X2 SimHash near-dup pairs via the native SimHash64 expression, with a
    * SCALE-ADAPTIVE candidate scheme. The 64-bit signature splits into B
    * bands of 64/B bits; a pair within Hamming distance h has its
    * differing bits in ≤ h bands, leaving ≥ B−h clean bands, so joining on
    * every r-combination of bands (r = B−h) finds every qualifying pair —
    * pigeonhole, provably lossless for h ≤ B−1. B derives from corpus
    * size: 4 bands below 16k docs (4 single-band 16-bit keys, 2^16
    * buckets — the small-corpus shape), 8 bands above (C(8,5) = 56 combo
    * keys of 5×8 = 40 bits, 2^40 buckets), so bucket population — and the
    * Σ bucket² pair space — keeps scaling with key width instead of
    * regressing toward n²/2^16 at n ≫ 2^16. The OUTPUT is
    * config-independent (under either B the candidates are a superset of
    * all pairs at Hamming ≤ h, and the verify filter keeps exactly those),
    * asserted as an ExtSpec law at both configurations.
    */
  def simhashPairs(spark: SparkSession, dir: String, maxHamming: Int = 3,
                   nBands: Int = 0): DataFrame = {
    // persist the signatures: the banded self-join references this plan
    // twice, and without a materialization the shingle+hash pass runs twice
    val sigs = graft.Layer.cached(spark, dir, "simhashSigs") {
      shingled3(spark, dir)
        .select(col("doc_id"), gf.simhash64(col("shingles")).as("sig"))
    }
    // corpus count for the derivation: count(*) over parquet resolves from
    // footer metadata — control-plane cost, like an ML fit's stats pass
    val bands =
      if (nBands > 0) nBands
      else if (Tables.documents(spark, dir).count() <= (1L << 14)) 4 else 8
    // bands == 1 would pass the divisibility check but make w = 64, and
    // (1L << 64) - 1 is 0 under shift-mod-64 — every doc would land in band
    // key 0 and the "bucketed" candidate join would silently degenerate to
    // the full n²/2 cross product (output still correct via the Hamming
    // verify, but the contract is gone). The derived path yields 4 or 8;
    // reject the degenerate caller value outright.
    require(64 % bands == 0 && bands >= 2,
      s"band count $bands must divide 64 and be >= 2 (bands = 1 has no bucketing effect)")
    val w = 64 / bands
    // h > B−1 leaves no guaranteed-clean band: degrade to best-effort r=1
    // (single-band keys) rather than emit an empty combination
    val r = math.max(1, bands - maxHamming)
    def bandVal(bnd: Int) =
      shiftright(col("sig"), bnd * w).bitwiseAND(lit((1L << w) - 1))
    val combos = (0 until bands).combinations(r).toSeq
    val banded = sigs.select(col("doc_id"), col("sig"),
      explode(array(combos.zipWithIndex.map { case (combo, idx) =>
        struct(lit(idx).as("band"),
          combo.zipWithIndex.map { case (bnd, i) => shiftleft(bandVal(bnd), i * w) }
            .reduce(_.bitwiseOR(_)).as("key"))
      }: _*)).as("bk"))
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

  /** x158: df-capped near-dup pairs — the saturation guard SCALE.md's 30×
    * measurement motivates. [[ngramJaccardPairs]] is provably exact but
    * its candidate volume is Σ_s df(s)² over per-doc prefix shingles,
    * which degenerates to n²/|shingle-domain| when the corpus is
    * boilerplate-saturated (every shingle corpus-hot — the measured
    * 10→30× e = 2.43). This variant excludes shingles with df > dfCap
    * from CANDIDATE GENERATION ONLY — the same [[ngramJaccardPairs]]
    * prefix machinery with one added filter (df ≤ cap on prefix entries,
    * applied AFTER ranks so the positional bounds keep their uncapped
    * meaning). Per-shingle candidate work is bounded by cap², total
    * candidate volume by O(n·cap) — linear at ANY saturation — and the
    * verify step still computes exact Jaccard on the full shingle sets,
    * so precision is exact. The recall contract is precise, not
    * hand-wavy: sub-cap shingles sort strictly before hot ones in the
    * global (df, shingle) prefix order, so the order-smallest common
    * shingle s* of a qualifying pair survives the cap iff the pair's
    * rarest shared shingle does — a qualifying pair is missed iff EVERY
    * shingle the two docs share is corpus-hot (df > cap), i.e. the pair
    * is near-duplicate only in boilerplate, which is exactly the
    * evidence a curation pipeline should refuse to act on (the CCNet /
    * RefinedWeb practice of discounting boilerplate overlap). ExtSpec
    * asserts that miss condition literally against the exact x15 pairs;
    * the DuckDB oracle states it as the all-pairs twin with a
    * min-shared-df gate, so the hash check pins BOTH directions of the
    * equivalence.
    */
  def cappedNeardupPairs(spark: SparkSession, dir: String,
                         minJaccard: Double = 0.6, dfCap: Int = 64): DataFrame =
    // unguarded by construction: the df cap bounds per-shingle candidate
    // work at cap² and total volume at O(n·cap) — no saturation regime
    // can blow this channel up, which is the whole reason it exists
    prefixFilteredPairs(spark, dir, minJaccard, Some(dfCap), guard = None)

  /** x158 oracle: the SEMANTIC contract, not the plan — the capped-prefix
    * PPJoin's output equals exactly {qualifying pairs whose RAREST shared
    * shingle has df ≤ cap} (both directions of that equivalence are the
    * prefix theorem + the strict sub-cap-before-hot ordering; see
    * [[cappedNeardupPairs]]). The twin states it on the all-pairs
    * formulation: x15's oracle with a min-shared-df gate.
    */
  def cappedNeardupOracle(minJaccard: Double = 0.6, dfCap: Int = 64): String =
    s"""WITH t AS (
       |  SELECT doc_id, lang, string_split(text, ' ') AS toks
       |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
       |sh AS (
       |  SELECT doc_id, lang,
       |         list_distinct(list_transform(range(1, len(toks) - 1),
       |                                      i -> array_to_string(toks[i:i+2], ' '))) AS s
       |  FROM t),
       |f AS (SELECT sh.lang, u.s AS s, COUNT(*) AS df
       |      FROM sh, UNNEST(sh.s) u(s) GROUP BY 1, 2),
       |p AS (
       |  SELECT a.doc_id AS a, b.doc_id AS b, a.lang AS lang,
       |         list_filter(a.s, x -> list_contains(b.s, x)) AS shared,
       |         ROUND(len(list_filter(a.s, x -> list_contains(b.s, x))) /
       |               len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard
       |  FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id),
       |q AS (SELECT a, b, lang, shared, jaccard FROM p WHERE jaccard >= $minJaccard),
       |mx AS (SELECT q.a, q.b, q.lang, u.s AS s FROM q, UNNEST(q.shared) u(s)),
       |m AS (SELECT mx.a, mx.b, MIN(f.df) AS mindf
       |      FROM mx JOIN f ON f.lang = mx.lang AND f.s = mx.s
       |      GROUP BY 1, 2)
       |SELECT q.a, q.b, q.jaccard
       |FROM q JOIN m ON m.a = q.a AND m.b = q.b
       |WHERE m.mindf <= $dfCap ORDER BY q.a, q.b""".stripMargin

  /** X2 n-gram Jaccard near-dup pairs, exact, within-lang: J(a,b) =
    * |A∩B| / |A∪B| over distinct 3-shingles, prefix-filtered (AllPairs /
    * PPJoin candidate rule):
    *
    * 1. Invert: explode shingles, compute each shingle's document frequency
    *    per lang (one groupBy).
    * 2. Prefix: per doc, keep only the ⌊(1−t)·|A|⌋+1 globally-rarest
    *    shingles (order by (df, shingle)). Theorem: if J(A,B) ≥ t then
    *    |A∩B| ≥ t·max(|A|,|B|), and the order-smallest common shingle sits
    *    within the first |A|−⌈t·|A|⌉+1 positions of BOTH docs — so the
    *    prefix equi-join loses no qualifying pair (exact, not approximate).
    * 3. Candidate equi-join on (lang, prefix-shingle), distinct pairs.
    * 4. Verify: join full shingle arrays back, exact J via array_intersect.
    *
    * Identical output to the all-pairs formulation, but corpus-hot shingles
    * (high df) are by construction excluded from most prefixes, so the
    * candidate-pair space is Σ per-RARE-shingle-count² — the df-quadratic
    * hot-shingle blowup of a plain inverted-index join (one shingle in 1%
    * of a 100 TB corpus → count² pairs) cannot happen.
    */
  def ngramJaccardPairs(spark: SparkSession, dir: String, minJaccard: Double = 0.6,
                        budget: Long = pairBudget): DataFrame =
    prefixFilteredPairs(spark, dir, minJaccard, dfCap = None, guard = Some(budget))

  /** Per-(lang, shingle) document-frequency frame — the x269 probe
    * surface (the same inverted frame the PPJoin prefix already builds).
    */
  private[graft] def shingleDfFrame(docs: DataFrame): DataFrame =
    shingled(docs, 3)
      .select(col("lang"), explode(col("shingles")).as("s"))
      .groupBy("lang", "s").agg(count(lit(1)).as("df"))

  /** The corpus's (lang, shingle) → df frame, persisted once per
    * (session, sf dir) — round-13: the x269 routing probe and BOTH
    * near-dup channels consume this same aggregate, and before this
    * layer existed the probe re-ran the explode+groupBy on every
    * routedNearDup call even when the channel's pair result was already
    * memoized (the r12 x135/x142 warm regression: the pipeline paid the
    * df aggregate twice per warm pass). One Layer entry; the probe is
    * now a genuine 1-row aggregate over a cached frame, and the
    * channels' prefix join reads the identical blocks.
    */
  private[graft] def shingleDf(spark: SparkSession, dir: String): DataFrame =
    graft.Layer.cached(spark, dir, "shingleDf")(
      shingled3(spark, dir)
        .select(col("lang"), explode(col("shingles")).as("s"))
        .groupBy("lang", "s").agg(count(lit(1)).as("df")))

  /** Share of DISTINCT shingles that are corpus-hot (df > dfCap) — the
    * saturation statistic of SCALE.md's routing prose: ≈0 on a Heaps-law
    * corpus (vocabulary keeps growing, sub-cap evidence dominates), →1
    * when the vocabulary has saturated and every posting list is hot.
    * One aggregate, 1-row driver boundary; exact 0/1 counts so the
    * double ratio is engine-identical.
    */
  private[graft] def saturationShare(dfFrame: DataFrame, dfCap: Int): Double =
    dfFrame.agg(coalesce(avg(when(col("df") > dfCap, 1d).otherwise(0d)), lit(0d)))
      .head.getDouble(0)

  /** Candidate-pair budget for the BARE exact near-dup channels (x15
    * PPJoin, x16 MinHash). The round-10 m100 rehearsal proved the failure
    * mode: on a saturation-hot corpus both channels shipped 35–66 GiB of
    * doomed pair shuffle before aborting — 11,600 burned task-seconds for
    * a join that could never finish. The guard refuses BEFORE the pair
    * join is attempted, for the cost of one aggregate over a frame the
    * channel already builds. Default 2·10⁹ estimated pairs (≈ 32 GB of
    * 16-byte pair keys — the abort's scale); override via
    * SPARK_GRAFT_PAIR_BUDGET. Gate SFs sit 3–6 orders of magnitude below
    * (sf0.01: 3.7 k, sf0.1: 326 k vs the saturated m100's ~10¹³), so the
    * refusal can never fire on a healthy corpus by accident.
    */
  private[graft] def pairBudget: Long =
    sys.env.get("SPARK_GRAFT_PAIR_BUDGET") match {
      case None => 2000000000L
      case Some(v) =>
        val parsed = v.toLongOption
        require(parsed.exists(_ >= 1L),
          s"SPARK_GRAFT_PAIR_BUDGET must be a positive integer within Long range, got '$v'")
        parsed.get
    }

  /** Σ c·(c−1)/2 over a bucket-population frame — the row count the
    * bucket self-join would emit before any verify (exact for x16's
    * (table, minhash) buckets; an upper bound for x15's df frame, since
    * prefix filtering only shrinks posting lists). Double arithmetic by
    * design: this is a refuse/admit estimate, and Σ df² on a web-scale
    * saturated corpus overflows Long (10⁹ docs × hot lists → > 10¹⁹).
    */
  private[graft] def candidatePairEstimate(buckets: DataFrame, cntCol: String): Double =
    buckets.agg(coalesce(
        sum(col(cntCol).cast("double") * (col(cntCol).cast("double") - 1d) / 2d), lit(0d)))
      .head.getDouble(0)

  private def requirePairBudget(est: Double, budget: Long, channel: String): Unit =
    require(est <= budget.toDouble,
      f"$channel refused: candidate-pair estimate $est%.3g exceeds the " +
        f"pair budget $budget%d — this corpus is saturation-hot for the bare " +
        "exact channel (every posting list corpus-hot ⇒ the pair join is " +
        "superlinear and was measured to abort at 100×, SCALE.md). Use " +
        "routedNearDup (x269) to auto-route, or cappedNeardupPairs (x158) " +
        "for the df-capped channel whose volume is O(n·cap) at any " +
        "saturation; raise SPARK_GRAFT_PAIR_BUDGET only with cluster " +
        "shuffle capacity to match.")

  /** x269: saturation-ROUTED near-dup — the r9 SCALE.md routing finding
    * made executable. The measured facts it encodes: on the 30× fully
    * saturated corpus (every observed 3-shingle hotter than the cap) the
    * exact PPJoin channel (x15) goes superlinear (task e 1.60, and
    * MinHash 1.92 — posting-list concentration, not duplicate count,
    * governs the pair space), while the df-capped channel (x158) holds
    * task e 0.96 at ANY saturation by refusing boilerplate-only
    * evidence; on a Heaps-law corpus (β ≈ 0.5, the 100 TB web case) the
    * exact channel is both safe (e ≈ 0.65) and strictly more complete,
    * so capping by default would give away recall for nothing. The
    * routing probe is [[routeToCapped]] over the shingle df frame —
    * computed BEFORE any pair join is attempted — with TWO gates
    * (round-11): the 0.5 saturation SHARE, and the Σ df·(df−1)/2
    * candidate MASS against [[RouteMassBudget]] (share alone is blind
    * to a Heaps-law corpus whose few mega-hot boilerplate shingles make
    * the exact join a multi-billion-row shuffle). Either gate →
    * [[cappedNeardupPairs]], else [[ngramJaccardPairs]]. The decision
    * is a 1-row driver boundary, and the ORACLE derives the same share
    * AND mass from the same frame and gates each channel's SQL on
    * them, so the routing itself (not just the routed result) is
    * hash-checked at every gate SF. ExtSpec pins all three directions
    * with synthetic fixtures (a saturated corpus routes capped, a
    * mass-hot low-share corpus routes capped, a Heaps corpus routes
    * exact).
    */
  /** The router's mass-gate threshold — a DOCUMENTED CONSTANT, not the
    * env dial: the oracle must compute the identical routing decision,
    * and SQL cannot read this process's environment. (The env dial
    * stays what it is — the bare channels' refusal budget.)
    */
  private[graft] val RouteMassBudget: Long = 2000000000L

  /** The routing decision (true = capped channel), from TWO signals over
    * the shared df frame — round-11 closes the share-only blind spot:
    *
    *  - SHARE (r10): fraction of distinct shingles with df > cap — the
    *    vocabulary-saturation statistic (→1 when the whole vocabulary is
    *    hot, the m100 regime).
    *  - MASS (r11): Σ df·(df−1)/2, the candidate-pair estimate — a
    *    corpus can sit far BELOW the 0.5 share (a Heaps-law vocabulary
    *    with a handful of mega-hot boilerplate shingles) while those few
    *    posting lists alone make the exact pair join a multi-billion-row
    *    shuffle. Share misses it; mass catches it. Terms compute on
    *    least(df, 10⁵) so the BIGINT sum cannot overflow on any feasible
    *    corpus (a single df ≥ 63 246 already crosses the 2·10⁹ gate, so
    *    the clamp never changes a decision — it only bounds the
    *    arithmetic), exactly mirrored in the oracle's integer SQL.
    */
  private[graft] def routeToCapped(dfFrame: DataFrame, dfCap: Int,
                                   routeBudget: Long): Boolean = {
    val probe = dfFrame.agg(
      coalesce(avg(when(col("df") > dfCap, 1d).otherwise(0d)), lit(0d)).as("sat"),
      coalesce(sum(expr("least(df, 100000) * (least(df, 100000) - 1) DIV 2")),
        lit(0L)).as("mass")).head()
    probe.getDouble(0) >= 0.5 || probe.getLong(1) > routeBudget
  }

  def routedNearDup(spark: SparkSession, dir: String,
                    minJaccard: Double = 0.6, dfCap: Int = 64,
                    routeBudget: Long = RouteMassBudget): DataFrame = {
    // probe off the LAYER-CACHED df frame the selected channel also
    // consumes (round-13, the r12 x135/x142 warm fix): before, only the
    // SHINGLE pass was shared and the explode+groupBy df aggregate
    // re-ran per probe even when the channel's pair result was already
    // memoized — the pipeline queries paid that aggregate on every warm
    // pass. Now [[shingleDf]] persists the aggregate once per (session,
    // dir); the probe is a 1-row scan of cached blocks and the channels'
    // prefix join reads the same entry. Counts and hashes unchanged
    // (the frame is identical — only its caching moved).
    val capped = routeToCapped(shingleDf(spark, dir), dfCap, routeBudget)
    if (capped) cappedNeardupPairs(spark, dir, minJaccard, dfCap)
    // budget = MaxValue: the router's informed decision IS the guard
    // here — double jeopardy against the env dial would let an env
    // override silently veto a routing the oracle has already mirrored
    else ngramJaccardPairs(spark, dir, minJaccard, budget = Long.MaxValue)
  }

  /** x269 oracle — the probe CTE computes the identical saturation share
    * and each channel's SQL (x15's all-pairs twin; x158's min-shared-df
    * gate) is admitted by the matching WHERE on it, so exactly one
    * branch of the UNION ALL survives and it is the branch the Scala
    * router picked.
    */
  def routedNearDupOracle(minJaccard: Double = 0.6, dfCap: Int = 64,
                          routeBudget: Long = RouteMassBudget): String =
    s"""WITH t AS (
       |  SELECT doc_id, lang, string_split(text, ' ') AS toks
       |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
       |sh AS (
       |  SELECT doc_id, lang,
       |         list_distinct(list_transform(range(1, len(toks) - 1),
       |                                      i -> array_to_string(toks[i:i+2], ' '))) AS s
       |  FROM t),
       |f AS (SELECT sh.lang, u.s AS s, COUNT(*) AS df
       |      FROM sh, UNNEST(sh.s) u(s) GROUP BY 1, 2),
       |probe AS (SELECT COALESCE(AVG(CASE WHEN df > $dfCap THEN 1.0 ELSE 0.0 END), 0.0) AS sat,
       |                 COALESCE(SUM(LEAST(df, 100000) * (LEAST(df, 100000) - 1) // 2),
       |                          0) AS mass
       |          FROM f),
       |p AS (
       |  SELECT a.doc_id AS a, b.doc_id AS b, a.lang AS lang,
       |         list_filter(a.s, x -> list_contains(b.s, x)) AS shared,
       |         ROUND(len(list_filter(a.s, x -> list_contains(b.s, x))) /
       |               len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard
       |  FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id),
       |q AS (SELECT a, b, lang, shared, jaccard FROM p WHERE jaccard >= $minJaccard),
       |mx AS (SELECT q.a, q.b, q.lang, u.s AS s FROM q, UNNEST(q.shared) u(s)),
       |m AS (SELECT mx.a, mx.b, MIN(f.df) AS mindf
       |      FROM mx JOIN f ON f.lang = mx.lang AND f.s = mx.s
       |      GROUP BY 1, 2)
       |SELECT a, b, jaccard FROM (
       |  SELECT q.a, q.b, q.jaccard FROM q
       |  WHERE (SELECT sat FROM probe) < 0.5
       |    AND (SELECT mass FROM probe) <= $routeBudget
       |  UNION ALL
       |  SELECT q.a, q.b, q.jaccard
       |  FROM q JOIN m ON m.a = q.a AND m.b = q.b
       |  WHERE ((SELECT sat FROM probe) >= 0.5
       |         OR (SELECT mass FROM probe) > $routeBudget)
       |    AND m.mindf <= $dfCap)
       |ORDER BY a, b""".stripMargin

  private def prefixFilteredPairs(spark: SparkSession, dir: String, minJaccard: Double,
                                  dfCap: Option[Int], guard: Option[Long]): DataFrame =
  graft.Layer.cached(spark, dir, s"jaccardPairs@$minJaccard${dfCap.fold("")("#" + _)}") {
    val docs = shingled3(spark, dir)
      .select(col("lang"), col("doc_id"), col("shingles"), size(col("shingles")).as("sz"))
    val inv = docs.select(col("lang"), col("doc_id"), col("sz"), explode(col("shingles")).as("s"))
    // the Layer-shared df aggregate — the same persisted frame the x269
    // routing probe reads (round-13; previously rebuilt here from `inv`)
    val df = shingleDf(spark, dir)
    // bare-channel saturation guard (x15's m100 abort, round-10): refuse
    // LOUDLY off the df frame — one aggregate over the Layer-shared
    // shingle pass — before a doomed pair join ships anything. Runs once
    // per (session, dir, threshold): the Layer memoizes the built frame,
    // and a refusal throws before anything is cached.
    guard.foreach(b =>
      requirePairBudget(candidatePairEstimate(df, "df"), b, "ngramJaccardPairs (x15)"))
    // per-doc prefix under the global (df asc, shingle asc) total order.
    // Length |A|−L+1 with the required-overlap bound L computed in INTEGER
    // basis points: double floor(1−t)·sz under-counts by 1 whenever 1−t
    // rounds low (e.g. t=0.1, sz=10 → 8.999… → 9, losing a qualifying
    // pair). The verify filter accepts ROUND(J,4) ≥ t, i.e. true
    // J ≥ t − 0.5e-4, so L derives from (tBp − 0.5)/10000 — without the
    // half-ulp margin a pair at |A| ≥ 20000 shingles could be pruned here
    // yet pass the rounded verify/oracle. ⌈(2·tBp−1)·sz/20000⌉ exactly.
    val tBp = math.round(minJaccard * 10000).toInt
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("s"))
    // the df-cap (x158) drops corpus-hot shingles from the prefix AFTER
    // ranks are assigned over the UNCAPPED (df, shingle) order: sub-cap
    // shingles sort strictly before hot ones, so the order-smallest
    // common shingle s* of any qualifying pair is sub-cap iff the pair's
    // rarest shared evidence is — and the positional-filter bounds keep
    // their uncapped meaning
    val prefix = inv.join(df, Seq("lang", "s"))
      .withColumn("r", row_number().over(wDoc))
      .filter(col("r") <=
        col("sz") - floor((lit(2L * tBp - 1) * col("sz") + lit(19999)) / 20000) + 1)
      .filter(dfCap.fold(lit(true))(c => col("df") <= c))
      .select("lang", "doc_id", "s", "sz", "r")
    // PPJoin filters, applied INSIDE the candidate join — both provably
    // lossless under the half-ulp margin τ = (2·tBp−1)/20000 (the verify
    // accepts ROUND(J,4) ≥ t, i.e. true J ≥ τ), both pruning BEFORE the
    // distinct:
    // - length: J ≤ min(|A|,|B|)/max(|A|,|B|), so 20000·min ≥ (2tBp−1)·max.
    // - positional: every common shingle sits at global-order position
    //   ≥ (rₐ, r_b) of the FIRST common one, so |A∩B| ≤ 1+min(szₐ−rₐ,
    //   sz_b−r_b); J ≥ τ ⟺ |A∩B|·(20000+num) ≥ num·(szₐ+sz_b) with
    //   num = 2tBp−1 — all-long arithmetic, no division. A qualifying
    //   pair always survives via its first-common-shingle row (which the
    //   prefix theorem keeps in BOTH prefixes, and whose upper bound
    //   dominates the true intersection).
    val num = 2L * tBp - 1
    val cand = prefix.toDF("lang", "a", "s", "sza", "ra")
      .join(prefix.toDF("lang", "b", "s", "szb", "rb"), Seq("lang", "s"))
      .filter(col("a") < col("b") &&
        least(col("sza"), col("szb")) * 20000 >= greatest(col("sza"), col("szb")) * num &&
        (lit(1) + least(col("sza") - col("ra"), col("szb") - col("rb"))) * (20000 + num) >=
          (col("sza") + col("szb")) * num)
      .select("a", "b").distinct()
    val da = docs.select(col("doc_id").as("a"), col("shingles").as("sa"), col("sz").as("sza"))
    val db = docs.select(col("doc_id").as("b"), col("shingles").as("sb"), col("sz").as("szb"))
    cand.join(da, "a").join(db, "b")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard",
        round(col("inter") / (col("sza") + col("szb") - col("inter")), 4))
      .filter(col("jaccard") >= minJaccard)
      .select("a", "b", "jaccard")
      .orderBy("a", "b")
  }

  /** Duplicate-cluster resolution: connected components over the near-dup
    * pair graph by iterative min-label propagation — each node adopts the
    * smallest doc_id reachable so far, accelerated by per-round pointer
    * jumping to O(log diameter) rounds (see
    * [[connectedComponentsWithRounds]]). The driver loop is CONTROL only
    * (like ML iterations): per round one distributed join + aggregate, and
    * the convergence check is a count, not a data collect. This is how a
    * pipeline keeps ONE representative per duplicate group rather than
    * dropping pairwise.
    */
  def dupClusters(spark: SparkSession, dir: String, minJaccard: Double = 0.6): DataFrame =
    dupClustersUnsorted(spark, dir, minJaccard).orderBy("doc_id")

  /** The unsorted Layer-memoized cluster labels — graph/aggregate
    * consumers (x139's representative selection) take THIS frame; the
    * public [[dupClusters]] adds the presentation sort. The labels frame
    * comes back persisted (see [[connectedComponents]]), so repeated
    * invocations must reuse one copy (evicted via Layer.clear) rather
    * than leak a new persist each call.
    */
  private[graft] def dupClustersUnsorted(spark: SparkSession, dir: String,
                                         minJaccard: Double = 0.6): DataFrame =
    graft.Layer.cached(spark, dir, s"dupClusters@$minJaccard") {
      connectedComponents(ngramJaccardPairs(spark, dir, minJaccard).select("a", "b"))
        .select(col("id").as("doc_id"), col("rep").as("cluster_rep"))
    }

  /** Min-label propagation over an undirected pair list `(a, b)`; returns
    * one row per node with its component's smallest id as `rep`. The
    * result comes back PERSISTED (it is the converged loop state; dropping
    * the persist would recompute the whole iteration on first use) — the
    * caller owns the unpersist, or memoizes via Layer as [[dupClusters]]
    * does.
    */
  def connectedComponents(pairs: DataFrame): DataFrame =
    connectedComponentsWithRounds(pairs)._1

  /** As [[connectedComponents]], additionally reporting the round count
    * (ExtSpec asserts the logarithmic bound on a planted deep chain).
    *
    * Each round is min-label propagation (adopt the smallest neighbor
    * label) followed by one POINTER JUMP (rep := rep(rep), a self-join of
    * the label table — valid because every rep is itself a node id).
    * Propagation alone converges in O(diameter) rounds, so a
    * 10⁶-long duplicate chain would cost 10⁶ shuffle rounds; the jump
    * doubles the distance a label travels per round, the pointer-doubling
    * idea behind the large-star/small-star CC algorithms, giving
    * O(log diameter) rounds at one extra equi-join per round. Labels only
    * ever decrease, and the propagate fixpoint is constant per component
    * (for every edge rep(a) ≤ rep(b) and vice versa), so the converged
    * state — and x63's oracle — is unchanged by the acceleration.
    * `maxRounds` (default 64 ≫ 2·log₂ of any feasible node count) guards
    * the driver loop: a non-converging iteration throws instead of
    * spinning forever.
    */
  private[graft] def connectedComponentsWithRounds(
      pairs: DataFrame, maxRounds: Int = 64,
      injectFailureAtRound: Int = -1): (DataFrame, Int) = {
    // Symmetrize with ONE pass over `pairs` (explode of the two
    // orientations), not union(pairs, pairs.reversed): the input pair DAG
    // is typically unpersisted and can be expensive (PPJoin / PassJoin
    // candidate generation) — a two-branch union would evaluate that whole
    // DAG twice when `edges` materializes.
    val edges = pairs.select(explode(array(
        struct(col("a").as("a"), col("b").as("b")),
        struct(col("b").as("a"), col("a").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b")).persist()
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("rep", col("id")).persist()
    var changed = 1L
    var rounds = 0
    // the round's in-flight persisted propagate state, visible to the catch:
    // a throw between prop.persist() and prop.unpersist() (jump join,
    // convergence count, the max-rounds guard) must release THIS round's
    // blocks too, not just `labels`
    var inFlight: DataFrame = null
    try {
    while (changed > 0) {
      rounds += 1
      if (rounds > maxRounds)
        throw new IllegalStateException(
          s"connected components did not converge within $maxRounds rounds; " +
            "pointer jumping needs ~2*log2(nodes), so the pair graph is " +
            "pathological (or raise maxRounds)")
      val t0 = System.nanoTime()
      val viaNbr = edges
        .join(labels.select(col("id").as("b"), col("rep").as("nrep")), "b")
        .groupBy(col("a").as("id")).agg(min(col("nrep")).as("minNbr"))
      // carry the pre-round label as `old` so convergence detection below
      // is a filter-count over `next` ITSELF — the old formulation joined
      // `next` back to `labels` for it, a whole extra equi-join + job per
      // round
      val prop = labels.join(viaNbr, Seq("id"), "left")
        .select(col("id"), col("rep").as("old"),
          least(col("rep"), coalesce(col("minNbr"), col("rep"))).as("rep"))
        .persist()
      inFlight = prop
      // test hook: fail AFTER this round's frame is persisted and its
      // blocks materialized — the exact window the catch must clean up
      if (rounds == injectFailureAtRound) {
        prop.count()
        throw new IllegalStateException("injected mid-round failure (test hook)")
      }
      val jumpTo = prop.select(col("id").as("jid"), col("rep").as("jrep"))
      // localCheckpoint truncates lineage: `labels` appears multiple times
      // per round (propagate reads it twice, the jump self-joins prop), so
      // without truncation the LOGICAL plan doubles per round and the
      // analyzer goes exponential long before the data does. Each round's
      // label state becomes a leaf (MEMORY_AND_DISK — same residency the
      // old persist gave); executor-local blocks are the right durability
      // here because the loop is re-runnable control flow, and a lost
      // executor fails the job, not the algorithm. LAZY checkpoint: the
      // convergence count below is the action that materializes this
      // round's blocks — ONE job per round, not an eager-checkpoint job
      // plus a count job.
      val next = prop.join(jumpTo, col("rep") === col("jid"), "left")
        .select(col("id"), col("old"), coalesce(col("jrep"), col("rep")).as("rep"))
        .localCheckpoint(false)
      changed = next.filter(col("rep") < col("old")).count()
      // per-round observability (the bench stderr trail keeps these): round
      // count is the one number that adjudicates a slow CC — O(log diameter)
      // rounds is the design, a count near maxRounds means a pathological
      // chain graph
      System.err.println(
        f"[cc] round $rounds%2d: changed=$changed%-8d ${(System.nanoTime() - t0) / 1e6}%8.0f ms")
      prop.unpersist()
      inFlight = null
      labels.unpersist() // no-op once labels is a checkpoint (GC reclaims)
      labels = next.select("id", "rep")
    }
    (labels, rounds)
    } catch { case t: Throwable =>
      // guard / mid-round failure: don't leak the loop state's blocks —
      // including the round's persisted propagate frame if the throw
      // happened between its persist and unpersist
      try labels.unpersist() catch { case _: Throwable => () }
      if (inFlight != null)
        try inFlight.unpersist(blocking = true) catch { case _: Throwable => () }
      throw t
    } finally edges.unpersist()
  }

  /** Recursive-CTE connected-components prefix (shingle → ≥0.6-Jaccard
    * pair graph → transitive closure), shared by the x63 oracle and the
    * x104 leak-safe-split oracle; ends with a `cl(doc_id, cluster_rep)`
    * CTE ready for a final SELECT.
    */
  private[graft] val ccOracleCtes: String =
    """WITH RECURSIVE t AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS toks
      |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (
      |  SELECT doc_id, lang,
      |         list_distinct(list_transform(range(1, len(toks) - 1),
      |                                      i -> array_to_string(toks[i:i+2], ' '))) AS s
      |  FROM t),
      |p AS (
      |  SELECT a.doc_id AS a, b.doc_id AS b
      |  FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |  WHERE ROUND(len(list_filter(a.s, x -> list_contains(b.s, x))) /
      |              len(list_distinct(list_concat(a.s, b.s))), 4) >= 0.6),
      |edges AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
      |nodes AS (SELECT DISTINCT a AS id FROM edges),
      |reach AS (
      |  SELECT id, id AS r FROM nodes
      |  UNION
      |  SELECT e.a AS id, reach.r FROM edges e JOIN reach ON reach.id = e.b),
      |cl AS (
      |  SELECT id AS doc_id, CAST(MIN(r) AS BIGINT) AS cluster_rep
      |  FROM reach GROUP BY id)""".stripMargin

  /** DuckDB twin: transitive closure via recursive CTE, min reachable id. */
  val clustersOracle: String =
    ccOracleCtes +
      "\nSELECT doc_id, cluster_rep FROM cl ORDER BY doc_id"

  /** x139: quality-best representative per duplicate cluster — the
    * curation policy past x63's min-id labeling: when a cluster of
    * near-identical documents collapses to one survivor, production
    * pipelines keep the BEST copy (here: most tokens — the least-truncated
    * mirror; ties to the smallest doc_id), not the arbitrarily-first one.
    * One aggregate over the Layer-shared cluster labels joined to a
    * key-projected token count: the argmax rides a struct max (tokens,
    * −doc_id) — no window, no second pass, the same max-aggregate shape
    * as W1's last-per-group. Output: one row per cluster with the kept
    * member, its token count, and cluster size.
    */
  def clusterBestReps(spark: SparkSession, dir: String): DataFrame = {
    val qual = Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
    dupClustersUnsorted(spark, dir, 0.6)
      .join(qual, "doc_id")
      .groupBy("cluster_rep")
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("n_tokens"), (-col("doc_id")).as("neg_id"))).as("m"))
      .select(col("cluster_rep"), (-col("m.neg_id")).as("kept_doc"),
        col("m.n_tokens").as("kept_tokens"), col("n_members"))
      .orderBy("cluster_rep")
  }

  /** DuckDB twin: the recursive-CTE closure + a packed-key argmax
    * (tokens·10¹² − doc_id ≡ the struct's lexicographic order for
    * doc_id < 10¹²).
    */
  val clusterRepsOracle: String =
    ccOracleCtes +
      """,
        |q AS (SELECT cl.cluster_rep, cl.doc_id,
        |             CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
        |      FROM cl JOIN documents d ON d.doc_id = cl.doc_id),
        |best AS (SELECT cluster_rep,
        |                MAX(n_tokens * 1000000000000 - doc_id) AS bkey,
        |                CAST(COUNT(*) AS BIGINT) AS n_members
        |         FROM q GROUP BY cluster_rep)
        |SELECT b.cluster_rep, q.doc_id AS kept_doc,
        |       q.n_tokens AS kept_tokens, b.n_members
        |FROM best b JOIN q
        |  ON q.cluster_rep = b.cluster_rep
        | AND q.n_tokens * 1000000000000 - q.doc_id = b.bkey
        |ORDER BY b.cluster_rep""".stripMargin

  /** x143: IDF-weighted re-scoring of the near-dup pair set — plain
    * Jaccard treats a shared boilerplate shingle ("all rights reserved")
    * and a shared rare shingle as equal evidence; the weighted score
    * wJ(A,B) = Σ_{A∩B} idf / Σ_{A∪B} idf down-weights exactly the
    * shingles that appear everywhere. Scoped honestly as a RE-SCORING of
    * the Layer-shared x15 pair set (thresholding on the weighted score
    * would need its own lossless candidate rule), which is also the right
    * plan: the corpus-wide work is one shingle-df aggregate; the pair-set
    * work is two key-projected explodes over only the paired docs, a
    * (pair, shingle) count that marks intersection membership (cnt = 2),
    * and the idf join. Integer milli-idf with the pinned ln operand
    * order; score in basis points via positive integral division.
    */
  def idfWeightedPairs(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingled3(spark, dir)
    val e = sh.select(col("doc_id"), explode(col("shingles")).as("s"))
    val dfc = e.groupBy("s").agg(count(lit(1)).as("dfc"))
    val nd = sh.agg(count(lit(1)).as("n_docs"))
    val w = dfc.crossJoin(broadcast(nd))
      .select(col("s"),
        floor(log(col("n_docs") / col("dfc")) * 1000d + 0.5d).cast("long").as("idf"))
    val pairs = ngramJaccardPairs(spark, dir, 0.6)
    val pa = pairs.select("a", "b").join(e.withColumnRenamed("doc_id", "a"), "a")
    val pb = pairs.select("a", "b").join(e.withColumnRenamed("doc_id", "b"), "b")
    val u = pa.unionByName(pb).groupBy("a", "b", "s").agg(count(lit(1)).as("cnt"))
    u.join(w, "s")
      .groupBy("a", "b")
      .agg(sum(when(col("cnt") === 2, col("idf")).otherwise(0L)).as("num"),
        sum(col("idf")).as("den"))
      .join(pairs, Seq("a", "b"))
      .select(col("a"), col("b"), col("jaccard"),
        expr("num * 10000 div den").as("widf_bp"))
      .orderBy("a", "b")
  }

  /** DuckDB twin: brute-force pair set + the same explode/union scoring. */
  val idfWeightedOracle: String =
    """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks
      |           FROM documents WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (SELECT doc_id, lang,
      |              list_distinct(list_transform(range(1, len(toks) - 1),
      |                i -> array_to_string(toks[i:i+2], ' '))) AS s
      |       FROM t),
      |p AS (SELECT a.doc_id AS a, b.doc_id AS b,
      |             ROUND(len(list_filter(a.s, x -> list_contains(b.s, x))) /
      |                   len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard
      |      FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |      WHERE ROUND(len(list_filter(a.s, x -> list_contains(b.s, x))) /
      |                  len(list_distinct(list_concat(a.s, b.s))), 4) >= 0.6),
      |e AS (SELECT doc_id, u.s FROM sh, UNNEST(s) u(s)),
      |dfc AS (SELECT s, COUNT(*) AS dfc FROM e GROUP BY 1),
      |nd AS (SELECT COUNT(*) AS n_docs FROM sh),
      |w AS (SELECT s, CAST(floor(ln(n_docs / dfc) * 1000 + 0.5) AS BIGINT) AS idf
      |      FROM dfc, nd),
      |pa AS (SELECT p.a, p.b, e.s FROM p JOIN e ON e.doc_id = p.a),
      |pb AS (SELECT p.a, p.b, e.s FROM p JOIN e ON e.doc_id = p.b),
      |u AS (SELECT a, b, s, COUNT(*) AS cnt
      |      FROM (SELECT * FROM pa UNION ALL SELECT * FROM pb) GROUP BY 1, 2, 3),
      |sc AS (SELECT a, b,
      |              CAST(SUM(CASE WHEN cnt = 2 THEN idf ELSE 0 END) AS BIGINT) AS num,
      |              CAST(SUM(idf) AS BIGINT) AS den
      |       FROM u JOIN w USING (s) GROUP BY 1, 2)
      |SELECT p.a, p.b, p.jaccard,
      |       CAST(sc.num * 10000 // sc.den AS BIGINT) AS widf_bp
      |FROM p JOIN sc ON sc.a = p.a AND sc.b = p.b
      |ORDER BY p.a, p.b""".stripMargin

  /** x127: incremental near-dup ADMISSION — the third leg of the
    * incremental family: x61 rejects exact re-ingests (content hash),
    * x101 does it with O(1) bloom probes, and this rejects arrivals that
    * NEAR-duplicate the existing corpus (≥ 0.6 shingle Jaccard against
    * any resident doc). The arrival batch is the doc_id % 10 == 0 slice
    * (the x61/x101 fixture convention). Reuses [[ngramJaccardPairs]]'s
    * lossless PPJoin formulation wholesale — Layer-shared with
    * x15/x63/x121, so in a session the pair generation runs ONCE — and
    * classifies each cross pair (one arrival, one resident); intra-batch
    * pairs don't block admission (they resolve in the next dedup round).
    * Admission is then a key-projected left anti join.
    */
  def nearDupAdmit(spark: SparkSession, dir: String): DataFrame = {
    val newSide = (c: org.apache.spark.sql.Column) => c % 10 === 0
    val cross = ngramJaccardPairs(spark, dir, 0.6)
      .filter(newSide(col("a")) =!= newSide(col("b")))
    val blocked = cross
      .select(when(newSide(col("a")), col("a")).otherwise(col("b")).as("doc_id"))
      .distinct()
    Tables.documents(spark, dir)
      .filter(newSide(col("doc_id")))
      .select("doc_id")
      .join(blocked, Seq("doc_id"), "left_anti")
      .orderBy("doc_id")
  }

  /** DuckDB twin: brute-force arrival-vs-resident Jaccard, anti-joined. */
  val admitOracle: String =
    """WITH t AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS toks
      |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (
      |  SELECT doc_id, lang,
      |         list_distinct(list_transform(range(1, len(toks) - 1),
      |                                      i -> array_to_string(toks[i:i+2], ' '))) AS s
      |  FROM t),
      |blocked AS (
      |  SELECT DISTINCT n.doc_id
      |  FROM sh n JOIN sh o ON n.lang = o.lang
      |   AND n.doc_id % 10 = 0 AND o.doc_id % 10 <> 0
      |  WHERE ROUND(len(list_filter(n.s, x -> list_contains(o.s, x))) /
      |              len(list_distinct(list_concat(n.s, o.s))), 4) >= 0.6)
      |SELECT d.doc_id FROM documents d
      |WHERE d.doc_id % 10 = 0
      |  AND d.doc_id NOT IN (SELECT doc_id FROM blocked)
      |ORDER BY d.doc_id""".stripMargin

  /** x133: cross-source contamination matrix — WHERE the near-dups live:
    * the x15 pair set rolled up to (source, source) counts, the heatmap a
    * curation team reads to find mirror sites, syndication, and pipeline
    * double-ingests (a heavy diagonal means intra-source boilerplate; a
    * heavy off-diagonal cell means two feeds ship the same content).
    * Layer-shared pairs (generated once per session across
    * x15/x63/x121/x127); the rollup joins the 8-byte doc→source lookup
    * twice and canonicalizes the pair with least/greatest so (A,B) and
    * (B,A) land in one cell.
    */
  def sourceDupMatrix(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    ngramJaccardPairs(spark, dir, 0.6)
      .join(src.toDF("a", "source_of_a"), "a")
      .join(src.toDF("b", "source_of_b"), "b")
      .select(least(col("source_of_a"), col("source_of_b")).as("src_lo"),
        greatest(col("source_of_a"), col("source_of_b")).as("src_hi"))
      .groupBy("src_lo", "src_hi")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("src_lo", "src_hi")
  }

  /** DuckDB twin: brute-force Jaccard pairs rolled up by source pair. */
  val dupMatrixOracle: String =
    """WITH t AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS toks
      |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (
      |  SELECT doc_id, lang,
      |         list_distinct(list_transform(range(1, len(toks) - 1),
      |                                      i -> array_to_string(toks[i:i+2], ' '))) AS s
      |  FROM t),
      |p AS (
      |  SELECT a.doc_id AS a, b.doc_id AS b
      |  FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |  WHERE ROUND(len(list_filter(a.s, x -> list_contains(b.s, x))) /
      |              len(list_distinct(list_concat(a.s, b.s))), 4) >= 0.6)
      |SELECT LEAST(da.source, db.source) AS src_lo,
      |       GREATEST(da.source, db.source) AS src_hi,
      |       COUNT(*) AS n_pairs
      |FROM p JOIN documents da ON p.a = da.doc_id
      |       JOIN documents db ON p.b = db.doc_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** x121: entity resolution across evidence channels — the step past
    * single-signal dedup: two docs are the "same entity" if they match on
    * EITHER token-set overlap (x15's lossless PPJoin pairs, word-order
    * blind) OR prefix edit distance (x117's lossless PassJoin pairs,
    * word-order aware), and entity ids come from connected components over
    * the union evidence graph (x63's pointer-jumping CC — transitivity is
    * the point: A≈B by Jaccard and B≈C by edit distance put A and C in one
    * entity although NO channel links them directly). Every stage is a
    * formulation already proven lossless/oracle-green above; the
    * composition is one DAG and the CC loop is the only iteration.
    */
  def entityClusters(spark: SparkSession, dir: String): DataFrame =
    graft.Layer.cached(spark, dir, "entityClusters") {
      connectedComponents(entityEdges(spark, dir))
        .select(col("id").as("doc_id"), col("rep").as("entity_id"))
    }.orderBy("doc_id")

  /** The x121 union evidence graph: Jaccard pairs ∪ edit-distance pairs,
    * deduplicated. Consumes the UNSORTED edit-pair core (the x117 query's
    * presentation orderBy under this distinct would add a range-sample pass
    * over the whole PassJoin DAG); the Jaccard leg is the Layer-shared
    * [[ngramJaccardPairs]] frame (generated once per session across
    * x15/x63/x121/x127/x133). OpsSpec asserts no Sort survives in this
    * plan.
    */
  private[graft] def entityEdges(spark: SparkSession, dir: String): DataFrame = {
    val jac = ngramJaccardPairs(spark, dir, 0.6).select("a", "b")
    val ed = editDistancePairsOf(Tables.documents(spark, dir), 64, 4)
      .select(col("a_id").as("a"), col("b_id").as("b"))
    jac.unionByName(ed).distinct()
  }

  /** DuckDB twin: both evidence channels brute-force (the right plan
    * single-node), transitive closure via recursive CTE.
    */
  val entityOracle: String =
    """WITH RECURSIVE t AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS toks
      |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (
      |  SELECT doc_id, lang,
      |         list_distinct(list_transform(range(1, len(toks) - 1),
      |                                      i -> array_to_string(toks[i:i+2], ' '))) AS s
      |  FROM t),
      |p AS (
      |  SELECT a.doc_id AS a, b.doc_id AS b
      |  FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |  WHERE ROUND(len(list_filter(a.s, x -> list_contains(b.s, x))) /
      |              len(list_distinct(list_concat(a.s, b.s))), 4) >= 0.6),
      |dpre AS (SELECT doc_id, substr(text, 1, 64) AS pfx
      |         FROM documents WHERE length(text) >= 64),
      |pe AS (
      |  SELECT a.doc_id AS a, b.doc_id AS b
      |  FROM dpre a JOIN dpre b ON a.doc_id < b.doc_id
      |  WHERE levenshtein(a.pfx, b.pfx) <= 4),
      |edges AS (SELECT a, b FROM p UNION SELECT b, a FROM p
      |          UNION SELECT a, b FROM pe UNION SELECT b, a FROM pe),
      |nodes AS (SELECT DISTINCT a AS id FROM edges),
      |reach AS (
      |  SELECT id, id AS r FROM nodes
      |  UNION
      |  SELECT e.a AS id, reach.r FROM edges e JOIN reach ON reach.id = e.b),
      |cl AS (
      |  SELECT id AS doc_id, CAST(MIN(r) AS BIGINT) AS entity_id
      |  FROM reach GROUP BY id)
      |SELECT doc_id, entity_id FROM cl ORDER BY doc_id""".stripMargin

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

  /** X2 embedding-cosine near-dup pairs, bucketed — the 100 TB shape.
    * Candidates come from a banded coordinate-sign LSH equi-join: each
    * (unit) vector emits nBands keys, key b packing the sign bits of dims
    * [b·bandBits, (b+1)·bandBits); a pair is a candidate iff ≥ 1 band
    * matches, then cosine is verified exactly. The pair space is
    * Σ bucket² per band — never n², and the band index shuffles
    * (vec_id, band, key) triples, not embeddings.
    *
    * Deterministic (no random hyperplanes: the coordinate axes are the
    * projection, which is sign-RP for isotropic embeddings), so the DuckDB
    * oracle mirrors the banding bit-for-bit and x21 stays hash-checked.
    * Recall law (pigeonhole over the nBands bands): a pair differing in
    * ≤ nBands−1 coordinate signs always leaves at least one band with no
    * differing position, so genuine near-duplicates (cos → 1) are found
    * with certainty; barely-similar pairs are found with probability
    * 1−(1−p^bandBits)^nBands, p = 1−θ/π. ExtSpec asserts the planted-dup
    * law and precision == 1 vs [[exactNearDup]].
    */
  def embeddingNearDup(spark: SparkSession, dir: String, minCos: Double = 0.4): DataFrame =
    bandedNearDup(Tables.embeddings(spark, dir), minCos)

  /** Banded candidate generation + exact verify over any (vec_id,
    * embedding) frame; see [[embeddingNearDup]]. With the default
    * nBands/bandBits = 0 the parameters DERIVE from the input via
    * [[deriveBands]]: bandBits is the smallest b in [8, 24] with 2^b ≥ n
    * (clamped to dim/2 so at least two bands always exist), and
    * nBands = min(8, dim / bandBits). Buckets per band then track corpus
    * size (2^bandBits ≥ n), so expected bucket population stays O(1) and
    * the Σ bucket² candidate space near-linear — an ASYMPTOTIC defense,
    * where a fixed 8-bit key regresses toward n²/256 per band at corpus
    * scale. The x21 oracle mirrors the derivation verbatim (computing the
    * same n and dim from the same table), keeping the query hash-checked;
    * the stats pass here is one count+min aggregate — control-plane cost.
    * Explicit nBands/bandBits (both > 0, bandBits ≤ 63) pin a
    * configuration, used by the ExtSpec two-config law.
    */
  def bandedNearDup(e: DataFrame, minCos: Double,
                    nBands: Int = 0, bandBits: Int = 0): DataFrame = {
    val v = e.select(col("vec_id"), col("embedding"))
    val (nb, bb) =
      if (nBands > 0 && bandBits > 0) (nBands, bandBits)
      else {
        val stats = v.agg(count(lit(1)), min(size(col("embedding")))).head()
        if (stats.isNullAt(1)) (8, 8) // empty input: any banding yields zero pairs
        else deriveBands(stats.getLong(0), stats.getInt(1))
      }
    val sig = v.select(col("vec_id"),
      posexplode(array((0 until nb).map { b =>
        (0 until bb).map { j =>
          when(col("embedding").getItem(b * bb + j) >= 0, lit(1L << j))
            .otherwise(lit(0L))
        }.reduce(_ + _)
      }: _*)).as(Seq("band", "key")))
    val cand = sig.toDF("a", "band", "key")
      .join(sig.toDF("b", "band", "key"), Seq("band", "key"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    val ea = v.toDF("a", "va")
    val eb = v.toDF("b", "vb")
    cand.join(ea, "a").join(eb, "b")
      .withColumn("cos", round(gf.cosine_sim(col("va"), col("vb")), 4))
      .filter(col("cos") >= minCos)
      .select("a", "b", "cos")
      .orderBy("a", "b")
  }

  /** (nBands, bandBits) from corpus count and embedding dimension — see
    * [[bandedNearDup]]. A pure function of (n, dim) so the ExtSpec law and
    * the SQL oracle can pin exact values: bandBits = smallest b ∈ [8, 24]
    * with 2^b ≥ n (24 past 16M vectors — wider keys stop paying once the
    * per-band collision rate is ≪ 1), clamped to dim/2; nBands fills the
    * remaining dimensions, capped at 8 (more bands = more recall for
    * marginal pairs but a full extra shuffle of (vec_id, band, key) rows
    * per band — 8 is the knee).
    */
  private[graft] def deriveBands(n: Long, dim: Int): (Int, Int) = {
    val fit = (8 to 24).find(b => (1L << b) >= n).getOrElse(24)
    val bb = math.max(1, math.min(fit, dim / 2))
    (math.max(1, math.min(8, dim / bb)), bb)
  }

  /** x117: edit-distance prefix dedup — find document pairs whose first
    * `prefixLen` characters are within Levenshtein distance `d` (the
    * title/boilerplate near-identity that token-set measures like x15's
    * Jaccard are blind to, since edit distance sees order). Candidate
    * generation is PassJoin-style segment blocking (Li, Deng, Wang, Feng,
    * "PASS-JOIN: A Partition-based Method for Similarity Joins", VLDB
    * 2011): partition the prefix into d+1 segments — by pigeonhole an
    * alignment with ≤ d edits leaves SOME segment untouched, and that
    * segment appears verbatim in the partner shifted by at most d. So
    * each doc emits d+1 probe keys (its segments) and ≤ (d+1)·(2d+1)
    * index keys (every segment-length substring within shift d of each
    * segment start — constants, enumerated at plan-build time into one
    * explode each, ONE scan per side); an equi-join on (segment#, string)
    * yields candidates, distinct pairs re-join their prefixes, and a
    * codegen'd `levenshtein` verifies ≤ d. Blocking is provably lossless,
    * so the DuckDB oracle needn't mirror it — a brute-force twin produces
    * the identical pair set. Candidate volume is Σ per-(seg#, 8-gram)
    * collisions — corpus-statistics-bounded like x15's rare-shingle
    * space, never n².
    */
  def editDistancePairs(spark: SparkSession, dir: String,
                        prefixLen: Int = 64, d: Int = 4): DataFrame =
    editDistancePairsOf(Tables.documents(spark, dir), prefixLen, d)
      .orderBy("a_id", "b_id")

  /** Unsorted pair core — [[editDistancePairs]] adds the presentation sort.
    * Graph consumers ([[entityClusters]]' union-distinct) take THIS frame:
    * a global orderBy under an aggregate buys nothing, and its
    * range-partitioner SAMPLE job would evaluate the whole candidate DAG an
    * extra time even when Catalyst later prunes the sort itself.
    */
  private[graft] def editDistancePairsOf(docsIn: DataFrame,
                                         prefixLen: Int, d: Int): DataFrame = {
    val k = d + 1
    val base = prefixLen / k
    // segment lengths partition the prefix; the remainder widens the tail
    val lens = {
      val rem = prefixLen - base * k
      (0 until k).map(i => if (i < k - rem) base else base + 1)
    }
    val starts = lens.scanLeft(0)(_ + _).dropRight(1)
    val docs = docsIn
      .select(col("doc_id"), substring(col("text"), 1, prefixLen).as("p"))
      .filter(length(col("p")) === prefixLen)
    val probeArr = array((0 until k).map { i =>
      struct(lit(i).as("i"), substring(col("p"), starts(i) + 1, lens(i)).as("s"))
    }: _*)
    val probes = docs
      .select(col("doc_id"), explode(probeArr).as("kv"))
      .select(col("doc_id"), col("kv.i").as("i"), col("kv.s").as("s"))
    val idxCells = for {
      i <- 0 until k
      q <- (starts(i) - d) to (starts(i) + d)
      if q >= 0 && q + lens(i) <= prefixLen
    } yield struct(lit(i).as("i"), substring(col("p"), q + 1, lens(i)).as("s"))
    val index = docs
      .select(col("doc_id").as("o_id"), explode(array(idxCells: _*)).as("kv"))
      .select(col("o_id"), col("kv.i").as("i"), col("kv.s").as("s"))
    val cand = probes.join(index, Seq("i", "s"))
      .filter(col("doc_id") =!= col("o_id"))
      .select(least(col("doc_id"), col("o_id")).as("a_id"),
        greatest(col("doc_id"), col("o_id")).as("b_id"))
      .distinct()
    cand
      .join(docs.select(col("doc_id").as("a_id"), col("p").as("pa")), "a_id")
      .join(docs.select(col("doc_id").as("b_id"), col("p").as("pb")), "b_id")
      .select(col("a_id"), col("b_id"),
        levenshtein(col("pa"), col("pb")).cast("long").as("dist"))
      .filter(col("dist") <= d)
  }

  val editDistanceOracle: String =
    """WITH d AS (SELECT doc_id, substr(text, 1, 64) AS p
      |           FROM documents WHERE length(text) >= 64)
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |       CAST(levenshtein(a.p, b.p) AS BIGINT) AS dist
      |FROM d a JOIN d b ON a.doc_id < b.doc_id
      |WHERE levenshtein(a.p, b.p) <= 4
      |ORDER BY a_id, b_id""".stripMargin

  /** Exact all-pairs baseline — a crossJoin, O(n²): kept ONLY as the
    * test-side exactness check for [[bandedNearDup]]'s precision/recall
    * (ExtSpec); deliberately not wired to any query.
    */
  private[graft] def exactNearDup(e: DataFrame, minCos: Double): DataFrame = {
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
