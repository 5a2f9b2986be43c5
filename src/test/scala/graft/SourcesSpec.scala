package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, count, countDistinct, floor, lit, round, sum, unix_micros}
import org.apache.spark.sql.types._

import graft.sources.Ingest

/** S1–S4 CSV ingestion semantics + SQL registration of custom functions. */
class SourcesSpec extends SparkSuite {

  test("csv ingest: header stripped, schema applied, malformed rows dropped") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "orders.csv")
    val w = new java.io.PrintWriter(f)
    w.println("orderID,productID,cart_order,reordered")
    w.println("1,100,1,0")
    w.println("2,oops,not,a_number") // malformed → dropped
    w.println("3,300,2,1")
    w.close()
    val schema = StructType(Seq(
      StructField("orderID", LongType), StructField("productID", LongType),
      StructField("cart_order", IntegerType), StructField("reordered", IntegerType)))
    val got = Ingest.csv(spark, f.getAbsolutePath, schema)
      .orderBy("orderID").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 3L))
    assert(got(1).getLong(1) === 300L)
  }

  test("csv round-trip of orders drops exactly the planted malformed lines") {
    // collect(), not count(): column pruning would parse ZERO fields for a
    // bare count and DROPMALFORMED then sees no malformed rows at all —
    // malformedness is judged only over the columns actually parsed
    // (see the Ingest.csv scaladoc)
    val rows = graft.queries.Core.q18CsvRoundtrip(spark, sf).collect()
    assert(rows.length === Tables.orders(spark, sf).count())
    // header did not survive as data, bad keys did not survive the cast
    assert(rows.forall(_.getLong(0) >= 0)) // planted bad row has key -1
  }

  test("RunScoped sweeps only OLD scratch dirs of dead processes") {
    import java.nio.file.{Paths, attribute}
    // pids far above any Linux pid_max, so ProcessHandle.of is empty
    val old = Paths.get("/tmp/graft_io_999999999")
    Files.createDirectories(old)
    Files.write(old.resolve("junk.txt"), "x".getBytes)
    Files.setLastModifiedTime(old,
      attribute.FileTime.fromMillis(System.currentTimeMillis() - 2L * 60 * 60 * 1000))
    val fresh = Paths.get("/tmp/graft_io_999999998")
    Files.createDirectories(fresh)
    val live = Paths.get(RunScoped.ioDir)
    Files.createDirectories(live)
    RunScoped.sweepStale()
    assert(!Files.exists(old), "old dead-pid scratch dir must be swept")
    assert(Files.exists(fresh),
      "a FRESH dead-pid dir must survive — its oracle step may still be reading the exports")
    assert(Files.exists(live), "this JVM's own scratch dir must survive the sweep")
    RunScoped.deleteRecursively(fresh)
  }

  test("orc round-trip reproduces the parquet source and prunes partition directories") {
    import org.apache.spark.sql.functions.col
    val back = graft.queries.Core.q21OrcRoundtrip(spark, sf)
    val src = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_orderpriority"))
      .orderBy("o_orderkey")
    assert(back.collect().toSeq === src.collect().toSeq,
      "ORC round-trip must be the identity on the orders table")
    // the Hive-partitioned layout prunes whole directories on the
    // partition predicate — filter appears as PartitionFilters in the scan
    val filtered = graft.sources.Ingest.orc(spark, s"${RunScoped.ioDir}/orders_orc")
      .filter(col("o_orderstatus") === "F")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("o_orderstatus"))
    assert(filtered.count() ===
      Tables.orders(spark, sf).filter(col("o_orderstatus") === "F").count())
  }

  test("compaction rewrites a fragmented table into few uniform files with identical content") {
    import graft.sources.Sinks
    val base = Files.createTempDirectory("graft_compact").toString
    val frag = s"$base/frag"
    val out = s"$base/compacted"
    // plant heavy fragmentation: 64 files for a 1500-row table
    Tables.orders(spark, sf).repartition(64).write.parquet(frag)
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(parquetFiles(frag).length === 64)
    // target sized so the real on-disk sum lands on a handful of outputs
    val inputBytes = parquetFiles(frag).map(_.length).sum
    Sinks.compacted(spark.read.parquet(frag), out, targetBytesPerFile = inputBytes / 4)
    val outFiles = parquetFiles(out)
    assert(outFiles.length <= 6, s"still fragmented: ${outFiles.length} files")
    // content survives byte-for-byte (row set equality)
    val a = spark.read.parquet(frag).collect().map(_.toString).sorted
    val b = spark.read.parquet(out).collect().map(_.toString).sorted
    assert(a === b)
  }

  test("range-clustered layout prunes parquet row groups a round-robin layout decodes") {
    import org.apache.spark.sql.functions.col
    val events = graft.Tables.events(spark, sf)
    val total = events.count()
    val base = java.nio.file.Files.createTempDirectory("graft_cluster").toString
    // same data, two layouts: round-robin (fragmented stats) vs clustered
    events.repartition(8).write.mode("overwrite").parquet(s"$base/scattered")
    graft.sources.Sinks.clustered(events, s"$base/clustered", Seq("user_id"), 8)
    def scanRows(path: String): Long = {
      val q = spark.read.parquet(path).filter(col("user_id") === 7L)
      q.collect()
      val plan = q.queryExecution.executedPlan
      plan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numOutputRows").value
      }.get
    }
    val scattered = scanRows(s"$base/scattered")
    val clustered = scanRows(s"$base/clustered")
    // round-robin: every file's row group spans the whole user domain, so
    // the pushed filter prunes nothing and the scan decodes ~all rows;
    // clustered: disjoint per-file ranges, only the covering group decodes
    assert(scattered > total / 2, s"expected near-full decode, got $scattered of $total")
    assert(clustered <= total / 4,
      s"clustered layout decoded $clustered of $total — row-group pruning did not engage")
    assert(clustered < scattered)
  }

  test("custom expressions are callable from SQL after registration") {
    graft.functions.functions.registerSql(spark)
    val r = spark.sql(
      """SELECT fnv1a64('foobar') AS h,
        |       hamming64(0L, -1L) AS d,
        |       cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c,
        |       simhash64(array('a','b')) = simhash64(array('b','a')) AS sym
        |""".stripMargin).collect()(0)
    assert(r.getLong(0) === 0x85944171f73967e8L)
    assert(r.getInt(1) === 64)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
    assert(r.getBoolean(3))
  }

  test("aggregator top-k equals window-based brute force") {
    val viaWindow = graft.ext.Similarity.bruteForceTopK(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    val viaAgg = graft.ext.Similarity.aggregatorTopK(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(viaAgg === viaWindow)
  }

  test("z-order layout prunes row groups on BOTH dimensions; round-robin prunes neither") {
    import org.apache.spark.sql.functions.{col, expr}
    val events = graft.Tables.events(spark, sf)
    val total = events.count()
    val base = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    // INT96 (the default parquet timestamp encoding) carries stats no
    // reader prunes on — TIMESTAMP_MICROS is the layout that makes the
    // ts min/max usable
    val prevTs = spark.conf.get("spark.sql.parquet.outputTimestampType")
    try {
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      events.repartition(8).write.mode("overwrite").parquet(s"$base/scattered")
      graft.sources.Sinks.zOrdered(events, s"$base/zorder",
        col("user_id"), expr("unix_micros(ts) div 86400000000"), files = 16)
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prevTs)
    // one predicate per dimension — a single-column sort can serve only
    // one of these; the z-layout must narrow the stats for both. The day
    // predicate is a PLAIN ts range (an expression predicate would not
    // reach the parquet stats at all).
    val dayStartUs = (events.agg(expr("min(unix_micros(ts) div 86400000000)"))
      .first().getLong(0) + 1) * 86400000000L
    def decoded(path: String, pred: org.apache.spark.sql.Column): Long = {
      val q = spark.read.parquet(path).filter(pred)
      q.collect()
      q.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numOutputRows").value
      }.get
    }
    val userPred = col("user_id") === 7L
    val dayPred = col("ts") >= expr(s"timestamp_micros(${dayStartUs}L)") &&
      col("ts") < expr(s"timestamp_micros(${dayStartUs + 86400000000L}L)")
    val su = decoded(s"$base/scattered", userPred)
    val sd = decoded(s"$base/scattered", dayPred)
    val zu = decoded(s"$base/zorder", userPred)
    val zd = decoded(s"$base/zorder", dayPred)
    // scattered: every file spans both full domains — no pruning either way
    assert(su > total / 2 && sd > total / 2,
      s"expected near-full decode on scattered: user=$su day=$sd of $total")
    // z-order: a contiguous z-range is a bounded rectangle, so both
    // dimensions' stats are narrow — each predicate decodes a fraction
    assert(zu < su && zd < sd,
      s"z-layout failed to prune: user $zu vs $su, day $zd vs $sd")
    assert(zu <= 3 * total / 5 && zd <= total / 2,
      s"z-layout pruning too weak: user=$zu day=$zd of $total")
  }

  test("DSv2 graftseq source: filters consumed into the scan range, columns pruned at the reader") {
    val base = spark.read.format("graft.sources.SeqSource")
      .option("n", "100000").option("slices", "8").load()
    val filtered = base.filter(col("id") >= 25000L && col("id") < 75000L)
    val plan = filtered.queryExecution.executedPlan.toString
    // the id-range predicates are CONSUMED by pushFilters: the scan's own
    // bounds narrow and no residual Filter node survives in the plan
    assert(plan.contains("graftseq range [25000, 75000)"),
      s"pushdown did not reach the scan:\n$plan")
    assert(!plan.contains("\nFilter") && !plan.contains("+- Filter"),
      s"residual Filter survived a fully-pushable predicate:\n$plan")
    // rows outside the range were never generated
    assert(filtered.count() === 50000L)
    // column pruning reaches the row generator: a val-only projection
    // plans a scan that materializes just that column
    val pruned = base.select("val")
    val prunedPlan = pruned.queryExecution.executedPlan.toString
    assert(prunedPlan.contains("cols val"), s"column pruning missed:\n$prunedPlan")
    // the generated content is the closed-form Knuth hash
    val sample = base.filter(col("id") === 12345L).collect().head
    assert(sample.getLong(1) === graft.sources.SeqSource.valOf(12345L))
    assert(sample.getString(2) === "g5")
    // partition planning tracks the PRUNED volume: a 1%-of-idspace filter
    // plans no more slices than the full scan
    val narrow = base.filter(col("id") < 1000L)
    assert(narrow.rdd.getNumPartitions <= base.rdd.getNumPartitions)
    assert(narrow.count() === 1000L)
  }

  test("mergeSchema unifies parquet generations; old-generation rows null the new columns") {
    // q23's write side: run the query once so both generations exist
    val out = graft.queries.Core.q23SchemaEvolution(spark, sf)
    assert(out.columns.toSeq === Seq("doc_id", "text", "lang", "source"))
    val evoDir = s"${graft.RunScoped.ioDir}/documents_evo"
    // without the merge, the v1-first read would not even SEE the new
    // columns — the evolution is real, not a no-op on this fixture
    val v1 = spark.read.parquet(s"$evoDir/v1")
    assert(!v1.columns.contains("lang") && !v1.columns.contains("source"))
    // and the merged read nulls exactly the old generation's new columns
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$evoDir/v1", s"$evoDir/v2")
    val nulls = merged.filter(merged("lang").isNull).select("doc_id")
      .collect().map(_.getLong(0))
    assert(nulls.nonEmpty && nulls.forall(_ % 2 == 0),
      "null lang must appear exactly on v1 (even-id) rows")
  }

  test("graftkv write connector honors the full batch commit protocol") {
    import spark.implicits._
    val dir = s"${graft.RunScoped.ioDir}/kv_law"
    val df = spark.range(100).select(col("id").as("k"), (col("id") * 7L).as("v"))
      .repartition(3)
    df.write.format("graft.sources.KvSource").option("path", dir)
      .mode("append").save()
    def ls(prefix: String): Seq[String] =
      new java.io.File(dir).listFiles().toSeq.map(_.getName)
        .filter(_.startsWith(prefix)).sorted
    // commit published exactly one part per partition, one manifest, and
    // left no staging
    assert(ls("part-").size === 3, "one part file per write partition")
    assert(ls("snap-") === Seq("snap-00000001.gts"), "commit must publish a manifest")
    assert(ls("_staged").isEmpty, "no staged files survive a commit")
    // the roundtrip is lossless
    val back = spark.read.format("graft.sources.KvSource").option("path", dir)
      .load().collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(back.toSeq === (0L until 100L).map(k => (k, k * 7L)))
    // overwrite TRUNCATES LOGICALLY (round-13): the new snapshot lists
    // only the new files — prior parts stay on disk because snapshot 1
    // still references them (expireSnapshots is the vacuum)
    df.repartition(2).write.format("graft.sources.KvSource").option("path", dir)
      .mode("overwrite").save()
    assert(ls("part-").size === 5, "snapshotting retains prior parts for time travel")
    assert(ls("snap-").size === 2)
    val cur = spark.read.format("graft.sources.KvSource").option("path", dir).load()
    assert(cur.count() === 100L, "current read must see only the overwrite")
    assert(cur.rdd.getNumPartitions === 2,
      "current read must plan only the current snapshot's 2 files")
    // append ACCUMULATES (the mode distinction is real)
    df.repartition(1).write.format("graft.sources.KvSource").option("path", dir)
      .mode("append").save()
    assert(spark.read.format("graft.sources.KvSource").option("path", dir)
      .load().count() === 200L)
    // a writer that aborts leaves NO trace — the task-failure contract
    val w = new graft.sources.KvWriter(dir, 99)
    w.write(org.apache.spark.sql.catalyst.InternalRow(1L, 2L))
    assert(ls("_staged").nonEmpty, "writer stages before commit")
    w.abort()
    assert(ls("_staged").isEmpty, "abort must delete the staged file")
    assert(ls("part-").size === 6, "abort must not touch published parts")
  }

  test("graftkv snapshots: VERSION/TIMESTAMP AS OF, immutability under overwrite, retention vacuum") {
    import graft.sources.KvSource
    val dir = s"${graft.RunScoped.ioDir}/kv_snap"
    def write(n: Long, mult: Long, mode: String, parts: Int): Unit =
      spark.range(n).select(col("id").as("k"), (col("id") * mult).as("v"))
        .repartition(parts)
        .write.format("graft.sources.KvSource").option("path", dir).mode(mode).save()
    def readV(v: Option[Long]) = {
      val r = spark.read.format("graft.sources.KvSource").option("path", dir)
      v.fold(r)(x => r.option("versionAsOf", x.toString)).load()
        .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1).toSeq
    }
    write(50, 7L, "overwrite", 3)  // snapshot 1
    val tsBetween = System.currentTimeMillis()
    Thread.sleep(5)
    write(10, 11L, "overwrite", 2) // snapshot 2: logically replaces v1
    Thread.sleep(5)
    write(5, 13L, "append", 1)     // snapshot 3: v2 + 5 rows
    val v1 = (0L until 50L).map(k => (k, k * 7L))
    val v2 = (0L until 10L).map(k => (k, k * 11L))
    val v3 = ((0L until 10L).map(k => (k, k * 11L)) ++
      (0L until 5L).map(k => (k, k * 13L))).sorted
    // old snapshots are immutable after the table moved on
    assert(readV(Some(1L)) === v1, "VERSION AS OF 1 must survive two later publishes")
    assert(readV(Some(2L)) === v2)
    assert(readV(Some(3L)) === v3)
    assert(readV(None) === v3, "current read = latest snapshot")
    // TIMESTAMP AS OF resolves by manifest commit time
    assert(KvSource.versionAt(dir, tsBetween) === 1L)
    assert(KvSource.versionAt(dir, System.currentTimeMillis()) === 3L)
    // unknown versions refuse loudly with the available range
    val e = intercept[Exception] { readV(Some(9L)) }
    assert(e.getMessage.contains("no snapshot version 9"))
    // retention: keep 1 → expired manifests gone, unreferenced parts
    // vacuumed, the current view intact
    KvSource.expireSnapshots(dir, keep = 1)
    assert(readV(None) === v3, "vacuum must not change the current view")
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(names.count(_.startsWith("snap-")) === 1)
    assert(names.count(_.startsWith("part-")) === 3,
      "vacuum must delete parts only the expired snapshots referenced")
    intercept[Exception] { readV(Some(1L)) }
  }

  test("graftkv snapshots: racing committers serialize into distinct intact versions") {
    import graft.sources.KvSource
    val dir = s"${graft.RunScoped.ioDir}/kv_race"
    // seed snapshot 1 so the racers contend on version 2
    spark.range(3).select(col("id").as("k"), col("id").as("v"))
      .write.format("graft.sources.KvSource").option("path", dir)
      .mode("overwrite").save()
    // 8 committers race distinct part lists through publishSnapshot —
    // the r13 exists()+rename() allocation could silently clobber a
    // COMMITTED manifest (POSIX rename overwrites); the r14 protocol
    // (rename-if-absent + payload re-read) must hand every committer
    // its own version with its own payload intact
    val parts = (0 until 8).map(i => Seq(s"part-$i.gkv"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futs = parts.map { p =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = KvSource.publishSnapshot(dir, p)
        })
      }
      val versions = futs.map(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
      assert(versions.distinct.size === 8, s"version collision: $versions")
      // every committer's manifest holds exactly its own part list
      parts.zip(versions).foreach { case (p, v) =>
        assert(KvSource.readSnapshot(dir, v)._2 === p,
          s"manifest $v was clobbered (expected $p)")
      }
      // no staged turds survive
      val staged = new java.io.File(dir).listFiles()
        .map(_.getName).filter(_.startsWith("_staged-"))
      assert(staged.isEmpty, s"staged files left behind: ${staged.toSeq}")
    } finally pool.shutdownNow()
  }

  test("catalog time travel: VERSION AS OF and TIMESTAMP AS OF through GraftCatalog SQL") {
    val root = s"${graft.RunScoped.ioDir}/cat_tt"
    spark.conf.set("spark.sql.catalog.gtt", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gtt.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtt.db")
    spark.sql("DROP TABLE IF EXISTS gtt.db.t")
    spark.sql("CREATE TABLE gtt.db.t USING graftkv")
    spark.sql("INSERT INTO gtt.db.t SELECT id AS k, id * 2 AS v FROM range(20)")
    Thread.sleep(5)
    val tsBetween = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(5)
    spark.sql("INSERT INTO gtt.db.t SELECT id AS k, id * 100 AS v FROM range(100, 103)")
    val v1 = (0L until 20L).map(k => (k, k * 2L))
    def rows(sql: String) = spark.sql(sql).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(rows("SELECT k, v FROM gtt.db.t VERSION AS OF 1") === v1)
    assert(rows(s"SELECT k, v FROM gtt.db.t TIMESTAMP AS OF '$tsBetween'") === v1)
    assert(rows("SELECT k, v FROM gtt.db.t").size === 23, "current view sees both inserts")
    // a seq table has no snapshots: VERSION AS OF refuses at resolution
    spark.sql("DROP TABLE IF EXISTS gtt.db.s")
    spark.sql("CREATE TABLE gtt.db.s USING graftseq OPTIONS (n '10', slices '2')")
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM gtt.db.s VERSION AS OF 1").collect()
    }
    assert(e.getMessage.contains("does not support VERSION AS OF"))
  }

  test("graftkv history table: snapshot log rows, vacuum visibility, real-table shadowing") {
    val root = s"${graft.RunScoped.ioDir}/cat_hist"
    spark.conf.set("spark.sql.catalog.gh", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gh.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gh.db")
    spark.sql("DROP TABLE IF EXISTS gh.db.t")
    spark.sql("CREATE TABLE gh.db.t USING graftkv")
    spark.sql("INSERT INTO gh.db.t SELECT id AS k, id AS v FROM range(5)")
    spark.sql("INSERT INTO gh.db.t SELECT id AS k, id AS v FROM range(5, 8)")
    spark.sql("INSERT OVERWRITE gh.db.t SELECT id AS k, id AS v FROM range(2)")
    val h = spark.sql(
      "SELECT version, n_parts, operation FROM gh.db.t.history ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(h.map(_._1) === Seq(1L, 2L, 3L), "one history row per snapshot, ordered")
    assert(h.map(_._3) === Seq("append", "append", "overwrite"))
    assert(h(1)._2 > h(0)._2, "append manifest lists prior parts plus its own")
    // vacuum: expired versions vanish from history, current survives
    graft.sources.KvSource.expireSnapshots(s"$root/db/t.gtdata", 1)
    val h2 = spark.sql("SELECT version FROM gh.db.t.history")
      .collect().map(_.getLong(0)).toSeq
    assert(h2 === Seq(3L), "history lists only retained manifests")
    // a REAL table named `history` shadows the metadata route
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gh.db.t2")
    spark.sql("CREATE TABLE gh.db.t2.history USING graftkv")
    spark.sql("INSERT INTO gh.db.t2.history SELECT 7 AS k, 8 AS v")
    val shadow = spark.sql("SELECT k, v FROM gh.db.t2.history").collect()
    assert(shadow.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((7L, 8L)))
  }

  test("graftkv row-level SQL: MERGE/UPDATE/DELETE rewrite snapshots, old versions intact") {
    val root = s"${graft.RunScoped.ioDir}/cat_rlo"
    spark.conf.set("spark.sql.catalog.grl", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.grl.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS grl.db")
    spark.sql("DROP TABLE IF EXISTS grl.db.t")
    spark.sql("CREATE TABLE grl.db.t USING graftkv")
    spark.sql("INSERT INTO grl.db.t SELECT id AS k, id * 10 AS v FROM range(10)")
    def rows() = spark.sql("SELECT k, v FROM grl.db.t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // DELETE: drops multiples of 3
    spark.sql("DELETE FROM grl.db.t WHERE k % 3 = 0")
    assert(rows() === (0L until 10L).filter(_ % 3 != 0).map(k => (k, k * 10)))
    // UPDATE: bump even keys
    spark.sql("UPDATE grl.db.t SET v = v + 1 WHERE k % 2 = 0")
    assert(rows() === (0L until 10L).filter(_ % 3 != 0)
      .map(k => (k, k * 10 + (if (k % 2 == 0) 1 else 0))))
    // MERGE: conditional delete + update + insert in one statement
    spark.range(0, 14).selectExpr("id AS k", "id * 100 AS nv",
      "CASE WHEN id = 1 THEN 'D' ELSE 'U' END AS op")
      .createOrReplaceTempView("rlo_src")
    spark.sql(
      """MERGE INTO grl.db.t t USING rlo_src s ON t.k = s.k
        |WHEN MATCHED AND s.op = 'D' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = s.nv
        |WHEN NOT MATCHED AND s.op = 'U' THEN INSERT (k, v) VALUES (s.k, s.nv)
        |""".stripMargin)
    val expect = ((0L until 10L).filter(k => k % 3 != 0 && k != 1) // survivors updated
      .map(k => (k, k * 100)) ++
      ((0L until 14L).filter(k => k % 3 == 0 || k >= 10).map(k => (k, k * 100))))
      .sortBy(_._1)
    assert(rows() === expect)
    // every pre-mutation version still serves its exact rows (time travel
    // across row-level ops), and history labels the operations
    def vrows(v: Int) = spark.sql(s"SELECT k, v FROM grl.db.t VERSION AS OF $v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(vrows(1) === (0L until 10L).map(k => (k, k * 10)))
    assert(vrows(2) === (0L until 10L).filter(_ % 3 != 0).map(k => (k, k * 10)))
    val ops = spark.sql("SELECT operation FROM grl.db.t.history ORDER BY version")
      .collect().map(_.getString(0)).toSeq
    assert(ops === Seq("append", "delete", "update", "merge"))
  }

  test("graftkv streaming write: epoch re-commit is dropped (exactly-once at the protocol level)") {
    import graft.sources.{KvCommit, KvSource, KvStreamingWrite}
    val dir = s"${graft.RunScoped.ioDir}/kv_stream_eo"
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    f.mkdirs(new org.apache.hadoop.fs.Path(dir))
    def stage(tag: String, lines: Seq[String]): KvCommit = {
      val p = new org.apache.hadoop.fs.Path(dir, s"_staged-p0-$tag")
      val out = f.create(p, true)
      try lines.foreach(l => out.write((l + "\n").getBytes("UTF-8"))) finally out.close()
      KvCommit(p.toString, 0, lines.size.toLong)
    }
    val w = new KvStreamingWrite(dir, truncate = false)
    w.commit(0L, Array(stage("a", Seq("1\t10", "2\t20"))))
    // recovery replay: the engine re-runs epoch 0 after a restart — the
    // duplicate staging must be dropped, not double-published
    w.commit(0L, Array(stage("b", Seq("1\t10", "2\t20"))))
    w.commit(1L, Array(stage("c", Seq("3\t30"))))
    val vs = new java.io.File(dir).listFiles().map(_.getName)
      .collect { case n if n.startsWith("snap-") && n.endsWith(".gts") =>
        n.stripPrefix("snap-").stripSuffix(".gts").toLong }.sorted.toSeq
    assert(vs === Seq(1L, 2L), "one snapshot per DISTINCT epoch")
    assert(vs.map(v => KvSource.readSnapshotMeta(dir, v)._2) ===
      Seq("stream-epoch-0", "stream-epoch-1"))
    val rows = spark.read.format("graft.sources.KvSource").option("path", dir)
      .load().collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(rows === Seq((1L, 10L), (2L, 20L), (3L, 30L)),
      "append epochs chain; the replayed epoch contributes once")
    val staged = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("_staged-p"))
    assert(staged.isEmpty, s"replayed staging not cleaned: ${staged.toSeq}")
  }

  test("graftkv compaction: balanced rewrite, content identical, old versions intact, vacuum reclaims") {
    import graft.sources.KvSource
    val root = s"${graft.RunScoped.ioDir}/cat_compact"
    spark.conf.set("spark.sql.catalog.gc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gc.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gc.db")
    spark.sql("CREATE TABLE gc.db.t USING graftkv")
    (0 until 5).foreach { i =>
      spark.sql(s"INSERT INTO gc.db.t SELECT id AS k, id * 2 AS v FROM range(${i * 10}, ${i * 10 + 10})")
    }
    val dataDir = s"$root/db/t.gtdata"
    def gkvFiles() = new java.io.File(dataDir).listFiles()
      .map(_.getName).filter(n => n.startsWith("part-") && n.endsWith(".gkv")).toSeq
    val before = spark.sql("SELECT k, v FROM gc.db.t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val nFilesBefore = gkvFiles().size
    val v = KvSource.compact(dataDir, 2)
    assert(v === 6L, "compaction publishes the next snapshot version")
    val after = spark.sql("SELECT k, v FROM gc.db.t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(after === before, "compaction must be content-lossless")
    // current snapshot scans exactly 2 files; superseded files remain on
    // disk (prior versions reference them) until the vacuum
    val hist = spark.sql(
      "SELECT version, n_parts, operation FROM gc.db.t.history ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(hist.last === ((6L, 2L, "compact")))
    assert(gkvFiles().size === nFilesBefore + 2)
    // pre-compaction version still serves its exact rows
    val v5 = spark.sql("SELECT k, v FROM gc.db.t VERSION AS OF 5").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(v5 === before)
    // vacuum to the compacted snapshot alone: the small files go away
    KvSource.expireSnapshots(dataDir, 1)
    assert(gkvFiles().size === 2, "vacuum reclaims the superseded small files")
    assert(spark.sql("SELECT k, v FROM gc.db.t").count() === before.size.toLong)
  }

  test("SQL CALL procedures: system.compact and system.expire_snapshots end-to-end") {
    val root = s"${graft.RunScoped.ioDir}/cat_proc"
    spark.conf.set("spark.sql.catalog.gp", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gp.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gp.db")
    spark.sql("CREATE TABLE gp.db.t USING graftkv")
    (0 until 4).foreach { i =>
      spark.sql(s"INSERT INTO gp.db.t SELECT id AS k, id AS v FROM range(${i * 5}, ${i * 5 + 5})")
    }
    val before = spark.sql("SELECT k, v FROM gp.db.t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    // named args + default-carrying parameter
    val res = spark.sql("CALL gp.system.compact(table => 'db.t', target => 2)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(res === Seq((5L, 2L)), "CALL returns (new version, n_parts)")
    assert(spark.sql("SELECT k, v FROM gp.db.t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq === before)
    // positional spelling, default keep=1 via named omission
    val exp = spark.sql("CALL gp.system.expire_snapshots('db.t')")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(exp === Seq((1L, 2L)), "vacuum to 1 manifest, 2 compacted files")
    assert(spark.sql("SELECT k, v FROM gp.db.t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq === before)
    // unknown procedure and non-kv table both refuse with clear messages
    val e1 = intercept[Exception] { spark.sql("CALL gp.system.nope()").collect() }
    assert(e1.getMessage.contains("no procedure") || e1.getMessage.contains("nope"))
    spark.sql("CREATE TABLE gp.db.s USING graftseq OPTIONS (n '5', slices '1')")
    val e2 = intercept[Exception] {
      spark.sql("CALL gp.system.compact(table => 'db.s')").collect()
    }
    assert(e2.getMessage.contains("not a graftkv table"))
  }

  test("graftkv file-level COW groups: DELETE/UPDATE rewrite only the matched files") {
    import graft.sources.KvSource
    val root = s"${graft.RunScoped.ioDir}/cat_cow"
    spark.conf.set("spark.sql.catalog.gf", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gf.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gf.db")
    spark.sql("CREATE TABLE gf.db.t USING graftkv")
    (0 until 4).foreach { i =>
      spark.sql("INSERT INTO gf.db.t SELECT /*+ REPARTITION(1) */ " +
        s"id AS k, id * 10 AS v FROM range(${i * 5}, ${i * 5 + 5})")
    }
    val dataDir = s"$root/db/t.gtdata"
    def currentParts() = KvSource.readSnapshotMeta(dataDir,
      new java.io.File(dataDir).listFiles().map(_.getName)
        .collect { case n if n.startsWith("snap-") && n.endsWith(".gts") =>
          n.stripPrefix("snap-").stripSuffix(".gts").toLong }.max)
      ._3.map(_.split('\t')(0)).toSet // manifest lines carry k-range stats (r15)
    val before = currentParts()
    assert(before.size === 4, s"four single-file inserts, got $before")
    // SELECT _file: the metadata column is a real lineage surface
    val fileOf7 = spark.sql("SELECT _file FROM gf.db.t WHERE k = 7")
      .collect().map(_.getString(0)).toSeq
    assert(fileOf7.size === 1 && before.contains(fileOf7.head))
    // DELETE one key: the runtime group filter narrows the rewrite to
    // the ONE file holding it — the other three carry forward BY NAME
    spark.sql("DELETE FROM gf.db.t WHERE k = 7")
    val afterDelete = currentParts()
    assert((before - fileOf7.head).subsetOf(afterDelete),
      "untouched files must carry forward by name")
    assert(!afterDelete.contains(fileOf7.head), "the matched file is replaced")
    assert(spark.sql("SELECT k FROM gf.db.t").collect().map(_.getLong(0)).sorted
      === (0L until 20L).filterNot(_ == 7L).toArray)
    // UPDATE one key: same surgical shape
    val fileOf12 = spark.sql("SELECT _file FROM gf.db.t WHERE k = 12")
      .collect().map(_.getString(0)).head
    spark.sql("UPDATE gf.db.t SET v = 999 WHERE k = 12")
    val afterUpdate = currentParts()
    assert((afterDelete - fileOf12).subsetOf(afterUpdate))
    assert(!afterUpdate.contains(fileOf12))
    val rows = spark.sql("SELECT k, v FROM gf.db.t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(rows === (0L until 20L).filterNot(_ == 7L)
      .map(k => (k, if (k == 12L) 999L else k * 10)))
    // prior versions still serve their exact pre-mutation rows
    assert(spark.sql("SELECT k FROM gf.db.t VERSION AS OF 4").count() === 20L)
  }

  test("graftkv data skipping: manifest k-ranges prune files; stats survive COW; statless never skipped") {
    import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual, LessThan}
    import graft.sources.{KvScanBuilder, KvSource}
    val root = s"${graft.RunScoped.ioDir}/cat_skip"
    spark.conf.set("spark.sql.catalog.gs", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gs.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gs.db")
    spark.sql("CREATE TABLE gs.db.t USING graftkv")
    (0 until 4).foreach { i =>
      spark.sql("INSERT INTO gs.db.t SELECT /*+ REPARTITION(1) */ " +
        s"id AS k, id * 10 AS v FROM range(${i * 10}, ${i * 10 + 10})")
    }
    val dataDir = s"$root/db/t.gtdata"
    def planned(filters: org.apache.spark.sql.sources.Filter*): Int = {
      val b = new KvScanBuilder(dataDir, None)
      val residual = b.pushFilters(filters.toArray)
      assert(residual.length === filters.length, "all filters stay residual")
      b.build().toBatch.planInputPartitions().length
    }
    assert(planned() === 4, "no filter: all files")
    assert(planned(EqualTo("k", 25L)) === 1, "point lookup opens ONE file")
    assert(planned(GreaterThanOrEqual("k", 10L), LessThan("k", 30L)) === 2,
      "range scan opens the two covering files")
    assert(planned(EqualTo("k", 999L)) === 0, "out-of-range opens none")
    // end-to-end: residual evaluation keeps answers exact
    assert(spark.sql("SELECT v FROM gs.db.t WHERE k = 25").collect()
      .map(_.getLong(0)).toSeq === Seq(250L))
    assert(spark.sql("SELECT COUNT(*) FROM gs.db.t WHERE k >= 10 AND k < 30")
      .head().getLong(0) === 20L)
    // stats SURVIVE a file-level COW delete: untouched files keep their
    // ranges (carried line-for-line), so the point lookup still prunes
    spark.sql("DELETE FROM gs.db.t WHERE k = 15")
    assert(planned(EqualTo("k", 25L)) === 1, "stats carried across COW")
    assert(spark.sql("SELECT COUNT(*) FROM gs.db.t").head().getLong(0) === 39L)
    // a legacy statless manifest line is NEVER skipped
    val f = new org.apache.hadoop.fs.Path(dataDir)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    val legacy = new org.apache.hadoop.fs.Path(dataDir, "part-legacy-00000.gkv")
    val out = f.create(legacy, true)
    try out.write("100\t1000\n".getBytes("UTF-8")) finally out.close()
    val lines = KvSource.resolvePartLines(dataDir, None) :+ "part-legacy-00000.gkv"
    KvSource.publishSnapshot(dataDir, lines, "append")
    assert(planned(EqualTo("k", 25L)) === 2,
      "statless legacy file must always be scanned")
    assert(spark.sql("SELECT v FROM gs.db.t WHERE k = 100").collect()
      .map(_.getLong(0)).toSeq === Seq(1000L))
  }

  test("write-audit-publish gates on real contract violations") {
    import spark.implicits._
    // the happy path publishes exactly the source aggregate
    val out = graft.queries.Core.q28WapPublish(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val exp = graft.Tables.orders(spark, sf)
      .select(floor(unix_micros(col("o_orderdate")) / 86400000000L)
        .cast("long").as("k"),
        round(col("o_totalprice") * 100, 0).cast("long").as("v"))
      .groupBy("k").agg(sum(col("v")).as("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(out.toSeq === exp.toSeq, "published table must equal the source aggregate")
    // and the audit predicates are NOT vacuous: a staged table with a
    // duplicated key is caught by the same uniqueness check q28 applies
    val bad = s"${graft.RunScoped.ioDir}/wap_bad"
    Seq((1L, 10L), (1L, 20L), (2L, 30L)).toDF("k", "v")
      .repartition(1)
      .write.format("graft.sources.KvSource").option("path", bad)
      .mode("overwrite").save()
    val staged = spark.read.format("graft.sources.KvSource").option("path", bad).load()
    val a = staged.agg(count(lit(1)).as("n"),
      countDistinct(col("k")).as("nk")).collect()(0)
    assert(a.getLong(0) !== a.getLong(1),
      "duplicate-key staging must fail the uniqueness audit")
  }

  test("GraftCatalog DDL laws: create/list/exists/rename/drop, both providers, SQL-only access") {
    import org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException
    val root = s"${graft.RunScoped.ioDir}/cat_law"
    spark.conf.set("spark.sql.catalog.gtest", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gtest.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtest.db")
    assert(spark.sql("SHOW NAMESPACES IN gtest").collect()
      .map(_.getString(0)).contains("db"))
    // kv table: create → listed → insert via SQL → select via SQL
    spark.sql("DROP TABLE IF EXISTS gtest.db.t1")
    spark.sql("CREATE TABLE gtest.db.t1 USING graftkv")
    assert(spark.sql("SHOW TABLES IN gtest.db").collect()
      .map(_.getString(1)).contains("t1"), "created table must list")
    intercept[TableAlreadyExistsException] {
      spark.sql("CREATE TABLE gtest.db.t1 USING graftkv")
    }
    spark.sql("INSERT INTO gtest.db.t1 SELECT id AS k, id * 3 AS v FROM range(50)")
    val got = spark.sql("SELECT k, v FROM gtest.db.t1 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === (0L until 50L).map(k => (k, k * 3L)))
    // metadata published atomically: the namespace dir holds the meta
    // file and data dir, never a staged remnant
    val nsFiles = new java.io.File(s"$root/db").listFiles().map(_.getName)
    assert(nsFiles.contains("t1.gt") && !nsFiles.exists(_.startsWith("_staged")),
      s"unexpected namespace contents: ${nsFiles.mkString(",")}")
    // seq table through the catalog: options persist in metadata, reads
    // go through the same pushdown-capable scan stack
    spark.sql("DROP TABLE IF EXISTS gtest.db.s1")
    spark.sql("CREATE TABLE gtest.db.s1 USING graftseq OPTIONS (n '1000', slices '4')")
    assert(spark.sql("SELECT COUNT(*) AS n FROM gtest.db.s1 WHERE id >= 900")
      .collect()(0).getLong(0) === 100L)
    // rename moves metadata AND data; the old name stops resolving
    spark.sql("ALTER TABLE gtest.db.t1 RENAME TO db.t2")
    assert(spark.sql("SELECT COUNT(*) AS n FROM gtest.db.t2").collect()(0).getLong(0) === 50L)
    val afterRename = spark.sql("SHOW TABLES IN gtest.db").collect().map(_.getString(1))
    assert(afterRename.contains("t2") && !afterRename.contains("t1"))
    // drop removes both listings and data; selecting a dropped table fails
    spark.sql("DROP TABLE gtest.db.t2")
    spark.sql("DROP TABLE gtest.db.s1")
    assert(spark.sql("SHOW TABLES IN gtest.db").collect().isEmpty)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM gtest.db.t2").collect()
    }
    // provider validation is at CREATE time, not first read
    intercept[Exception] {
      spark.sql("CREATE TABLE gtest.db.bad USING parquet")
    }
  }

  test("GraftCatalog: data and staging directories are not namespaces (r12 advice)") {
    val root = s"${graft.RunScoped.ioDir}/cat_resv"
    spark.conf.set("spark.sql.catalog.gres", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gres.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gres.db")
    spark.sql("DROP TABLE IF EXISTS gres.db.t1")
    spark.sql("CREATE TABLE gres.db.t1 USING graftkv")
    spark.sql("INSERT INTO gres.db.t1 SELECT id AS k, id AS v FROM range(10)")
    // the kv data directory is on disk…
    assert(new java.io.File(s"$root/db/t1.gtdata").isDirectory,
      "fixture broken: expected a t1.gtdata data directory")
    // …but never surfaces as a child namespace (the phantom the advice flagged)
    val children = spark.sql("SHOW NAMESPACES IN gres.db").collect().map(_.getString(0))
    assert(!children.exists(_.contains("gtdata")),
      s"data dir leaked into namespace listing: ${children.mkString(",")}")
    val top = spark.sql("SHOW NAMESPACES IN gres").collect().map(_.getString(0))
    assert(top.contains("db") && !top.exists(_.contains("gtdata")))
    // reserved names are refused at CREATE NAMESPACE, not silently shadowed
    intercept[Exception] {
      spark.sql("CREATE NAMESPACE gres.`t9.gtdata`")
    }
    intercept[Exception] {
      spark.sql("CREATE NAMESPACE gres.`_staged-evil`")
    }
    spark.sql("DROP TABLE gres.db.t1")
  }
}
