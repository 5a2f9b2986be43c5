package graft

import org.apache.spark.sql.functions.{col, count, countDistinct, expr, lit, unix_micros}

import graft.ext.Events
import graft.streaming.Streams

/** X9: streaming results replayed from files must agree with their batch
  * twins (tumbling exactly; watermarked sessions = batch minus the
  * withheld tail).
  */
class StreamingSpec extends SparkSuite {

  test("streaming tumbling equals batch tumbling") {
    val batch = Events.tumbling(spark, sf).collect().toSeq
    val stream = Streams.tumbling(spark, sf).collect().toSeq
    assert(stream === batch)
  }

  test("stateful accumulator carries state across micro-batches (MemoryStream)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val counted = mem.toDS().groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), (Long, Long, Double)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) =>
          var (n, t) = state.getOption.getOrElse((0L, 0.0))
          rows.foreach { r => n += 1; t += r._2 }
          state.update((n, t))
          Iterator((uid, n, t))
      }.toDF("user_id", "n", "total")
    val q = counted.writeStream.outputMode("update")
      .format("memory").queryName("graft_state_test").start()
    mem.addData((1L, 1.0), (1L, 2.0), (2L, 10.0))
    q.processAllAvailable()
    mem.addData((1L, 4.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("graft_state_test")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // batch 1 emitted (1,2,3.0) and (2,1,10.0); batch 2 emitted (1,3,7.0)
    assert(rows.toSet === Set((1L, 2L, 3.0), (2L, 1L, 10.0), (1L, 3L, 7.0)))
  }

  test("s19 deterministic HLL is replay-invariant across batch splits and replays driver registers") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val data = Tables.events(spark, sf).select(col("event_type"), col("user_id"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      def run(chunks: Seq[Seq[(String, Long)]]): Map[String, (Long, Long, Long, Long)] = {
        val mem = MemoryStream[(String, Long)]
        val out = mem.toDS().groupByKey(_._1)
          .transformWithState(new graft.streaming.Streams.DeterministicHllProcessor,
            TimeMode.None(), OutputMode.Update())
          .toDF("event_type", "n_events", "denom_s", "v_zero", "est_e3")
        val name = s"graft_s19_law_${chunks.size}"
        val q = out.writeStream.outputMode("update").format("memory")
          .queryName(name).start()
        chunks.foreach { c => mem.addData(c: _*); q.processAllAvailable() }
        q.stop()
        // the final (largest-n) update per key is the completed state
        spark.table(name).collect()
          .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
          .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).maxBy(_._1) }
      }
      val whole = run(Seq(data))
      val split = run(data.grouped(math.max(1, data.size / 3 + 1)).toSeq)
      // batch-boundary invariance: max-merge is associative, so 1 batch = 3
      assert(whole === split, "final state depends on batch boundaries")
      // driver replay of the register algebra, exact to the bit
      val md = java.security.MessageDigest.getInstance("MD5")
      val regs = scala.collection.mutable.Map[String, Array[Byte]]()
      val ns = scala.collection.mutable.Map[String, Long]()
      data.foreach { case (t, uid) =>
        val d = md.digest((uid.toString + ":hll").getBytes("UTF-8")); md.reset()
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        val m = regs.getOrElseUpdate(t, new Array[Byte](256))
        val w = h / 256L
        val rho = if (w == 0L) 25 else 25 - (64 - java.lang.Long.numberOfLeadingZeros(w))
        val b = (h % 256L).toInt
        if (rho > m(b)) m(b) = rho.toByte
        ns(t) = ns.getOrElse(t, 0L) + 1L
      }
      regs.foreach { case (t, m) =>
        var denom = 0L; var vz = 0L; var i = 0
        while (i < 256) { denom += 1L << (25 - m(i)); if (m(i) == 0) vz += 1L; i += 1 }
        val (gotN, gotDenom, gotVz, _) = whole(t)
        assert(gotN === ns(t) && gotDenom === denom && gotVz === vz,
          s"streaming registers diverge from driver replay for $t")
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming dedup final key set equals batch distinct") {
    import org.apache.spark.sql.functions.{lower, md5, regexp_replace, col}
    val batch = Tables.documents(spark, sf)
      .select(md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("k"))
      .distinct().collect().map(_.getString(0)).sorted.toSeq
    val stream = Streams.dedupStream(spark, sf).collect().map(_.getString(0)).toSeq
    assert(stream === batch)
  }

  test("dropDuplicatesWithinWatermark drops in-horizon dups, bounds state by the watermark") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sq = spark.sqlContext
    def ts(m: Int) = new Timestamp(3600L * 1000 + m * 60000L)
    val mem = MemoryStream[(String, Timestamp)]
    val deduped = mem.toDS().toDF("key", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("key")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("graft_wmdedup_test").start()
    // batch 1: a duplicate inside one batch → emitted once
    mem.addData(("a", ts(0)), ("a", ts(1)), ("b", ts(2)))
    q.processAllAvailable()
    // batch 2: "a" again within the 10m horizon → still a duplicate;
    // "c" is new. Watermark advances to ~ts(2)-10m.
    mem.addData(("a", ts(3)), ("c", ts(4)))
    q.processAllAvailable()
    // batch 3: push event time far ahead so "a"'s state expires, then
    // batch 4: "a" REAPPEARS once the horizon has passed — within-watermark
    // semantics, not global distinct
    mem.addData(("d", ts(60)))
    q.processAllAvailable()
    mem.addData(("a", ts(61)))
    q.processAllAvailable()
    q.stop()
    val keys = spark.table("graft_wmdedup_test")
      .collect().map(_.getString(0)).toSeq
    assert(keys.sorted === Seq("a", "a", "b", "c", "d"),
      s"got $keys")
  }

  test("stream-stream interval join emits in-horizon matches and drops post-watermark lates") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, expr}
    import java.sql.Timestamp
    implicit val sq = spark.sqlContext
    def ts(m: Int) = new Timestamp(3600L * 1000 + m * 60000L)
    val vm = MemoryStream[(Long, Long, Timestamp)]
    val pm = MemoryStream[(Long, Long, Timestamp)]
    val views = vm.toDS().toDF("view_id", "v_user", "view_ts")
      .withWatermark("view_ts", "10 minutes")
    val purchases = pm.toDS().toDF("purchase_id", "p_user", "purchase_ts")
      .withWatermark("purchase_ts", "10 minutes")
    val joined = views.join(purchases,
      col("v_user") === col("p_user") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"))
      .select("view_id", "purchase_id")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("graft_ssj_test").start()
    // in-horizon pair → match emitted
    vm.addData((1L, 1L, ts(0))); pm.addData((10L, 1L, ts(5)))
    q.processAllAvailable()
    // advance both watermarks far past view 1's retention bound
    // (view_ts + 30 min interval + 10 min watermark)
    vm.addData((2L, 2L, ts(120))); pm.addData((11L, 3L, ts(120)))
    q.processAllAvailable()
    // a purchase for user 1 at t6 is now LATE (below the purchase-side
    // watermark): dropped before the join, no resurrected match
    pm.addData((12L, 1L, ts(6)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("graft_ssj_test").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows === Set((1L, 10L)), s"got $rows")
  }

  test("left-outer stream join keeps the inner matches and flushes every unmatched view") {
    import org.apache.spark.sql.functions.col
    val lj = Streams.viewPurchaseLeftJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5)))
    // the matched subset is EXACTLY s06's inner join
    val inner = Streams.viewPurchaseJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5))).toSet
    assert(lj.filter(_._2 >= 0).toSet === inner)
    // every batch view appears exactly once matched-or-unmatched per match:
    // the view id set equals the batch view set (nothing held back in state)
    val allViews = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "view")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(lj.map(_._1).toSet === allViews,
      "some views never flushed from the outer join's state")
    // unmatched rows exist at this fixture and carry the null-side sentinels
    val unmatched = lj.filter(_._2 == -1L)
    assert(unmatched.nonEmpty, "fixture has no abandoned views — test is vacuous")
    unmatched.foreach { r => assert(r._5 === -1L && r._6 === 0.0) }
  }

  test("checkpointed windowed aggregate recovers state across stop/restart") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, count, lit, sum, window}
    import java.sql.Timestamp
    implicit val sq = spark.sqlContext
    def ts(m: Int) = new Timestamp(3600L * 1000 + m * 60000L)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val agg = mem.toDS().toDF("user_id", "ts", "value")
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").cast("long").as("ws"),
        col("user_id"), col("n"), col("total"))
    def start() = agg.writeStream.outputMode("complete")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("graft_restart_test").start()
    val q1 = start()
    mem.addData((1L, ts(0), 1.0), (1L, ts(10), 2.0), (2L, ts(5), 4.0))
    q1.processAllAvailable()
    q1.stop()
    // restart from the checkpoint: the new rows must MERGE into recovered
    // window state, not start from zero
    mem.addData((1L, ts(70), 8.0), (2L, ts(15), 16.0))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val got = spark.table("graft_restart_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val w0 = 3600L
    val w1 = 2 * 3600L
    // user 2's window-0 count of 2 spans the restart — the recovery proof
    assert(got === Set(
      (w0, 1L, 2L, 3.0),
      (w0, 2L, 2L, 20.0),
      (w1, 1L, 1L, 8.0)), s"got $got")
  }

  test("stateful aggregation runs on the RocksDB state store (the at-scale backend)") {
    // local runs default to the in-memory HDFS-backed provider; at corpus
    // scale state must live in RocksDB (bounded heap, incremental
    // checkpoints). Prove the same query semantics hold under it.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, count, sum}
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Double)]
      val agg = mem.toDS().toDF("user_id", "value")
        .groupBy("user_id")
        .agg(count(col("value")).as("n"), sum(col("value")).as("total"))
      val q = agg.writeStream.outputMode("complete")
        .format("memory").queryName("graft_rocksdb_test").start()
      mem.addData((1L, 1.0), (2L, 10.0))
      q.processAllAvailable()
      mem.addData((1L, 2.0)) // second batch must merge into RocksDB state
      q.processAllAvailable()
      q.stop()
      val got = spark.table("graft_rocksdb_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === Set((1L, 2L, 3.0), (2L, 1L, 10.0)), s"got $got")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("watermarked streaming sessions are a subset of batch sessions") {
    val batch = Events.sessions(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val stream = Streams.sessionsWatermarked(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(stream.nonEmpty)
    assert(stream.subsetOf(batch),
      s"streaming emitted sessions absent from batch: ${stream.diff(batch).take(3)}")
  }

  test("gap detector: closed gaps emit on arrival, timer alert fires when the watermark passes the silence") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, unix_micros}
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      def ts(h: Double) = new java.sql.Timestamp(t0.getTime + (h * 3600 * 1000).toLong)
      def us(h: Double) = ts(h).getTime * 1000L
      val mem = MemoryStream[(String, java.sql.Timestamp)]
      val gaps = mem.toDS().toDF("k", "ts")
        .withWatermark("ts", "0 seconds")
        .select(col("k"), unix_micros(col("ts")).as("ts_us")).as[(String, Long)]
        .groupByKey(_._1)
        .transformWithState(new Streams.GapDetectProcessor(2L * 3600 * 1000000),
          TimeMode.EventTime(), OutputMode.Append())
        .toDF("k", "gap_start_us", "gap_end_us")
      val q = gaps.writeStream.outputMode("append")
        .format("memory").queryName("graft_gap_test").start()
      // batch 1: both keys alive; batch 2+3: only "busy" keeps reporting,
      // advancing the watermark past "lone"'s armed expiry (t0 + 2h)
      mem.addData(("lone", ts(0)), ("busy", ts(0))); q.processAllAvailable()
      mem.addData(("busy", ts(3.0))); q.processAllAvailable()
      mem.addData(("busy", ts(3.1))); q.processAllAvailable()
      q.stop()
      val rows = spark.table("graft_gap_test").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      // the 3h hole in "busy" closes when the t0+3h event ARRIVES
      assert(rows.contains(("busy", us(0), us(3.0))), s"closed gap missing: $rows")
      // "lone" never reports again: only the event-time timer can surface
      // it — the open-ended alert carries its last sighting
      assert(rows.contains(("lone", us(0), -1L)), s"timer alert missing: $rows")
      // and "busy" is still live at the final watermark: no false alert
      assert(!rows.exists(r => r._1 == "busy" && r._3 == -1L),
        s"false tail alert for live key: $rows")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("full-outer stream join contains the left join's rows plus only purchase-side orphans") {
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val left = keyed(Streams.viewPurchaseLeftJoin(spark, sf))
    val full = keyed(Streams.viewPurchaseFullJoin(spark, sf))
    // the left join's output is exactly the full join's view-side rows
    assert(full.filter { case ((v, _), _) => v >= 0 } === left)
    // what full adds beyond left is only unmatched purchases (view_id = -1),
    // and those purchase ids never appear matched elsewhere in the output
    val matchedPurchases = full.keys.collect {
      case (v, p) if v >= 0 && p >= 0 => p
    }.toSet
    full.keys.filter(_._1 < 0).foreach { case (_, p) =>
      assert(p >= 0 && !matchedPurchases.contains(p),
        s"orphan purchase $p also appears matched")
    }
  }

  test("streaming HLL distinct: final state equals the one-shot batch sketch, within 5% of exact") {
    val got = graft.streaming.Streams.streamingDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ev = Tables.events(spark, sf)
    // batch truth: exact row/distinct counts + the one-shot sketch estimate
    val batch = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("exact"),
        expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("est"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet === batch.keySet)
    batch.foreach { case (t, (n, exact, batchEst)) =>
      val (gotN, gotEst) = got(t)
      assert(gotN === n, s"$t: processed $gotN rows of $n")
      // HLL absorption is order- and batch-boundary-insensitive: feeding
      // the stream micro-batch by micro-batch lands on the SAME sketch
      // registers as one batch pass — estimate equality, not similarity
      assert(gotEst === batchEst,
        s"$t: streaming estimate $gotEst != one-shot batch sketch $batchEst")
      assert(math.abs(gotEst - exact) <= math.max(1L, (exact * 0.05).toLong),
        s"$t: estimate $gotEst drifted past 5% of exact $exact")
    }
  }

  test("streaming inference scores equal the batch transform of the same seeded model") {
    import org.apache.spark.sql.functions._
    val got = Streams.streamingInference(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty)
    val model = graft.ml.ReorderModel.rf.fit(
      graft.ml.ReorderModel.assembledTrain(spark, sf))
    val batch = model.transform(graft.ml.ReorderModel.assemble(
        graft.insta.Insta.featureMatrix(spark, sf, Seq(2L))))
      .select(col("orderID"), col("productID"),
        floor(col("prediction") * 1000000d + 0.5d).cast("long").as("p"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.keySet === batch.keySet, "stream scored a different row set")
    // seeded fit + deterministic transform ⇒ EXACT equality, row by row
    got.foreach { case (k, p) =>
      assert(p === batch(k), s"row $k: stream $p != batch ${batch(k)}")
    }
  }

  test("streaming top-k leaderboard equals the batch top-10 with the tie-break order") {
    import org.apache.spark.sql.functions._
    val got = Streams.streamingTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val batch = Tables.events(spark, sf)
      .select(col("user_id"), floor(col("value") * 100d + 0.5d).cast("long").as("v"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (uid, _, t) => (-t, uid) }
      .take(10)
    assert(got.toSeq === batch.toSeq)
    // the leaderboard must be strictly ordered by (total desc, user asc)
    got.sliding(2).foreach { case Array((u1, _, t1), (u2, _, t2)) =>
      assert(t1 > t2 || (t1 == t2 && u1 < u2), "leaderboard order violated")
    }
  }

  test("alert stream fires once per window and equals the batch threshold set") {
    import org.apache.spark.sql.functions._
    val thr = 8L
    val got = Streams.alertStream(spark, sf, thr).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val batch = Tables.events(spark, sf)
      .select(col("event_type"),
        floor(unix_micros(col("ts")) / 86400000000L).cast("long").as("day"))
      .groupBy("event_type", "day").count()
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    // the fixture must exercise BOTH branches — some windows alert, some don't
    assert(got.nonEmpty && got.length < batch.size,
      s"threshold $thr does not split the fixture (${got.length} of ${batch.size})")
    assert(got.toSet === batch.filter(_._2 >= thr).keySet, "alert set != batch HAVING set")
    assert(got.distinct.length === got.length, "an alert fired twice for one window")
  }

  test("alert latch is edge-triggered across micro-batches and expires past the watermark") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sq = spark.sqlContext
    def ts(day: Long, h: Int) = new Timestamp(day * 86400000L + h * 3600L * 1000)
    val mem = MemoryStream[(String, Long, Timestamp)]
    val alerts = Streams.alertsOf(
      mem.toDS().toDF("event_type", "day", "ts")
        .withWatermark("ts", "48 hours")
        .as[(String, Long, Timestamp)], threshold = 3L)
      .toDF("event_type", "day")
    val q = alerts.writeStream.outputMode("update")
      .format("memory").queryName("graft_alert_test").start()
    // batch 1: key ("a", 10) sees 2 events — below threshold, no alert
    mem.addData(("a", 10L, ts(10, 1)), ("a", 10L, ts(10, 2)), ("b", 10L, ts(10, 1)))
    q.processAllAvailable()
    assert(spark.table("graft_alert_test").count() === 0L, "alert fired below threshold")
    // batch 2: one more "a" event crosses the threshold — exactly one alert
    mem.addData(("a", 10L, ts(10, 3)))
    q.processAllAvailable()
    // batch 3: further "a" traffic must NOT re-fire (the latch)
    mem.addData(("a", 10L, ts(10, 4)), ("a", 10L, ts(10, 5)))
    q.processAllAvailable()
    val afterLatch = spark.table("graft_alert_test").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(afterLatch.toSeq === Seq(("a", 10L)), s"latch broken: ${afterLatch.toSeq}")
    // batch 4: advance event time far past day 12 so the watermark passes
    // the key's day+2 timeout and its state is dropped; a late burst for
    // the EXPIRED window must stay silent (its data is complete by the
    // watermark contract — a re-alert would be a duplicate)
    mem.addData(("c", 20L, ts(20, 0)))
    q.processAllAvailable()
    mem.addData(("a", 10L, ts(10, 6)), ("a", 10L, ts(10, 7)), ("a", 10L, ts(10, 8)))
    q.processAllAvailable()
    q.stop()
    val finalRows = spark.table("graft_alert_test").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(finalRows.toSeq === Seq(("a", 10L)),
      s"expired window re-alerted: ${finalRows.toSeq}")
  }

  test("late-data drop: stragglers are dropped, everything else flushes, accounting balances") {
    import org.apache.spark.sql.functions._
    val streamed = Streams.lateDataDrop(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val ev = graft.Tables.events(spark, sf)
      .select(expr("unix_micros(ts)").as("us"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val minDay = ev.map(_._1 / 86400000000L).min
    val (late, onTime) = ev.partition(_._1 / 86400000000L == minDay)
    // the straggler file is non-trivial AND fully dropped
    assert(late.nonEmpty, "fixture must contain a late day")
    val exp = onTime.groupBy { case (us, t) => (us / 3600000000L * 3600L, t) }
      .map { case (k, v) => k -> v.size.toLong }
    assert(streamed === exp, "emitted windows must equal the on-time subset exactly")
    // accounting: batch total − streamed total = exactly the late rows
    assert(ev.length.toLong - streamed.values.sum === late.length.toLong)
    // and no window from the late day leaked through
    val lateWindows = late.map(_._1 / 3600000000L * 3600L).toSet
    assert(streamed.keys.forall { case (ws, _) => !lateWindows.contains(ws) })
  }

  test("s18 chained windows equal the batch two-level rollup, sentinels excluded") {
    val got = graft.streaming.Streams.twoLevelWindows(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val ev = graft.Tables.events(spark, sf)
      .select(unix_micros(col("ts")).as("us"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val fine = ev.groupBy { case (us, t) => (us / 900000000L * 900L, t) }.view
      .mapValues(_.size.toLong).toSeq
    val exp = fine.groupBy { case ((w15, t), _) => (w15 / 3600L * 3600L, t) }.view
      .mapValues { g =>
        (g.size.toLong, g.map(_._2).sum, g.map(_._2).max)
      }.toMap
    assert(got === exp, "two-level rollup mismatch")
    // the sentinel rows advanced the watermark but never surfaced
    assert(!got.keys.exists(_._2 == "__sentinel"))
    // both stateful levels are conservative: within an hour the peak
    // 15-minute bucket never exceeds the hour total, and at most four
    // fine windows roll into one hour
    got.values.foreach { case (nw, total, peak) =>
      assert(peak <= total && nw <= 4L && nw >= 1L)
    }
    // global conservation: Σ hourly totals = all events
    assert(got.values.map(_._2).sum === ev.length.toLong)
  }

  test("state reader reproduces s19's output from the RocksDB bytes alone") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val fromState = graft.streaming.Streams.stateReaderHll(spark, sf)
      .collect().map(key).toSeq
    val fromStream = graft.streaming.Streams.streamingHllDistinct(spark, sf)
      .collect().map(key).toSeq
    assert(fromState.nonEmpty)
    // the reader's rows ARE the stream's final rows: state ↔ output tied
    assert(fromState === fromStream,
      "statestore read diverged from the processor's own final updates")
  }

  test("legacy-API state reader decodes the HDFS-backed store to s03's final state") {
    val fromState = graft.streaming.Streams.stateReaderUserTotals(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val fromStream = graft.streaming.Streams.statefulUserTotals(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(fromState.nonEmpty)
    assert(fromState === fromStream,
      "legacy statestore read diverged from the stream's final per-user state")
  }
}
