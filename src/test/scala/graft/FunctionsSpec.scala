package graft

import org.apache.spark.sql.functions._

import graft.functions.{functions => gf, Kernels}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions: known values, identities, codegen path. */
class FunctionsSpec extends SparkSuite {

  test("fnv1a64 matches the published FNV-1a test vectors") {
    // http://www.isthe.com/chongo/tech/comp/fnv/ reference values
    assert(Kernels.fnv1a64(UTF8String.fromString("")) === 0xcbf29ce484222325L)
    assert(Kernels.fnv1a64(UTF8String.fromString("a")) === 0xaf63dc4c8601ec8cL)
    assert(Kernels.fnv1a64(UTF8String.fromString("foobar")) === 0x85944171f73967e8L)
  }

  test("fnv1a64 as a column expression (codegen path) agrees with the kernel") {
    import spark.implicits._
    val rows = Seq("", "a", "foobar", "spark graft").toDF("s")
      .select(col("s"), gf.fnv1a64(col("s")).as("h"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) === Kernels.fnv1a64(UTF8String.fromString(r.getString(0))))
    }
  }

  test("simhash64: identical token sets collide, disjoint ones differ") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("alpha", "beta", "gamma", "delta")),
      (2L, Seq("alpha", "beta", "gamma", "delta")),
      (3L, Seq("zeta", "eta", "theta", "iota")),
    ).toDF("id", "toks").select(col("id"), gf.simhash64(col("toks")).as("sig"))
    val sigs = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) !== sigs(3L))
  }

  test("deflate_ratio: repetitive text compresses far below varied text, deterministically") {
    import spark.implicits._
    val rep = "spam " * 200
    val varied = (1 to 200).map(i => s"tok${i * 7919 % 1000}").mkString(" ")
    assert(Kernels.deflateRatio(UTF8String.fromString("")) === 1.0)
    val viaColumn = Seq(rep, varied, rep).toDF("s")
      .select(gf.deflate_ratio(col("s"))).collect().map(_.getDouble(0))
    assert(viaColumn(0) === viaColumn(2)) // deterministic
    assert(viaColumn(0) < 0.1, s"repetitive ratio ${viaColumn(0)}")
    assert(viaColumn(1) > 2 * viaColumn(0), s"varied ${viaColumn(1)} vs ${viaColumn(0)}")
    // SQL registration path resolves and agrees with the column API
    graft.functions.functions.registerSql(spark)
    val viaSql = spark.sql(s"SELECT deflate_ratio('${rep.trim}')").collect()(0).getDouble(0)
    assert(math.abs(viaSql - Kernels.deflateRatio(UTF8String.fromString(rep.trim))) < 1e-12)
  }

  test("cosine_sim: self-similarity 1.0, orthogonal 0.0, empty-norm 0.0") {
    import spark.implicits._
    val df = Seq(
      (Seq(1f, 2f, 3f), Seq(1f, 2f, 3f), 1.0),
      (Seq(1f, 0f), Seq(0f, 1f), 0.0),
      (Seq(0f, 0f), Seq(1f, 1f), 0.0),
    ).toDF("a", "b", "want")
      .select(gf.cosine_sim(col("a"), col("b")).as("got"), col("want"))
    df.collect().foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("int8_dot is the exact integer dot product, via column API and SQL") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.util.ArrayData
    // kernel: exact integer MAC, negative codes included
    assert(Kernels.int8Dot(
      ArrayData.toArrayData(Array(127L, -127L, 1L)),
      ArrayData.toArrayData(Array(127L, 127L, 5L))) === 127L * 127 - 127L * 127 + 5L)
    // column API agrees with the functions.aggregate/zip_with composition
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (Seq(-128L, 127L), Seq(127L, -128L)),
      (Seq.empty[Long], Seq.empty[Long]),
    ).toDF("a", "b")
      .select(gf.int8_dot(col("a"), col("b")).as("got"),
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")
          .as("want"))
    df.collect().foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // SQL registration path resolves
    graft.functions.functions.registerSql(spark)
    assert(spark.sql("SELECT int8_dot(array(2L, 3L), array(4L, 5L))")
      .collect()(0).getLong(0) === 23L)
  }

  test("hamming64 counts differing bits") {
    assert(Kernels.hamming64(0L, -1L) === 64)
    assert(Kernels.hamming64(0b1011L, 0b0010L) === 2)
    import spark.implicits._
    val got = Seq((0L, -1L)).toDF("a", "b")
      .select(gf.hamming64(col("a"), col("b"))).collect()(0).getInt(0)
    assert(got === 64)
  }

  test("GraftExtensions wires the SQL functions and the hamming identity fold at session build") {
    import graft.functions.GraftExtensions
    // Builder.create() (not getOrCreate) builds a FRESH session over the
    // live SparkContext with the extensions applied — getOrCreate would
    // return the suite's shared session and silently skip them
    spark.sparkContext // force the suite's context up first; create() reuses it
    val s2 = org.apache.spark.sql.classic.SparkSession.builder()
      .master("local[4]")
      .withExtensions(e => new GraftExtensions().apply(e))
      .create()
    // NOTE s2.stop() is NOT the right cleanup: it would stop the
    // SparkContext the suite's session shares. What can and must be
    // undone is session-level: drop s2's execution listeners and restore
    // the suite session as active/default so no later test resolves
    // against the extended session by accident.
    try {
      // injected functions resolve in SQL with no registerSql call
      val r = s2.sql(
        "SELECT fnv1a64('foobar') AS h, deflate_ratio(repeat('a', 1000)) < 0.1 AS rep")
        .collect()(0)
      assert(r.getLong(0) === 0x85944171f73967e8L)
      assert(r.getBoolean(1))
      // wrong-arity calls fail with the builder's arity message, not an
      // IndexOutOfBoundsException from a blind es(1)
      val wrongArity = intercept[Exception](s2.sql("SELECT hamming64(1)").collect())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(wrongArity).exists(_.contains("expects 2 argument")),
        s"expected the arity message, got: ${msgs(wrongArity).mkString(" | ")}")
      // the identity fold rewrites hamming64(x, x) away entirely
      val df = s2.sql(
        "SELECT hamming64(fnv1a64(x), fnv1a64(x)) AS d FROM VALUES ('abc'), (CAST(NULL AS STRING)) t(x)")
      assert(!df.queryExecution.optimizedPlan.toString.toLowerCase.contains("hamming"),
        s"identity not folded:\n${df.queryExecution.optimizedPlan}")
      // and null semantics survive the rewrite: null in, null out — never 0
      val got = df.collect().map(row => if (row.isNullAt(0)) None else Some(row.getInt(0))).toSet
      assert(got === Set(Some(0), None))
      // the suite's shared session is untouched (no injected rule there)
      val shared = spark.sql("SELECT 1").sparkSession
      assert(shared eq spark)
    } finally {
      s2.listenerManager.clear()
      org.apache.spark.sql.SparkSession.setDefaultSession(spark)
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }

  test("bloom_might_contain (codegen path) agrees with the driver-side filter") {
    import spark.implicits._
    val bf = org.apache.spark.util.sketch.BloomFilter.create(1000, 0.01)
    val put = (0 until 500).map(i => s"key_$i")
    put.foreach(bf.putString)
    val probe = put.take(50) ++ (0 until 50).map(i => s"absent_$i")
    val seen = spark.sparkContext.broadcast(bf)
    val got = probe.toDF("k")
      .select(col("k"), gf.bloom_might_contain(seen, col("k")).as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    // no false negatives, ever: every inserted key probes true
    put.take(50).foreach(k => assert(got(k), s"inserted key $k probed false"))
    // and the expression is the SAME predicate as the driver-side filter,
    // false positives included (bit-level agreement, not a statistical law)
    probe.foreach(k => assert(got(k) === bf.mightContainString(k), k))
    // null flows through as null (nullIntolerant), not a crash or a hit
    val withNull = Seq(Some("key_1"), None).toDF("k")
      .select(gf.bloom_might_contain(seen, col("k")).as("hit")).collect()
    assert(withNull(0).getBoolean(0) && withNull(1).isNullAt(0))
  }

  test("Misra-Gries: two-sided bound, all true heavy hitters survive, any merge order") {
    import spark.implicits._
    import graft.functions.{MisraGriesAggregator, MGSummary}
    // planted zipf-ish stream with vocab (40 tokens) >> k (8): the sketch
    // MUST decrement — this is the bounded-memory regime the guarantee is
    // about, deliberately harder than the near-uniform documents corpus
    val stream: Seq[String] =
      (1 to 40).flatMap { r => Seq.fill(3000 / (r * r))(s"tok_$r") }
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size.toLong
    val k = 8
    for (parts <- Seq(1, 3, 7)) {
      val got: MGSummary = spark.createDataset(stream).repartition(parts)
        .select(new MisraGriesAggregator(k).toColumn).head()
      assert(got.n === n)
      assert(got.counters.size <= k, s"buffer exceeded k: ${got.counters.size}")
      got.counters.foreach { case (t, est) =>
        assert(est <= truth(t), s"$t overestimated: $est > ${truth(t)}")
        assert(truth(t) - est <= n / (k + 1) + 1,
          s"$t undercounted past the bound: ${truth(t)} - $est")
      }
      // the heavy-hitter guarantee: true freq > n/(k+1) ⇒ a counter survives
      truth.filter { case (_, c) => c * (k + 1) > n }.keys.foreach { t =>
        assert(got.counters.contains(t),
          s"true heavy hitter $t missing from candidates (parts=$parts)")
      }
    }
  }

  test("sketch-guided heavy hitters equal the plain exact definition on the corpus") {
    val got = graft.ext.TextAnalysis.heavyHitters(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val toks = graft.ext.TextAnalysis
      .withTokens(Tables.documents(spark, sf))
      .select(explode(col("tokens")).as("token"))
    val n = toks.count()
    val exact = toks.groupBy("token").agg(count(lit(1)).as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .filter { case (_, c) => c * 41 > n }
      .sortBy { case (t, c) => (-c, t) }
    assert(got.toSeq === exact.toSeq)
  }
}
