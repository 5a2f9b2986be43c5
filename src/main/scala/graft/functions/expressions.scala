package graft.functions

import org.apache.spark.sql.Column

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** JVM-side kernels shared by interpreted eval and generated code. Keeping
  * the loops here lets `doGenCode` emit a single static call, so the
  * expressions stay inside whole-stage codegen without inlining loop bodies.
  */
object Kernels {

  /** FNV-1a 64-bit over UTF-8 bytes — the document-fingerprint rolling hash. */
  def fnv1a64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** SimHash-64 over a token array: per-token FNV-1a hashes vote on each of
    * the 64 bit positions; the sign of the vote sets the output bit.
    */
  def simhash64(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = fnv1a64(arr.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var r = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) r |= (1L << b)
      b += 1
    }
    r
  }

  /** Cosine similarity of two float vectors, accumulated in double in
    * ascending index order — bit-identical to the DuckDB oracle formula
    * (list_sum over ascending range). Single pass, no allocation.
    */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Exact integer dot product of two int8-code arrays (stored as
    * array<long>) — the SQ8 quantized-ANN scoring core. Per-element
    * products are ≤ 127², so the sum is exact in long for any realistic
    * dimension; the score never touches a double, which is what makes
    * the x184 ranking hash-checkable.
    */
  def int8Dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }

  /** Deflate compression ratio (compressed/raw bytes, level 6): the
    * corpus-quality signal where highly repetitive text compresses far
    * below ~1 and natural text sits higher. Deterministic for a fixed
    * zlib level; a fresh Deflater per call keeps the kernel reentrant
    * across codegen'd rows (no shared native state).
    */
  def deflateRatio(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.isEmpty) return 1.0
    val d = new java.util.zip.Deflater(6)
    try {
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](1024)
      var compressed = 0L
      while (!d.finished()) compressed += d.deflate(buf)
      compressed.toDouble / raw.length
    } finally d.end()
  }
}

/** 64-bit FNV-1a content fingerprint of a string column (X4 document
  * fingerprinting). Native Catalyst expression with codegen — no UDF
  * serialization, stays inside WholeStageCodegen.
  */
case class Fnv1a64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    Kernels.fnv1a64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.fnv1a64($c)")
  override protected def withNewChildInternal(newChild: Expression): Fnv1a64 =
    copy(child = newChild)
}

/** SimHash-64 near-duplicate signature of a token array (X2 SimHash dedup). */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    Kernels.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Cosine similarity of two array<float> columns (X3), computed in double.
  * One fused pass over both arrays — replaces the
  * aggregate(zip_with(...)) composition with a single codegen'd call.
  */
case class CosineSimF(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.cosineF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimF =
    copy(left = l, right = r)
}

/** Exact integer dot product of two int8 code arrays (array<long>) — the
  * SQ8 scoring core (x184). Codegen'd single pass; LongType result keeps
  * the quantized ranking in exact integer arithmetic end to end.
  */
case class Int8Dot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.int8Dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.int8Dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Int8Dot =
    copy(left = l, right = r)
}

/** Hamming distance between two int64 signatures (SimHash band join). */
case class Hamming64(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.hamming64(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.hamming64($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Hamming64 =
    copy(left = l, right = r)
}

/** Deflate compression ratio of a string column — the repetitiveness
  * quality signal (zlib level 6, deterministic). Codegen'd like its
  * siblings; the zlib pass is the per-row cost, the same work any
  * implementation pays.
  */
case class DeflateRatio(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    Kernels.deflateRatio(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.deflateRatio($c)")
  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

/** Bloom-filter membership probe of a string column against a broadcast
  * `util.sketch.BloomFilter` (the X57r corpus-delta seen-set). Spark's own
  * codegen'd might_contain expression is internal to the runtime-filter
  * rule, so this is the public-API equivalent: the broadcast handle rides
  * in the expression (serialized into the codegen references array), each
  * executor reads the filter bits once, and the probe stays inside
  * WholeStageCodegen — the sixth native expression, retiring the repo's
  * last Scala-closure UDF.
  */
case class BloomMightContain(
    child: Expression,
    bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    bloom.value.mightContainString(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBc", bloom)
    defineCodeGen(ctx, ev, c =>
      s"((org.apache.spark.util.sketch.BloomFilter) $ref.value()).mightContainString($c.toString())")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

/** Column-API entry points, mirroring org.apache.spark.sql.functions style. */
object functions {
  import org.apache.spark.sql.graftshim.ColumnBridge
  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def x(col: Column): Expression = ColumnBridge.expression(col)

  def fnv1a64(col: Column): Column = c(Fnv1a64(x(col)))
  def simhash64(tokens: Column): Column = c(SimHash64(x(tokens)))
  def cosine_sim(a: Column, b: Column): Column = c(CosineSimF(x(a), x(b)))
  def hamming64(a: Column, b: Column): Column = c(Hamming64(x(a), x(b)))
  def int8_dot(a: Column, b: Column): Column = c(Int8Dot(x(a), x(b)))
  def deflate_ratio(col: Column): Column = c(DeflateRatio(x(col)))
  // not in registerSql: the expression closes over a Broadcast handle,
  // which a SQL call site has no way to supply
  def bloom_might_contain(
      bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter],
      col: Column): Column = c(BloomMightContain(x(col), bloom))

  /** Expose the custom expressions to SQL (`SELECT fnv1a64(text) ...`). */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.graftshim.ColumnBridge.registerFunction
    registerFunction(spark, "fnv1a64", es => Fnv1a64(es.head))
    registerFunction(spark, "simhash64", es => SimHash64(es.head))
    registerFunction(spark, "cosine_sim", es => CosineSimF(es(0), es(1)))
    registerFunction(spark, "hamming64", es => Hamming64(es(0), es(1)))
    registerFunction(spark, "int8_dot", es => Int8Dot(es(0), es(1)))
    registerFunction(spark, "deflate_ratio", es => DeflateRatio(es.head))
  }
}
