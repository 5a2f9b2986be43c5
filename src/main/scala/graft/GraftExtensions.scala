package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimF, DeflateRatio, Fnv1a64, Hamming64, SimHash64}

/** Build-time extension hook: enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (or
  * `.withExtensions(new GraftExtensions)`) and the engine's custom
  * expressions resolve in SQL from any session — the idiomatic way a
  * library contributes Catalyst pieces. For an already-built session, use
  * [[graft.functions.functions.registerSql]] instead.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name)

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("fnv1a64"),
      info("fnv1a64", "fnv1a64(str) - 64-bit FNV-1a content fingerprint"),
      (es: Seq[Expression]) => Fnv1a64(es.head)))
    e.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(array<string>) - SimHash near-dup signature"),
      (es: Seq[Expression]) => SimHash64(es.head)))
    e.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(array<float>, array<float>) - cosine similarity"),
      (es: Seq[Expression]) => CosineSimF(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("hamming64"),
      info("hamming64", "hamming64(bigint, bigint) - Hamming distance of signatures"),
      (es: Seq[Expression]) => Hamming64(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("deflate_ratio"),
      info("deflate_ratio", "deflate_ratio(str) - zlib compression ratio (repetitiveness signal)"),
      (es: Seq[Expression]) => DeflateRatio(es.head)))
  }
}
