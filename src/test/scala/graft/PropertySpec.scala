package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Kernels

/** ScalaCheck properties over the expression kernels (SURVEY.md §5.3). */
object PropertySpec extends Properties("Kernels") {

  private def utf8Arr(ts: Seq[String]) =
    new GenericArrayData(ts.map(t => UTF8String.fromString(t)).toArray[Any])

  private val token = Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(12))
  private val tokens = Gen.nonEmptyListOf(token)

  property("minhash table derivation is minimal and meets the recall target on the S-curve") =
    forAll(Gen.choose(0.05, 0.95), Gen.choose(0.5, 0.99)) { (maxDist, p) =>
      val b = graft.ext.Dedup.minhashTables(maxDist, p)
      val s = 1.0 - maxDist
      // 1-(1-s)^b is the per-pair candidate probability at the decision
      // threshold; the derived b must reach the target and b-1 must not
      b >= 1 &&
        1.0 - math.pow(1.0 - s, b.toDouble) >= p - 1e-9 &&
        (b == 1 || 1.0 - math.pow(1.0 - s, (b - 1).toDouble) < p + 1e-9)
    }

  property("ivf geometry: sublinear dials at every corpus size") =
    forAll(Gen.choose(1L, 10000000L)) { n =>
      val (nlist, mod, probe) = graft.ext.Similarity.ivfGeometry(n)
      // min(√n, 12·n^¼)-sized centroid table (the r11 build-cost cap),
      // every mod-th vector seeds, probe = ⌈√nlist⌉
      val root = math.ceil(math.sqrt(n.toDouble)).toLong
      val cap = 12L * math.ceil(math.sqrt(math.sqrt(n.toDouble))).toLong
      nlist == math.max(4L, math.min(root, cap)) &&
        mod >= 1 && mod <= math.max(1L, n) && probe >= 2 && probe.toLong <= nlist
    }

  property("fnv1a64 is deterministic and sensitive to any appended byte") =
    forAll(Gen.alphaNumStr) { s =>
      val h1 = Kernels.fnv1a64(UTF8String.fromString(s))
      val h2 = Kernels.fnv1a64(UTF8String.fromString(s))
      val h3 = Kernels.fnv1a64(UTF8String.fromString(s + "x"))
      h1 == h2 && h1 != h3
    }

  property("simhash64 is order-invariant over token multisets") =
    forAll(tokens) { ts =>
      Kernels.simhash64(utf8Arr(ts)) == Kernels.simhash64(utf8Arr(scala.util.Random.shuffle(ts)))
    }

  property("identical token lists have hamming distance 0") =
    forAll(tokens) { ts =>
      Kernels.hamming64(Kernels.simhash64(utf8Arr(ts)), Kernels.simhash64(utf8Arr(ts))) == 0
    }

  private val floatVec: Gen[Array[Float]] =
    Gen.nonEmptyListOf(Gen.chooseNum(-100f, 100f)).map(_.toArray)

  private def fArr(a: Array[Float]) = new GenericArrayData(a.map(Float.box).toArray[Any])

  property("cosine is bounded in [-1, 1] and symmetric") =
    forAll(floatVec) { v =>
      val w = v.map(x => -x * 0.5f)
      val c = Kernels.cosineF(fArr(v), fArr(w))
      val c2 = Kernels.cosineF(fArr(w), fArr(v))
      c >= -1.0000001 && c <= 1.0000001 && math.abs(c - c2) < 1e-12
    }

  property("cosine of a vector with itself is 1 (non-zero vectors)") =
    forAll(floatVec.suchThat(_.exists(_ != 0f))) { v =>
      math.abs(Kernels.cosineF(fArr(v), fArr(v)) - 1.0) < 1e-9
    }

  property("hamming64 is a metric: symmetry + triangle inequality") =
    forAll { (a: Long, b: Long, c: Long) =>
      val ab = Kernels.hamming64(a, b)
      val ba = Kernels.hamming64(b, a)
      val ac = Kernels.hamming64(a, c)
      val cb = Kernels.hamming64(c, b)
      ab == ba && ab <= ac + cb && ab >= 0 && ab <= 64
    }

  /** Reference session-splitter in plain Scala, mirroring the documented
    * semantics: an event merges while ts <= prev + gap (boundary inclusive).
    */
  private def sessionize(ts: Seq[Long], gapUs: Long): Seq[(Long, Long, Int)] = {
    val sorted = ts.sorted
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    var start = sorted.head; var last = sorted.head; var n = 1
    for (t <- sorted.tail) {
      if (t > last + gapUs) { out += ((start, last + gapUs, n)); start = t; n = 0 }
      n += 1; last = t
    }
    out += ((start, last + gapUs, n))
    out.toSeq
  }

  /** The integer chunk-count formula shared by ops/Chunking and its oracle:
    * chunks = 1 + ceil(max(n − L, 0) / S) via integer arithmetic.
    */
  private def chunkCount(n: Long, maxLen: Int, stride: Int): Long =
    1L + (math.max(n - maxLen, 0L) + stride - 1) / stride

  property("chunk spans tile [0, n) without holes whenever stride <= maxLen") =
    forAll(Gen.chooseNum(1L, 200000L), Gen.chooseNum(1, 4096), Gen.chooseNum(1, 4096)) {
      (n, a, b) =>
        val len = math.max(a, b); val stride = math.min(a, b)
        val k = chunkCount(n, len, stride)
        val spans = (0L until k).map(i => (i * stride, math.min(i * stride + len, n)))
        spans.forall { case (s, e) => s < e } && // every chunk non-empty
          spans.head._1 == 0 && spans.last._2 == n && // first starts at 0, last reaches n
          spans.sliding(2).forall { // consecutive chunks overlap or abut
            case Seq((_, e1), (s2, _)) => s2 <= e1
            case _ => true
          }
    }

  property("int8 quantization codes stay in [-127, 127] and max-abs maps to ±127") =
    forAll(floatVec.suchThat(_.exists(_ != 0f))) { v =>
      val mx = v.map(x => math.abs(x.toDouble)).max
      val codes = v.map(x => math.floor(x.toDouble / mx * 127 + 0.5).toLong)
      codes.forall(c => c >= -127 && c <= 127) &&
        codes.exists(c => math.abs(c) == 127)
    }

  property("reference sessionizer: counts conserve and sessions are gap-separated") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(0L, 10L * 3600 * 1000000L))) { ts =>
      val gap = 30L * 60 * 1000000L
      val sessions = sessionize(ts, gap)
      val countsOk = sessions.map(_._3).sum == ts.size
      // a new session only starts strictly after the previous end
      // (end = last event + gap; an event exactly at the end merges)
      val separated = sessions.sliding(2).forall {
        case Seq((_, e1, _), (s2, _, _)) => s2 > e1
        case _ => true
      }
      countsOk && separated
    }
}
