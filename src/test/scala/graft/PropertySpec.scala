package graft

import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.DateFeatures
import graft.plans.{ArrayEqCountExpr, CosineSimExpr, DotExpr, GeometricRoundExpr, L2DistExpr}

/** Generator-driven property checks (SURVEY.md §5.2 item 5) over the pure
  * expression kernels — evaluated through the expressions' interpreted
  * eval path directly (no SparkSession), so thousands of cases run in
  * milliseconds. The codegen path is asserted bitwise-equal to this path
  * in PlansSpec, so these properties transfer to it.
  */
object PropertySpec extends Properties("graft.kernels") {

  private val smallDouble = Gen.chooseNum(-1e6, 1e6)
  private val vecGen: Gen[Array[Double]] =
    Gen.chooseNum(1, 48).flatMap(n => Gen.containerOfN[Array, Double](n, smallDouble))
  private def pairGen: Gen[(Array[Double], Array[Double])] =
    for {
      a <- vecGen
      b <- Gen.containerOfN[Array, Double](a.length, smallDouble)
    } yield (a, b)

  private val dummy = org.apache.spark.sql.catalyst.expressions.Literal(1.0)

  private def evalDot(a: Array[Double], b: Array[Double]): Double =
    DotExpr(dummy, dummy).nullSafeEval(
      ArrayData.toArrayData(a), ArrayData.toArrayData(b)).asInstanceOf[Double]
  private def evalCos(a: Array[Double], b: Array[Double]): Double =
    CosineSimExpr(dummy, dummy).nullSafeEval(
      ArrayData.toArrayData(a), ArrayData.toArrayData(b)).asInstanceOf[Double]
  private def evalL2(a: Array[Double], b: Array[Double]): Double =
    L2DistExpr(dummy, dummy).nullSafeEval(
      ArrayData.toArrayData(a), ArrayData.toArrayData(b)).asInstanceOf[Double]

  property("dot is symmetric") = forAll(pairGen) { case (a, b) =>
    evalDot(a, b) == evalDot(b, a)
  }

  property("dot(a,a) = |a|² ≥ 0") = forAll(vecGen) { a =>
    evalDot(a, a) >= 0.0
  }

  property("cosine bounded in [-1, 1] (mod rounding) when defined") =
    forAll(pairGen) { case (a, b) =>
      val c = evalCos(a, b)
      c.isNaN || (c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }

  property("cosine(a, a) = 1 for nonzero a") = forAll(vecGen) { a =>
    val c = evalCos(a, a)
    c.isNaN || math.abs(c - 1.0) < 1e-9
  }

  property("cosine(a, -a) = -1 for nonzero a") = forAll(vecGen) { a =>
    val c = evalCos(a, a.map(-_))
    c.isNaN || math.abs(c + 1.0) < 1e-9
  }

  property("l2dist: nonneg, zero iff equal, symmetric") = forAll(pairGen) { case (a, b) =>
    val d = evalL2(a, b)
    d >= 0.0 && evalL2(a, a) == 0.0 && d == evalL2(b, a)
  }

  property("l2 triangle inequality") =
    forAll(for {
      a <- vecGen
      b <- Gen.containerOfN[Array, Double](a.length, smallDouble)
      c <- Gen.containerOfN[Array, Double](a.length, smallDouble)
    } yield (a, b, c)) { case (a, b, c) =>
      evalL2(a, c) <= evalL2(a, b) + evalL2(b, c) + 1e-6
    }

  property("eq_count ∈ [0, n]; n on identical; counts planted matches") =
    forAll(Gen.chooseNum(1, 32).flatMap(n =>
      Gen.containerOfN[Array, Long](n, Gen.choose(Long.MinValue, Long.MaxValue)))) { a =>
      val expr = ArrayEqCountExpr(dummy, dummy)
      def cnt(x: Array[Long], y: Array[Long]) = expr.nullSafeEval(
        ArrayData.toArrayData(x), ArrayData.toArrayData(y)).asInstanceOf[Int]
      val shifted = a.map(_ + 1) // differs everywhere (wrap-around included)
      cnt(a, a) == a.length && cnt(a, shifted) == 0
    }

  property("geometric round lands on floor or ceil; fixes integers") =
    forAll(Gen.chooseNum(-1e9, 1e9)) { x =>
      val g = GeometricRoundExpr(dummy).nullSafeEval(x).asInstanceOf[Double]
      val onStep = g == math.floor(x) || g == math.ceil(x)
      val fixesInt = GeometricRoundExpr(dummy)
        .nullSafeEval(math.rint(x)).asInstanceOf[Double] == math.rint(x)
      onStep && fixesInt
    }

  property("Easter falls on a Sunday in March or April") =
    forAll(Gen.chooseNum(1900, 2199)) { y =>
      val e = DateFeatures.easterDate(y)
      e.getDayOfWeek == java.time.DayOfWeek.SUNDAY &&
        (e.getMonthValue == 3 || e.getMonthValue == 4)
    }

  property("hash-split bucket derivation is total and stable") =
    forAll(Gen.alphaNumStr) { s =>
      // mirrors Sampling.hashSplit's bucket math on the driver side:
      // first hex digit of md5 → [0, 16)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      val hex = String.format("%032x", new java.math.BigInteger(1, md))
      val bucket = Integer.parseInt(hex.substring(0, 1), 16)
      bucket >= 0 && bucket < 16
    }

  // random texts over a small alphabet INCLUDING the delimiter, so empty
  // tokens, leading/trailing/double spaces all occur
  private val textGen: Gen[String] =
    Gen.listOf(Gen.oneOf("a", "bb", "ç", " ", "", "d e")).map(_.mkString(""))

  property("shingles generator matches the split+sliding reference model") =
    forAll(textGen) { s =>
      val expr = graft.plans.ShinglesGenerator(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(s),
          org.apache.spark.sql.types.StringType))
      val got = expr.eval(null).iterator.map(_.getString(0)).toSeq
      // reference: same regex split as split(text, ' '), adjacent pairs
      val toks = s.split(" ", -1).toSeq
      val want = if (toks.length < 2) Seq.empty
                 else toks.sliding(2).map(_.mkString(" ")).toSeq
      got == want
    }

  private def evalZ(a: Int, b: Int): Long =
    graft.plans.ZValueExpr(dummy, dummy).nullSafeEval(a, b).asInstanceOf[Long]
  private val code16 = Gen.chooseNum(0, 65535)

  property("zvalue is a bijection on 16-bit pairs (bits recoverable)") =
    forAll(code16, code16) { (a, b) =>
      val z = evalZ(a, b)
      val ra = (0 until 16).map(i => (((z >> (2 * i + 1)) & 1L) << i).toInt).sum
      val rb = (0 until 16).map(i => (((z >> (2 * i)) & 1L) << i).toInt).sum
      ra == a && rb == b
    }

  property("zvalue is strictly monotone along each axis slice") =
    forAll(code16, Gen.chooseNum(0, 65534)) { (fixed, v) =>
      evalZ(v, fixed) < evalZ(v + 1, fixed) && evalZ(fixed, v) < evalZ(fixed, v + 1)
    }

  property("zvalue interleave bounds: z < 4^16 and z >= max spread bit") =
    forAll(code16, code16) { (a, b) =>
      val z = evalZ(a, b)
      z >= 0 && z < (1L << 32)
    }

  private val tokenGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val tokensGen = Gen.nonEmptyListOf(tokenGen)

  property("BPE doubled encoding round-trips token sequences") =
    forAll(tokensGen) { toks =>
      // '  a  b  ' encode → trim + split on double spaces → original
      val doubledStr = "  " + toks.mkString("  ") + "  "
      doubledStr.trim.split("  ", -1).toSeq == toks
    }

  private val pngGen = for {
    w <- Gen.chooseNum(1, 300)
    h <- Gen.chooseNum(1, 60)
    g1 <- Gen.chooseNum(0, 255)
    g2 <- Gen.chooseNum(0, 255)
  } yield (w, h, g1, g2)

  property("minimal PNG writer round-trips through ImageIO pixel-exactly") =
    forAll(pngGen) { case (w, h, g1, g2) =>
      val bytes = graft.multimodal.Multimodal.ImageCodec.encodePng(w, h, g1, g2)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      img.getWidth == w && img.getHeight == h && {
        val r = img.getRaster
        (0 until h).forall { y =>
          val expect = if (y < h / 2) g1 else g2
          (0 until w).forall(x => r.getSample(x, y, 0) == expect)
        }
      }
    }

  property("BPE merge via doubled replace equals greedy left-to-right pair fusion") =
    forAll(tokensGen, tokenGen, tokenGen) { (toks, a, b) =>
      val doubledStr = "  " + toks.mkString("  ") + "  "
      val merged = doubledStr.replace(s" $a  $b ", s" ${a}_$b ")
      val got = merged.trim.split("  ", -1).toSeq
      // reference greedy fusion
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
          out += s"${a}_$b"; i += 2
        } else { out += toks(i); i += 1 }
      }
      got == out.toSeq
    }

  // --- r11 kernels -----------------------------------------------------

  private val hashSetGen: Gen[Set[Long]] =
    Gen.chooseNum(0, 60).flatMap(n =>
      Gen.containerOfN[Set, Long](n, Gen.chooseNum(0L, Long.MaxValue)))

  private def kmin(k: Int, s: Set[Long]): Set[Long] = s.toSeq.sorted.take(k).toSet

  property("KMV k-min merge: kmin(A ∪ B) = kmin(kmin(A) ∪ kmin(B)), assoc + comm") =
    forAll(hashSetGen, hashSetGen, hashSetGen) { (a, b, c) =>
      val k = 8
      // the mergeability identity q221's streaming maintenance rests on
      val direct = kmin(k, a ++ b)
      val merged = kmin(k, kmin(k, a) ++ kmin(k, b))
      val assoc1 = kmin(k, kmin(k, kmin(k, a) ++ kmin(k, b)) ++ kmin(k, c))
      val assoc2 = kmin(k, kmin(k, a) ++ kmin(k, kmin(k, b) ++ kmin(k, c)))
      direct == merged && assoc1 == assoc2 &&
        kmin(k, kmin(k, a) ++ kmin(k, b)) == kmin(k, kmin(k, b) ++ kmin(k, a))
    }

  private val ringKeyGen: Gen[Long] = Gen.chooseNum(0L, (1L << 60) - 1)
  private val ringGen: Gen[Map[Int, Seq[Long]]] =
    Gen.chooseNum(2, 6).flatMap { shards =>
      Gen.sequence[Seq[(Int, Seq[Long])], (Int, Seq[Long])](
        (0 until shards).map(s =>
          Gen.containerOfN[Seq, Long](4, ringKeyGen).map(vs => s -> vs.distinct)))
        .map(_.toMap)
    }

  private def ringAssign(ring: Map[Int, Seq[Long]], h: Long): Int = {
    // sort by (position, shard): two shards drawing the SAME position
    // must tie-break identically before and after a shard is added, or
    // the monotonicity property fails spuriously on Map iteration order
    val nodes = ring.toSeq.flatMap { case (s, vs) => vs.map(v => (v, s)) }.sorted
    nodes.find(_._1 >= h).getOrElse(nodes.head)._2
  }

  property("consistent ring: adding a shard only moves keys TO the new shard") =
    forAll(ringGen, Gen.containerOfN[Seq, Long](30, ringKeyGen),
      Gen.containerOfN[Seq, Long](4, ringKeyGen)) { (ring, keys, newVs) =>
      // q220's monotonicity theorem (Karger): keys either stay on their
      // old shard or move to the NEWLY added shard — never between two
      // pre-existing shards
      val newShard = ring.keys.max + 1
      val grown = ring + (newShard -> newVs.distinct)
      keys.forall { h =>
        val before = ringAssign(ring, h)
        val after = ringAssign(grown, h)
        after == before || after == newShard
      }
    }

  private val chunkToksGen: Gen[Seq[String]] =
    Gen.chooseNum(1, 90).flatMap(n =>
      Gen.containerOfN[Seq, String](n, Gen.alphaLowerStr.map(s => "w" + s.take(4))))

  property("chunk windows: full coverage when stride ≤ size, bounded length always") =
    forAll(chunkToksGen, Gen.chooseNum(2, 12), Gen.chooseNum(1, 12)) { (toks, size, stride) =>
      // the q218 geometry contract, independent of the engine tier
      val n = toks.length
      val chunks = Iterator.from(0).takeWhile(_.toLong * stride < n)
        .map(k => (k, toks.slice(k * stride, math.min(k * stride + size, n)))).toSeq
      val covered = stride <= size || chunks.forall(_._2.nonEmpty)
      val coverage = if (stride <= size)
        chunks.flatMap { case (k, c) => (k * stride) until (k * stride + c.length) }
          .toSet == (0 until n).toSet
      else true // gaps are legal geometry when stride > size; rows still non-empty
      val tail = chunks.last
      covered && coverage && (tail._1 * stride + tail._2.length <= n) &&
        chunks.forall(_._2.length <= size)
    }
}
