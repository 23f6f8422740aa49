package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the round-9 native kernels over inputs the gate
  * corpus cannot produce (odd lengths, zeros, extreme magnitudes, empty
  * payloads). Everything here states the kernels' documented contracts;
  * the bit-parity against the HOF formulations on real data lives in
  * NativeExprParitySpec. */
object VectorKernelProps extends Properties("VectorKernels") {

  private val finiteFloat: Gen[Float] =
    Gen.chooseNum(-1e6f, 1e6f).suchThat(f => !f.isNaN && !f.isInfinite)
  private val floatVec: Gen[Array[Float]] =
    Gen.containerOf[Array, Float](finiteFloat)
  private def arr(v: Array[Float]) =
    new GenericArrayData(v.map(x => x: Any))

  property("int8 codes are bounded by 127 and sign-preserving") =
    forAll(floatVec) { v =>
      val q = VectorOps.int8EncodeAuto(arr(v)).toLongArray()
      q.length == v.length &&
        q.forall(x => math.abs(x) <= 127) &&
        q.zip(v).forall { case (qi, xi) =>
          (xi >= 0 && qi >= 0) || (xi < 0 && qi <= 0)
        }
    }

  property("the max-magnitude element always encodes to exactly ±127") =
    forAll(floatVec.suchThat(v => v.nonEmpty && v.exists(_ != 0f))) { v =>
      val q = VectorOps.int8EncodeAuto(arr(v)).toLongArray()
      val m = VectorOps.maxAbs(arr(v))
      v.indices.exists(i => math.abs(v(i).toDouble) == m &&
        math.abs(q(i)) == 127)
    }

  property("zero vectors encode to all-zero codes (scale guard)") =
    forAll(Gen.chooseNum(0, 128)) { n =>
      VectorOps.int8EncodeAuto(arr(Array.fill(n)(0.0f)))
        .toLongArray().forall(_ == 0L)
    }

  property("maxAbs equals the true max of |x|") =
    forAll(floatVec) { v =>
      val want = if (v.isEmpty) 0.0 else v.map(x => math.abs(x.toDouble)).max
      VectorOps.maxAbs(arr(v)) == want
    }

  property("absSum equals the exact left-fold of |x|") =
    forAll(floatVec) { v =>
      VectorOps.absSum(arr(v)) ==
        v.foldLeft(0.0)((a, x) => a + math.abs(x.toDouble))
    }

  private val codeVec: Gen[Array[Long]] =
    Gen.nonEmptyContainerOf[Array, Long](Gen.chooseNum(-127L, 127L))
      .suchThat(_.exists(_ != 0L))
  private def larr(v: Array[Long]) =
    new GenericArrayData(v.map(x => x: Any))

  private val codePair: Gen[(Array[Long], Array[Long])] = for {
    n <- Gen.chooseNum(1, 96)
    mk = Gen.listOfN(n, Gen.chooseNum(-127L, 127L)).map(_.toArray)
      .suchThat(_.exists(_ != 0L))
    a <- mk
    b <- mk
  } yield (a, b)

  property("integer cosine is bounded and reflexive") = forAll(codePair) {
    case (q, r) =>
      val self = VectorOps.intCosine(larr(q), larr(q))
      val c = VectorOps.intCosine(larr(q), larr(r))
      Prop(math.abs(self - 1.0) < 1e-9) &&
        Prop(c >= -1.0000001 && c <= 1.0000001)
  }

  property("ppm codec round-trips any payload (dims rule, cycled pixels, header length)") =
    forAll(Gen.containerOf[Array, Byte](Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { b =>
      import graft.operators.MultimodalQueries._
      val ppm = makePpm(b)
      val img = decodePpm(ppm)
      val n = b.length
      val w = 4 + (if (n == 0) 0 else b(0) & 0x07)
      val h = 4 + (if (n < 2) 0 else b(1) & 0x07)
      val headerLen = 9 + w.toString.length + h.toString.length
      img.width == w && img.height == h && img.maxval == 255 &&
        ppm.length == headerLen + w * h * 3 &&
        img.pixels.length == w * h * 3 &&
        img.pixels.indices.forall(i =>
          img.pixels(i) == (if (n == 0) 0: Byte else b(i % n)))
    }

  property("ppm parser tolerates comments and extra header whitespace") =
    forAll(Gen.alphaNumStr.map(_.take(12))) { c =>
      val body = Array.tabulate[Byte](4 * 4 * 3)(i => (i % 251).toByte)
      val payload = (s"P6\n# $c\n  4\t4 #dims\n255\n").getBytes("US-ASCII") ++ body
      val img = graft.operators.MultimodalQueries.decodePpm(payload)
      img.width == 4 && img.height == 4 && img.pixels.sameElements(body)
    }
}
