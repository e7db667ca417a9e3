package graft.ops

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/**
 * Property tests for the n31 temperature-mixing integer arithmetic
 * (`Corpus.temperatureMixingQuery`): the acceptance predicate
 * `bucket·W·n_s < K·w_u·2^16` must (a) never overflow inside its
 * documented envelope, and (b) equal the real-valued acceptance test
 * `bucket/2^16 < K·w_s/(W·n_s)` it encodes — checked against exact BigInt
 * arithmetic, which is the ground truth both engines must match.
 */
object TemperatureMixProps extends Properties("TemperatureMix") {

  private val scale = 65536L // 2^16, the weight and bucket resolution
  private val budget = 100L

  // documented envelope: W·n_s < 1.4e14 keeps bucket·W·n_s under 2^63.
  // Generate source layouts well past testdata scale (up to 1e4 sources
  // of up to 1e9 docs) and verify the guard analytically per sample.
  private val sourcesGen: Gen[List[Long]] =
    Gen.choose(1, 200).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(
        Gen.choose(1L, 1000L),
        Gen.choose(1L, 1000000L),
        Gen.choose(1L, 1000000000L))))

  private def weight(n: Long): Long =
    math.floor(math.sqrt(n.toDouble) * scale.toDouble).toLong

  property("acceptance predicate matches exact BigInt arithmetic and never overflows in-envelope") =
    forAll(sourcesGen, Gen.choose(0L, scale - 1)) { (sizes, bucket) =>
      val ws = sizes.map(weight)
      val wTotal = ws.sum // longs: ≤ 1e4 sources · sqrt(1e9)·2^16 ≈ 2e13, exact
      sizes.zip(ws).forall { case (n, w) =>
        val inEnvelope = BigInt(wTotal) * BigInt(n) < BigInt("140000000000000")
        if (!inEnvelope) true // outside the documented envelope: no claim
        else {
          // the long arithmetic the operator runs
          val longLhs = bucket * wTotal * n
          val longRhs = budget * w * scale
          // exact ground truth
          val bigLhs = BigInt(bucket) * BigInt(wTotal) * BigInt(n)
          val bigRhs = BigInt(budget) * BigInt(w) * BigInt(scale)
          // (a) no overflow: the long products equal their BigInt values
          BigInt(longLhs) == bigLhs && BigInt(longRhs) == bigRhs &&
            // (b) predicate equivalence
            (longLhs < longRhs) == (bigLhs < bigRhs)
        }
      }
    }

  property("expected kept count per source is K·w/W (within integer-bucket discretization)") =
    forAll(sourcesGen) { sizes =>
      val ws = sizes.map(weight)
      val wTotal = ws.sum
      sizes.zip(ws).forall { case (n, w) =>
        if (BigInt(wTotal) * BigInt(n) >= BigInt("140000000000000")) true
        else {
          // acceptance threshold on the bucket axis: bucket < t where
          // t = K·w·2^16 / (W·n); expected kept = n · min(t, 2^16)/2^16
          val t = (BigInt(budget) * BigInt(w) * BigInt(scale) /
            (BigInt(wTotal) * BigInt(n))).toDouble
          val expectedKept = n.toDouble * math.min(t, scale.toDouble) / scale.toDouble
          // must flatten toward K·w/W when the rate is < 1
          val target = budget.toDouble * w.toDouble / wTotal.toDouble
          expectedKept <= n.toDouble + 1e-9 &&
            (t >= scale.toDouble || math.abs(expectedKept - target) <= target * 0.01 + 1.0)
        }
      }
    }
}
