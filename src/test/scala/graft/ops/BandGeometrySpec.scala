package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/**
 * Invariants of the size-adaptive sign-projection banding geometry (the
 * round-9 n37 fix). These are the properties the linear-candidate argument
 * and the cross-geometry consistency of [[Dedup.planesFor]] rest on; a
 * regression in any of them silently reintroduces either the quadratic
 * candidate term or a recall cliff.
 */
class BandGeometrySpec extends AnyFunSuite {

  test("bits grow with corpus size: floor 12, cap 32, monotone, ~log2 n + 2") {
    assert(Dedup.lshBitsFor(0L) == 12)
    assert(Dedup.lshBitsFor(1000L) == 12)
    assert(Dedup.lshBitsFor(4000L) == 14)
    assert(Dedup.lshBitsFor(40000L) == 18)
    assert(Dedup.lshBitsFor(1L << 40) == 32)
    val ns = Seq(1L, 100L, 1000L, 4000L, 40000L, 400000L, 1L << 25, 1L << 45)
    val bits = ns.map(Dedup.lshBitsFor)
    assert(bits == bits.sorted, s"bits not monotone in n: ${ns.zip(bits)}")
  }

  test("expected random candidates per row stay bounded at every size") {
    // E[random collisions per row] = n * bands * 2^-bits; the adaptive rule
    // (bits >= ceil(log2 n) + 2) keeps it under bands/4 — a constant per
    // row, which is the whole linearity claim — until the 32-bit cap
    for (n <- Seq(100L, 1000L, 10000L, 100000L, 1000000L, 100000000L)) {
      val bits = Dedup.lshBitsFor(n)
      val bands = Dedup.lshBandsFor(bits)
      val perRow = n.toDouble * bands * math.pow(2.0, -bits)
      assert(perRow <= bands / 4.0 + 1e-9,
        s"n=$n bits=$bits bands=$bands -> $perRow candidates/row")
    }
  }

  test("band count compensates recall: miss bound held at the design point") {
    // per planted pair (per-plane agreement p=0.96): miss = (1-p^bits)^bands.
    // Ceil rounding of the band count lets the bound drift a few e-folds
    // off the base geometry's (1-0.96^12)^48 ~ 2e-20; the computed worst
    // case over the whole pool is 1.12e-15 at the 32-bit cap - assert that
    // envelope (2e-11 expected misses across 20k planted pairs: nothing)
    for (bits <- 12 to 32) {
      val bands = Dedup.lshBandsFor(bits)
      val miss = math.pow(1 - math.pow(0.96, bits), bands)
      assert(miss <= 2e-15,
        s"bits=$bits bands=$bands -> miss $miss above the 2e-15 envelope")
      assert(bands >= 48)
    }
  }

  test("planesFor: band planes are a stable prefix across geometries") {
    // band b's planes at a narrower geometry must be the prefix of its
    // planes at a wider one — what makes a pinned-geometry index and the
    // adaptive batch path share one pool coherently
    val dim = 64
    val narrow = Dedup.planesFor(12, 48)
    val wide = Dedup.planesFor(20, Dedup.lshBandsFor(20))
    for (b <- 0 until 48; k <- 0 until 12; i <- 0 until dim) {
      assert(narrow((b * 12 + k) * dim + i) == wide((b * 20 + k) * dim + i),
        s"band $b plane $k dim $i differs between geometries")
    }
  }

  test("planesFor rejects geometries beyond the pool") {
    intercept[IllegalArgumentException] { Dedup.planesFor(33, 48) }
    intercept[IllegalArgumentException] {
      Dedup.planesFor(32, Dedup.lshBandsFor(32) + 1)
    }
  }
}
