package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the banded-LSH SOUNDNESS bound d06 relies on
  * (asserted in Dedup.simhashPairs' scaladoc, previously tested only
  * on the fixed gate corpus): splitting a `bits`-bit fingerprint into
  * `bands` equal bands is a sound blocking scheme for Hamming
  * distance ≤ maxHamming whenever maxHamming < bands — ≤ maxHamming
  * differing bits can touch at most maxHamming bands, so by
  * pigeonhole at least one band is untouched and matches exactly.
  * The generators randomize the geometry (bits, bands, width) and the
  * flip set, including the adversarial extreme where every flip lands
  * in a distinct band; [[LshRecallSpec]] pins the same bound through
  * the actual Spark SQL banding expressions end to end. */
object BandingProperties extends Properties("BandedLsh") {

  // random (bits, bands) geometry with bands | bits — d06's 60/6 plus
  // arbitrary shapes. m07's 64/4 banding is NOT in this generator's
  // range (its fingerprint is carried as TWO 32-bit halves precisely
  // because 64 bits don't fit a non-negative Long, and its banding is
  // div/mod arithmetic on the halves, pinned end-to-end by the m07
  // oracle's arithmetic replay); the pigeonhole argument tested here
  // is width-independent.
  private val geomGen: Gen[(Int, Int)] = for {
    width <- Gen.choose(2, 16)   // band width in bits
    bands <- Gen.choose(2, 8)
    if width * bands <= 62       // stay in non-negative Long territory
  } yield (width * bands, bands)

  private def bandsOf(x: Long, bits: Int, nBands: Int): Seq[Long] = {
    val w = bits / nBands
    val mask = (1L << w) - 1
    (0 until nBands).map(b => (x >>> (b * w)) & mask)
  }

  property("<= (bands-1) flipped bits always leave one band intact") =
    forAll(geomGen, Gen.choose(0L, Long.MaxValue), Gen.choose(0, 1 << 30)) {
      case ((bits, nBands), rawX, seed) =>
        val x = rawX & ((1L << bits) - 1)
        val rnd = new java.util.Random(seed)
        // flip up to bands-1 DISTINCT positions (the soundness boundary)
        val maxH = nBands - 1
        val k = rnd.nextInt(maxH + 1)
        val pos = rnd.ints(0, bits).distinct().limit(k).toArray
        val y = pos.foldLeft(x)((acc, p) => acc ^ (1L << p))
        val shared = bandsOf(x, bits, nBands).zip(bandsOf(y, bits, nBands))
          .exists { case (a, b) => a == b }
        java.lang.Long.bitCount(x ^ y) <= maxH && shared
    }

  property("adversarial flips: one per band still collides when k < bands") =
    forAll(geomGen, Gen.choose(0L, Long.MaxValue), Gen.choose(0, 1 << 30)) {
      case ((bits, nBands), rawX, seed) =>
        val x = rawX & ((1L << bits) - 1)
        val w = bits / nBands
        val rnd = new java.util.Random(seed)
        // spread k = bands-1 flips across DISTINCT bands — the worst
        // case for blocking (every flip invalidates a fresh band)
        val hitBands = rnd.ints(0, nBands).distinct().limit(nBands - 1).toArray
        val y = hitBands.foldLeft(x)((acc, b) =>
          acc ^ (1L << (b * w + rnd.nextInt(w))))
        bandsOf(x, bits, nBands).zip(bandsOf(y, bits, nBands))
          .exists { case (a, b) => a == b }
    }

  property("the bound is tight: bands flips CAN miss every band") =
    forAll(Gen.choose(0, 1 << 30)) { seed =>
      // witness, not universal: with exactly `bands` flips, one per
      // band, NO band matches — maxHamming < bands in simhashPairs'
      // require() is the exact boundary, not slack
      val bits = 60; val nBands = 6; val w = bits / nBands
      val rnd = new java.util.Random(seed)
      val x = rnd.nextLong() & ((1L << bits) - 1)
      val y = (0 until nBands).foldLeft(x)((acc, b) =>
        acc ^ (1L << (b * w + rnd.nextInt(w))))
      !bandsOf(x, bits, nBands).zip(bandsOf(y, bits, nBands))
        .exists { case (a, b) => a == b }
    }
}
