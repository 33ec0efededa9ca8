package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the corpus-derived LSH parameters: the recall and
  * cost formulas must hold at every corpus size the engine targets, not
  * just the fixture (round-2 verdict: fixture-scale constants presented
  * as parameters). Pure math — no Spark session. */
class LshParamsSpec extends AnyFunSuite {

  private val corpusSizes =
    Seq(500L, 5000L, 100000L, 1000000L, 100000000L, 10000000000L, 1000000000000L)

  test("minhash derivation: >=99% recall at the threshold AND <=1 expected false-positive candidate per doc, at every corpus size") {
    for (n <- corpusSizes) {
      val (b, r) = LshParams.lshParams(n)
      assert(LshParams.minhashRecall(b, r, 0.8) >= 0.99,
        s"n=$n derived ($b,$r): recall ${LshParams.minhashRecall(b, r, 0.8)} < 0.99")
      val fpPerDoc = n / 2.0 * b * math.pow(0.1, r)
      assert(fpPerDoc <= 1.0, s"n=$n derived ($b,$r): $fpPerDoc expected FP candidates per doc")
      // the linearity property: signature depth must GROW with the corpus
      // (a fixed (b,r) lets FP candidates grow linearly per doc)
      val (_, rBig) = LshParams.lshParams(n * 1000)
      assert(rBig >= r, "rows must be nondecreasing in corpus size")
    }
  }

  test("minhash derivation: verification-corpus setting is (9,4) and the shipped default (6,2) still clears the recall bar") {
    assert(LshParams.lshParams(500) == ((9, 4)))
    assert(LshParams.minhashRecall(9, 4, 0.8) >= 0.99)
    assert(LshParams.minhashRecall(6, 2, 0.8) >= 0.99) // the default banding
  }

  test("hyperplane derivation: bucket count tracks corpus size (bounded occupancy), so in-bucket pairs stay linear") {
    for (n <- corpusSizes) {
      val p = LshParams.dedupPlanes(n)
      val buckets = math.pow(2.0, p)
      val occupancy = n / buckets
      assert(occupancy <= 8.0 + 1e-9, s"n=$n planes=$p: occupancy $occupancy exceeds the target")
      // expected candidate pairs per table ~ n * occupancy / 2: linear
      assert(occupancy >= 2.0 || p == 4, s"n=$n planes=$p: buckets overshoot (occupancy $occupancy)")
    }
    assert(LshParams.dedupPlanes(500) == 6) // the fixture default: 64 buckets
  }

  test("semdedup sub-cell depth: occupancy pinned to the verified baseline at every corpus size, zero at the baseline itself") {
    assert(LshParams.semSubPlanes(500) == 0)  // oracle gate runs unrefined
    assert(LshParams.semSubPlanes(1) == 0)    // never negative below baseline
    var prev = 0
    for (n <- corpusSizes if n >= 500) {
      val m = LshParams.semSubPlanes(n)
      // enough sub-cells that per-cell occupancy is back at (or below)
      // the level the fixture verified: n / 2^m <= baseline
      assert(n / math.pow(2.0, m) <= 500.0 + 1e-9,
        s"n=$n m=$m: sub-cells too coarse")
      // and not overshooting by more than one doubling
      assert(n / math.pow(2.0, m) > 250.0 - 1e-9 || m == 0,
        s"n=$n m=$m: sub-cells overshoot")
      assert(m >= prev, s"depth must be monotone in corpus size")
      prev = m
    }
  }

  test("hyperplane multi-table recall: 4 tables recover what deeper buckets cost") {
    // a cosine-0.95 near-dup pair, 6 derived planes: single-table collision
    // is weak, the 4-table union must clear 90%
    val single = LshParams.hyperplaneRecall(6, 1, 0.95)
    val multi = LshParams.hyperplaneRecall(6, 4, 0.95)
    assert(multi > single)
    assert(multi >= 0.90, s"4-table recall at cosine 0.95 is $multi")
    // and recall is monotone in tables at a deeper (large-corpus) setting
    assert(LshParams.hyperplaneRecall(20, 4, 0.95) >
      LshParams.hyperplaneRecall(20, 1, 0.95))
  }
}
