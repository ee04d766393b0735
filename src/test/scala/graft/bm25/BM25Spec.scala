package graft.bm25

import graft.util.SmallFloat
import org.scalatest.funsuite.AnyFunSuite

class BM25Spec extends AnyFunSuite {

  test("SmallFloat byte315 goldens (reference SmallFloat.cs doc constants)") {
    // smallest non-zero value = 5.820766E-10, largest = 7.5161928E9
    assert(SmallFloat.byte315ToFloat(1) == 5.820766e-10f)
    assert(SmallFloat.byte315ToFloat(-1) == 7.5161928e9f)
    assert(SmallFloat.byte315ToFloat(0) == 0.0f)
    assert(SmallFloat.floatToByte315(0f) == 0)
    assert(SmallFloat.floatToByte315(-1f) == 0)          // negative → 0
    assert(SmallFloat.floatToByte315(1e-12f) == 1)       // subnormal → 1
    assert(SmallFloat.floatToByte315(1e12f) == -1)       // overflow → 0xFF
  }

  test("byte315 encode∘decode is idempotent on the byte lattice") {
    for (b <- 0 until 256; byte = b.toByte) {
      val f = SmallFloat.byte315ToFloat(byte)
      if (b != 0) assert(SmallFloat.floatToByte315(f) == byte, s"byte $b")
    }
  }

  test("norm encoding: doc lengths map to expected bytes, decode ≈ length") {
    // dl=1 → 1/sqrt(1)=1.0; decode gives NORM_TABLE ≈ 1.0
    val b1 = BM25.encodeNorm(1)
    assert(BM25.NormTable(b1 & 0xff) == 1.0f)
    // lossy: decoded approx-length within the 3-mantissa-bit envelope
    for (dl <- Seq(2, 3, 5, 10, 100, 1000, 65536)) {
      val b = BM25.encodeNorm(dl)
      val approx = BM25.NormTable(b & 0xff)
      assert(approx >= dl * 0.75f && approx <= dl * 1.7f, s"dl=$dl approx=$approx")
    }
  }

  test("idf matches the double-then-float formula") {
    val idf = BM25.idf(docFreq = 2, maxDoc = 6)
    assert(idf == math.log(1 + (6 - 2 + 0.5) / (2 + 0.5)).toFloat)
    // df = maxDoc still positive (never NaN/neg)
    assert(BM25.idf(6, 6) > 0f)
  }

  test("score is monotone in tf and saturates at weightValue") {
    val avgdl = BM25.avgFieldLength(12, 6)
    val cache = BM25.normCache(avgdl)
    val w = BM25.weightValue(BM25.idf(2, 6), 1f)
    val norm = BM25.encodeNorm(2)
    val s1 = BM25.score(1f, norm, w, cache)
    val s2 = BM25.score(2f, norm, w, cache)
    val s100 = BM25.score(100f, norm, w, cache)
    assert(s1 < s2 && s2 < s100 && s100 < w)
  }

  test("blockMaxScore bounds every hit in a block") {
    val cache = BM25.normCache(BM25.avgFieldLength(1000, 100))
    val w = BM25.weightValue(BM25.idf(10, 100), 1f)
    val norms = Seq(1, 5, 20, 100).map(BM25.encodeNorm)
    val minCache = norms.map(b => cache(b & 0xff)).min
    val bound = BM25.blockMaxScore(maxTf = 7, minCache, w)
    for (tf <- 1 to 7; n <- norms)
      assert(BM25.score(tf.toFloat, n, w, cache) <= bound)
  }
}
