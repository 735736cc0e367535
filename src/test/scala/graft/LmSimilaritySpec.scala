package graft

import graft.exec.LMDirichletSim
import graft.model.{FieldStats, TermStats}
import graft.util.SmallFloat
import org.scalatest.funsuite.AnyFunSuite

/** LMDirichletSimilarity pinned to independent transcriptions of
  * `core/search/similarities/LMDirichletSimilarity.java:68-76` and
  * `LMSimilarity.DefaultCollectionModel.computeProbability`.
  */
class LmSimilaritySpec extends AnyFunSuite {
  private val fs = FieldStats(docCount = 100L, sumTotalTermFreq = 5000L)
  private val mu = 2000d

  private def expected(freq: Double, ttf: Long, len: Int): Double = {
    val p = (ttf + 1d) / (fs.sumTotalTermFreq + 1d)
    val s = math.log(1 + freq / (mu * p)) + math.log(mu / (len + mu))
    if (s > 0d) s else 0d
  }

  test("term score matches the published formula (double mode)") {
    val sc = LMDirichletSim.term(TermStats("t", 10L, 40L), fs, 1f, -1d, doubleMode = true)
    val n7 = SmallFloat.intToByte4(7)
    assert(sc.score(3, n7) === expected(3d, 40L, SmallFloat.byte4ToInt(n7)))
    assert(sc.score(1, n7) === expected(1d, 40L, SmallFloat.byte4ToInt(n7)))
    // quantisation: the decoded (not raw) length feeds the norm term
    val n1000 = SmallFloat.intToByte4(1000)
    assert(sc.score(2, n1000) === expected(2d, 40L, SmallFloat.byte4ToInt(n1000)))
  }

  test("negative raw scores clamp to zero (common term, long doc)") {
    val common = LMDirichletSim.term(TermStats("c", 90L, 4000L), fs, 1f, -1d, doubleMode = true)
    val nLong = SmallFloat.intToByte4(100000)
    assert(common.score(1, nLong) === 0d)
    // and the clamp is per-score, not an exception: a high freq recovers
    assert(common.score(500, SmallFloat.intToByte4(600)) > 0d)
  }

  test("float-parity mode = double computation cast to float") {
    val scF = LMDirichletSim.term(TermStats("t", 10L, 40L), fs, 1f, -1d, doubleMode = false)
    val n7 = SmallFloat.intToByte4(7)
    assert(scF.score(3, n7) ===
      expected(3d, 40L, SmallFloat.byte4ToInt(n7)).toFloat.toDouble)
  }

  test("phrase = sum of member subscorers at the same (freq, norm)") {
    val ph = LMDirichletSim.phrase(
      Seq(TermStats("a", 5L, 20L), TermStats("b", 7L, 30L)), fs, doubleMode = true)
    val n9 = SmallFloat.intToByte4(9)
    val len = SmallFloat.byte4ToInt(n9)
    assert(ph.score(2, n9) === expected(2d, 20L, len) + expected(2d, 30L, len))
  }

  test("LMJelinekMercer: published formula, lambda gate, phrase sum, float parity") {
    import graft.exec.LMJelinekMercerSim
    val lambda = 0.1d
    def jm(freq: Double, ttf: Long, len: Int): Double = {
      val p = (ttf + 1d) / (fs.sumTotalTermFreq + 1d)
      math.log(1 + ((1 - lambda) * freq / len) / (lambda * p))
    }
    val sim = LMJelinekMercerSim.Default
    val sc = sim.term(TermStats("t", 10L, 40L), fs, 1f, -1d, doubleMode = true)
    val n7 = SmallFloat.intToByte4(7)
    val len7 = SmallFloat.byte4ToInt(n7)
    assert(sc.score(3, n7) === jm(3d, 40L, len7))
    assert(sc.score(1, n7) === jm(1d, 40L, len7))
    // always >= 0: even the most common term in the longest doc
    val common = sim.term(TermStats("c", 90L, 4000L), fs, 1f, -1d, doubleMode = true)
    assert(common.score(1, SmallFloat.intToByte4(100000)) > 0d)
    // float parity casts at the end
    val scF = sim.term(TermStats("t", 10L, 40L), fs, 1f, -1d, doubleMode = false)
    assert(scF.score(3, n7) === jm(3d, 40L, len7).toFloat.toDouble)
    // phrase sums member subscorers
    val ph = sim.phrase(Seq(TermStats("a", 5L, 20L), TermStats("b", 7L, 30L)),
      fs, doubleMode = true)
    val n9 = SmallFloat.intToByte4(9)
    val len9 = SmallFloat.byte4ToInt(n9)
    assert(ph.score(2, n9) === jm(2d, 20L, len9) + jm(2d, 30L, len9))
    // block-max bound dominates
    val bound = sc.maxScore(8, SmallFloat.intToByte4(5))
    for (f <- 1 to 8; l <- Seq(5, 9, 40, 1000))
      assert(sc.score(f, SmallFloat.intToByte4(l)) <= bound)
    // lambda domain gate (reference: (0 .. 1])
    intercept[IllegalArgumentException] { new LMJelinekMercerSim(0d) }
    intercept[IllegalArgumentException] { new LMJelinekMercerSim(1.5d) }
  }

  test("DFR InL2: published composition, finite global bound, phrase sum") {
    import graft.exec.DfrInL2Sim
    def log2(x: Double) = math.log(x) / math.log(2d)
    val avgdl = fs.sumTotalTermFreq / fs.docCount.toDouble
    def inl2(freq: Double, df: Long, len: Int): Double = {
      val tfn = freq * log2(1 + avgdl / len)
      log2((fs.docCount + 1).toDouble / (df + 0.5)) * (1 - 1 / (1 + tfn))
    }
    val sim = DfrInL2Sim.Default
    val sc = sim.term(TermStats("t", 10L, 40L), fs, 1f, -1d, doubleMode = true)
    val n7 = SmallFloat.intToByte4(7)
    val len7 = SmallFloat.byte4ToInt(n7)
    assert(sc.score(3, n7) === inl2(3d, 10L, len7))
    assert(sc.score(1, n7) === inl2(1d, 10L, len7))
    // tfn saturation: the GLOBAL bound is finite and dominates any freq
    val a = log2((fs.docCount + 1).toDouble / (10L + 0.5))
    assert(sc.globalMax === a)
    assert(sc.score(1000000, n7) < sc.globalMax)
    // float parity + phrase sum + block-max dominance
    val scF = sim.term(TermStats("t", 10L, 40L), fs, 1f, -1d, doubleMode = false)
    assert(scF.score(3, n7) === inl2(3d, 10L, len7).toFloat.toDouble)
    val ph = sim.phrase(Seq(TermStats("a", 5L, 20L), TermStats("b", 7L, 30L)),
      fs, doubleMode = true)
    assert(ph.score(2, n7) === inl2(2d, 5L, len7) + inl2(2d, 7L, len7))
    val bound = sc.maxScore(8, SmallFloat.intToByte4(5))
    for (f <- 1 to 8; l <- Seq(5, 9, 40, 1000))
      assert(sc.score(f, SmallFloat.intToByte4(l)) <= bound)
    intercept[IllegalArgumentException] { new DfrInL2Sim(-1d) }
  }

  test("block-max bound: maxScore(maxFreq, minNorm) dominates the block") {
    val sc = LMDirichletSim.term(TermStats("t", 10L, 40L), fs, 1f, -1d, doubleMode = true)
    val bound = sc.maxScore(8, SmallFloat.intToByte4(5))
    for (f <- 1 to 8; l <- Seq(5, 9, 40, 1000)) {
      assert(sc.score(f, SmallFloat.intToByte4(l)) <= bound,
        s"freq=$f len=$l exceeds block bound")
    }
    assert(sc.globalMax === Double.PositiveInfinity)
  }
}
