package graft.exec

import graft.model.{FieldStats, TermStats}
import graft.util.SmallFloat

/** Pluggable similarity — the `Similarity` SPI of the reference
  * (`core/search/similarities/Similarity.java:61`): a factory producing
  * per-term and phrase pseudo-term scorers in either float-parity or
  * double-oracle mode. BM25 ([[BM25Sim]]) is the default;
  * [[ClassicSim]] is the TF-IDF vector-space model.
  */
trait SimilarityFactory extends Serializable {
  def term(stats: TermStats, fs: FieldStats, boost: Float, boostD: Double,
      doubleMode: Boolean): Kernel.AnyScorer

  /** Phrase pseudo-term from the members' FULL stats: TF-IDF sims sum
    * member idfs (`PhraseWeight` uses
    * `idfExplain(collectionStats, termStats[])`); language-model sims
    * need ttf per member (`SimilarityBase.scorer(...)` builds one
    * subscorer per member and SUMS their scores,
    * `MultiSimilarity.MultiSimScorer.score`).
    */
  def phrase(stats: Seq[TermStats], fs: FieldStats, doubleMode: Boolean): Kernel.AnyScorer
}

/** Default BM25 (`core/search/similarities/BM25Similarity.java`). */
object BM25Sim extends SimilarityFactory {
  def term(stats: TermStats, fs: FieldStats, boost: Float, boostD: Double,
      doubleMode: Boolean): Kernel.AnyScorer =
    if (doubleMode) Kernel.DoubleScorer(BM25.termScorerD(stats, fs,
      if (boostD >= 0d) boostD else boost.toDouble))
    else Kernel.FloatScorer(BM25.termScorer(stats, fs, boost))

  def phrase(stats: Seq[TermStats], fs: FieldStats, doubleMode: Boolean): Kernel.AnyScorer =
    if (doubleMode) {
      var idf = 0d
      stats.foreach(ts => idf += BM25.idfDouble(ts.df, fs.docCount))
      Kernel.DoubleScorer(new BM25.TermScorerD(idf, BM25.cacheD(fs)))
    } else {
      var idf = 0d
      stats.foreach(ts => idf += BM25.idf(ts.df, fs.docCount).toDouble)
      Kernel.FloatScorer(new BM25.TermScorer(idf.toFloat, BM25.cacheF(fs)))
    }
}

/** ClassicSimilarity — the TF-IDF vector space model
  * (`core/search/similarities/ClassicSimilarity.java:45-71` +
  * `TFIDFSimilarity.java:442-476`):
  *   idf  = (float)(ln((docCount+1)/(df+1)) + 1)
  *   tf   = sqrt(freq)
  *   norm = 1/sqrt(decoded length)   (normTable over LENGTH_TABLE)
  *   score(freq, norm) = (tf(freq) * (boost*idf)) * normTable[norm]
  * Score is unbounded in freq (sqrt grows without limit), so the global
  * pre-block bound is +inf; block-max bounds still come from per-block
  * (maxFreq, minNorm) impacts, which remain valid (score is monotone up
  * in freq, down in length).
  */
object ClassicSim extends SimilarityFactory {

  final class ScorerF(val weight: Float, table: Array[Float]) extends Kernel.AnyScorer {
    def score(freq: Int, norm: Byte): Double = {
      val raw = Math.sqrt(freq.toDouble).toFloat * weight
      (raw * table(norm & 0xff)).toDouble
    }
    def scoreF(freq: Double, norm: Byte): Double = {
      val raw = Math.sqrt(freq).toFloat * weight
      (raw * table(norm & 0xff)).toDouble
    }
    def maxScore(maxFreq: Int, minNorm: Byte): Double = score(maxFreq, minNorm)
    def globalMax: Double = Double.PositiveInfinity
  }

  final class ScorerD(val weight: Double, table: Array[Double]) extends Kernel.AnyScorer {
    def score(freq: Int, norm: Byte): Double =
      (Math.sqrt(freq.toDouble) * weight) * table(norm & 0xff)
    def scoreF(freq: Double, norm: Byte): Double =
      (Math.sqrt(freq) * weight) * table(norm & 0xff)
    def maxScore(maxFreq: Int, minNorm: Byte): Double = score(maxFreq, minNorm)
    def globalMax: Double = Double.PositiveInfinity
  }

  def idf(df: Long, docCount: Long): Float =
    (Math.log((docCount + 1) / (df + 1).toDouble) + 1.0).toFloat
  def idfDouble(df: Long, docCount: Long): Double =
    Math.log((docCount + 1) / (df + 1).toDouble) + 1.0

  /** normTable (`TFIDFSimilarity.java:442-447`): 1/sqrt(len) per decoded
    * length; slot 0 mirrors the reference's 1/normTable[255] special case.
    */
  private def tableF: Array[Float] = {
    val t = new Array[Float](256)
    var i = 1
    while (i < 256) {
      t(i) = (1.0 / Math.sqrt(SmallFloat.LengthTable(i).toDouble)).toFloat
      i += 1
    }
    t(0) = 1f / t(255)
    t
  }
  private def tableD: Array[Double] = {
    val t = new Array[Double](256)
    var i = 1
    while (i < 256) {
      t(i) = 1.0 / Math.sqrt(SmallFloat.byte4ToInt(i.toByte).toDouble)
      i += 1
    }
    t(0) = 1d / t(255)
    t
  }

  def term(stats: TermStats, fs: FieldStats, boost: Float, boostD: Double,
      doubleMode: Boolean): Kernel.AnyScorer =
    if (doubleMode)
      new ScorerD((if (boostD >= 0d) boostD else boost.toDouble) * idfDouble(stats.df, fs.docCount), tableD)
    else new ScorerF(boost * idf(stats.df, fs.docCount), tableF)

  def phrase(stats: Seq[TermStats], fs: FieldStats, doubleMode: Boolean): Kernel.AnyScorer =
    if (doubleMode) {
      var w = 0d
      stats.foreach(ts => w += idfDouble(ts.df, fs.docCount))
      new ScorerD(w, tableD)
    } else {
      var w = 0d
      stats.foreach(ts => w += idf(ts.df, fs.docCount).toDouble)
      new ScorerF(w.toFloat, tableF)
    }
}

/** BooleanSimilarity (`core/search/similarities/BooleanSimilarity.java:
  * 28-66`): every match scores the query boost — freq, norm, and
  * collection stats are ignored ("simple similarity that gives terms a
  * score equal to their query boost"). Under a boolean SHOULD tree a
  * doc's score is therefore its matched-clause count — set semantics.
  */
object BooleanSim extends SimilarityFactory {
  final class Scorer(b: Double) extends Kernel.AnyScorer {
    def score(freq: Int, norm: Byte): Double = b
    def scoreF(freq: Double, norm: Byte): Double = b
    def maxScore(maxFreq: Int, minNorm: Byte): Double = b
    def globalMax: Double = b
  }
  def term(stats: TermStats, fs: FieldStats, boost: Float, boostD: Double,
      doubleMode: Boolean): Kernel.AnyScorer =
    new Scorer(if (doubleMode && boostD >= 0d) boostD else boost.toDouble)
  def phrase(stats: Seq[TermStats], fs: FieldStats, doubleMode: Boolean): Kernel.AnyScorer =
    new Scorer(1d)
}

/** LMDirichletSimilarity — Bayesian smoothing with Dirichlet priors
  * (`core/search/similarities/LMDirichletSimilarity.java:68-76`, Zhai &
  * Lafferty 2001), default mu = 2000 (`:61-66`):
  *
  *   P(t|C) = (ttf + 1) / (sumTotalTermFreq + 1)
  *            (`LMSimilarity.DefaultCollectionModel.computeProbability`)
  *   score  = boost * (ln(1 + freq/(mu*P)) + ln(mu/(dl + mu))), clamped
  *            at 0 (the paper's negative scores return 0, `:73-75`)
  *
  * dl is the byte-quantised decoded length (`SimilarityBase` LENGTH_TABLE
  * lookup). Score is monotone up in freq and down in dl, so block-max
  * bounds from (maxFreq, minNorm) impacts remain valid; freq is
  * unbounded, so the global pre-block bound is +inf. Float-parity mode
  * casts the double computation to float at the end, exactly
  * `SimilarityBase.BasicSimScorer.score`'s `(float)` return.
  */
object LMDirichletSim extends SimilarityFactory {
  val Mu: Double = 2000d

  private def pOf(ttf: Long, fs: FieldStats): Double =
    (ttf + 1d) / (fs.sumTotalTermFreq + 1d)

  /** One subscorer per member stat, scores SUMMED at the same
    * (freq, norm) — `MultiSimilarity.MultiSimScorer.score`.
    */
  final class Scorer(boost: Double, ps: Array[Double], asFloat: Boolean)
      extends Kernel.AnyScorer {
    private def raw(freq: Double, norm: Byte): Double = {
      val dl = SmallFloat.LengthTable(norm & 0xff).toDouble
      var s = 0d
      var i = 0
      while (i < ps.length) {
        val one = boost * (math.log(1 + freq / (Mu * ps(i))) + math.log(Mu / (dl + Mu)))
        s += (if (one > 0d) one else 0d)
        i += 1
      }
      s
    }
    def score(freq: Int, norm: Byte): Double = {
      val s = raw(freq.toDouble, norm)
      if (asFloat) s.toFloat.toDouble else s
    }
    def scoreF(freq: Double, norm: Byte): Double = {
      val s = raw(freq, norm)
      if (asFloat) s.toFloat.toDouble else s
    }
    def maxScore(maxFreq: Int, minNorm: Byte): Double = score(maxFreq, minNorm)
    def globalMax: Double = Double.PositiveInfinity
  }

  def term(stats: TermStats, fs: FieldStats, boost: Float, boostD: Double,
      doubleMode: Boolean): Kernel.AnyScorer =
    new Scorer(if (doubleMode && boostD >= 0d) boostD else boost.toDouble,
      Array(pOf(stats.ttf, fs)), asFloat = !doubleMode)

  def phrase(stats: Seq[TermStats], fs: FieldStats, doubleMode: Boolean): Kernel.AnyScorer =
    new Scorer(1d, stats.map(ts => pOf(ts.ttf, fs)).toArray, asFloat = !doubleMode)
}

/** LMJelinekMercerSimilarity — linear-interpolation language-model
  * smoothing (`core/search/similarities/LMJelinekMercerSimilarity.java:
  * 68-74`, Zhai & Lafferty 2001), lambda in (0, 1]:
  *
  *   P(t|C) = (ttf + 1) / (sumTotalTermFreq + 1)   (same collection model)
  *   score  = boost * ln(1 + ((1-lambda) * freq/dl) / (lambda * P))
  *
  * Always >= 0 (the SimilarityBase clamp never fires). Monotone up in
  * freq, down in dl — block-max impacts stay valid; global bound +inf.
  * Float-parity mode casts the double result like the other LM family.
  */
final class LMJelinekMercerSim(lambda: Double) extends SimilarityFactory {
  require(!lambda.isNaN && lambda > 0d && lambda <= 1d, "lambda must be in (0 .. 1]")

  private def pOf(ttf: Long, fs: FieldStats): Double =
    (ttf + 1d) / (fs.sumTotalTermFreq + 1d)

  /** One subscorer per member stat, SUMMED (`MultiSimilarity`). */
  final class Scorer(boost: Double, ps: Array[Double], asFloat: Boolean)
      extends Kernel.AnyScorer {
    private def raw(freq: Double, norm: Byte): Double = {
      val dl = SmallFloat.LengthTable(norm & 0xff).toDouble
      var s = 0d
      var i = 0
      while (i < ps.length) {
        s += boost * math.log(1 + ((1 - lambda) * freq / dl) / (lambda * ps(i)))
        i += 1
      }
      s
    }
    def score(freq: Int, norm: Byte): Double = {
      val s = raw(freq.toDouble, norm)
      if (asFloat) s.toFloat.toDouble else s
    }
    def scoreF(freq: Double, norm: Byte): Double = {
      val s = raw(freq, norm)
      if (asFloat) s.toFloat.toDouble else s
    }
    def maxScore(maxFreq: Int, minNorm: Byte): Double = score(maxFreq, minNorm)
    def globalMax: Double = Double.PositiveInfinity
  }

  def term(stats: TermStats, fs: FieldStats, boost: Float, boostD: Double,
      doubleMode: Boolean): Kernel.AnyScorer =
    new Scorer(if (doubleMode && boostD >= 0d) boostD else boost.toDouble,
      Array(pOf(stats.ttf, fs)), asFloat = !doubleMode)

  def phrase(stats: Seq[TermStats], fs: FieldStats, doubleMode: Boolean): Kernel.AnyScorer =
    new Scorer(1d, stats.map(ts => pOf(ts.ttf, fs)).toArray, asFloat = !doubleMode)
}

object LMJelinekMercerSim {
  /** The paper's short-query sweet spot (Zhai & Lafferty: ~0.1 for
    * title queries) — the conventional default.
    */
  val Default = new LMJelinekMercerSim(0.1d)
}

/** DFR InL2 — divergence from randomness with basic model I(n),
  * after-effect L (Laplace), and length normalization H2
  * (`core/search/similarities/DFRSimilarity.java`,
  * `BasicModelIn.java:38-45` A = log2((N+1)/(n+0.5)) combined with the
  * after-effect as A·(1 − 1/(1+tfn)), `AfterEffectL.java:33` (=1),
  * `NormalizationH2.java:57-59` tfn = tf·log2(1 + c·avgdl/dl), default
  * c = 1; Amati & van Rijsbergen 2002):
  *
  *   score = boost · log2((N+1)/(n+0.5)) · (1 − 1/(1+tfn))
  *
  * Monotone up in freq and down in dl, so block-max impacts hold; tfn
  * saturates, so the GLOBAL bound is finite: boost·A (unlike the
  * unbounded BM25-free-freq families). avgdl uses exact collection sums
  * (`BasicStats.getAvgFieldLength`); dl is the byte-quantised decoded
  * length. Float-parity mode casts the double result like the LM family.
  */
final class DfrInL2Sim(c: Double = 1d) extends SimilarityFactory {
  require(java.lang.Double.isFinite(c) && c >= 0d, "c must be a non-negative finite value")

  private val Ln2 = math.log(2d)

  /** One subscorer per member stat, SUMMED (`MultiSimilarity`). */
  final class Scorer(boost: Double, as: Array[Double], avgdl: Double, asFloat: Boolean)
      extends Kernel.AnyScorer {
    private def raw(freq: Double, norm: Byte): Double = {
      val dl = SmallFloat.LengthTable(norm & 0xff).toDouble
      val tfn = freq * (math.log(1 + c * avgdl / dl) / Ln2)
      var s = 0d
      var i = 0
      while (i < as.length) {
        s += boost * as(i) * (1 - 1 / (1 + tfn))
        i += 1
      }
      s
    }
    def score(freq: Int, norm: Byte): Double = {
      val s = raw(freq.toDouble, norm)
      if (asFloat) s.toFloat.toDouble else s
    }
    def scoreF(freq: Double, norm: Byte): Double = {
      val s = raw(freq, norm)
      if (asFloat) s.toFloat.toDouble else s
    }
    def maxScore(maxFreq: Int, minNorm: Byte): Double = score(maxFreq, minNorm)
    // tfn saturation: score < boost * sum(A) for every (freq, dl)
    def globalMax: Double = { var t = 0d; as.foreach(t += _); boost * t }
  }

  private def aOf(df: Long, fs: FieldStats): Double =
    math.log((fs.docCount + 1).toDouble / (df + 0.5)) / Ln2

  def term(stats: TermStats, fs: FieldStats, boost: Float, boostD: Double,
      doubleMode: Boolean): Kernel.AnyScorer =
    new Scorer(if (doubleMode && boostD >= 0d) boostD else boost.toDouble,
      Array(aOf(stats.df, fs)), fs.avgdlDouble, asFloat = !doubleMode)

  def phrase(stats: Seq[TermStats], fs: FieldStats, doubleMode: Boolean): Kernel.AnyScorer =
    new Scorer(1d, stats.map(ts => aOf(ts.df, fs)).toArray, fs.avgdlDouble,
      asFloat = !doubleMode)
}

object DfrInL2Sim {
  val Default = new DfrInL2Sim(1d)
}
