package graft

import graft.analysis.{CodeAnalyzer, Token}
import graft.exec.BM25
import graft.model.{FieldStats, TermStats}
import graft.query._
import graft.util.SmallFloat

/** Exhaustive in-memory reference scorer — the differential oracle
  * (reference practice: `tf/search/CheckHits.java`, SURVEY.md §5.3).
  * Implements the same semantics as the engine by independent brute
  * force: per-doc evaluation over tokenized content, float term scores
  * with byte-quantised norms, double clause accumulation, HitQueue
  * tie-break.
  */
object NaiveOracle {

  final case class Doc(docId: Long, tokens: Array[Token]) {
    lazy val tf: Map[String, Int] = tokens.groupBy(_.term).map { case (t, xs) => t -> xs.length }
    lazy val positions: Map[String, Array[Int]] =
      tokens.groupBy(_.term).map { case (t, xs) => t -> xs.map(_.pos).sorted }
    val norm: Byte = SmallFloat.intToByte4(tokens.length)
  }

  def fromContents(docs: Seq[(Long, String)]): Seq[Doc] =
    docs.map { case (id, c) => Doc(id, CodeAnalyzer.tokenize(c)) }

  def search(docs: Seq[Doc], q0: Query, k: Int): Seq[(Long, Float)] = {
    val fs = FieldStats(docs.size.toLong, docs.map(_.tokens.length.toLong).sum)
    val vocabDf: Map[String, Long] =
      docs.flatMap(_.tf.keys).groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val vocabSorted = vocabDf.keys.toSeq.sorted

    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }

    // expand multi-term queries like the engine (sorted, capped)
    def expand(q: Query): Query = q match {
      case PrefixQ(p) =>
        val ts = vocabSorted.filter(_.startsWith(p)).take(Query.MaxClauseCount)
        if (ts.isEmpty) MatchNone else BoolQ(should = ts.map(TermQ.apply), minShouldMatch = 1)
      case FuzzyQ(t, e) =>
        val ts = vocabSorted.filter(v => math.abs(v.length - t.length) <= e && lev(v, t) <= e)
          .take(Query.MaxClauseCount)
        if (ts.isEmpty) MatchNone else BoolQ(should = ts.map(TermQ.apply), minShouldMatch = 1)
      case TermRangeQ(lo, hi) =>
        val ts = vocabSorted.filter(v => v >= lo && v <= hi).take(Query.MaxClauseCount)
        if (ts.isEmpty) MatchNone else BoolQ(should = ts.map(TermQ.apply), minShouldMatch = 1)
      case BoolQ(m, s, n, msm) => BoolQ(m.map(expand), s.map(expand), n.map(expand), msm)
      case DisMaxQ(cs, tb) => DisMaxQ(cs.map(expand), tb)
      case other => other
    }
    val q = Query.rewrite(expand(Query.rewrite(q0)))

    def scorer(t: String): BM25.TermScorer =
      BM25.termScorer(TermStats(t, vocabDf.getOrElse(t, 0L), 0L), fs)
    def phraseWeight(ts: Seq[String]): Float = {
      var idf = 0d
      ts.foreach(t => idf += BM25.idf(vocabDf.getOrElse(t, 0L), fs.docCount).toDouble)
      idf.toFloat
    }

    // Option[score as double-sum]
    def eval(q: Query, d: Doc): Option[Double] = q match {
      case MatchNone => None
      case MatchAll => Some(0d)
      case TermQ(t) =>
        d.tf.get(t).map(f => scorer(t).score(f, d.norm).toDouble)
      case PhraseQ(ts) =>
        val pos = ts.map(d.positions.get)
        if (pos.exists(_.isEmpty)) None
        else {
          val arrays = pos.map(_.get)
          val count = arrays.head.count(p => arrays.zipWithIndex.forall {
            case (arr, i) => java.util.Arrays.binarySearch(arr, p + i) >= 0
          })
          if (count == 0) None
          else {
            val w = phraseWeight(ts)
            val sc = new BM25.TermScorer(w, Array.tabulate(256)(i =>
              1f / (BM25.K1 * ((1 - BM25.B) + BM25.B * SmallFloat.LengthTable(i) / fs.avgdl))))
            Some(sc.score(count, d.norm).toDouble)
          }
        }
      case SynonymQ(ts) =>
        val f = ts.map(t => d.tf.getOrElse(t, 0)).sum
        if (f == 0) None
        else {
          val dfMax = ts.map(t => vocabDf.getOrElse(t, 0L)).max
          Some(BM25.termScorer(TermStats("", dfMax, 0L), fs).score(f, d.norm).toDouble)
        }
      case PrefixQ(_) | FuzzyQ(_, _) | TermRangeQ(_, _) => None // expanded above
      case DisMaxQ(cs, tb) =>
        val ss = cs.map(eval(_, d)).flatten
        if (ss.isEmpty) None
        else Some(ss.max + tb * (ss.sum - ss.max))
      case BoolQ(must0, should, mustNot, msm) =>
        val must = must0
        if (mustNot.exists(n => eval(n, d).isDefined)) None
        else {
          val ms = must.map(eval(_, d))
          if (ms.exists(_.isEmpty)) None
          else {
            val ss = should.map(eval(_, d))
            val matched = ss.count(_.isDefined)
            val effMsm = math.max(msm, if (must.isEmpty && should.nonEmpty) 1 else 0)
            if (matched < effMsm) None
            else if (must.isEmpty && should.nonEmpty && matched == 0) None
            else Some(ms.flatten.sum + ss.flatten.sum)
          }
        }
    }

    val hits = docs.flatMap(d => eval(q, d).map(s => (d.docId, s.toFloat)))
    hits.sortBy { case (id, s) => (-s, id) }.take(k)
  }
}
