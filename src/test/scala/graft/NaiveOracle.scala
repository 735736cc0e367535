package graft

import graft.analysis.{CodeAnalyzer, Token}
import graft.exec.BM25
import graft.model.{FieldStats, TermStats}
import graft.query._
import graft.util.{EditDistance, SmallFloat}

/** Exhaustive in-memory reference scorer — the differential oracle
  * (reference practice: `tf/search/CheckHits.java`, SURVEY.md §5.3).
  * Implements the same semantics as the engine by independent brute
  * force: per-doc evaluation over tokenized content, float term scores
  * with byte-quantised norms, double clause accumulation with the float
  * cast at the collector boundary, HitQueue tie-break.
  */
object NaiveOracle {

  final case class Doc(docId: Long, tokens: Array[Token],
      pathTokens: Array[Token] = Array.empty) {
    /** content tf plus `@path:`-prefixed path-field tf (the engine's
      * per-field term encoding).
      */
    lazy val tf: Map[String, Int] =
      tokens.groupBy(_.term).map { case (t, xs) => t -> xs.length } ++
        pathTokens.groupBy(t => "@path:" + t.term).map { case (t, xs) => t -> xs.length }
    lazy val positions: Map[String, Array[Int]] =
      tokens.groupBy(_.term).map { case (t, xs) => t -> xs.map(_.pos).sorted } ++
        pathTokens.groupBy(t => "@path:" + t.term)
          .map { case (t, xs) => t -> xs.map(_.pos).sorted }
    val norm: Byte = SmallFloat.intToByte4(tokens.length)
    val pathNorm: Byte = SmallFloat.intToByte4(pathTokens.length)
    def normOf(term: String): Byte = if (term.startsWith("@path:")) pathNorm else norm
  }

  def fromContents(docs: Seq[(Long, String)],
      tokenizer: String => Array[Token] = CodeAnalyzer.tokenize): Seq[Doc] =
    docs.map { case (id, c) => Doc(id, tokenizer(c)) }

  /** (docId, content, path) — path indexed as the second scored field. */
  def fromContentsWithPath(docs: Seq[(Long, String, String)]): Seq[Doc] =
    docs.map { case (id, c, p) => Doc(id, CodeAnalyzer.tokenize(c), CodeAnalyzer.tokenize(p)) }

  /** Greedy sloppy-phrase freq over adjusted position lists — an
    * independent implementation of `SloppyPhraseMatcher.nextMatch`
    * (`core/search/SloppyPhraseMatcher.java:189-221`) using an explicit
    * sorted re-insertion queue, including the reference's repeated-term
    * handling: slots with identical (unadjusted) position arrays form a
    * repetition group (same term -> same postings); the j-th slot of a
    * group starts j occurrences in (`advanceRepeatGroups`), and any
    * advance landing two group members on the same actual token position
    * advances the lesser (by position, then offset) until the collision
    * clears (`advanceRpts`).
    */
  def sloppyFreq(posArrays: Seq[Array[Int]], slop: Int): Double = {
    val n = posArrays.length
    val streams = posArrays.zipWithIndex.map { case (ps, off) => ps.map(_ - off) }
    // repetition groups by unadjusted-array content equality
    val groupOf = Array.fill(n)(-1)
    val groups = scala.collection.mutable.ArrayBuffer.empty[Vector[Int]]
    for (i <- 0 until n if groupOf(i) < 0) {
      val same = (i until n).filter(j => posArrays(j).toSeq == posArrays(i).toSeq)
      if (same.length > 1) {
        same.foreach(groupOf(_) = groups.length)
        groups += same.toVector
      }
    }
    val ix = Array.fill(n)(0)
    def pos(k: Int): Int = streams(k)(ix(k))
    def tp(k: Int): Int = pos(k) + k
    // start condition: j-th member of each group advanced j times
    for (g <- groups; (s, j) <- g.zipWithIndex if j > 0) {
      if (ix(s) + j >= streams(s).length) return 0d
      ix(s) += j
    }
    var end = (0 until n).map(pos).max
    def advancePP(k: Int): Boolean = {
      if (ix(k) + 1 >= streams(k).length) false
      else { ix(k) += 1; if (pos(k) > end) end = pos(k); true }
    }
    def collide(k: Int): Int =
      if (groupOf(k) < 0) -1
      else groups(groupOf(k)).find(k2 => k2 != k && tp(k2) == tp(k)).getOrElse(-1)
    def advanceRpts(k0: Int): Boolean = {
      var k = k0
      var c = collide(k)
      while (c >= 0) {
        k = if (pos(k) < pos(c) || (pos(k) == pos(c) && k < c)) k else c
        if (!advancePP(k)) return false
        c = collide(k)
      }
      true
    }
    // queue of slot indices ordered by (adjusted position, offset)
    def sorted(q: Seq[Int]): Vector[Int] = q.sortBy(k => (pos(k), k)).toVector
    var queue = sorted(0 until n)
    var freq = 0d
    var pp = queue.head
    queue = queue.tail
    var matchLength = end - pos(pp)
    var next = pos(queue.head)
    var done = false
    while (!done) {
      val alive = advancePP(pp) && {
        val ok = advanceRpts(pp)
        // collision resolution may advance QUEUED slots: restore queue
        // order (the reference re-heapifies via its rptStack, `:319-336`)
        if (ok && groups.nonEmpty) queue = sorted(queue)
        ok
      }
      if (!alive) {
        if (matchLength <= slop) freq += 1d / (1d + matchLength)
        done = true
      } else if (pos(pp) > next) {
        if (matchLength <= slop) freq += 1d / (1d + matchLength)
        queue = sorted(queue :+ pp)
        pp = queue.head
        queue = queue.tail
        next = pos(queue.head)
        matchLength = end - pos(pp)
      } else {
        val m2 = end - pos(pp)
        if (m2 < matchLength) matchLength = m2
      }
    }
    freq
  }

  /** Brute-force minimal-interval evaluation — EXHAUSTIVE cartesian
    * composition over children's canonical lists followed by a
    * containment filter, vs the engine's greedy sweeps
    * ([[graft.exec.IntervalEval]]). Returns (start, end, gaps) in start
    * order. For equal (start, end) candidates from distinct witnesses the
    * minimum gaps is kept — identical to the greedy witness whenever the
    * combinator's children are term-leaf sources (width 1 each), which is
    * the only shape the random generator puts directly under maxgaps.
    */
  def intervalIvs(src: ISrc, pos: String => Array[Int]): Vector[(Int, Int, Int)] = {
    def canon(cands: Seq[(Int, Int, Int)]): Vector[(Int, Int, Int)] = {
      val ds = cands.groupBy(c => (c._1, c._2)).map { case (_, xs) => xs.minBy(_._3) }.toVector
      ds.filter(c => !ds.exists(o =>
          o._1 >= c._1 && o._2 <= c._2 && (o._1 > c._1 || o._2 < c._2)))
        .sortBy(_._1)
    }
    def width(iv: (Int, Int, Int)): Int = iv._2 - iv._1 + 1
    src match {
      case ITermS(t) => pos(t).toVector.map(p => (p, p, 0))
      case IOrderedS(subs) =>
        val ls = subs.map(intervalIvs(_, pos))
        if (ls.exists(_.isEmpty)) Vector.empty
        else canon(ls.foldLeft(Seq(Seq.empty[(Int, Int, Int)])) { (acc, l) =>
          acc.flatMap(pre => l.filter(iv => pre.isEmpty || pre.last._2 < iv._1).map(pre :+ _))
        }.map { tup =>
          val s = tup.head._1; val e = tup.last._2
          (s, e, (e - s + 1) - tup.map(width).sum)
        })
      case IUnorderedS(subs) =>
        val ls = subs.map(intervalIvs(_, pos))
        if (ls.exists(_.isEmpty)) Vector.empty
        else canon(ls.foldLeft(Seq(Seq.empty[(Int, Int, Int)])) { (acc, l) =>
          acc.flatMap(pre => l.map(pre :+ _))
        }.map { tup =>
          val s = tup.map(_._1).min; val e = tup.map(_._2).max
          (s, e, (e - s + 1) - tup.map(width).sum)
        })
      case IMaxGapsS(g, sub) => intervalIvs(sub, pos).filter(_._3 <= g)
      case IMaxWidthS(w, sub) => intervalIvs(sub, pos).filter(iv => width(iv) <= w)
      case IContainingS(big, small) =>
        val ss = intervalIvs(small, pos)
        intervalIvs(big, pos).filter(b => ss.exists(s => b._1 <= s._1 && b._2 >= s._2))
      case IContainedByS(small, big) =>
        val bs = intervalIvs(big, pos)
        intervalIvs(small, pos).filter(s => bs.exists(b => b._1 <= s._1 && b._2 >= s._2))
    }
  }

  /** Interval pseudo-frequency over the brute-force canonical list
    * (`IntervalScorer.java:60-67`).
    */
  def intervalFreq(src: ISrc, pos: String => Array[Int]): Double = {
    val me = src.minExtent
    intervalIvs(src, pos).foldLeft(0d) { (f, iv) =>
      f + 1d / math.max((iv._2 - iv._1 + 1) - me + 1, 1)
    }
  }

  def search(docs: Seq[Doc], q0: Query, k: Int): Seq[(Long, Float)] =
    search(docs, q0, k, scoring = true)

  def search(docs: Seq[Doc], q0: Query, k: Int, scoring: Boolean): Seq[(Long, Float)] = {
    val fs = FieldStats(docs.size.toLong, docs.map(_.tokens.length.toLong).sum)
    // path-field collection stats: docCount = docs WITH the field
    val fsPath = FieldStats(
      math.max(1L, docs.count(_.pathTokens.nonEmpty).toLong),
      math.max(1L, docs.map(_.pathTokens.length.toLong).sum))
    def fsOf(t: String): FieldStats = if (t.startsWith("@path:")) fsPath else fs
    val vocabDf: Map[String, Long] =
      docs.flatMap(_.tf.keys).groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val vocabSorted = vocabDf.keys.toSeq.sorted
    // unprefixed patterns expand over the content namespace only;
    // a `@F:`-anchored pattern restricts itself by its own prefix
    def dictFor(pattern: String): Seq[String] =
      if (pattern.startsWith("@")) vocabSorted else vocabSorted.filterNot(_.startsWith("@"))

    // expand multi-term queries like the engine (sorted; over-cap in a
    // scoring context follows Query.MultiTermRewrite — default blended =
    // constant-score (boost 1) over ALL matching terms, explicit
    // scoring-boolean = TooManyClauses; in a non-scoring context the FULL
    // term set is used — the WideTermSetQ / CONSTANT_SCORE_REWRITE
    // semantics, where no term is ever dropped)
    def expanded(ts: Seq[String], pattern: String, ns: Boolean): Query =
      if (ts.isEmpty) MatchNone
      else if (ts.size > Query.MaxClauseCount && !ns) {
        if (Query.MultiTermRewrite == Query.ScoringBooleanRewrite)
          throw new Query.TooManyClauses(pattern)
        else ConstScoreQ(BoolQ(should = ts.map(TermQ.apply), minShouldMatch = 1), 1f)
      }
      else BoolQ(should = ts.map(TermQ.apply), minShouldMatch = 1)
    def expand(q: Query, ns: Boolean): Query = q match {
      case PrefixQ(p) =>
        expanded(dictFor(p).filter(_.startsWith(p)), p, ns)
      case PhrasePrefixQ(ts, p, maxExp) =>
        // MultiPhraseQuery javadoc expansion: first maxExpansions matching
        // terms in term order as the last slot (never throws)
        dictFor(p).filter(_.startsWith(p)).take(maxExp) match {
          case Seq() => MatchNone
          case alts => MultiPhraseQ(ts.map(Seq(_)) :+ alts)
        }
      case WildcardQ(p) =>
        val re = graft.exec.Searcher.wildcardRegex(p).r
        expanded(dictFor(p).filter(t => re.findFirstIn(t).isDefined), p, ns)
      case RegexpQ(p) =>
        val re = s"^(?:$p)$$".r
        expanded(dictFor(p).filter(t => re.findFirstIn(t).isDefined), p, ns)
      case FuzzyQ(t0, e, maxExp) =>
        // blended top-n rewrite (FuzzyQuery.java:34,60; FuzzyTermsEnum
        // boost); fielded fuzzy matches within the field's namespace with
        // distance/boost on the bare tokens
        val ns = if (t0.startsWith("@")) t0.substring(0, t0.indexOf(':') + 1) else ""
        val t = t0.substring(ns.length)
        val cands = dictFor(t0)
          .filter(v => ns.isEmpty || v.startsWith(ns))
          .filter(v => math.abs(v.length - t0.length) <= e)
          .map(v => (v, EditDistance.osa(v.substring(ns.length), t, e)))
          .filter(_._2 <= e)
          .map { case (v, ed) =>
            val boost = if (ed == 0) 1f
              else 1f - ed.toFloat / math.min(v.length - ns.length, t.length).toFloat
            (v, boost)
          }
        if (cands.isEmpty) MatchNone
        else {
          val top = cands.sortBy { case (v, boost) => (-boost, v) }
            .take(math.min(maxExp, Query.MaxClauseCount))
          val dfBlended = top.map(x => vocabDf(x._1)).max
          BoolQ(should = top.sortBy(_._1).map { case (v, boost) => BoostTermQ(v, boost, dfBlended) },
            minShouldMatch = 1)
        }
      case TermRangeQ(lo, hi, il, ih) =>
        expanded(dictFor(lo).filter(v =>
          (if (il) v >= lo else v > lo) && (if (ih) v <= hi else v < hi)),
          s"[$lo TO $hi]", ns)
      case BlendedTermQ(ts, boosts) =>
        // BlendedTermQuery.java:270-300 + DisjunctionMaxRewrite(0.01f)
        val dfMax = (0L +: ts.map(t => vocabDf.getOrElse(t, 0L))).max
        if (dfMax <= 0L) MatchNone
        else DisMaxQ(ts.zipWithIndex.map { case (t, i) =>
          BoostTermQ(t, if (boosts.isDefinedAt(i)) boosts(i) else 1f, dfMax)
        }, 0.01f.toDouble)
      case BoolQ(m, s, n, msm, f) =>
        BoolQ(m.map(expand(_, ns)), s.map(expand(_, ns)),
          n.map(expand(_, ns = true)), msm, f.map(expand(_, ns = true)))
      case DisMaxQ(cs, tb) => DisMaxQ(cs.map(expand(_, ns)), tb)
      case ConstScoreQ(inner, b) => ConstScoreQ(expand(inner, ns = true), b)
      case BoostQ(inner, b) => BoostQ(expand(inner, ns), b)
      case other => other
    }
    val q = Query.rewrite(expand(Query.rewrite(q0), ns = !scoring))

    def scorer(t: String): BM25.TermScorer =
      BM25.termScorer(TermStats(t, vocabDf.getOrElse(t, 0L), 0L), fsOf(t))
    def phraseWeight(ts: Seq[String]): Float = {
      var idf = 0d
      ts.foreach(t => idf += BM25.idf(vocabDf.getOrElse(t, 0L), fsOf(ts.head).docCount).toDouble)
      idf.toFloat
    }
    def phraseScorer(ts: Seq[String]): BM25.TermScorer =
      new BM25.TermScorer(phraseWeight(ts), Array.tabulate(256)(i =>
        1f / (BM25.K1 * ((1 - BM25.B) + BM25.B * SmallFloat.LengthTable(i) / fsOf(ts.head).avgdl))))

    // Option[score as double-sum]
    def eval(q: Query, d: Doc): Option[Double] = q match {
      case MatchNone => None
      case MatchAll => Some(0d)
      case TermQ(t) =>
        d.tf.get(t).map(f => scorer(t).score(f, d.normOf(t)).toDouble)
      case BoostTermQ(t, boost, df, _) =>
        // df < 0 = parser-boosted term: real df (engine plan does the same)
        d.tf.get(t).map { f =>
          val dfv = if (df >= 0L) df else vocabDf.getOrElse(t, 0L)
          BM25.termScorer(TermStats(t, dfv, 0L), fsOf(t), boost).score(f, d.normOf(t)).toDouble
        }
      case BoostQ(inner, boost) =>
        // post-hoc clause multiply (see BoostQ doc: non-foldable leaves)
        eval(inner, d).map(s => boost.toDouble * s)
      case CombinedFieldQ(t, fields) =>
        // reference CombinedFieldQuery semantics (see the ADT doc): float
        // weighted freq, re-quantised weighted norm over PRESENT fields,
        // pseudo stats df=max / weighted long-narrowing sums
        var df = 0L
        var docCount = 0L
        var sumTtf = 0L
        fields.foreach { case (f, w) =>
          val key = if (f == "content") t else s"@$f:$t"
          df = math.max(df, vocabDf.getOrElse(key, 0L))
          val ffs = if (f == "content") fs else fsPath
          docCount = math.max(docCount, ffs.docCount)
          sumTtf = (sumTtf.toDouble + w.toDouble * ffs.sumTotalTermFreq.toDouble).toLong
        }
        var freq = 0f
        var nv = 0f
        var matched = false
        fields.foreach { case (f, w) =>
          val key = if (f == "content") t else s"@$f:$t"
          d.tf.get(key).foreach { tf => freq += tf * w; matched = true }
          val present = if (f == "content") d.tokens.nonEmpty else d.pathTokens.nonEmpty
          if (present)
            nv += w * SmallFloat.LengthTable(
              (if (f == "content") d.norm else d.pathNorm) & 0xff)
        }
        if (!matched) None
        else {
          val combined = SmallFloat.intToByte4(Math.round(nv))
          val sc = BM25.termScorer(TermStats("", df, 0L),
            FieldStats(math.max(1L, docCount), math.max(1L, sumTtf)))
          Some(sc.scoreF(freq, combined).toDouble)
        }
      case PhraseQ(ts, 0) =>
        val pos = ts.map(d.positions.get)
        if (pos.exists(_.isEmpty)) None
        else {
          val arrays = pos.map(_.get)
          val count = arrays.head.count(p => arrays.zipWithIndex.forall {
            case (arr, i) => java.util.Arrays.binarySearch(arr, p + i) >= 0
          })
          if (count == 0) None
          else Some(phraseScorer(ts).score(count, d.normOf(ts.head)).toDouble)
        }
      case PhraseQ(ts, slop) =>
        val pos = ts.map(d.positions.get)
        if (pos.exists(_.isEmpty)) None
        else {
          val f = sloppyFreq(pos.map(_.get), slop)
          if (f <= 0d) None
          else Some(phraseScorer(ts).scoreF(f.toFloat, d.normOf(ts.head)).toDouble)
        }
      case MultiPhraseQ(slots) =>
        val pos = slots.map(alts =>
          alts.flatMap(t => d.positions.getOrElse(t, Array.empty[Int])).distinct.sorted.toArray)
        if (pos.exists(_.isEmpty)) None
        else {
          val first = pos.head
          val count = first.count(p => pos.zipWithIndex.forall {
            case (arr, i) => java.util.Arrays.binarySearch(arr, p + i) >= 0
          })
          if (count == 0) None
          else Some(phraseScorer(slots.flatten).score(count, d.normOf(slots.head.head)).toDouble)
        }
      case SynonymQ(ts) =>
        val f = ts.map(t => d.tf.getOrElse(t, 0)).sum
        if (f == 0) None
        else {
          val dfMax = ts.map(t => vocabDf.getOrElse(t, 0L)).max
          Some(BM25.termScorer(TermStats("", dfMax, 0L), fsOf(ts.head))
            .score(f, d.normOf(ts.head)).toDouble)
        }
      case IntervalQ(src, pivot) =>
        // saturation over the interval pseudo-freq, float arithmetic
        // mirroring SaturationScorerF (`IntervalScoreFunction.java:72`)
        val f = intervalFreq(src, t => d.positions.getOrElse(t, Array.empty[Int]))
        if (f <= 0d) None
        else Some((1.0f - pivot / (pivot + f.toFloat)).toDouble)
      case PrefixQ(_) | WildcardQ(_) | RegexpQ(_) | FuzzyQ(_, _, _) | TermRangeQ(_, _, _, _) =>
        None // expanded above
      case ConstScoreQ(inner, boost) =>
        eval(inner, d).map(_ => boost.toDouble)
      case DisMaxQ(cs, tb) =>
        val ss = cs.map(eval(_, d)).flatten
        if (ss.isEmpty) None
        else Some(ss.max + tb * (ss.sum - ss.max))
      case BoolQ(must0, should, mustNot, msm, filter) =>
        val must = must0
        if (mustNot.exists(n => eval(n, d).isDefined)) None
        else {
          val ms = must.map(eval(_, d))
          val fl = filter.map(eval(_, d))
          if (ms.exists(_.isEmpty) || fl.exists(_.isEmpty)) None
          else {
            val ss = should.map(eval(_, d))
            val matched = ss.count(_.isDefined)
            val anchored = must.nonEmpty || filter.nonEmpty
            val effMsm = math.max(msm, if (!anchored && should.nonEmpty) 1 else 0)
            if (matched < effMsm) None
            else if (!anchored && should.nonEmpty && matched == 0) None
            // FILTER clauses match but contribute no score
            else Some(ms.flatten.sum + ss.flatten.sum)
          }
        }
    }

    val hits = docs.flatMap(d => eval(q, d).map(s => (d.docId, s.toFloat)))
    hits.sortBy { case (id, s) => (-s, id) }.take(k)
  }

  /** All matching docIds, sorted — the unscored count/docs-path oracle
    * (non-scoring context: over-cap expansions use the full term set).
    */
  def matchingDocs(docs: Seq[Doc], q0: Query): Seq[Long] =
    search(docs, q0, Int.MaxValue, scoring = false).map(_._1).sorted
}
