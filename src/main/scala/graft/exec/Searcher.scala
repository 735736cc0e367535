package graft.exec

import graft.build.Index
import graft.model._
import graft.query._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Query planner + distributed top-k executor.
  *
  * Mirrors the reference search lifecycle (SURVEY.md §3.2): rewrite the
  * ADT to fixpoint -> expand multi-term (prefix) queries against the term
  * dictionary (`core/search/MultiTermQuery.java:86-153`, SCORING_BOOLEAN
  * rewrite, clause cap `IndexSearcher.java:873`) -> gather term +
  * collection statistics once and broadcast them with the query (Lucene's
  * `createWeight`, `core/search/TermQuery.java:44`) -> per-segment kernel
  * emits a local top-k (per-leaf bulk scorer) -> global reduce =
  * `orderBy(score desc, docId asc).limit(k)` (`TopDocs.merge` with the
  * HitQueue tie-break).
  *
  * Scale: the only data movement is (a) the postings of the query's terms
  * (partition-pruned, predicate-pushed scan on the sorted `term` column),
  * (b) k rows per segment for the final merge. Executor work per segment
  * is bounded by that segment's posting sizes; WAND/block-max pruning
  * skips non-competitive blocks without decoding them.
  */
object Searcher {

  /** Plan-time scorer table shipped to executors. */
  private final case class Scorers(
      term: Map[String, Kernel.AnyScorer],
      phrase: Map[Seq[String], Kernel.AnyScorer],
      synonym: Map[Seq[String], Kernel.AnyScorer]
  ) extends Serializable

  /** Expand prefixes against the term dictionary (bounded). The global
    * term-stats table IS the term dictionary (one row per term) — far
    * cheaper to scan than per-segment postings, range-prunable on the
    * sorted term column.
    */
  def expandPrefix(index: Index, prefix: String): Seq[String] = {
    import index.postings.sparkSession.implicits._
    index.termStats
      .filter($"term" >= prefix && $"term".startsWith(prefix))
      .select($"term")
      .orderBy($"term")
      .limit(Query.MaxClauseCount)
      .as[String].collect().toSeq
  }

  /** Fuzzy expansion: dictionary terms within `maxEdits` Levenshtein
    * (`core/search/FuzzyQuery.java:52`) — Spark's codegen'd `levenshtein`
    * plays the Lev-automaton's role over the sorted term dictionary.
    */
  def expandFuzzy(index: Index, term: String, maxEdits: Int): Seq[String] = {
    import index.postings.sparkSession.implicits._
    index.termStats
      .filter(length($"term") >= length(lit(term)) - maxEdits &&
        length($"term") <= length(lit(term)) + maxEdits)
      .filter(levenshtein($"term", lit(term)) <= maxEdits)
      .select($"term").orderBy($"term")
      .limit(Query.MaxClauseCount)
      .as[String].collect().toSeq
  }

  /** Lexicographic range expansion (`core/search/TermRangeQuery.java:37`);
    * sorted term column gives parquet min/max pruning for free.
    */
  def expandRange(index: Index, lo: String, hi: String): Seq[String] = {
    import index.postings.sparkSession.implicits._
    index.termStats
      .filter($"term" >= lo && $"term" <= hi)
      .select($"term").orderBy($"term")
      .limit(Query.MaxClauseCount)
      .as[String].collect().toSeq
  }

  private def substitutePrefixes(q: Query, exp: Map[Query, Seq[String]]): Query = q match {
    case PrefixQ(_) | FuzzyQ(_, _) | TermRangeQ(_, _) =>
      exp.getOrElse(q, Nil) match {
        case Nil => MatchNone
        case ts => BoolQ(should = ts.map(TermQ.apply), minShouldMatch = 1)
      }
    case BoolQ(m, s, n, msm) =>
      BoolQ(m.map(substitutePrefixes(_, exp)), s.map(substitutePrefixes(_, exp)),
        n.map(substitutePrefixes(_, exp)), msm)
    case DisMaxQ(cs, tb) => DisMaxQ(cs.map(substitutePrefixes(_, exp)), tb)
    case other => other
  }

  private def phrases(q: Query): Set[Seq[String]] = q match {
    case PhraseQ(ts) => Set(ts)
    case BoolQ(m, s, n, _) => (m ++ s ++ n).flatMap(phrases).toSet
    case DisMaxQ(cs, _) => cs.flatMap(phrases).toSet
    case _ => Set.empty
  }

  private def synonyms(q: Query): Set[Seq[String]] = q match {
    case SynonymQ(ts) => Set(ts)
    case BoolQ(m, s, n, _) => (m ++ s ++ n).flatMap(synonyms).toSet
    case DisMaxQ(cs, _) => cs.flatMap(synonyms).toSet
    case _ => Set.empty
  }

  /** Execute `query` returning the global top-k as (docId, score).
    * `doubleMode = false` reproduces the reference's float op order
    * (rank-identity contract); `true` computes the same quantised-norm
    * BM25 in double precision (SQL-oracle-comparable).
    */
  def topK(index: Index, queryStr: String, k: Int, doubleMode: Boolean = false): DataFrame =
    topKQ(index, QueryParser.parse(queryStr), k, doubleMode)

  def topKQ(index: Index, query0: Query, k: Int, doubleMode: Boolean = false): DataFrame = {
    val spark = index.postings.sparkSession
    import spark.implicits._

    // 1. rewrite + multi-term expansion (prefix / fuzzy / range)
    val pre = Query.rewrite(query0)
    val exp: Map[Query, Seq[String]] =
      Query.prefixes(pre).map(p => (PrefixQ(p): Query) -> expandPrefix(index, p)).toMap ++
        Query.expansions(pre).map {
          case f @ FuzzyQ(t, e) => (f: Query) -> expandFuzzy(index, t, e)
          case r @ TermRangeQ(lo, hi) => (r: Query) -> expandRange(index, lo, hi)
          case other => (other, Nil)
        }.toMap
    val query = Query.rewrite(substitutePrefixes(pre, exp))

    if (query == MatchNone) return emptyResult(spark, doubleMode)
    val terms = Query.literalTerms(query)
    if (terms.isEmpty) return emptyResult(spark, doubleMode)

    // 2. stats gathering (tiny collect, broadcast with the closure)
    val statsMap: Map[String, TermStats] =
      index.termStats.filter($"term".isin(terms.toSeq: _*)).as[TermStats]
        .collect().map(t => t.term -> t).toMap
    val fs = index.fieldStats

    def anyScorer(df: Long): Kernel.AnyScorer =
      if (doubleMode) Kernel.DoubleScorer(BM25.termScorerD(TermStats("", df, 0), fs))
      else Kernel.FloatScorer(BM25.termScorer(TermStats("", df, 0), fs))

    // phrase pseudo-term scorer: weight = boost * (float) sum of member idfs
    // (`BM25Similarity.idfExplain(collectionStats, termStats[])`)
    def phraseScorer(ts: Seq[String]): Kernel.AnyScorer = {
      if (doubleMode) {
        var idf = 0d
        ts.foreach(t => idf += BM25.idfDouble(statsMap.get(t).map(_.df).getOrElse(0L), fs.docCount))
        Kernel.DoubleScorer(new BM25.TermScorerD(idf, cacheOfD(fs)))
      } else {
        var idf = 0d
        ts.foreach(t => idf += BM25.idf(statsMap.get(t).map(_.df).getOrElse(0L), fs.docCount).toDouble)
        Kernel.FloatScorer(new BM25.TermScorer(idf.toFloat, cacheOfF(fs)))
      }
    }

    // synonym pseudo-term: df = max of member dfs (SynonymQuery.java:223)
    def synonymScorer(ts: Seq[String]): Kernel.AnyScorer =
      anyScorer(ts.map(t => statsMap.get(t).map(_.df).getOrElse(0L)).max)

    val scorers = Scorers(
      terms.map(t => t -> anyScorer(statsMap.get(t).map(_.df).getOrElse(0L))).toMap,
      phrases(query).map(ts => ts -> phraseScorer(ts)).toMap,
      synonyms(query).map(ts => ts -> synonymScorer(ts)).toMap
    )

    // 3. per-segment kernels over the pruned postings scan
    val kk = k
    val q = query
    val localTopK = index.postings
      .filter($"term".isin(terms.toSeq: _*))
      .as[PostingList]
      .groupByKey(_.seg)
      .flatMapGroups { (_, rows) =>
        // a term may span multiple rows (mega-term salt split / merge output);
        // blocks are self-contained, so concat in docId order
        val byTerm = rows.toSeq.groupBy(_.term).map { case (t, rs) =>
          if (rs.size == 1) t -> rs.head
          else t -> graft.codec.PostingCodec.concat(rs.sortBy(_.maxDocIds.head))
        }
        SegmentKernel.run(q, byTerm, scorers.term, scorers.phrase, scorers.synonym, kk)
          .iterator.map { case (d, s) => ScoredDocD(d, s) }
      }

    // 4. global reduce (partial top-k per partition via sort+limit)
    val merged = localTopK.toDF()
      .orderBy(desc("score"), asc("docId"))
      .limit(k)
    if (doubleMode) merged
    else merged.select($"docId", $"score".cast("float").as("score"))
  }

  private def cacheOfF(fs: FieldStats): Array[Float] = {
    val avgdl = fs.avgdl
    Array.tabulate(256)(i =>
      1f / (BM25.K1 * ((1 - BM25.B) + BM25.B * graft.util.SmallFloat.LengthTable(i) / avgdl)))
  }
  private def cacheOfD(fs: FieldStats): Array[Double] = {
    val avgdl = fs.avgdlDouble
    Array.tabulate(256)(i =>
      1d / (1.2d * (0.25d + 0.75d * graft.util.SmallFloat.byte4ToInt(i.toByte) / avgdl)))
  }

  private def emptyResult(spark: SparkSession, doubleMode: Boolean): DataFrame = {
    import spark.implicits._
    val df = Seq.empty[ScoredDocD].toDF()
    if (doubleMode) df else df.select($"docId", $"score".cast("float").as("score"))
  }
}

/** The per-segment execution: cursor tree construction + physical
  * algorithm choice (`core/search/BooleanScorerSupplier.java:176-349`).
  */
object SegmentKernel {
  import Kernel._

  def run(
      q: Query,
      byTerm: Map[String, PostingList],
      termScorers: Map[String, AnyScorer],
      phraseScorers: Map[Seq[String], AnyScorer],
      synonymScorers: Map[Seq[String], AnyScorer],
      k: Int
  ): Array[(Long, Double)] = {

    def termCursor(t: String, needPos: Boolean): Option[TermCursor] =
      byTerm.get(t).map(pl => new TermCursor(pl, termScorers(t), needPos))

    // physical strategy selection on the rewritten root
    q match {
      case TermQ(t) =>
        termCursor(t, needPos = false) match {
          case Some(c) => termTopK(c, k)
          case None => Array.empty
        }
      case BoolQ(must, Nil, Nil, _) if must.nonEmpty && must.forall(_.isInstanceOf[TermQ]) =>
        val ts = must.collect { case TermQ(t) => t }
        if (ts.exists(t => !byTerm.contains(t))) Array.empty
        else {
          // rarest-first lead order (cost = segment-local df),
          // `ConjunctionDISI` cost ordering
          val sorted = ts.sortBy(t => byTerm(t).df)
            .map(t => new TermCursor(byTerm(t), termScorers(t))).toArray
          conjunctionTopK(sorted, k)
        }
      case BoolQ(Nil, should, Nil, msm) if msm <= 1 && should.nonEmpty &&
          should.forall(_.isInstanceOf[TermQ]) =>
        val cs = should.collect { case TermQ(t) => termCursor(t, needPos = false) }.flatten
        if (cs.isEmpty) Array.empty
        // dense many-clause disjunctions (multi-term expansions): term-at-a-
        // time accumulation beats document-at-a-time WAND
        // (`BooleanScorerSupplier.java:176-223` makes the same choice)
        else if (cs.size > 16) taatTopK(cs.toArray, k)
        else wandTopK(cs.toArray, k)
      case BoolQ(Nil, should, Nil, msm) if should.nonEmpty && should.size > 16 &&
          should.forall(_.isInstanceOf[TermQ]) =>
        val cs = should.collect { case TermQ(t) => termCursor(t, needPos = false) }.flatten
        if (cs.isEmpty) Array.empty else taatTopK(cs.toArray, k, msm)
      case other =>
        buildCursor(other, byTerm, termScorers, phraseScorers, synonymScorers) match {
          case Some(c) => collectAll(c, k)
          case None => Array.empty
        }
    }
  }

  /** Compositional cursor construction for arbitrary rewritten queries. */
  def buildCursor(
      q: Query,
      byTerm: Map[String, PostingList],
      termScorers: Map[String, AnyScorer],
      phraseScorers: Map[Seq[String], AnyScorer],
      synonymScorers: Map[Seq[String], AnyScorer] = Map.empty
  ): Option[DocCursor] = q match {
    case MatchNone | MatchAll => None // MatchAll only survives in pure-negation -> empty
    case TermQ(t) =>
      byTerm.get(t).map(pl => new TermCursor(pl, termScorers(t)))
    case PhraseQ(ts) =>
      val cs = ts.map(t => byTerm.get(t).map(pl =>
        new TermCursor(pl, termScorers(t), needPositions = true)))
      if (cs.exists(_.isEmpty)) None
      else Some(new PhraseCursor(cs.flatten.toArray, phraseScorers(ts)))
    case SynonymQ(ts) =>
      val cs = ts.flatMap(t => byTerm.get(t).map(pl => new TermCursor(pl, termScorers(t))))
      if (cs.isEmpty) None
      else Some(new SynonymCursor(cs.toArray, synonymScorers(ts)))
    case PrefixQ(_) | FuzzyQ(_, _) | TermRangeQ(_, _) => None // expanded before kernel
    case DisMaxQ(cs, tb) =>
      val sub = cs.flatMap(buildCursor(_, byTerm, termScorers, phraseScorers, synonymScorers))
      if (sub.isEmpty) None
      else if (sub.size == 1) Some(sub.head)
      else Some(new DisMaxCursor(sub.toArray, tb))
    case BoolQ(must0, should, mustNot, msm) =>
      val must = must0.filterNot(_ == MatchAll)
      val mc = must.map(buildCursor(_, byTerm, termScorers, phraseScorers, synonymScorers))
      if (mc.exists(_.isEmpty)) return None // a required clause can't match here
      val sc = should.flatMap(buildCursor(_, byTerm, termScorers, phraseScorers, synonymScorers))
      val nc = mustNot.flatMap(buildCursor(_, byTerm, termScorers, phraseScorers, synonymScorers))

      val positive: Option[DocCursor] =
        if (must.nonEmpty) {
          val conj: DocCursor =
            if (mc.size == 1) mc.head.get else new ConjunctionCursor(mc.flatten.toArray)
          if (sc.isEmpty) Some(conj)
          else if (msm <= 0)
            Some(new ReqOptCursor(conj,
              if (sc.size == 1) sc.head else new DisjunctionCursor(sc.toArray, 1)))
          else Some(new ConjunctionCursor(Array(conj, new DisjunctionCursor(sc.toArray, msm))))
        } else if (sc.nonEmpty) {
          if (sc.size < math.max(msm, 1)) None
          else if (sc.size == 1) Some(sc.head)
          else Some(new DisjunctionCursor(sc.toArray, math.max(msm, 1)))
        } else None

      positive.map { pos =>
        if (nc.isEmpty) pos
        else new ExclusionCursor(pos,
          if (nc.size == 1) nc.head else new DisjunctionCursor(nc.toArray, 1))
      }
  }
}
