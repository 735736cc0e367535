package graft.exec

import graft.build.Index
import graft.query.{BoolQ, MatchNone, Query, TermQ}

/** CommonTermsQuery former — a re-expression of the reference's
  * `lucene/queries/src/java/org/apache/lucene/queries/CommonTermsQuery.java`:
  * query terms are split by document frequency against `maxTermFrequency`
  * (a fraction of docCount when < 1, an absolute df otherwise,
  * `:338-345`); LOW-frequency terms form the REQUIRED subquery (rare
  * terms gate matching), HIGH-frequency terms an OPTIONAL subquery that
  * only contributes score when present (`buildQuery:188-230`: lowFreq
  * MUST + highFreq SHOULD; an all-high or all-low split degenerates to
  * that single subquery). Terms absent from the index stay in the
  * low-frequency group (df 0 can never exceed the cutoff), matching the
  * reference's missing-TermStates path.
  *
  * Spark shape: ONE filtered term-stats read whose `In(term, ...)`
  * predicate pushes to the parquet scan (the MoreLikeThis pattern) — no
  * full-vocabulary pass, no shuffle; the formed query then runs through
  * the ordinary kernel.
  */
object CommonTerms {
  def form(index: Index, terms: Seq[String], maxTermFrequency: Double,
      lowMsm: Int = 0, highMsm: Int = 0): Query = {
    require(terms.nonEmpty, "CommonTerms.form: no terms")
    val spark = index.postings.sparkSession
    import spark.implicits._
    val dfs = index.termStats.filter($"term".isin(terms: _*))
      .select($"term", $"df").as[(String, Long)].collect().toMap
    val n = index.fieldStats.docCount
    val cutoff =
      if (maxTermFrequency >= 1.0) maxTermFrequency else maxTermFrequency * n
    val (high, low) = terms.partition(t => dfs.getOrElse(t, 0L).toDouble > cutoff)
    val lowQ =
      if (low.isEmpty) None
      else Some(BoolQ(should = low.map(TermQ.apply), minShouldMatch = lowMsm))
    val highQ =
      if (high.isEmpty) None
      else Some(BoolQ(should = high.map(TermQ.apply), minShouldMatch = highMsm))
    (lowQ, highQ) match {
      case (Some(l), Some(h)) => BoolQ(must = Seq(l), should = Seq(h))
      case (Some(l), None) => l
      case (None, Some(h)) => h
      case (None, None) => MatchNone
    }
  }
}
