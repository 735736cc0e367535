package graft

import graft.build.{IndexBuilder, InputDoc}
import graft.exec.Suggest

/** Suggest module: DirectSpellChecker gates and ordering, prefix/infix/
  * fuzzy completion ranking, and FreeText stupid-backoff arithmetic —
  * all against hand-computed expectations on a synthetic corpus.
  */
class SuggestSpec extends SparkTest {
  import spark.implicits._

  // vocabulary engineered for the orderings under test:
  //  - "spill" (df 12) vs "still" (df 3): both ed=1 from "still"-adjacent
  //    typos; score ties break on df, df ties on term
  //  - "merge" appears often; "stream" follows "merge" in every doc of
  //    seg 0 for bigram stats
  private lazy val docs: Seq[InputDoc] = (0 until 24).map { i =>
    val words = Seq.newBuilder[String]
    words += "merge"
    words += (if (i % 2 == 0) "stream" else "table")
    if (i < 12) words += "spill"
    if (i < 3) words += "still"
    if (i < 6) words += "stile"
    words += "spark"
    InputDoc(seg = i % 2, sortKey = f"$i%06d", repo = "r", path = s"p$i",
      commit = i.toString, lang = "scala", content = words.result().mkString(" "))
  }
  private lazy val index = IndexBuilder.buildInMemory(spark, spark.createDataset(docs))
  private lazy val shingled =
    IndexBuilder.buildInMemory(spark, spark.createDataset(docs), analyzerMode = "shingle")

  test("didYouMean: gates (length, in-index, frequency)") {
    // shorter than minQueryLength=4 -> empty
    assert(Suggest.didYouMean(index, "stl", 5).count() === 0L)
    // present in the index -> empty (SUGGEST_WHEN_NOT_IN_INDEX)
    assert(Suggest.didYouMean(index, "spill", 5).count() === 0L)
    assert(Suggest.didYouMean(index, "merge", 5).count() === 0L)
  }

  test("didYouMean: candidate set, scores, and comparator order") {
    // "still" misspelled as "stilk": first char 's' exact; candidates by
    // suffix ed vs "tilk": stile ("tile" ed 1 -> boost 1-1/5=0.8, df 6),
    // still ("till" ed 1 -> 0.8, df 3), spill ("pill" ed 2 -> 0.6, df 12)
    // — comparator is score desc FIRST (spill's higher df cannot beat a
    // better score), then df desc within the 0.8 tie, then term
    val got = Suggest.didYouMean(index, "stilk", 5)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got === Seq(("stile", 0.8, 6L), ("still", 0.8, 3L), ("spill", 0.6, 12L)),
      got.toString)
    // no candidate below accuracy 0.5 leaked, query term itself excluded
    assert(got.forall(c => c._2 >= 0.5 && c._1 != "stilk"))
  }

  test("didYouMean: first-character prefix is held exact") {
    // "tpill" is ed-1 from "spill" but the first char differs -> the
    // minPrefix=1 band excludes every candidate
    assert(Suggest.didYouMean(index, "tpill", 5).count() === 0L)
  }

  test("didYouMean modes: more_popular df floor, always ignores presence") {
    // "still" (df 3, in 3/24 docs): the maxQueryFrequency gate (default
    // 0.01*maxDoc) refuses frequent terms in EVERY mode — raise it for
    // the 24-doc fixture to exercise the mode logic itself
    assert(Suggest.didYouMean(index, "still", 5).count() === 0L)
    assert(Suggest.didYouMean(index, "still", 5,
      maxQueryFrequency = 0.5f, mode = Suggest.ModeAlways).count() > 0L)
    val always = Suggest.didYouMean(index, "still", 5,
      maxQueryFrequency = 0.5f, mode = Suggest.ModeAlways)
      .collect().map(_.getString(0)).toSeq
    assert(always.contains("stile") && always.contains("spill"), always.toString)
    // more_popular: only candidates with df > 3 survive (stile 6, spill 12)
    val popular = Suggest.didYouMean(index, "still", 5,
      maxQueryFrequency = 0.5f, mode = Suggest.ModeMorePopular)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSeq
    assert(popular.nonEmpty && popular.forall(_._2 > 3L), popular.toString)
  }

  test("wordBreaks: bi-sects where both parts exist, max-freq order, gates") {
    // "spillmerge" absent; valid splits: spill+merge (df 12/24)
    val got = Suggest.wordBreaks(index, "spillmerge", 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq(("spill", "merge", 12L, 24L)), got.toString)
    // in-index terms are never broken (SUGGEST_WHEN_NOT_IN_INDEX)
    assert(Suggest.wordBreaks(index, "still", 5).count() === 0L)
    // no valid split -> empty
    assert(Suggest.wordBreaks(index, "zzzqqq", 5).count() === 0L)
  }

  test("wordCombine: adjacent absent parts whose concatenation exists") {
    // "sti"+"ll" -> "still" (both parts absent, combined df 3);
    // "merge"+"spark": both present -> gated; "ll"+"merge" -> absent
    val got = Suggest.wordCombine(index, Seq("sti", "ll", "merge", "spark"), 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(("still", 0L, 3L)), got.toString)
  }

  test("completePrefix: weight order, term tie-break, k cap") {
    val got = Suggest.completePrefix(index, "st", 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // stream ttf 12, stile 6, still 3
    assert(got === Seq(("stream", 12L), ("stile", 6L), ("still", 3L)), got.toString)
    assert(Suggest.completePrefix(index, "st", 2).count() === 2L)
    assert(Suggest.completePrefix(index, "zz", 5).count() === 0L)
  }

  test("completeInfix: containment, not prefix") {
    val got = Suggest.completeInfix(index, "il", 10)
      .collect().map(_.getString(0)).toSeq
    assert(got.toSet === Set("spill", "stile", "still"), got.toString)
  }

  test("completeInfix with infixGrams artifact == full scan; plan prunes on gram") {
    val grams = Suggest.infixGrams(index).persist()
    try {
      // every fragment length (1, 2, 3, >3), a hit-less fragment, and a
      // full-term fragment — the pruned path must be result-identical
      for (frag <- Seq("i", "il", "til", "till", "ream", "spark", "zzq")) {
        val full = Suggest.completeInfix(index, frag, 10)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        val pruned = Suggest.completeInfix(index, frag, 10, Some(grams))
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        assert(pruned === full, s"fragment [$frag]: pruned=$pruned full=$full")
      }
      // the pruned plan's source is the aux table with a gram-equality
      // predicate (one bucket), not a dictionary-wide contains scan
      val plan = Suggest.completeInfix(index, "il", 10, Some(grams))
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("gram") && plan.contains("= il"), plan)
    } finally { grams.unpersist(); () }
  }

  test("nextToken with topUnigrams artifact == full-dictionary backoff") {
    val top = Suggest.topUnigrams(index).persist()
    try {
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      // a context with followers (mixed bigram+backoff top-k), one with
      // none (pure backoff), and an absent context
      for (ctx <- Seq("merge", "spark", "nonexistent_ctx")) {
        val full = rows(Suggest.nextToken(index, shingled, ctx, 20))
        val fast = rows(Suggest.nextToken(index, shingled, ctx, 20, unigramTop = Some(top)))
        assert(fast === full, s"context [$ctx]: fast=$fast full=$full")
      }
      // an artifact too small for k+F must fall back, still exact
      val tiny = Suggest.topUnigrams(index, n = 2).persist()
      try assert(rows(Suggest.nextToken(index, shingled, "merge", 20, unigramTop = Some(tiny)))
        === rows(Suggest.nextToken(index, shingled, "merge", 20)))
      finally { tiny.unpersist(); () }
    } finally { top.unpersist(); () }
  }

  test("completeFuzzy: sub/del/transposition prefixes match, weight-ranked") {
    // input "setam": first char exact, some prefix of the term within 1
    // edit of "etam"? stream: prefix "trea"... no; "steam"-like typo for
    // "stream": prefixes of "tream": "tream" vs "etam" ed 3 — use a
    // closer input: "strem" -> prefixes "tre"/"trem"/"tream" vs "trem"
    // gives stream (del); "spil" -> spill exact-prefix; transposition:
    // "psill" fails the exact first char, "sipll" -> "ipll" vs prefixes
    // of "pill": "ipll"? osa("pil","ipl")... keep to the clear cases:
    val strem = Suggest.completeFuzzy(index, "strem", 5)
      .collect().map(_.getString(0)).toSeq
    assert(strem.contains("stream"), strem.toString)
    // shorter than minFuzzyLength=3 -> exact prefix completion only
    val sp = Suggest.completeFuzzy(index, "sp", 5)
      .collect().map(_.getString(0)).toSeq
    assert(sp.toSet === Set("spill", "spark"), sp.toString)
    // transposed interior: "sitll" (til<->itl) should still reach "still"
    val sitll = Suggest.completeFuzzy(index, "sitll", 5)
      .collect().map(_.getString(0)).toSeq
    assert(sitll.contains("still"), sitll.toString)
  }

  test("nextToken: bigram ratio beats backoff; backoff = 0.4*ttf/total") {
    val got = Suggest.nextToken(index, shingled, "merge", 20)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    // "merge stream" in 12 of 24 docs, "merge table" in the other 12;
    // count("merge") = 24 -> ratio 0.5 each
    assert(got("stream") === 0.5)
    assert(got("table") === 0.5)
    // words never following "merge" fall back: 0.4 * ttf/totalTokens
    val total = docs.map(_.content.split(" ").length).sum.toDouble
    def r4(x: Double) = math.floor(x * 10000d + 0.5d) / 10000d
    assert(got("spark") === r4(0.4 * 24 / total), got.toString)
    assert(got("spill") === r4(0.4 * 12 / total), got.toString)
    // bigram continuations are NOT duplicated into the backoff leg
    assert(Suggest.nextToken(index, shingled, "merge", 20)
      .groupBy("suggestion").count().filter($"count" > 1).count() === 0L)
  }

  test("didYouMean: maxQueryFrequency >= 1 is an absolute df cutoff") {
    // "still" has df 3: an absolute cutoff of 2 refuses it in EVERY mode,
    // an absolute cutoff of 3 admits it — no silent docCount rescale of
    // a caller's absolute-threshold convention (DirectSpellChecker's)
    assert(Suggest.didYouMean(index, "still", 5,
      maxQueryFrequency = 2f, mode = Suggest.ModeAlways).count() === 0L)
    assert(Suggest.didYouMean(index, "still", 5,
      maxQueryFrequency = 3f, mode = Suggest.ModeAlways).count() > 0L)
  }
}
