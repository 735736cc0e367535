package graft

import graft.exec.Highlighter
import org.scalatest.funsuite.AnyFunSuite

/** Passage scorer: structural behavior (match selection, earliest-start
  * tie-break, ragged tail windows, no-match None) plus a differential
  * sweep against an independently written evaluation of the published
  * PassageScorer formula over randomized docs.
  */
class HighlightSpec extends AnyFunSuite {

  test("no matched term -> None; empty text -> None") {
    assert(Highlighter.bestPassage("", Set("x")).isEmpty)
    assert(Highlighter.bestPassage("alpha beta gamma", Set("zzz")).isEmpty)
  }

  test("window with denser matches wins; snippet and idx correct") {
    // window 0: one 'hit'; window 1: two 'hit's -> higher tf, later start
    // penalised only mildly by norm -> window 1 must win
    val text = "hit aa bb cc dd ee ff gg hit hit xx yy zz qq rr ss"
    val p = Highlighter.bestPassage(text, Set("hit"), window = 8).get
    assert(p.idx === 1)
    assert(p.snippet === "hit hit xx yy zz qq rr ss")
    assert(p.startOffset === "hit aa bb cc dd ee ff gg ".length)
  }

  test("equal windows -> earliest start wins (norm + tie-break)") {
    val text = "hit aa bb cc dd ee ff gg hit aa bb cc dd ee ff gg"
    val p = Highlighter.bestPassage(text, Set("hit"), window = 8).get
    assert(p.idx === 0)
    assert(p.startOffset === 0)
  }

  test("ragged tail window is scored with its true length") {
    val text = "aa bb cc dd ee ff gg hh hit"
    val p = Highlighter.bestPassage(text, Set("hit"), window = 8).get
    assert(p.idx === 1)
    assert(p.snippet === "hit")
    // passage length = the single token
    assert(p.startOffset === "aa bb cc dd ee ff gg hh ".length)
  }

  /** Independent evaluation: straight transcription of
    * PassageScorer.java:80-138 using Scala collections over a
    * pre-split token list.
    */
  private def naiveBest(tokens: Vector[String], terms: Set[String], window: Int)
      : Option[(Int, Double)] = {
    if (tokens.isEmpty || !tokens.exists(terms)) return None
    val k1 = 1.2; val b = 0.75; val pivot = 87d
    val joined = tokens.mkString(" ")
    val contentLen = joined.length
    val numDocs = 1 + contentLen / pivot
    val ttf = tokens.filter(terms).groupBy(identity).view.mapValues(_.size).toMap
    val offsets = tokens.scanLeft(0)((acc, t) => acc + t.length + 1)
    val cands = tokens.grouped(window).zipWithIndex.flatMap { case (win, w) =>
      val matched = win.filter(terms)
      if (matched.isEmpty) None
      else {
        val start = offsets(w * window)
        val passLen = win.map(_.length).sum + (win.size - 1)
        val s = matched.groupBy(identity).toSeq.sortBy(_._1).map { case (t, g) =>
          val f = g.size.toDouble
          val tf = f / (f + k1 * ((1 - b) + b * passLen / pivot))
          val weight = (k1 + 1) * math.log(1 + (numDocs + 0.5) / (ttf(t) + 0.5))
          tf * weight
        }.sum * (1 + 1 / math.log(pivot + start))
        Some((w, math.floor(s * 10000d + 0.5d) / 10000d))
      }
    }.toSeq
    Some(cands.maxBy { case (w, s) => (s, -w) })
  }

  /** Full ranked list from the same independent transcription. */
  private def naiveRanked(tokens: Vector[String], terms: Set[String], window: Int)
      : Seq[(Int, Double)] = {
    if (tokens.isEmpty || !tokens.exists(terms)) return Nil
    val k1 = 1.2; val b = 0.75; val pivot = 87d
    val joined = tokens.mkString(" ")
    val numDocs = 1 + joined.length / pivot
    val ttf = tokens.filter(terms).groupBy(identity).view.mapValues(_.size).toMap
    val offsets = tokens.scanLeft(0)((acc, t) => acc + t.length + 1)
    tokens.grouped(window).zipWithIndex.flatMap { case (win, w) =>
      val matched = win.filter(terms)
      if (matched.isEmpty) None
      else {
        val start = offsets(w * window)
        val passLen = win.map(_.length).sum + (win.size - 1)
        val s = matched.groupBy(identity).toSeq.sortBy(_._1).map { case (t, g) =>
          val f = g.size.toDouble
          val tf = f / (f + k1 * ((1 - b) + b * passLen / pivot))
          tf * ((k1 + 1) * math.log(1 + (numDocs + 0.5) / (ttf(t) + 0.5)))
        }.sum * (1 + 1 / math.log(pivot + start))
        Some((w, math.floor(s * 10000d + 0.5d) / 10000d))
      }
    }.toSeq.sortBy { case (w, s) => (-s, w) }
  }

  test("topPassages: ranked N, score desc / window asc, prefix-consistent") {
    val text = "hit aa bb cc dd ee ff gg hit hit xx yy zz qq rr ss hit aa bb cc dd ee ff gg"
    val top = Highlighter.topPassages(text, Set("hit"), 3, window = 8)
    assert(top.size === 3)
    // densest window first, then the earlier of the two equal singles
    assert(top.map(_.idx) === Seq(1, 0, 2), top.toString)
    assert(top.map(_.score) === top.map(_.score).sorted(Ordering[Double].reverse))
    // n=1 is exactly bestPassage
    assert(Highlighter.bestPassage(text, Set("hit"), 8).get === top.head)
    // asking for more than exist returns only matched windows
    assert(Highlighter.topPassages(text, Set("hit"), 99, window = 8).size === 3)
  }

  test("topPassages differential vs independent ranked evaluation (randomized)") {
    val rnd = new scala.util.Random(4242)
    val vocab = Vector("merge", "stream", "table", "scan", "alpha", "beta",
      "gamma", "delta", "x", "longidentifier_name")
    for (trial <- 0 until 300) {
      val n = 1 + rnd.nextInt(40)
      val tokens = Vector.fill(n)(vocab(rnd.nextInt(vocab.length)))
      val terms: Set[String] = Set("merge", "stream")
      val window = 1 + rnd.nextInt(10)
      val k = 1 + rnd.nextInt(4)
      val got = Highlighter.topPassages(tokens.mkString(" "), terms, k, window)
        .map(p => (p.idx, p.score))
      val exp = naiveRanked(tokens, terms, window).take(k)
      assert(got === exp, s"trial $trial: $tokens window=$window k=$k")
    }
  }

  test("differential vs independent formula evaluation (randomized)") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("merge", "stream", "table", "scan", "alpha", "beta",
      "gamma", "delta", "x", "longidentifier_name")
    for (trial <- 0 until 300) {
      val n = 1 + rnd.nextInt(40)
      val tokens = Vector.fill(n)(vocab(rnd.nextInt(vocab.length)))
      val terms: Set[String] = Set("merge", "stream")
      val window = 1 + rnd.nextInt(10)
      val got = Highlighter.bestPassage(tokens.mkString(" "), terms, window)
      val exp = naiveBest(tokens, terms, window)
      assert(got.isDefined === exp.isDefined, s"trial $trial: $tokens")
      got.foreach { p =>
        assert((p.idx, p.score) === exp.get, s"trial $trial: $tokens window=$window")
      }
    }
  }
}
