package graft.exec

import graft.analysis.CodeAnalyzer

/** Passage extraction and snippet ranking — the UnifiedHighlighter
  * surface (`highlighter/.../uhighlight/UnifiedHighlighter.java`) with
  * the reference's PassageScorer formula held exactly
  * (`highlighter/.../uhighlight/PassageScorer.java:80-138`, defaults
  * k1=1.2 b=0.75 pivot=87 `:52-57`):
  *
  *   score(P) = norm(start) * Σ_uniqueMatchedTerms tf(f,|P|) * weight(|D|,ttf)
  *   weight(contentLen, ttf) = (k1+1) * ln(1 + (numDocs+0.5)/(ttf+0.5)),
  *                             numDocs = 1 + contentLen/pivot
  *   tf(f, passLen)          = f / (f + k1*((1-b) + b*passLen/pivot))
  *   norm(start)             = 1 + 1/ln(pivot + start)
  *
  * Two declared divergences from the reference, both forced by inputs
  * rather than design: passages are fixed `window`-token runs instead of
  * BreakIterator sentences (the corpus contract has no sentence
  * punctuation — every doc would be ONE passage and the scorer would
  * never discriminate), and character offsets are measured over the
  * canonical single-space-joined token stream (identical to raw-text
  * offsets on the corpus contract, which is space-joined). Scores are
  * 1e-4-quantised; the best passage is the highest rounded score with
  * earliest-start tie-break (the reference's passage queue resolves ties
  * by offset too, `FieldHighlighter.java` passage PQ).
  *
  * Scale shape: highlighting runs per final HIT (k-bounded), never per
  * corpus row — the driver ships the k hit texts through [[bestPassage]]
  * executor-side via a map over the hit join, so cost is O(k * |doc|)
  * regardless of corpus size, like the reference highlighting only the
  * returned page.
  */
object Highlighter {

  final case class Passage(idx: Int, startOffset: Int, score: Double, snippet: String)

  def bestPassage(text: String, terms: Set[String], window: Int = 8,
      k1: Double = 1.2, b: Double = 0.75, pivot: Double = 87d): Option[Passage] =
    topPassages(text, terms, 1, window, k1, b, pivot).headOption

  /** Ranked top-N passages — the reference's passage priority queue
    * (`FieldHighlighter.java:147-192`: a PQ of the best N passages,
    * returned in offset-resolved rank order), over the same fixed
    * windows and exact PassageScorer formula as [[bestPassage]].
    * Ordering: rounded score desc, then window index asc (earliest
    * start, the reference PQ's tie resolution).
    */
  def topPassages(text: String, terms: Set[String], n: Int, window: Int = 8,
      k1: Double = 1.2, b: Double = 0.75, pivot: Double = 87d): Seq[Passage] = {
    val toks = CodeAnalyzer.tokenize(text)
    if (toks.isEmpty) return Nil
    val starts = new Array[Int](toks.length)
    var off = 0
    var i = 0
    while (i < toks.length) {
      starts(i) = off
      off += toks(i).term.length + 1
      i += 1
    }
    val contentLen = off - 1
    // per-doc ttf of the matched terms only (PassageScorer weights use
    // in-document stats, `PassageScorer.java:75-85`)
    val ttfInDoc = new java.util.HashMap[String, Int]()
    i = 0
    while (i < toks.length) {
      val t = toks(i).term
      if (terms(t)) ttfInDoc.merge(t, 1, Integer.sum)
      i += 1
    }
    if (ttfInDoc.isEmpty) return Nil
    val numDocs = 1 + contentLen / pivot
    val all = Seq.newBuilder[Passage]
    var w = 0
    while (w * window < toks.length) {
      val lo = w * window
      val hi = math.min(toks.length, lo + window)
      val passLen = starts(hi - 1) + toks(hi - 1).term.length - starts(lo)
      // unique matched terms in this window with in-passage freqs
      val freqs = new java.util.TreeMap[String, Int]()
      i = lo
      while (i < hi) {
        val t = toks(i).term
        if (terms(t)) freqs.merge(t, 1, Integer.sum)
        i += 1
      }
      if (!freqs.isEmpty) {
        val norm = 1 + 1 / math.log(pivot + starts(lo))
        var s = 0d
        val it = freqs.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val f = e.getValue.toDouble
          val tf = f / (f + k1 * ((1 - b) + b * passLen / pivot))
          val weight = (k1 + 1) * math.log(1 + (numDocs + 0.5) / (ttfInDoc.get(e.getKey) + 0.5))
          s += tf * weight
        }
        s *= norm
        val rs = math.floor(s * 10000d + 0.5d) / 10000d
        val snippet = new StringBuilder()
        i = lo
        while (i < hi) {
          if (i > lo) snippet.append(' ')
          snippet.append(toks(i).term)
          i += 1
        }
        all += Passage(w, starts(lo), rs, snippet.toString)
      }
      w += 1
    }
    all.result().sortBy(p => (-p.score, p.idx)).take(n)
  }
}
