package graft.exec

import graft.query._

/** Canonical minimal-interval evaluation over per-doc position arrays —
  * the semantics of the reference's lazy interval iterators
  * (`lucene/queries/src/java/org/apache/lucene/queries/intervals/`),
  * computed eagerly per candidate doc (the working set is the doc's own
  * positions, the same profile as the sloppy-phrase kernel).
  *
  * Every source yields a PROPER list: starts strictly increasing, ends
  * strictly increasing, no interval containing another — exactly what
  * the reference iterators return per `nextInterval()` (intermediate
  * non-minimal states are only visible through the Matches API, which
  * does not affect matching or the scorer's pseudo-frequency,
  * `IntervalScorer.java:60-67`).
  *
  * Algorithms are the classical minimal-interval sweeps (Clarke/Cormack
  * GC-lists; Vigna, "Efficient optimally lazy algorithms for
  * minimal-interval semantics"), not ports of the reference's iterator
  * state machines; equality with the reference semantics is established
  * by the brute-force differential oracle (NaiveOracle.intervalIvs).
  */
object IntervalEval {

  /** One emitted interval; `gaps` = width minus the sum of constituent
    * child widths at emission (`IntervalIterator.gaps()`).
    */
  final case class Iv(start: Int, end: Int, gaps: Int) {
    def width: Int = end - start + 1
  }

  /** Canonical minimal intervals of `src`, increasing start order.
    * `pos(term)` returns the doc's sorted positions (empty if absent).
    */
  def minimal(src: ISrc, pos: String => Array[Int]): Vector[Iv] = src match {
    case ITermS(t) => pos(t).iterator.map(p => Iv(p, p, 0)).toVector
    case IOrderedS(subs) => orderedMin(subs.map(minimal(_, pos)))
    case IUnorderedS(subs) => unorderedMin(subs.map(minimal(_, pos)))
    case IMaxGapsS(g, s) => minimal(s, pos).filter(_.gaps <= g)
    case IMaxWidthS(w, s) => minimal(s, pos).filter(_.width <= w)
    case IContainingS(big, small) =>
      containingFilter(minimal(big, pos), minimal(small, pos))
    case IContainedByS(small, big) =>
      containedByFilter(minimal(small, pos), minimal(big, pos))
  }

  /** Interval pseudo-frequency — `IntervalScorer.ensureFreq`
    * (`:60-67`): sum over minimal intervals of
    * 1/max(length - minExtent + 1, 1). Double accumulation (the `r4`
    * oracle quantisation absorbs the reference's float accumulate).
    */
  def freq(src: ISrc, pos: String => Array[Int]): Double = {
    val ivs = minimal(src, pos)
    val me = src.minExtent
    var f = 0d
    var i = 0
    while (i < ivs.length) {
      f += 1d / math.max(ivs(i).width - me + 1, 1)
      i += 1
    }
    f
  }

  /** Minimal ordered tuples: forward pass finds the least end for the
    * current first-child choice, backward pass maximises every start
    * (the "shrunk" tuple the reference iterator holds when it returns),
    * then a containment sweep enforces canonical minimality.
    */
  private def orderedMin(lists: Seq[Vector[Iv]]): Vector[Iv] = {
    if (lists.exists(_.isEmpty)) return Vector.empty
    val ls = lists.toArray
    val n = ls.length
    if (n == 1) return ls(0)
    val out = Vector.newBuilder[Iv]
    var i0 = 0
    var done = false
    while (!done && i0 < ls(0).length) {
      val chosen = new Array[Int](n)
      chosen(0) = i0
      var ok = true
      var k = 1
      var prevEnd = ls(0)(i0).end
      while (ok && k < n) {
        var j = 0 // per-doc lists are small; a linear probe per child is fine
        val lk = ls(k)
        var found = -1
        while (found < 0 && j < lk.length) {
          if (lk(j).start > prevEnd) found = j else j += 1
        }
        if (found < 0) ok = false
        else { chosen(k) = found; prevEnd = lk(found).end; k += 1 }
      }
      if (!ok) done = true
      else {
        // backward shrink: each child takes the latest interval still
        // strictly before its successor's start
        var k2 = n - 2
        var nextStart = ls(n - 1)(chosen(n - 1)).start
        while (k2 >= 0) {
          val lk = ls(k2)
          var j = chosen(k2)
          while (j + 1 < lk.length && lk(j + 1).end < nextStart) j += 1
          chosen(k2) = j
          nextStart = lk(j).start
          k2 -= 1
        }
        val s = ls(0)(chosen(0)).start
        val e = ls(n - 1)(chosen(n - 1)).end
        var sumW = 0
        var k3 = 0
        while (k3 < n) { sumW += ls(k3)(chosen(k3)).width; k3 += 1 }
        out += Iv(s, e, (e - s + 1) - sumW)
        i0 = chosen(0) + 1
      }
    }
    minimalityFilter(out.result())
  }

  /** Minimal unordered windows (overlaps allowed): sweep advancing the
    * min-start child, recording the candidate window at each state, then
    * enforce canonical minimality.
    */
  private def unorderedMin(lists: Seq[Vector[Iv]]): Vector[Iv] = {
    if (lists.exists(_.isEmpty)) return Vector.empty
    val ls = lists.toArray
    val n = ls.length
    if (n == 1) return ls(0)
    val idx = new Array[Int](n)
    val cand = Vector.newBuilder[Iv]
    var live = true
    while (live) {
      var minK = 0
      var s = Int.MaxValue
      var e = Int.MinValue
      var sumW = 0
      var k = 0
      while (k < n) {
        val iv = ls(k)(idx(k))
        if (iv.start < s) { s = iv.start; minK = k }
        if (iv.end > e) e = iv.end
        sumW += iv.width
        k += 1
      }
      cand += Iv(s, e, (e - s + 1) - sumW)
      idx(minK) += 1
      if (idx(minK) >= ls(minK).length) live = false
    }
    minimalityFilter(cand.result())
  }

  /** Big's intervals containing at least one small interval — the
    * two-pointer walk of `ContainingIntervalsSource.combine` (`:41-64`).
    */
  private def containingFilter(bigs: Vector[Iv], smalls: Vector[Iv]): Vector[Iv] = {
    if (smalls.isEmpty) return Vector.empty
    val out = Vector.newBuilder[Iv]
    var si = 0
    var bi = 0
    while (bi < bigs.length && si < smalls.length) {
      val b = bigs(bi)
      while (si < smalls.length && smalls(si).start < b.start && smalls(si).end < b.end) si += 1
      if (si < smalls.length && b.start <= smalls(si).start && b.end >= smalls(si).end) out += b
      bi += 1
    }
    out.result()
  }

  /** Small's intervals contained in at least one big interval. With a
    * proper big list, the first big whose end covers the small has the
    * least start among covering candidates — one probe decides
    * (`ContainedByIntervalsSource.combine`).
    */
  private def containedByFilter(smalls: Vector[Iv], bigs: Vector[Iv]): Vector[Iv] = {
    if (bigs.isEmpty) return Vector.empty
    val out = Vector.newBuilder[Iv]
    var bi = 0
    var si = 0
    while (si < smalls.length) {
      val s = smalls(si)
      while (bi < bigs.length && bigs(bi).end < s.end) bi += 1
      if (bi < bigs.length && bigs(bi).start <= s.start) out += s
      si += 1
    }
    out.result()
  }

  /** Enforce canonicity: drop duplicates and any interval that contains
    * another candidate. Sorted by (start asc, end desc), a backward
    * sweep keeps an interval iff its end is strictly below the minimum
    * end of every candidate with a start >= its own — exactly "no other
    * candidate is contained in it", and duplicates collapse to one.
    */
  private def minimalityFilter(ivs: Vector[Iv]): Vector[Iv] = {
    if (ivs.length <= 1) return ivs
    val arr = ivs.toArray.sortBy(iv => (iv.start, -iv.end))
    val keep = new Array[Boolean](arr.length)
    var minEnd = Int.MaxValue
    var i = arr.length - 1
    while (i >= 0) {
      if (arr(i).end < minEnd) { keep(i) = true; minEnd = arr(i).end }
      i -= 1
    }
    val out = Vector.newBuilder[Iv]
    var j = 0
    while (j < arr.length) { if (keep(j)) out += arr(j); j += 1 }
    out.result()
  }
}
