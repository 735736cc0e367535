package graft.util

/** Damerau-Levenshtein (optimal-string-alignment flavour: an adjacent
  * transposition costs 1 and its characters can't be edited again) —
  * the distance the reference's fuzzy matching uses by default
  * (`core/search/FuzzyQuery.java` `transpositions=true`,
  * `core/util/automaton/LevenshteinAutomata.java:31`). At maxEdits <= 1
  * OSA, full Damerau, and the Lucene automaton all agree, which is what
  * the oracle-checked catalog entries use.
  */
object EditDistance {

  /** OSA distance, capped: returns min(d(a,b), cap+1) with an early-exit
    * row-minimum check so dictionary scans stay O(|a|*|b|) worst case and
    * O(|a|*cap) typical.
    */
  def osa(a: String, b: String, cap: Int): Int = {
    if (a == b) return 0
    val n = a.length
    val m = b.length
    if (math.abs(n - m) > cap) return cap + 1
    var prev2: Array[Int] = null
    var prev = Array.tabulate(m + 1)(identity)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      cur(0) = i
      var rowMin = i
      var j = 1
      while (j <= m) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        var d = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), prev(j - 1) + cost)
        if (i > 1 && j > 1 && a.charAt(i - 1) == b.charAt(j - 2) &&
          a.charAt(i - 2) == b.charAt(j - 1)) {
          d = math.min(d, prev2(j - 2) + 1)
        }
        cur(j) = d
        if (d < rowMin) rowMin = d
        j += 1
      }
      if (rowMin > cap) return cap + 1
      val tmp = prev2
      prev2 = prev
      prev = cur
      cur = if (tmp == null) new Array[Int](m + 1) else tmp
      i += 1
    }
    math.min(prev(m), cap + 1)
  }
}
