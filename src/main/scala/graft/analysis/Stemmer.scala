package graft.analysis

/** Stemmers (English Porter + minimal; French + German minimal).
  *
  * [[porter]] — the classic Porter algorithm (M.F. Porter, "An algorithm
  * for suffix stripping", Program 14(3), 1980), the algorithm behind the
  * reference's `analysis/common/.../en/PorterStemFilter.java:51`.
  * Implemented from the published algorithm: per step, the longest listed
  * suffix that matches is selected and its condition tested; a failed
  * condition BLOCKS the step (no shorter suffix is retried) — the
  * behavior the paper illustrates with rational -> rational in step 2.
  *
  * [[englishMinimal]] — the minimal plural stemmer
  * (`analysis/common/.../en/EnglishMinimalStemFilter.java`; Savoy/Harman
  * "s-stemmer" family): strips a trailing plural 's' with guards, maps
  * "...ies" to "...y". Simple enough to mirror textually in ANSI SQL for
  * the DuckDB oracle.
  */
object Stemmer {

  /** Minimal English plural stemmer — same decision table as the
    * reference's EnglishMinimalStemmer: words shorter than 3 chars or not
    * ending in 's' pass through; "us"/"ss" endings pass through; "Cies"
    * (C not a/e) becomes "Cy"; vowel+"es" passes through except the ies
    * case; anything else drops the final 's'.
    */
  def englishMinimal(w: String): String = {
    val len = w.length
    if (len < 3 || w.charAt(len - 1) != 's') return w
    w.charAt(len - 2) match {
      case 'u' | 's' => w
      case 'e' =>
        if (len > 3 && w.charAt(len - 3) == 'i' &&
            w.charAt(len - 4) != 'a' && w.charAt(len - 4) != 'e')
          w.substring(0, len - 3) + "y"
        else if ("iaoe".indexOf(w.charAt(len - 3)) >= 0) w
        else w.substring(0, len - 1)
      case _ => w.substring(0, len - 1)
    }
  }

  /** Minimal French stemmer (Jacques Savoy, "A stemming procedure and
    * stopword list for general French corpora", JASIS 50(10), 1999 —
    * the algorithm behind the reference's
    * `analysis/common/.../fr/FrenchMinimalStemFilter.java`): words
    * shorter than 6 chars pass through; a final 'x' is dropped with
    * `-aux` becoming `-al` (chevaux -> cheval); otherwise one each of a
    * final s, r, e, é is stripped in that order, then a final doubled
    * letter is singled (appelle -> appel).
    */
  def frenchMinimal(w: String): String = {
    if (w.length < 6) return w
    var len = w.length
    if (w.charAt(len - 1) == 'x')
      return if (w.charAt(len - 3) == 'a' && w.charAt(len - 2) == 'u')
        w.substring(0, len - 2) + "l"
      else w.substring(0, len - 1)
    if (w.charAt(len - 1) == 's') len -= 1
    if (w.charAt(len - 1) == 'r') len -= 1
    if (w.charAt(len - 1) == 'e') len -= 1
    if (w.charAt(len - 1) == 'é') len -= 1
    if (w.charAt(len - 1) == w.charAt(len - 2) && Character.isLetter(w.charAt(len - 1)))
      len -= 1
    w.substring(0, len)
  }

  /** Minimal German stemmer (Jacques Savoy, "Morphologie et recherche
    * d'information" — the reference's
    * `analysis/common/.../de/GermanMinimalStemmer.java`): words shorter
    * than 5 chars pass through untouched; otherwise umlauts fold
    * (ä->a, ö->o, ü->u), then ONE plural/case suffix strips — `-nen`
    * when longer than 6 (scannen -> scan), `-en`/`-se`/`-es`/`-er` when
    * longer than 5, else a single final n/e/s/r.
    */
  def germanMinimal(w: String): String = {
    if (w.length < 5) return w
    val b = w.map {
      case 'ä' => 'a'
      case 'ö' => 'o'
      case 'ü' => 'u'
      case c => c
    }
    val len = b.length
    val last = b.charAt(len - 1)
    val prev = b.charAt(len - 2)
    if (len > 6 && last == 'n' && prev == 'e' && b.charAt(len - 3) == 'n')
      b.substring(0, len - 3)
    else if (len > 5 &&
        ((last == 'n' && prev == 'e') || (last == 'e' && prev == 's') ||
         (last == 's' && prev == 'e') || (last == 'r' && prev == 'e')))
      b.substring(0, len - 2)
    else if (last == 'n' || last == 'e' || last == 's' || last == 'r')
      b.substring(0, len - 1)
    else b
  }

  /** German normalization (the Snowball *german2* variant folding, the
    * reference's `analysis/common/.../de/GermanNormalizationFilter.java`
    * three-state machine): ß -> ss; ä/ö/ü -> a/o/u; an 'e' directly
    * following an umlaut-state a/o/u is deleted (ae -> a, oe -> o,
    * ue -> u) unless the u was itself preceded by a vowel or q
    * ("bauer", "quelle" keep their e — the V state blocks deletion).
    */
  def germanNormalize(w: String): String = {
    val out = new java.lang.StringBuilder(w.length + 2)
    var state = 0 // 0 = ordinary, 1 = V (blocks u), 2 = U (allows e-deletion)
    var i = 0
    while (i < w.length) {
      w.charAt(i) match {
        case c @ ('a' | 'o') => out.append(c); state = 2
        case 'u' => out.append('u'); state = if (state == 0) 2 else 1
        case 'e' => if (state != 2) out.append('e'); state = 1
        case c @ ('i' | 'q' | 'y') => out.append(c); state = 1
        case 'ä' => out.append('a'); state = 1
        case 'ö' => out.append('o'); state = 1
        case 'ü' => out.append('u'); state = 1
        case 'ß' => out.append("ss"); state = 0
        case c => out.append(c); state = 0
      }
      i += 1
    }
    out.toString
  }

  def porter(w: String): String = {
    if (w.length <= 2) return w
    val st = new P(w)
    st.step1ab(); st.step1c(); st.step2(); st.step3(); st.step4(); st.step5()
    st.result
  }

  /** Working buffer + the paper's conditions: consonant test (y is a
    * vowel iff preceded by a consonant), measure m = number of VC runs,
    * *v* (contains a vowel), *d (double consonant), *o (cvc where the
    * final c is not w, x or y).
    */
  private final class P(w: String) {
    private val b = new java.lang.StringBuilder(w)
    def result: String = b.toString

    private def cons(i: Int): Boolean = b.charAt(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' => i == 0 || !cons(i - 1)
      case _ => true
    }
    /** Measure of b[0..end]. */
    private def m(end: Int): Int = {
      var i = 0
      var n = 0
      while (i <= end && cons(i)) i += 1
      while (i <= end) {
        while (i <= end && !cons(i)) i += 1
        if (i > end) return n
        n += 1
        while (i <= end && cons(i)) i += 1
      }
      n
    }
    private def hasVowel(end: Int): Boolean = {
      var i = 0
      while (i <= end) { if (!cons(i)) return true; i += 1 }
      false
    }
    private def dbl(end: Int): Boolean =
      end >= 1 && b.charAt(end) == b.charAt(end - 1) && cons(end)
    private def cvc(end: Int): Boolean =
      end >= 2 && cons(end) && !cons(end - 1) && cons(end - 2) && {
        val c = b.charAt(end); c != 'w' && c != 'x' && c != 'y'
      }
    private def ends(s: String): Boolean = {
      val n = b.length - s.length
      if (n < 0) return false
      var i = 0
      while (i < s.length) { if (b.charAt(n + i) != s.charAt(i)) return false; i += 1 }
      true
    }
    private def trunc(k: Int): Unit = b.setLength(b.length - k)
    private def setTo(sufLen: Int, repl: String): Unit = { trunc(sufLen); b.append(repl) }

    def step1ab(): Unit = {
      // 1a: plural forms
      if (ends("sses")) trunc(2)
      else if (ends("ies")) trunc(2)
      else if (!ends("ss") && ends("s")) trunc(1)
      // 1b: -eed / -ed / -ing
      var cleanup = false
      if (ends("eed")) { if (m(b.length - 4) > 0) trunc(1) }
      else if (ends("ed") && hasVowel(b.length - 3)) { trunc(2); cleanup = true }
      else if (ends("ing") && hasVowel(b.length - 4)) { trunc(3); cleanup = true }
      if (cleanup) {
        if (ends("at") || ends("bl") || ends("iz")) b.append('e')
        else if (dbl(b.length - 1) && "lsz".indexOf(b.charAt(b.length - 1)) < 0) trunc(1)
        else if (m(b.length - 1) == 1 && cvc(b.length - 1)) b.append('e')
      }
    }

    def step1c(): Unit =
      if (ends("y") && hasVowel(b.length - 2)) b.setCharAt(b.length - 1, 'i')

    /** One (suffix -> replacement) table per step; longest matching
      * suffix wins and blocks the step whether or not its m-condition
      * holds (the porter.c switch-and-break structure).
      */
    private def applyTable(table: Seq[(String, String)], minM: Int,
        extra: Int => Boolean = _ => true): Unit = {
      val hit = table.iterator.filter(e => ends(e._1)).reduceOption(
        (a, c) => if (c._1.length > a._1.length) c else a)
      hit.foreach { case (suf, repl) =>
        val stemEnd = b.length - suf.length - 1
        if (m(stemEnd) >= minM && extra(stemEnd)) setTo(suf.length, repl)
      }
    }

    def step2(): Unit = applyTable(Seq(
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
      "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
      "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
      "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
      "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble"
    ), minM = 1)

    def step3(): Unit = applyTable(Seq(
      "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
      "ical" -> "ic", "ful" -> "", "ness" -> ""
    ), minM = 1)

    def step4(): Unit = applyTable(Seq(
      "al" -> "", "ance" -> "", "ence" -> "", "er" -> "", "ic" -> "",
      "able" -> "", "ible" -> "", "ant" -> "", "ement" -> "", "ment" -> "",
      "ent" -> "", "ion" -> "", "ou" -> "", "ism" -> "", "ate" -> "",
      "iti" -> "", "ous" -> "", "ive" -> "", "ize" -> ""
    ), minM = 2, extra = stemEnd => !ends("ion") || {
      val c = b.charAt(stemEnd); c == 's' || c == 't'
    })

    def step5(): Unit = {
      // 5a: drop a final e when m > 1, or m == 1 and not *o
      if (ends("e")) {
        val a = m(b.length - 2)
        if (a > 1 || (a == 1 && !cvc(b.length - 2))) trunc(1)
      }
      // 5b: -ll -> -l when m > 1
      if (m(b.length - 1) > 1 && dbl(b.length - 1) && b.charAt(b.length - 1) == 'l')
        trunc(1)
    }
  }
}
