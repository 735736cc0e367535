package graft.analysis

import scala.collection.mutable.ArrayBuffer

/** A token with its position (for phrase queries) and an optional
  * per-occurrence payload (the PAYLOADS IndexOptions lane,
  * `core/index/PostingsEnum.java`; attached by payload token filters —
  * see [[Payloads]]). Null payload = none; the default analyzers never
  * attach one.
  */
final case class Token(term: String, pos: Int, payload: Array[Byte] = null)

/** Payload-attaching token filters — the reference's
  * `analysis/common/.../payloads/` family re-expressed as pure
  * token-array transforms.
  */
object Payloads {

  /** `PayloadHelper.encodeFloat` (`analysis/common/.../payloads/
    * PayloadHelper.java:27-38`): big-endian 4-byte IEEE float.
    */
  def encodeFloat(f: Float): Array[Byte] = {
    val bits = java.lang.Float.floatToIntBits(f)
    Array[Byte]((bits >> 24).toByte, (bits >> 16).toByte, (bits >> 8).toByte, bits.toByte)
  }

  def decodeFloat(bytes: Array[Byte]): Float = {
    require(bytes != null && bytes.length >= 4, "float payload needs 4 bytes")
    java.lang.Float.intBitsToFloat(
      ((bytes(0) & 0xff) << 24) | ((bytes(1) & 0xff) << 16) |
        ((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff))
  }

  /** DelimitedPayloadTokenFilter (`analysis/common/.../payloads/
    * DelimitedPayloadTokenFilter.java:44-58`: text after the LAST
    * delimiter becomes the payload, the rest stays the term) with the
    * float encoder, over whitespace tokens — `"boost|2.5"` indexes term
    * `boost` with payload float 2.5; tokens without the delimiter (or
    * with an unparsable tail) pass through payload-less.
    */
  def delimitedFloat(tokens: Array[Token], delimiter: Char = '|'): Array[Token] =
    tokens.map { t =>
      val i = t.term.lastIndexOf(delimiter.toInt)
      if (i < 0) t
      else {
        val tail = t.term.substring(i + 1)
        try Token(t.term.substring(0, i), t.pos, encodeFloat(tail.toFloat))
        catch { case _: NumberFormatException => t }
      }
    }

  /** Token-length payload — a deterministic member of the
    * NumericPayloadTokenFilter family (`analysis/common/.../payloads/
    * NumericPayloadTokenFilter.java` attaches a constant float per
    * token; here the float is the term's length so per-occurrence
    * payloads vary and a cross-engine oracle can recompute them).
    */
  def lengthFloat(tokens: Array[Token]): Array[Token] =
    tokens.map(t => t.copy(payload = encodeFloat(t.term.length.toFloat)))
}

/** Word tokenizer + lowercase filter for source-code text.
  *
  * Semantics: maximal runs of `[A-Za-z0-9_]` plus any Unicode
  * letter/digit are tokens; everything else separates. Tokens longer than
  * [[CodeAnalyzer.MaxTokenLength]] are discarded — a documented divergence
  * from the reference tokenizer, which CHOPS over-long tokens at
  * maxTokenLength instead (`StandardTokenizer.java:86-89`); no fixture or
  * driver token exceeds 255 chars, and [[Uax29]] implements the faithful
  * chop. The analyzer chain matches `StandardAnalyzer.java:34` (tokenizer
  * + LowerCaseFilter, empty default stopset). On the ASCII alphabet used
  * by the fixtures and the driver's `documents` table this emits exactly
  * the reference's token stream (SURVEY.md §7.4.2); for full UAX#29
  * segmentation over general Unicode use [[Uax29.tokenize]] (analyzer
  * mode "uax29").
  *
  * Pure function `String => Array[Token]` so it can back either a typed
  * `flatMap` or a codegen'd Catalyst expression.
  */
object CodeAnalyzer {
  val MaxTokenLength = 255

  /** Default stop set of the "stop" analyzer mode (the fixtures' English
    * function words; the reference's StandardAnalyzer default stopset is
    * empty, StopFilter is opt-in).
    */
  val DefaultStops: Set[String] = Set("the", "a", "of", "to", "and")

  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_' ||
      (c > 127 && Character.isLetterOrDigit(c))

  /** Tokenize with positions. Position increments are 1 per kept token
    * (no stopwords by default, like StandardAnalyzer's empty stopset).
    */
  def tokenize(text: String): Array[Token] = {
    if (text == null || text.isEmpty) return Array.empty
    val out = new ArrayBuffer[Token](math.min(64, text.length / 4 + 1))
    var i = 0
    var pos = 0
    val n = text.length
    while (i < n) {
      while (i < n && !isWordChar(text.charAt(i))) i += 1
      val start = i
      while (i < n && isWordChar(text.charAt(i))) i += 1
      if (i > start) {
        val len = i - start
        if (len <= MaxTokenLength) {
          out += Token(text.substring(start, i).toLowerCase(java.util.Locale.ROOT), pos)
          pos += 1
        }
        // over-long tokens are dropped entirely (position not consumed),
        // mirroring the reference tokenizer skipping too-long terms
      }
    }
    out.toArray
  }

  /** Terms only, no positions (cheaper for inversion without phrases). */
  def terms(text: String): Array[String] = tokenize(text).map(_.term)

  /** Allocation-free streaming variant of [[tokenize]] (no Token objects,
    * no ArrayBuffer) for the inversion hot loop; emits the SAME
    * (term, position) stream. Returns the token count (= field length).
    */
  def foreachToken(text: String)(f: (String, Int) => Unit): Int = {
    if (text == null || text.isEmpty) return 0
    var i = 0
    var pos = 0
    val n = text.length
    while (i < n) {
      while (i < n && !isWordChar(text.charAt(i))) i += 1
      val start = i
      while (i < n && isWordChar(text.charAt(i))) i += 1
      if (i > start && i - start <= MaxTokenLength) {
        f(text.substring(start, i).toLowerCase(java.util.Locale.ROOT), pos)
        pos += 1
      }
    }
    pos
  }

  /** Sub-token ("word delimiter") analyzer for source code: word runs are
    * split at camelCase transitions, acronym boundaries, letter<->digit
    * transitions, and underscores; each part is emitted lowercased at its
    * OWN position (the GENERATE_WORD_PARTS + GENERATE_NUMBER_PARTS
    * configuration of the reference's WordDelimiterGraphFilter,
    * `lucene/analysis/common/.../miscellaneous/WordDelimiterGraphFilter.java:88`
    * — no PRESERVE_ORIGINAL / CATENATE, so the token stream is a plain
    * chain and norms count every part).
    *
    * `camelCaseName7` -> camel, case, name, 7; `ABCDef` -> abc, def;
    * `foo_bar2x` -> foo, bar, 2, x.
    */
  def subTokenize(text: String): Array[Token] = {
    if (text == null || text.isEmpty) return Array.empty
    val out = new ArrayBuffer[Token](math.min(64, text.length / 4 + 1))
    var i = 0
    var pos = 0
    val n = text.length
    @inline def isLower(c: Char) = Character.isLowerCase(c)
    @inline def isUpper(c: Char) = Character.isUpperCase(c)
    @inline def isLetter(c: Char) = Character.isLetter(c)
    @inline def isDigit(c: Char) = Character.isDigit(c)
    while (i < n) {
      while (i < n && !isWordChar(text.charAt(i))) i += 1
      val start = i
      while (i < n && isWordChar(text.charAt(i))) i += 1
      if (i > start) {
        // split the run [start, i) into parts
        var s = start
        while (s < i) {
          while (s < i && text.charAt(s) == '_') s += 1
          if (s < i) {
            var e = s + 1
            var break = false
            while (e < i && !break) {
              val prev = text.charAt(e - 1)
              val cur = text.charAt(e)
              val boundary =
                cur == '_' ||
                  (isLower(prev) && isUpper(cur)) ||
                  (isUpper(prev) && isUpper(cur) && e + 1 < i && isLower(text.charAt(e + 1))) ||
                  (isLetter(prev) && isDigit(cur)) ||
                  (isDigit(prev) && isLetter(cur))
              if (boundary) break = true else e += 1
            }
            val len = e - s
            if (len <= MaxTokenLength) {
              out += Token(text.substring(s, e).toLowerCase(java.util.Locale.ROOT), pos)
              pos += 1
            }
            s = e
          }
        }
      }
    }
    out.toArray
  }

  /** Token count = field length that feeds the norm byte
    * (`core/index/FieldInvertState.java:75-76`).
    */
  def tokenCount(text: String): Int = tokenize(text).length

  /** Position-preserving stop filter (`core/analysis/StopFilter.java:25`):
    * stopwords are dropped but consume their position increment, so
    * phrases never spuriously match across a removed stopword. Field
    * length (norms) counts only emitted tokens, like the reference's
    * inverter, which never sees the stopped tokens.
    */
  def tokenizeStops(text: String, stops: Set[String]): Array[Token] =
    tokenize(text).filter(t => !stops.contains(t.term))

  /** Whitespace tokenizer — splits on whitespace only
    * (`lucene/analysis/common/.../core/WhitespaceTokenizer.java:31`);
    * lowercased like our default chain.
    */
  def whitespaceTokenize(text: String): Array[Token] = {
    if (text == null || text.isEmpty) return Array.empty
    text.split("\\s+").iterator.filter(_.nonEmpty)
      .filter(_.length <= MaxTokenLength)
      .zipWithIndex
      .map { case (w, i) => Token(w.toLowerCase(java.util.Locale.ROOT), i) }
      .toArray
  }

  /** Letter tokenizer — maximal letter runs
    * (`lucene/analysis/common/.../core/LetterTokenizer.java:31`).
    */
  def letterTokenize(text: String): Array[Token] = {
    if (text == null || text.isEmpty) return Array.empty
    val out = new ArrayBuffer[Token]
    var i = 0
    var pos = 0
    val n = text.length
    while (i < n) {
      while (i < n && !Character.isLetter(text.charAt(i))) i += 1
      val start = i
      while (i < n && Character.isLetter(text.charAt(i))) i += 1
      if (i > start && i - start <= MaxTokenLength) {
        out += Token(text.substring(start, i).toLowerCase(java.util.Locale.ROOT), pos)
        pos += 1
      }
    }
    out.toArray
  }

  /** Keyword tokenizer — the whole input as one token
    * (`lucene/analysis/common/.../core/KeywordTokenizer.java:28`).
    */
  def keywordTokenize(text: String): Array[Token] =
    if (text == null || text.isEmpty) Array.empty
    else Array(Token(text.toLowerCase(java.util.Locale.ROOT), 0))

  /** Adjacent-token n-grams joined by ' ' — the shingle combinator shared
    * by [[shingleTokenize]] (the ShingleFilter analyzer mode) and the
    * dedup pipeline's minhash shingling, so analyzer and pipeline have ONE
    * implementation.
    */
  def shingles(terms: IndexedSeq[String], n: Int): Array[String] = {
    val count = terms.length - n + 1
    if (count <= 0) return Array.empty
    Array.tabulate(count)(i => terms.slice(i, i + n).mkString(" "))
  }

  /** Shingle analyzer (`lucene/analysis/common/.../shingle/ShingleFilter.java:42`
    * defaults: min=max=2, separator " ", outputUnigrams): each unigram at
    * its own position, plus every shingle of `minShingle..maxShingle`
    * adjacent tokens at the position of its FIRST token (the reference
    * emits shingles with posIncrement 0 after the unigram).
    */
  def shingleTokenize(text: String, minShingle: Int = 2, maxShingle: Int = 2,
      outputUnigrams: Boolean = true): Array[Token] = {
    val ts = tokenize(text)
    if (ts.isEmpty) return ts
    val out = new ArrayBuffer[Token](ts.length * 2)
    var i = 0
    while (i < ts.length) {
      if (outputUnigrams) out += ts(i)
      var n = minShingle
      while (n <= maxShingle) {
        if (i + n <= ts.length) {
          val sb = new java.lang.StringBuilder
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(ts(i + j).term)
            j += 1
          }
          out += Token(sb.toString, ts(i).pos)
        }
        n += 1
      }
      i += 1
    }
    out.toArray
  }

  /** Character n-gram tokenizer
    * (`lucene/analysis/common/.../ngram/NGramTokenizer.java:62` semantics
    * over lowercased word runs — our isTokenChar is the word alphabet):
    * for each start offset inside a word run, grams of `minGram..maxGram`
    * chars, start-major / size-minor, each consuming one position. Runs
    * shorter than `minGram` emit nothing, like the reference.
    */
  def ngramTokenize(text: String, minGram: Int = 3, maxGram: Int = 3): Array[Token] = {
    val words = tokenize(text)
    val out = new ArrayBuffer[Token](words.length * 4)
    var pos = 0
    words.foreach { w =>
      val s = w.term
      var i = 0
      while (i < s.length) {
        var g = minGram
        while (g <= maxGram && i + g <= s.length) {
          out += Token(s.substring(i, i + g), pos)
          pos += 1
          g += 1
        }
        i += 1
      }
    }
    out.toArray
  }

  /** ASCII folding
    * (`lucene/analysis/common/.../miscellaneous/ASCIIFoldingFilter.java:74`):
    * the Latin-1 supplement is mapped by explicit table (including the
    * non-decomposable Ø/Æ/Þ/ß cases); everything else >127 folds via
    * Unicode NFD decomposition with combining marks stripped — which
    * covers ALL precomposed letter-with-diacritic forms (Latin
    * Extended-A/B, Vietnamese, etc.) that dominate the reference's
    * generated table — plus explicit entries for the non-decomposable
    * Extended-A multigraphs (Đ, Ħ, ı, Ĳ, ĸ, Ł, Œ, Ŧ, ſ). Characters
    * with no ASCII fold pass through unchanged (same as the reference
    * for unlisted codepoints).
    */
  def foldAscii(s: String): String = {
    var needs = false
    var i = 0
    while (i < s.length && !needs) { if (s.charAt(i) > 127) needs = true; i += 1 }
    if (!needs) return s
    val sb = new java.lang.StringBuilder(s.length)
    s.foreach { c =>
      val f = c match {
        // non-decomposable Latin Extended-A (+ a few B) multigraphs
        case 'Đ' => "D"; case 'đ' => "d"
        case 'Ħ' => "H"; case 'ħ' => "h"
        case 'ı' => "i"
        case 'Ĳ' => "IJ"; case 'ĳ' => "ij"
        case 'ĸ' => "q" // kra (ASCIIFoldingFilter maps to q)
        case 'Ł' => "L"; case 'ł' => "l"
        case 'Ŀ' => "L"; case 'ŀ' => "l"
        case 'Œ' => "OE"; case 'œ' => "oe"
        case 'Ŧ' => "T"; case 'ŧ' => "t"
        case 'ſ' => "s"
        case c if "ÀÁÂÃÄÅ".indexOf(c) >= 0 => "A"
        case 'Æ' => "AE"
        case 'Ç' => "C"
        case c if "ÈÉÊË".indexOf(c) >= 0 => "E"
        case c if "ÌÍÎÏ".indexOf(c) >= 0 => "I"
        case 'Ð' => "D"
        case 'Ñ' => "N"
        case c if "ÒÓÔÕÖØ".indexOf(c) >= 0 => "O"
        case c if "ÙÚÛÜ".indexOf(c) >= 0 => "U"
        case 'Ý' => "Y"
        case 'Þ' => "TH"
        case 'ß' => "ss"
        case c if "àáâãäå".indexOf(c) >= 0 => "a"
        case 'æ' => "ae"
        case 'ç' => "c"
        case c if "èéêë".indexOf(c) >= 0 => "e"
        case c if "ìíîï".indexOf(c) >= 0 => "i"
        case 'ð' => "d"
        case 'ñ' => "n"
        case c if "òóôõöø".indexOf(c) >= 0 => "o"
        case c if "ùúûü".indexOf(c) >= 0 => "u"
        case c if "ýÿ".indexOf(c) >= 0 => "y"
        case 'þ' => "th"
        case other if other > 127 =>
          // NFD: base letter + combining marks; strip the marks
          val d = java.text.Normalizer.normalize(other.toString, java.text.Normalizer.Form.NFD)
          val stripped = d.filter(ch => Character.getType(ch) != Character.NON_SPACING_MARK)
          if (stripped.nonEmpty && stripped.forall(_ < 128)) stripped
          else other.toString
        case other => other.toString
      }
      sb.append(f)
    }
    sb.toString
  }
}
