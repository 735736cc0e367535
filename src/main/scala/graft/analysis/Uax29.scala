package graft.analysis

import scala.collection.mutable.ArrayBuffer
import java.lang.Character.{UnicodeScript => Script}

/** Full UAX#29 word segmentation, matching the reference's standard
  * tokenizer grammar (`core/analysis/standard/StandardTokenizerImpl.jflex`)
  * rule for rule:
  *
  *   - EMOJI: TR51 emoji_sequence — pictographic (with optional
  *     presentation selector / skin-tone modifier), ZWJ chains, keycaps,
  *     flag (regional-indicator) pairs, tag sequences
  *   - NUM: Numeric with MidNum/MidNumLet/SingleQuote joiners (WB8/11/12)
  *     and ExtendNumLet bridges (WB13a/b)
  *   - HANGUL / KATAKANA: script runs (typing split of the WORD rule)
  *   - ALPHANUM: the WORD rule — AHLetter/Numeric/Katakana chains with
  *     MidLetter/MidNumLet/quote joiners, Hebrew quote forms (WB5-13b)
  *   - SOUTHEAST_ASIAN: runs of Line_Break=Complex_Context scripts
  *   - IDEOGRAPHIC / HIRAGANA: single char (WB999 — one token per char)
  *
  * Every matched unit absorbs trailing Extend/Format/ZWJ chars (WB4); the
  * emoji rule's units absorb the same set minus the presentation selectors
  * FE0E/FE0F, which the grammar handles explicitly.
  *
  * Longest-match with the grammar's rule order on ties (so a pure digit
  * run types NUM, a pure Hangul run HANGUL, even though the WORD rule also
  * matches). The WORD rule is matched by an exact unit-level NFA rather
  * than greedy chaining — greedy fails on Hebrew quote forms ("א'א'" must
  * parse as two WB7a forms, longer than the greedy AHLetter chain).
  *
  * Character classes derive from JDK Unicode properties (Java 17 =
  * Unicode 13.0 vs the grammar's 12.1; drift is confined to codepoints
  * unassigned in 12.1). Word_Break classes not exposed by the JDK
  * (Extended_Pictographic, Emoji_Modifier_Base) are compact range tables
  * from the public Unicode 12 emoji-data.
  *
  * Over-long tokens are chopped at [[CodeAnalyzer.MaxTokenLength]] chars
  * and re-scanned, mirroring the reference's bounded scanner buffer
  * (`StandardTokenizer.java:86-89`: "Tokens larger than this will be
  * chopped up at this token length and emitted as multiple tokens").
  */
object Uax29 {
  // token types (jflex grammar order = tie-break priority after EMOJI)
  final val EMOJI = 0
  final val NUM = 1
  final val HANGUL = 2
  final val KATAKANA = 3
  final val ALPHANUM = 4
  final val SOUTHEAST_ASIAN = 5
  final val IDEOGRAPHIC = 6
  final val HIRAGANA = 7

  final case class RawToken(start: Int, end: Int, ttype: Int)

  // ---------------------------------------------------------------------
  // Word_Break character classes (UAX#29 / Unicode 12 derivations)
  // ---------------------------------------------------------------------

  @inline private def gc(cp: Int): Int = Character.getType(cp)

  /** WB:Extend = Grapheme_Extend + spacing marks + emoji modifiers:
    * gc Mn/Mc/Me, ZWNJ, and the Fitzpatrick skin tones (gc Sk).
    */
  @inline private[analysis] def isExtend(cp: Int): Boolean = {
    val t = gc(cp)
    t == Character.NON_SPACING_MARK || t == Character.COMBINING_SPACING_MARK ||
    t == Character.ENCLOSING_MARK || cp == 0x200C ||
    (cp >= 0x1F3FB && cp <= 0x1F3FF)
  }

  /** WB:Format = gc Cf minus ZWSP/ZWNJ/ZWJ. */
  @inline private[analysis] def isFormat(cp: Int): Boolean =
    gc(cp) == Character.FORMAT && cp != 0x200B && cp != 0x200C && cp != 0x200D

  @inline private def isZwj(cp: Int): Boolean = cp == 0x200D

  /** Line_Break=Complex_Context (SA): South-East-Asian script letters and
    * marks (digits/punctuation/currency of those scripts are not SA).
    */
  private val seaScripts: java.util.EnumSet[Script] = java.util.EnumSet.of(
    Script.THAI, Script.LAO, Script.MYANMAR, Script.KHMER,
    Script.TAI_LE, Script.NEW_TAI_LUE, Script.TAI_THAM, Script.TAI_VIET)

  private[analysis] def isComplexContext(cp: Int): Boolean =
    seaScripts.contains(Script.of(cp)) && (Character.isLetter(cp) || {
      val t = gc(cp)
      t == Character.NON_SPACING_MARK || t == Character.COMBINING_SPACING_MARK
    })

  /** WB:Katakana = script Katakana plus the shared kana marks the data
    * file lists explicitly (vertical repeats, voiced marks, prolonged
    * sound marks — script Common).
    */
  private[analysis] def isKatakana(cp: Int): Boolean =
    Script.of(cp) == Script.KATAKANA ||
      (cp >= 0x3031 && cp <= 0x3035) || cp == 0x309B || cp == 0x309C ||
      cp == 0x30A0 || cp == 0x30FC || cp == 0xFF70

  @inline private[analysis] def isHebrewLetter(cp: Int): Boolean =
    Character.isLetter(cp) && Script.of(cp) == Script.HEBREW

  /** WB:ALetter = Alphabetic (plus the listed gc Sk/Po modifier letters)
    * minus Ideographic, Katakana, Hiragana, SA scripts, Extend, and
    * Hebrew_Letter (the latter is split out for the quote rules; AHLetter
    * = ALetter + Hebrew_Letter).
    */
  private[analysis] def isALetter(cp: Int): Boolean = {
    val alpha = Character.isAlphabetic(cp) || cp == 0x05F3 ||
      (cp >= 0x02C2 && cp <= 0x02C5) || (cp >= 0x02D2 && cp <= 0x02D7) ||
      cp == 0x02DE || cp == 0x02DF || (cp >= 0x02E5 && cp <= 0x02EB) ||
      cp == 0x02ED || (cp >= 0x02EF && cp <= 0x02FF) ||
      (cp >= 0xA708 && cp <= 0xA716) || cp == 0xA720 || cp == 0xA721 ||
      cp == 0xA789 || cp == 0xA78A || cp == 0xAB5B
    if (!alpha) return false
    if (Character.isIdeographic(cp) || isExtend(cp) || isHebrewLetter(cp)) return false
    val s = Script.of(cp)
    s != Script.HIRAGANA && s != Script.KATAKANA && !isComplexContext(cp) &&
      !isKatakana(cp)
  }

  @inline private[analysis] def isAHLetter(cp: Int): Boolean =
    isALetter(cp) || isHebrewLetter(cp)

  /** WB:Numeric = gc Nd + U+066B ARABIC DECIMAL SEPARATOR. */
  @inline private[analysis] def isNumeric(cp: Int): Boolean =
    gc(cp) == Character.DECIMAL_DIGIT_NUMBER || cp == 0x066B

  @inline private def isMidLetterBase(cp: Int): Boolean = cp match {
    case 0x003A | 0x00B7 | 0x0387 | 0x055F | 0x05F4 | 0x2027 | 0xFE13 |
        0xFE55 | 0xFF1A => true
    case _ => false
  }

  @inline private def isMidNumBase(cp: Int): Boolean = cp match {
    case 0x002C | 0x003B | 0x037E | 0x0589 | 0x060C | 0x060D | 0x066C |
        0x07F8 | 0x2044 | 0xFE10 | 0xFE14 | 0xFE50 | 0xFE54 | 0xFF0C |
        0xFF1B => true
    case _ => false
  }

  @inline private def isMidNumLet(cp: Int): Boolean = cp match {
    case 0x002E | 0x2018 | 0x2019 | 0x2024 | 0xFE52 | 0xFF07 | 0xFF0E => true
    case _ => false
  }

  /** WB:ExtendNumLet = connector punctuation (incl. '_') + U+202F. */
  @inline private[analysis] def isExtendNumLet(cp: Int): Boolean =
    gc(cp) == Character.CONNECTOR_PUNCTUATION || cp == 0x202F

  @inline private def isHan(cp: Int): Boolean = Script.of(cp) == Script.HAN
  @inline private def isHiragana(cp: Int): Boolean = Script.of(cp) == Script.HIRAGANA
  @inline private def isHangulLetter(cp: Int): Boolean =
    Script.of(cp) == Script.HANGUL && Character.isLetter(cp)
  @inline private def isRegionalIndicator(cp: Int): Boolean =
    cp >= 0x1F1E6 && cp <= 0x1F1FF

  // ---------------------------------------------------------------------
  // Emoji property tables (public Unicode 12 emoji-data; the grammar's
  // EmojiChar reduces to Extended_Pictographic — every Emoji=Yes char
  // outside it is a keycap base or regional indicator, which the grammar
  // subtracts).
  // ---------------------------------------------------------------------

  /** Sorted [lo, hi] pairs, flattened. */
  private val extPict: Array[Int] = Array(
    0x00A9, 0x00A9, 0x00AE, 0x00AE, 0x203C, 0x203C, 0x2049, 0x2049,
    0x2122, 0x2122, 0x2139, 0x2139, 0x2194, 0x2199, 0x21A9, 0x21AA,
    0x231A, 0x231B, 0x2328, 0x2328, 0x2388, 0x2388, 0x23CF, 0x23CF,
    0x23E9, 0x23F3, 0x23F8, 0x23FA, 0x24C2, 0x24C2, 0x25AA, 0x25AB,
    0x25B6, 0x25B6, 0x25C0, 0x25C0, 0x25FB, 0x25FE, 0x2600, 0x2605,
    0x2607, 0x2612, 0x2614, 0x2685, 0x2690, 0x2705, 0x2708, 0x2712,
    0x2714, 0x2714, 0x2716, 0x2716, 0x271D, 0x271D, 0x2721, 0x2721,
    0x2728, 0x2728, 0x2733, 0x2734, 0x2744, 0x2744, 0x2747, 0x2747,
    0x274C, 0x274C, 0x274E, 0x274E, 0x2753, 0x2755, 0x2757, 0x2757,
    0x2763, 0x2767, 0x2795, 0x2797, 0x27A1, 0x27A1, 0x27B0, 0x27B0,
    0x27BF, 0x27BF, 0x2934, 0x2935, 0x2B05, 0x2B07, 0x2B1B, 0x2B1C,
    0x2B50, 0x2B50, 0x2B55, 0x2B55, 0x3030, 0x3030, 0x303D, 0x303D,
    0x3297, 0x3297, 0x3299, 0x3299,
    0x1F000, 0x1F0FF, 0x1F10D, 0x1F10F, 0x1F12F, 0x1F12F, 0x1F16C, 0x1F171,
    0x1F17E, 0x1F17F, 0x1F18E, 0x1F18E, 0x1F191, 0x1F19A, 0x1F1AD, 0x1F1E5,
    0x1F201, 0x1F20F, 0x1F21A, 0x1F21A, 0x1F22F, 0x1F22F, 0x1F232, 0x1F23A,
    0x1F23C, 0x1F23F, 0x1F249, 0x1F3FA, 0x1F400, 0x1F53D, 0x1F546, 0x1F64F,
    0x1F680, 0x1F6FF, 0x1F774, 0x1F77F, 0x1F7D5, 0x1F7FF, 0x1F80C, 0x1F80F,
    0x1F848, 0x1F84F, 0x1F85A, 0x1F85F, 0x1F888, 0x1F88F, 0x1F8AE, 0x1F8FF,
    0x1F90C, 0x1F93A, 0x1F93C, 0x1F945, 0x1F947, 0x1FAFF, 0x1FC00, 0x1FFFD)

  private val emojiModBase: Array[Int] = Array(
    0x261D, 0x261D, 0x26F9, 0x26F9, 0x270A, 0x270D, 0x1F385, 0x1F385,
    0x1F3C2, 0x1F3C4, 0x1F3C7, 0x1F3C7, 0x1F3CA, 0x1F3CC, 0x1F442, 0x1F443,
    0x1F446, 0x1F450, 0x1F466, 0x1F478, 0x1F47C, 0x1F47C, 0x1F481, 0x1F483,
    0x1F485, 0x1F487, 0x1F48F, 0x1F48F, 0x1F491, 0x1F491, 0x1F4AA, 0x1F4AA,
    0x1F574, 0x1F575, 0x1F57A, 0x1F57A, 0x1F590, 0x1F590, 0x1F595, 0x1F596,
    0x1F645, 0x1F647, 0x1F64B, 0x1F64F, 0x1F6A3, 0x1F6A3, 0x1F6B4, 0x1F6B6,
    0x1F6C0, 0x1F6C0, 0x1F6CC, 0x1F6CC, 0x1F90F, 0x1F90F, 0x1F918, 0x1F91F,
    0x1F926, 0x1F926, 0x1F930, 0x1F939, 0x1F93C, 0x1F93E, 0x1F9B5, 0x1F9B6,
    0x1F9B8, 0x1F9B9, 0x1F9BB, 0x1F9BB, 0x1F9CD, 0x1F9CF, 0x1F9D1, 0x1F9DD)

  private def inRanges(table: Array[Int], cp: Int): Boolean = {
    var lo = 0
    var hi = table.length / 2 - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (cp < table(2 * mid)) hi = mid - 1
      else if (cp > table(2 * mid + 1)) lo = mid + 1
      else return true
    }
    false
  }

  @inline private[analysis] def isExtPict(cp: Int): Boolean =
    cp >= 0x00A9 && inRanges(extPict, cp)
  @inline private def isEmojiModifier(cp: Int): Boolean =
    cp >= 0x1F3FB && cp <= 0x1F3FF
  @inline private def isEmojiModifierBase(cp: Int): Boolean =
    inRanges(emojiModBase, cp)
  @inline private def isKeyCapBase(cp: Int): Boolean =
    (cp >= '0' && cp <= '9') || cp == '#' || cp == '*'

  // ---------------------------------------------------------------------
  // WB4 absorption: every matched base char absorbs (Extend|Format|ZWJ)*.
  // The emoji rule's units absorb the same set minus FE0E/FE0F.
  // ---------------------------------------------------------------------

  private def absorb(s: String, from: Int, sansPresSel: Boolean): Int = {
    var j = from
    while (j < s.length) {
      val cp = s.codePointAt(j)
      val ok = (isExtend(cp) || isFormat(cp) || isZwj(cp)) &&
        !(sansPresSel && (cp == 0xFE0E || cp == 0xFE0F))
      if (!ok) return j
      j += Character.charCount(cp)
    }
    j
  }

  /** One base cp satisfying `pred` + WB4 absorption; end index or -1. */
  private def unit(s: String, i: Int, pred: Int => Boolean): Int = {
    if (i >= s.length) return -1
    val cp = s.codePointAt(i)
    if (!pred(cp)) -1 else absorb(s, i + Character.charCount(cp), sansPresSel = false)
  }

  // ---------------------------------------------------------------------
  // WORD rule — exact unit-level NFA (states as bit flags).
  //
  // WORD := conn* S (conn+ S)* conn*   with the chain-internal connector
  // bridges folded into the outer (conn+ S)* (same language), where
  //   S    := KataChain | Core+
  //   Core := Hebrew (SQ | DQ Hebrew) | NumChain | AHChain
  // ---------------------------------------------------------------------

  private final val Start = 1 // lead connectors; nothing matched yet
  private final val A = 2 // inside AHLetter chain, last unit a non-Hebrew letter
  private final val AHeb = 4 // inside AHLetter chain, last unit a Hebrew letter
  private final val N = 8 // inside Numeric chain
  private final val K = 16 // inside Katakana chain
  private final val AM = 32 // consumed a MidLetter/MidNumLet/SQ; need AHLetter
  private final val NM = 64 // consumed a MidNum/MidNumLet/SQ; need Numeric
  private final val AD = 128 // Hebrew + DoubleQuote; need Hebrew letter
  private final val Q = 256 // closed Hebrew quote form (WB7a/7c); Core boundary
  private final val B = 512 // consumed bridge/trailing connectors
  private final val Accepting = A | AHeb | N | K | Q | B

  /** Longest WORD-rule match from `i` (end char index), or -1. */
  private[analysis] def matchWord(s: String, i: Int): Int = {
    var frontier = Start
    var p = i
    var lastAccept = -1
    while (p < s.length && frontier != 0) {
      val cp = s.codePointAt(p)
      val e = absorb(s, p + Character.charCount(cp), sansPresSel = false)
      val heb = isHebrewLetter(cp)
      val ah = heb || isALetter(cp)
      val num = isNumeric(cp)
      val kata = isKatakana(cp)
      val conn = isExtendNumLet(cp)
      val sq = cp == 0x0027
      val dq = cp == 0x0022
      val midL = sq || isMidNumLet(cp) || isMidLetterBase(cp)
      val midN = sq || isMidNumLet(cp) || isMidNumBase(cp)
      val ahState = if (heb) AHeb else A
      var next = 0
      // Core/segment start: from lead conns, a closed Core, or a bridge
      if ((frontier & (Start | B)) != 0) {
        if (conn) next |= (if ((frontier & B) != 0) B else Start)
        if (ah) next |= ahState
        if (num) next |= N
        if (kata) next |= K
      }
      // Core boundary after a letter/number/quote-form unit (Core+ adjacency
      // WB8/9/10, or a connector bridge WB13a)
      if ((frontier & (A | AHeb | N | Q)) != 0) {
        if (ah) next |= ahState
        if (num) next |= N
        if (conn) next |= B
      }
      // AHLetter chain joiners (WB6/7); Hebrew quote forms (WB7a/7b/7c)
      if ((frontier & (A | AHeb)) != 0 && midL) next |= AM
      if ((frontier & AHeb) != 0) {
        if (sq) next |= Q
        if (dq) next |= AD
      }
      if ((frontier & AM) != 0 && ah) next |= ahState
      // Numeric chain joiners (WB11/12)
      if ((frontier & N) != 0 && midN) next |= NM
      if ((frontier & NM) != 0 && num) next |= N
      // Hebrew double-quote form close (WB7c) — the closing letter is not
      // chainable (the jflex form is closed), hence Q not AHeb
      if ((frontier & AD) != 0 && heb) next |= Q
      // Katakana chain (WB13); rejoin only via connector bridge
      if ((frontier & K) != 0) {
        if (kata) next |= K
        if (conn) next |= B
      }
      frontier = next
      if ((frontier & Accepting) != 0) lastAccept = e
      p = e
    }
    lastAccept
  }

  /** NUMERIC rule: conn* Num ((conn*|MidNum') Num)* conn*. */
  private def matchNumeric(s: String, i: Int): Int = {
    var frontier = Start
    var p = i
    var lastAccept = -1
    while (p < s.length && frontier != 0) {
      val cp = s.codePointAt(p)
      val e = absorb(s, p + Character.charCount(cp), sansPresSel = false)
      val num = isNumeric(cp)
      val conn = isExtendNumLet(cp)
      val midN = cp == 0x0027 || isMidNumLet(cp) || isMidNumBase(cp)
      var next = 0
      if ((frontier & Start) != 0 && conn) next |= Start
      if ((frontier & (Start | N | B | NM)) != 0 && num) next |= N
      if ((frontier & (N | B)) != 0 && conn) next |= B
      if ((frontier & N) != 0 && midN) next |= NM
      frontier = next
      if ((frontier & (N | B)) != 0) lastAccept = e
      p = e
    }
    lastAccept
  }

  /** Simple unit run: pred+ with WB4 absorption. */
  private def matchRun(s: String, i: Int, pred: Int => Boolean): Int = {
    var end = unit(s, i, pred)
    if (end < 0) return -1
    var nxt = unit(s, end, pred)
    while (nxt >= 0) { end = nxt; nxt = unit(s, end, pred) }
    end
  }

  // ---------------------------------------------------------------------
  // EMOJI rule (TR51 emoji_sequence)
  // ---------------------------------------------------------------------

  /** EmojiCharOrPresSeqOrModSeq:
    * (ZWJ* EmojiCharEx FE0F?) | ((ZWJ* EmojiModifierBaseEx)? EmojiModifierEx)
    */
  private def ecpsm(s: String, i: Int): Int = {
    var best = -1
    // common ZWJ* prefix
    var z = i
    while (z < s.length && s.codePointAt(z) == 0x200D) z += 1
    if (z < s.length) {
      val cp = s.codePointAt(z)
      if (isExtPict(cp)) {
        var e = absorb(s, z + Character.charCount(cp), sansPresSel = true)
        // optional modifier sequence: base + modifier (modifier is WB:Extend
        // but excluded from the sans-pres-sel absorption only for FE0E/FE0F,
        // so a skin tone right after the base is already absorbed above)
        if (e < s.length && s.codePointAt(e) == 0xFE0F) e += 1
        best = e
      }
      if (isEmojiModifierBase(cp)) {
        val afterBase = absorb(s, z + Character.charCount(cp), sansPresSel = true)
        if (afterBase < s.length && isEmojiModifier(s.codePointAt(afterBase))) {
          val e = absorb(s, afterBase + 2, sansPresSel = true) // modifiers are supplementary (2 chars)
          if (e > best) best = e
        }
      }
    }
    // modifier alone (no ZWJ prefix allowed when the optional group is absent)
    if (i < s.length && isEmojiModifier(s.codePointAt(i))) {
      val e = absorb(s, i + 2, sansPresSel = true)
      if (e > best) best = e
    }
    best
  }

  private def matchEmoji(s: String, i: Int): Int = {
    var best = -1
    // alt 1: ECPSM ((ZWJ ECPSM)* | TagSpec+ TagTerm)
    val e0 = ecpsm(s, i)
    if (e0 >= 0) {
      best = e0
      // ZWJ chain — the grammar's ( ZWJ ECPSM )*. The separator ZWJ is
      // usually already absorbed into the previous unit's WB4 tail
      // (ExtFmtZwjSansPresSel includes ZWJ), so continue when either the
      // next char is a ZWJ (reachable after an explicit FE0F) or the
      // absorbed glue ends with one; ecpsm's own ZWJ* prefix consumes any
      // leading joiners at the continuation point.
      var cur = e0
      var go = true
      while (go && cur < s.length &&
             (s.codePointAt(cur) == 0x200D || s.charAt(cur - 1) == '\u200D')) {
        val nxt = ecpsm(s, cur)
        if (nxt < 0) go = false
        else { cur = nxt; best = math.max(best, cur) }
      }
      // tag sequence
      var t = e0
      var tags = 0
      while (t < s.length && { val c = s.codePointAt(t); c >= 0xE0020 && c <= 0xE007E }) {
        t += 2; tags += 1
      }
      if (tags > 0 && t < s.length && s.codePointAt(t) == 0xE007F)
        best = math.max(best, t + 2)
    }
    // alt 2: keycap — KeyCapBaseEx FE0F? (U+20E3)Ex
    if (i < s.length && isKeyCapBase(s.codePointAt(i))) {
      var k = absorb(s, i + 1, sansPresSel = true)
      if (k < s.length && s.codePointAt(k) == 0xFE0F) k += 1
      if (k < s.length && s.codePointAt(k) == 0x20E3) {
        val e = absorb(s, k + 1, sansPresSel = true)
        if (e > best) best = e
      }
    }
    // alt 3: regional-indicator pair (exactly two)
    val r1 = unit(s, i, isRegionalIndicator)
    if (r1 >= 0) {
      val r2 = unit(s, r1, isRegionalIndicator)
      if (r2 > best) best = r2
    }
    best
  }

  // ---------------------------------------------------------------------
  // Scanner: longest match over all rules, grammar order on ties.
  // ---------------------------------------------------------------------

  def scan(text: String): ArrayBuffer[RawToken] = {
    val out = new ArrayBuffer[RawToken](math.min(64, text.length / 4 + 1))
    var i = 0
    val n = text.length
    while (i < n) {
      var bestEnd = -1
      var bestType = -1
      @inline def consider(end: Int, ttype: Int): Unit =
        if (end > bestEnd) { bestEnd = end; bestType = ttype }
      consider(matchEmoji(text, i), EMOJI)
      consider(matchNumeric(text, i), NUM)
      consider(matchRun(text, i, isHangulLetter), HANGUL)
      consider(matchRun(text, i, isKatakana), KATAKANA)
      consider(matchWord(text, i), ALPHANUM)
      consider(matchRun(text, i, isComplexContext), SOUTHEAST_ASIAN)
      consider(unit(text, i, isHan), IDEOGRAPHIC)
      consider(unit(text, i, isHiragana), HIRAGANA)
      if (bestEnd <= i) {
        i += Character.charCount(text.codePointAt(i)) // WB999: skip one cp
      } else {
        out += RawToken(i, bestEnd, bestType)
        i = bestEnd
      }
    }
    out
  }

  /** Analyzer chain = tokenizer + LowerCaseFilter (the reference's
    * StandardAnalyzer); over-long matches are chopped at MaxTokenLength
    * chars (on a codepoint boundary) and the remainder re-scanned, like
    * the reference's bounded scanner buffer.
    */
  def tokenize(text: String): Array[Token] = {
    if (text == null || text.isEmpty) return Array.empty
    val raw = scan(text)
    val out = new ArrayBuffer[Token](raw.length)
    var pos = 0
    var ri = 0
    while (ri < raw.length) {
      val t = raw(ri)
      if (t.end - t.start <= CodeAnalyzer.MaxTokenLength) {
        out += Token(text.substring(t.start, t.end).toLowerCase(java.util.Locale.ROOT), pos)
        pos += 1
        ri += 1
      } else {
        // chop: emit max-length window pieces of this over-long token
        var s = t.start
        while (s < t.end) {
          var e = math.min(s + CodeAnalyzer.MaxTokenLength, t.end)
          if (e < t.end && Character.isHighSurrogate(text.charAt(e - 1))) e -= 1
          out += Token(text.substring(s, e).toLowerCase(java.util.Locale.ROOT), pos)
          pos += 1
          s = e
        }
        ri += 1
      }
    }
    out.toArray
  }

  /** Token texts with types, for the differential specs. */
  def tokenizeTyped(text: String): Array[(String, Int)] =
    scan(text).map(t => (text.substring(t.start, t.end), t.ttype)).toArray
}
