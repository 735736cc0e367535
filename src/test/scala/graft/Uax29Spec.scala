package graft

import graft.analysis.{CodeAnalyzer, Uax29}
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Golden segmentation cases mirroring the reference's standard-tokenizer
  * test suite (`core/src/test/org/apache/lucene/analysis/standard/
  * TestStandardAnalyzer.java`) — UAX#29 word boundaries, the TR51
  * emoji_sequence rule, script typing, combining-mark absorption — plus a
  * differential property against the fixture-alphabet [[CodeAnalyzer]] and
  * the reference's max-token-length chop semantics
  * (`StandardTokenizer.java:86-89`).
  */
class Uax29Spec extends AnyFunSuite {

  private def terms(s: String): Seq[String] = Uax29.tokenizeTyped(s).map(_._1).toSeq
  private def types(s: String): Seq[Int] = Uax29.tokenizeTyped(s).map(_._2).toSeq
  import Uax29.{ALPHANUM, EMOJI, HANGUL, HIRAGANA, IDEOGRAPHIC, KATAKANA, NUM, SOUTHEAST_ASIAN}

  test("alphanumeric / delimiters / apostrophes (TestStandardAnalyzer.java:393-416)") {
    assert(terms("B2B") == Seq("B2B"))
    assert(terms("2B") == Seq("2B"))
    assert(terms("some-dashed-phrase") == Seq("some", "dashed", "phrase"))
    assert(terms("dogs,chase,cats") == Seq("dogs", "chase", "cats"))
    assert(terms("ac/dc") == Seq("ac", "dc"))
    assert(terms("O'Reilly") == Seq("O'Reilly"))
    assert(terms("you're") == Seq("you're"))
    assert(terms("she's") == Seq("she's"))
    assert(terms("don't") == Seq("don't"))
    assert(terms("O'Reilly's") == Seq("O'Reilly's"))
  }

  test("numeric forms (TestStandardAnalyzer.java:418-431)") {
    assert(terms("21.35") == Seq("21.35"))
    assert(terms("R2D2 C3PO") == Seq("R2D2", "C3PO"))
    assert(terms("216.239.63.104") == Seq("216.239.63.104"))
    assert(terms("David has 5000 bones") == Seq("David", "has", "5000", "bones"))
    assert(types("David has 5000 bones") == Seq(ALPHANUM, ALPHANUM, NUM, ALPHANUM))
  }

  test("empty / separator-only inputs (TestStandardAnalyzer.java:375-380)") {
    assert(terms("") == Seq())
    assert(terms(".") == Seq())
    assert(terms(" ") == Seq())
    assert(terms("\"QUOTED\" word") == Seq("QUOTED", "word"))
  }

  test("mid-letter / mid-num / extend-num-let rules (TestStandardAnalyzer.java:510-555)") {
    assert(terms("A:B") == Seq("A:B"))
    assert(terms("A::B") == Seq("A", "B"))
    assert(terms("1.2") == Seq("1.2"))
    assert(terms("A.B") == Seq("A.B"))
    assert(terms("1..2") == Seq("1", "2"))
    assert(terms("A..B") == Seq("A", "B"))
    assert(terms("1,2") == Seq("1,2"))
    assert(terms("1,,2") == Seq("1", "2"))
    assert(terms("A.:B") == Seq("A", "B"))
    assert(terms("A:.B") == Seq("A", "B"))
    assert(terms("1,.2") == Seq("1", "2"))
    assert(terms("1.,2") == Seq("1", "2"))
    assert(terms("A:B_A:B") == Seq("A:B_A:B"))
    assert(terms("A:B_A::B") == Seq("A:B_A", "B"))
    assert(terms("1.2_1.2") == Seq("1.2_1.2"))
    assert(terms("A.B_A.B") == Seq("A.B_A.B"))
    assert(terms("1.2_1..2") == Seq("1.2_1", "2"))
    assert(terms("A.B_A..B") == Seq("A.B_A", "B"))
    assert(terms("1,2_1,2") == Seq("1,2_1,2"))
    assert(terms("1,2_1,,2") == Seq("1,2_1", "2"))
    assert(terms("C_A.:B") == Seq("C_A", "B"))
    assert(terms("C_A:.B") == Seq("C_A", "B"))
    assert(terms("3_1,.2") == Seq("3_1", "2"))
    assert(terms("3_1.,2") == Seq("3_1", "2"))
  }

  test("combining marks are absorbed, LUCENE-1545 (TestStandardAnalyzer.java:383,499)") {
    assert(terms("mo\u0364chte") == Seq("mo\u0364chte"))
    assert(terms("\u3055\u3099") == Seq("\u3055\u3099")) // hiragana + voiced mark
    assert(terms("\u30B5\u3099") == Seq("\u30B5\u3099")) // katakana + voiced mark
    assert(terms("\u58F9\u3099") == Seq("\u58F9\u3099")) // ideograph + voiced mark
    assert(terms("\uC544\u3099") == Seq("\uC544\u3099")) // hangul + voiced mark
  }

  test("Armenian (TestStandardAnalyzer.java:148)") {
    val text = "Վիքիպեդիայի 13 " +
      "միլիոն հոդվածները " +
      "(4,600` հայերեն " +
      "վիքիպեդիայում) " +
      "գրվել են կայքը։"
    assert(terms(text) == Seq(
      "Վիքիպեդիայի", "13",
      "միլիոն", "հոդվածները",
      "4,600", "հայերեն",
      "վիքիպեդիայում",
      "գրվել", "են", "կայքը"))
  }

  test("Thai / Lao SE-Asian runs (TestStandardAnalyzer.java:342-355)") {
    assert(terms("การที่ได้ต้องแสดงว่างานดี. แล้วเธอจะไปไหน? ๑๒๓๔") == Seq(
      "การที่ได้ต้องแสดงว่างานดี",
      "แล้วเธอจะไปไหน",
      "๑๒๓๔"))
    assert(types("การ ๑๒") == Seq(SOUTHEAST_ASIAN, NUM))
    assert(terms("ສາທາລະນະລັດ ປະຊາທິປະໄຕ ປະຊາຊົນລາວ") == Seq(
      "ສາທາລະນະລັດ",
      "ປະຊາທິປະໄຕ",
      "ປະຊາຊົນລາວ"))
  }

  test("Tibetan splits on tsheg (TestStandardAnalyzer.java:356)") {
    assert(terms("སྣོན་མཛོད་དང་ཧ་ཅང་སོ། །") == Seq(
      "སྣོན", "མཛོད", "དང",
      "ཧ", "ཅང", "སོ"))
  }

  test("CJK: ideographs per-char, kana runs, hangul runs (TestStandardAnalyzer.java:370,443,484,489)") {
    assert(terms("我是中国人。 １２３４ Ｔｅｓｔｓ ") == Seq(
      "我", "是", "中", "国", "人", "１２３４", "Ｔｅｓｔｓ"))
    assert(terms("안녕하세요 한글입니다") == Seq(
      "안녕하세요", "한글입니다"))
    assert(Uax29.tokenizeTyped("훈민정음").toSeq == Seq(("훈민정음", HANGUL)))
    assert(Uax29.tokenizeTyped("仮名遣い カタカナ").toSeq == Seq(
      ("仮", IDEOGRAPHIC), ("名", IDEOGRAPHIC), ("遣", IDEOGRAPHIC),
      ("い", HIRAGANA), ("カタカナ", KATAKANA)))
    // supplementary-plane ideograph (surrogate pair)
    assert(terms("𩬅艱鍟") == Seq("𩬅", "艱", "鍟"))
    assert(types("𩬅艱鍟") == Seq(IDEOGRAPHIC, IDEOGRAPHIC, IDEOGRAPHIC))
  }

  test("Hebrew single/double-quote forms (UAX#29 WB7a-7c)") {
    assert(terms("א'") == Seq("א'"))
    assert(terms("א\"א") == Seq("א\"א"))
    assert(terms("א\"") == Seq("א")) // unclosed double quote splits
    assert(terms("א'א'") == Seq("א'א'")) // two WB7a forms chain
  }

  test("emoji: simple, ZWJ sequences, modifiers, flags (TestStandardAnalyzer.java:557-583)") {
    val poo = "\uD83D\uDCA9"
    assert(Uax29.tokenizeTyped(s"$poo $poo$poo").toSeq == Seq(
      (poo, EMOJI), (poo, EMOJI), (poo, EMOJI)))
    // woman ZWJ heart FE0F ZWJ woman is ONE token
    val wcw = "\uD83D\uDC69\u200D\u2764\uFE0F\u200D\uD83D\uDC69"
    assert(Uax29.tokenizeTyped(wcw).toSeq == Seq((wcw, EMOJI)))
    // man + skin tone + ZWJ + staff-of-aesculapius + FE0F
    val health = "\uD83D\uDC68\uD83C\uDFFC\u200D\u2695\uFE0F"
    assert(Uax29.tokenizeTyped(health).toSeq == Seq((health, EMOJI)))
    // regional-indicator pairs: two flags, not one four-char token
    val us = "\uD83C\uDDFA\uD83C\uDDF8"
    assert(Uax29.tokenizeTyped(us + us).toSeq == Seq((us, EMOJI), (us, EMOJI)))
  }

  test("emoji: keycaps, presentation selectors, tag sequences (TestStandardAnalyzer.java:584-637)") {
    assert(Uax29.tokenizeTyped("#\uFE0F\u20E3").toSeq == Seq(("#\uFE0F\u20E3", EMOJI)))
    assert(Uax29.tokenizeTyped("3\uFE0F\u20E3").toSeq == Seq(("3\uFE0F\u20E3", EMOJI)))
    assert(terms("#\uFE0E") == Seq()) // text presentation: not emoji, not a word
    assert(Uax29.tokenizeTyped("3\uFE0E").toSeq == Seq(("3\uFE0E", NUM))) // FE0E is WB:Extend
    assert(Uax29.tokenizeTyped("\u2B55\uFE0E").toSeq == Seq(("\u2B55", EMOJI)))
    assert(Uax29.tokenizeTyped("\u2B55\uFE0E\u200D\u2B55\uFE0E").toSeq == Seq(
      ("\u2B55", EMOJI), ("\u200D\u2B55", EMOJI)))
    // flag of England: black flag + tag letters (gbeng) + tag term
    val tagSeq = "\uD83C\uDFF4\uDB40\uDC67\uDB40\uDC62\uDB40\uDC65\uDB40\uDC6E\uDB40\uDC67\uDB40\uDC7F"
    assert(Uax29.tokenizeTyped(tagSeq).toSeq == Seq((tagSeq, EMOJI)))
  }

  test("emoji interleaved with words and ideographs (TestStandardAnalyzer.java:623-637)") {
    val poo = "\uD83D\uDCA9"
    assert(Uax29.tokenizeTyped(s"poo${poo}poo").toSeq == Seq(
      ("poo", ALPHANUM), (poo, EMOJI), ("poo", ALPHANUM)))
    assert(Uax29.tokenizeTyped(s"$poo\u4E2D\u570B$poo").toSeq == Seq(
      (poo, EMOJI), ("\u4E2D", IDEOGRAPHIC), ("\u570B", IDEOGRAPHIC), (poo, EMOJI)))
  }

  test("over-long tokens are chopped at MaxTokenLength, not dropped (StandardTokenizer.java:86-89)") {
    val toks = Uax29.tokenize("y" * 300)
    assert(toks.map(_.term).toSeq == Seq("y" * 255, "y" * 45))
    assert(toks.map(_.pos).toSeq == Seq(0, 1))
    // chop never lands mid-surrogate-pair
    val supp = new String(Character.toChars(0x20B45)) // supplementary ideograph
    val mixed = Uax29.tokenize("a" * 254 + supp) // 256 chars; naive chop at 255 splits the pair
    assert(mixed.forall(t => !Character.isHighSurrogate(t.term.last)))
  }

  test("analyzer chain lowercases; uax29 mode is wired into IndexBuilder.analyze") {
    assert(Uax29.tokenize("Foo BAR").map(_.term).toSeq == Seq("foo", "bar"))
    val text = "class FooBar_9 extends baz; x1.y2 O'Neill 21.35 💩"
    assert(graft.build.IndexBuilder.analyze("uax29", text).toSeq == Uax29.tokenize(text).toSeq)
  }

  test("differential: identical to CodeAnalyzer.tokenize on the fixture/driver alphabet") {
    val rnd = new Random(20260817L)
    val letters = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    val seps = Seq(" ", "\n", "\t", "(", ")", "{", "}", "=", "+", "-", "/", "<", ">", "[", "]", "!", "&", "|")
    def word(): String = {
      val core = Seq.fill(1 + rnd.nextInt(10))(letters(rnd.nextInt(letters.length))).mkString
      // optional underscore joins (ExtendNumLet in both tokenizers)
      if (rnd.nextBoolean()) core + "_" + Seq.fill(1 + rnd.nextInt(5))(letters(rnd.nextInt(letters.length))).mkString
      else core
    }
    (0 until 200).foreach { _ =>
      val text = Seq.fill(1 + rnd.nextInt(30))(word()).mkString(
        seps(rnd.nextInt(seps.length)), seps(rnd.nextInt(seps.length)), seps(rnd.nextInt(seps.length)))
      assert(Uax29.tokenize(text).toSeq == CodeAnalyzer.tokenize(text).toSeq, s"input: $text")
    }
  }
}
