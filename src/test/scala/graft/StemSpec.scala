package graft

import graft.analysis.Stemmer
import graft.build.{IndexBuilder, InputDoc}
import graft.exec.Searcher
import graft.query._
import org.scalatest.funsuite.AnyFunSuite

/** Stemmer goldens (hand-traced through the published Porter 1980
  * algorithm and the reference's minimal-English decision table) plus an
  * end-to-end differential: a Porter-stemmed index must agree with the
  * brute-force oracle running the SAME stemmer inside its tokenizer.
  */
class StemSpec extends AnyFunSuite {

  test("porter per-step examples (paper §'The algorithm')") {
    val cases = Seq(
      // step 1a
      "caresses" -> "caress", "ponies" -> "poni", "caress" -> "caress", "cats" -> "cat",
      // step 1b + cleanup
      "feed" -> "feed", "plastered" -> "plaster", "bled" -> "bled",
      "motoring" -> "motor", "sing" -> "sing",
      "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
      "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
      "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail", "filing" -> "file",
      // step 1c
      "happy" -> "happi", "sky" -> "sky",
      // steps 2-4 composites
      "relational" -> "relat", "conditional" -> "condit", "rational" -> "ration",
      "valenci" -> "valenc", "digitizer" -> "digit", "conformabli" -> "conform",
      "radicalli" -> "radic", "formaliti" -> "formal", "formative" -> "form",
      "formalize" -> "formal", "electriciti" -> "electr", "electrical" -> "electr",
      "hopeful" -> "hope", "goodness" -> "good",
      "revival" -> "reviv", "adjustable" -> "adjust", "defensible" -> "defens",
      "irritant" -> "irrit", "replacement" -> "replac", "adjustment" -> "adjust",
      "dependent" -> "depend", "adoption" -> "adopt", "communism" -> "commun",
      "activate" -> "activ", "effective" -> "effect",
      // step 5
      "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
      "controll" -> "control", "roll" -> "roll",
      // engine-vocabulary words relied on by the ft_porter_topk oracle
      "query" -> "queri", "merge" -> "merg", "value" -> "valu", "table" -> "tabl",
      "customer" -> "custom", "key" -> "kei", "line" -> "line", "filter" -> "filter",
      "window" -> "window", "stream" -> "stream", "order" -> "order",
      // short words pass through
      "a" -> "a", "as" -> "as", "the" -> "the"
    )
    cases.foreach { case (w, want) =>
      assert(Stemmer.porter(w) == want, s"porter($w)")
    }
  }

  test("minimal English plural stemmer decision table") {
    val cases = Seq(
      "cats" -> "cat", "streams" -> "stream", "queries" -> "query",
      "ponies" -> "pony", "ties" -> "ty", "dies" -> "dy",
      "bus" -> "bus", "abyss" -> "abyss", "gas" -> "ga",
      "goes" -> "goes", "aliases" -> "aliase", "makes" -> "make",
      "as" -> "as", "is" -> "is", "its" -> "it",
      "class" -> "class", "extends" -> "extend", "values" -> "value"
    )
    cases.foreach { case (w, want) =>
      assert(Stemmer.englishMinimal(w) == want, s"englishMinimal($w)")
    }
  }

  test("minimal French stemmer goldens (Savoy rules)") {
    val cases = Seq(
      // -x family: aux -> al, other x just drops
      "chevaux" -> "cheval", "tableaux" -> "tableal", "travaux" -> "traval",
      "généreux" -> "généreu",
      // s / r / e / é cascade + double-letter singling
      "chanteurs" -> "chanteu", "chanteur" -> "chanteu",
      "appelle" -> "appel", "appelles" -> "appel",
      "employé" -> "employ", "fermées" -> "ferm",
      // shorter than 6 pass through
      "actes" -> "actes", "merge" -> "merge", "table" -> "table", "query" -> "query",
      // engine-vocabulary words the ft_french_topk oracle relies on
      "streams" -> "stream", "stream" -> "stream",
      "customer" -> "custom", "filter" -> "filt", "vector" -> "vecto",
      "column" -> "column", "window" -> "window"
    )
    cases.foreach { case (w, want) =>
      assert(Stemmer.frenchMinimal(w) == want, s"frenchMinimal($w)")
    }
  }

  test("minimal German stemmer goldens (Savoy rules + umlaut fold)") {
    val cases = Seq(
      // -nen (len > 6), -en/-se/-es/-er (len > 5), single n/e/s/r
      "scannen" -> "scan", "frauen" -> "frau", "bilder" -> "bild",
      "hauses" -> "haus", "ergebnisse" -> "ergebnis",
      "karten" -> "kart", "worte" -> "wort",
      // umlaut folding happens before suffix rules (len >= 5 only)
      "bücher" -> "buch", "übungen" -> "ubung", "häuser" -> "haus",
      "über" -> "über", // len < 5: untouched, no fold
      // engine-vocabulary words the ft_german_topk oracle relies on
      "spark" -> "spark", "merge" -> "merg", "stream" -> "stream",
      "table" -> "tabl", "scan" -> "scan", "query" -> "query",
      "filter" -> "filt", "customer" -> "custom", "order" -> "orde",
      "column" -> "colum", "vector" -> "vecto", "window" -> "window"
    )
    cases.foreach { case (w, want) =>
      assert(Stemmer.germanMinimal(w) == want, s"germanMinimal($w)")
    }
  }

  test("german2 normalization state machine goldens") {
    val cases = Seq(
      // ß expansion, umlaut fold
      "weißbier" -> "weissbier", "fußball" -> "fussball",
      "schön" -> "schon", "müller" -> "muller", "häuser" -> "hauser",
      // ae/oe/ue -> a/o/u via the U state
      "goethe" -> "gothe", "hueber" -> "huber", "aepfel" -> "apfel",
      // V state BLOCKS the e-deletion: u after vowel/q, post-umlaut e
      "bauer" -> "bauer", "quelle" -> "quelle", "mauer" -> "mauer",
      "äepfel" -> "aepfel", // folded ä enters V: next e kept
      // engine-vocabulary words the ft_denorm_topk oracle relies on
      "gröup" -> "group", "group" -> "group", "stream" -> "stream",
      "value" -> "valu", "merge" -> "merge", "query" -> "query",
      "customer" -> "customer", "table" -> "table", "order" -> "order"
    )
    cases.foreach { case (w, want) =>
      assert(Stemmer.germanNormalize(w) == want, s"germanNormalize($w)")
    }
  }

  test("porter never lengthens beyond +1 and is total on the fixture alphabet") {
    val rnd = new scala.util.Random(8899)
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789_"
    (1 to 3000).foreach { _ =>
      val w = Array.fill(1 + rnd.nextInt(12))(alpha(rnd.nextInt(alpha.length))).mkString
      val s = Stemmer.porter(w)
      assert(s.length <= w.length + 1, s"porter($w) = $s grew") // at/bl/iz add an e
      assert(s.nonEmpty || w.isEmpty)
      Stemmer.englishMinimal(w) // must not throw
    }
  }
}

/** Porter-stemmed index vs the oracle running the same stem filter in
  * its tokenizer: scored search, phrase over stemmed positions, and the
  * unscored paths must all agree on an inflection-rich corpus.
  */
class StemSearchSpec extends SparkTest {
  import spark.implicits._

  test("stemmed index == stemmed oracle (conflation changes df/tf)") {
    val inflect = Array(
      "merge merges merged merging", "stream streams streaming",
      "query queries queried", "filter filters filtered filtering",
      "adjust adjustment adjustable", "depend dependent depends",
      "relational relations relate", "hope hopeful hopefulness",
      "activate activated activation", "connect connection connecting",
      "value values", "table tables", "size sized sizes", "plaster plastered")
    val rnd = new scala.util.Random(424242)
    val docs = (0 until 400).map { i =>
      val n = 3 + rnd.nextInt(8)
      val content = Seq.fill(n)(inflect(rnd.nextInt(inflect.length))).mkString(" ")
      InputDoc(seg = i % 3, sortKey = f"$i%06d", repo = "r", path = s"p$i",
        commit = i.toString, lang = "scala", content = content)
    }
    val index = IndexBuilder.buildInMemory(spark, spark.createDataset(docs), "porter")
    val stemTok: String => Array[graft.analysis.Token] = text =>
      graft.analysis.CodeAnalyzer.tokenize(text).map(t =>
        t.copy(term = Stemmer.porter(t.term)))
    val oracleDocs = NaiveOracle.fromContents(
      docs.groupBy(_.seg).toSeq.flatMap { case (seg, ds) =>
        ds.sortBy(_.sortKey).zipWithIndex.map { case (d, ord) =>
          ((seg.toLong << IndexBuilder.SegShift) | ord.toLong, d.content)
        }
      }, stemTok)
    val shapes: Seq[Query] = Seq(
      TermQ("merg"),                       // merge+merges+merged+merging conflated
      TermQ("stream"),                     // stream+streams+streaming
      TermQ("queri"),
      BoolQ(must = Seq(TermQ("adjust"), TermQ("depend"))),
      BoolQ(should = Seq(TermQ("valu"), TermQ("tabl")), minShouldMatch = 1),
      PhraseQ(Seq("merg", "merg")),        // "merge merges" is a stemmed bigram
      PhraseQ(Seq("stream", "stream"), slop = 1),
      DisMaxQ(Seq(TermQ("hope"), TermQ("activ")), 0.5d),
      PrefixQ("conn"),
      IntervalQ(IOrderedS(Seq(ITermS("queri"), ITermS("filter"))))
    )
    shapes.foreach { q =>
      val expected = NaiveOracle.search(oracleDocs, q, 10)
      val got = Searcher.topKQ(index, q, 10).as[(Long, Float)].collect().toSeq
      assert(got == expected, s"stemmed [$q]:\n got=$got\n exp=$expected")
      val expectedDocs = NaiveOracle.matchingDocs(oracleDocs, q)
      assert(Searcher.countQ(index, q) == expectedDocs.size.toLong, s"count [$q]")
    }
    // the unstemmed surface form must NOT hit the stemmed index
    assert(Searcher.countQ(index, TermQ("merges")) == 0L)
    assert(Searcher.countQ(index, TermQ("queries")) == 0L)
  }
}
