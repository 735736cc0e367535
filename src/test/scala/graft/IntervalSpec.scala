package graft

import graft.build.{Datagen, IndexBuilder, InputDoc}
import graft.exec.{IntervalEval, Searcher}
import graft.query._
import org.scalatest.funsuite.AnyFunSuite

/** Minimal-interval semantics (`lucene/queries/.../intervals/`):
  * hand-computed goldens per combinator, a randomized differential
  * between the engine's greedy sweeps ([[IntervalEval]]) and the
  * exhaustive cartesian oracle ([[NaiveOracle.intervalIvs]]), and
  * end-to-end kernel-vs-oracle over a built index (scored, boolean
  * composition, count/docs paths).
  */
class IntervalSpec extends AnyFunSuite {

  private def pos(m: (String, Seq[Int])*): String => Array[Int] = {
    val mm = m.toMap.map { case (k, v) => k -> v.toArray }
    t => mm.getOrElse(t, Array.empty[Int])
  }
  private def ivs(src: ISrc, p: String => Array[Int]): Seq[(Int, Int, Int)] =
    IntervalEval.minimal(src, p).map(iv => (iv.start, iv.end, iv.gaps))

  test("term source: one unit interval per position") {
    assert(ivs(ITermS("a"), pos("a" -> Seq(1, 4, 9))) == Seq((1, 1, 0), (4, 4, 0), (9, 9, 0)))
    assert(ivs(ITermS("z"), pos("a" -> Seq(1))) == Seq.empty)
  }

  test("ordered: canonical minimal tuples, strictly disjoint, shrunk starts") {
    val p = pos("a" -> Seq(0, 3, 10), "b" -> Seq(1, 5, 11))
    // a@0..b@1, a@3..b@5, a@10..b@11 (each a pairs its NEXT b; the wider
    // (0,5) candidate contains (3,5) and is dropped)
    assert(ivs(IOrderedS(Seq(ITermS("a"), ITermS("b"))), p) ==
      Seq((0, 1, 0), (3, 5, 1), (10, 11, 0)))
    // backward shrink: with a@{0,1}, b@{5}, the tuple must take a@1
    val p2 = pos("a" -> Seq(0, 1), "b" -> Seq(5))
    assert(ivs(IOrderedS(Seq(ITermS("a"), ITermS("b"))), p2) == Seq((1, 5, 3)))
  }

  test("ordered triple: middle child strictly between, gaps = width - 3") {
    val p = pos("a" -> Seq(0), "b" -> Seq(2), "c" -> Seq(6))
    assert(ivs(IOrderedS(Seq(ITermS("a"), ITermS("b"), ITermS("c"))), p) ==
      Seq((0, 6, 4)))
    // no b between a and c -> no match
    val p2 = pos("a" -> Seq(0), "b" -> Seq(8), "c" -> Seq(6))
    assert(ivs(IOrderedS(Seq(ITermS("a"), ITermS("b"), ITermS("c"))), p2) == Seq.empty)
  }

  test("unordered: min window per sweep state, overlaps allowed") {
    val p = pos("a" -> Seq(0, 7), "b" -> Seq(5))
    // windows (0,5) and (5,7); neither contains the other
    assert(ivs(IUnorderedS(Seq(ITermS("a"), ITermS("b"))), p) ==
      Seq((0, 5, 4), (5, 7, 1)))
  }

  test("maxgaps / maxwidth filter the canonical list") {
    val p = pos("a" -> Seq(0, 7), "b" -> Seq(5))
    val u = IUnorderedS(Seq(ITermS("a"), ITermS("b")))
    assert(ivs(IMaxGapsS(1, u), p) == Seq((5, 7, 1)))
    assert(ivs(IMaxWidthS(3, u), p) == Seq((5, 7, 1)))
    assert(ivs(IMaxGapsS(0, u), p) == Seq.empty)
  }

  test("containing / containedBy") {
    val p = pos("a" -> Seq(0, 10), "b" -> Seq(3, 20), "x" -> Seq(2, 11))
    val big = IUnorderedS(Seq(ITermS("a"), ITermS("b"))) // (0,3), (3,10)? no — see oracle
    val bigIvs = ivs(big, p)
    // big's canonical list: (0,3) and (3,10)? (10,20) also: a@10,b@20
    assert(bigIvs == Seq((0, 3, 2), (3, 10, 6), (10, 20, 9)))
    assert(ivs(IContainingS(big, ITermS("x")), p) == Seq((0, 3, 2), (10, 20, 9)))
    assert(ivs(IContainedByS(ITermS("x"), big), p) == Seq((2, 2, 0), (11, 11, 0)))
  }

  test("pseudo-frequency: sum of 1/max(width - minExtent + 1, 1)") {
    val p = pos("a" -> Seq(0, 7), "b" -> Seq(5))
    val u = IUnorderedS(Seq(ITermS("a"), ITermS("b"))) // widths 6 and 3, minExtent 2
    assert(math.abs(IntervalEval.freq(u, p) - (1d / 5 + 1d / 2)) < 1e-12)
  }

  test("randomized differential: greedy sweeps == exhaustive cartesian oracle") {
    val rnd = new scala.util.Random(20260817)
    val terms = Array("a", "b", "c", "d")
    def randPos(): String => Array[Int] = {
      val m = terms.map { t =>
        val n = rnd.nextInt(6)
        t -> Array.fill(n)(rnd.nextInt(24)).distinct.sorted
      }.toMap
      t => m.getOrElse(t, Array.empty[Int])
    }
    def leafCombo(): ISrc = {
      val n = 2 + rnd.nextInt(2)
      val subs = Seq.fill(n)(ITermS(terms(rnd.nextInt(terms.length))): ISrc)
      if (rnd.nextBoolean()) IOrderedS(subs) else IUnorderedS(subs)
    }
    def randSrc(depth: Int): ISrc =
      if (depth == 0) ITermS(terms(rnd.nextInt(terms.length)))
      else rnd.nextInt(7) match {
        case 0 => ITermS(terms(rnd.nextInt(terms.length)))
        case 1 | 2 => leafCombo()
        // maxgaps only over term-leaf combinators: there the greedy
        // witness's gaps is determined by (start, end) — see intervalIvs
        case 3 => IMaxGapsS(rnd.nextInt(4), leafCombo())
        case 4 => IMaxWidthS(1 + rnd.nextInt(6), randSrc(depth - 1))
        case 5 => IContainingS(randSrc(depth - 1), randSrc(depth - 1))
        case _ => IContainedByS(randSrc(depth - 1), randSrc(depth - 1))
      }
    (1 to 500).foreach { i =>
      val p = randPos()
      val src = randSrc(2)
      val got = IntervalEval.minimal(src, p).map(iv => (iv.start, iv.end, iv.gaps))
      val exp = NaiveOracle.intervalIvs(src, p)
      // nested witnesses can legitimately differ in gaps for the same
      // (start, end); spans and freq must agree exactly
      assert(got.map(iv => (iv._1, iv._2)) == exp.map(iv => (iv._1, iv._2)),
        s"#$i spans [$src]:\n got=$got\n exp=$exp")
      val gotF = IntervalEval.freq(src, p)
      val expF = NaiveOracle.intervalFreq(src, p)
      assert(math.abs(gotF - expF) < 1e-12, s"#$i freq [$src]: $gotF vs $expF")
    }
  }
}

/** End-to-end interval queries through the kernel vs the brute-force
  * oracle: saturation scoring, boolean composition, unscored paths.
  */
class IntervalSearchSpec extends SparkTest {
  import spark.implicits._

  test("interval queries == oracle across scored, boolean, count and docs paths") {
    val rows = (0L until 600L).map(i => Datagen.row(57L, i, 15, 200))
    val docs = rows.map { r =>
      val key = s"${r.repo}/${r.path}@${r.commit}"
      val seg = math.floorMod(scala.util.hashing.MurmurHash3.stringHash(key), 3)
      InputDoc(seg, key, r.repo, r.path, r.commit, r.lang, r.content)
    }
    val index = IndexBuilder.buildInMemory(spark, spark.createDataset(docs))
    val oracleDocs = NaiveOracle.fromContents(
      docs.groupBy(_.seg).toSeq.flatMap { case (seg, ds) =>
        ds.sortBy(_.sortKey).zipWithIndex.map { case (d, ord) =>
          ((seg.toLong << IndexBuilder.SegShift) | ord.toLong, d.content)
        }
      })
    val ord = IOrderedS(Seq(ITermS("def"), ITermS("return")))
    val unord = IUnorderedS(Seq(ITermS("val"), ITermS("class")))
    val shapes: Seq[Query] = Seq(
      IntervalQ(ord),
      IntervalQ(IMaxGapsS(3, ord)),
      IntervalQ(IMaxWidthS(6, unord)),
      IntervalQ(IUnorderedS(Seq(ITermS("def"), ITermS("class"), ITermS("return")))),
      IntervalQ(IContainedByS(ITermS("needle_0"), IMaxWidthS(20, unord))),
      IntervalQ(IContainingS(IMaxWidthS(12, unord), ITermS("def"))),
      IntervalQ(ord, pivot = 0.5f),
      BoostQ(IntervalQ(IMaxGapsS(4, unord)), 2f),
      BoolQ(must = Seq(IntervalQ(ord), TermQ("val"))),
      BoolQ(should = Seq(IntervalQ(unord), TermQ("needle_1")), minShouldMatch = 1),
      BoolQ(must = Seq(TermQ("def")), filter = Seq(IntervalQ(unord))),
      BoolQ(must = Seq(IntervalQ(ord)), mustNot = Seq(TermQ("ident_3"))),
      ConstScoreQ(IntervalQ(IMaxGapsS(2, ord)), 1.5f),
      DisMaxQ(Seq(IntervalQ(ord), TermQ("while")), 0.3d)
    )
    shapes.foreach { q =>
      val expected = NaiveOracle.search(oracleDocs, q, 10)
      val got = Searcher.topKQ(index, q, 10).as[(Long, Float)].collect().toSeq
      assert(got == expected, s"interval [$q]:\n got=$got\n exp=$expected")
      val expectedDocs = NaiveOracle.matchingDocs(oracleDocs, q)
      assert(Searcher.countQ(index, q) == expectedDocs.size.toLong, s"count [$q]")
      assert(Searcher.matchingDocs(index, q).collect().map(_.longValue).sorted.toSeq
        == expectedDocs, s"docs [$q]")
    }
  }
}
