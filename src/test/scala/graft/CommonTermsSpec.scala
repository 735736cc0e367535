package graft

import graft.build.{IndexBuilder, InputDoc}
import graft.exec.{CommonTerms, Searcher}
import graft.query._

/** CommonTermsQuery former: df split against fractional and absolute
  * cutoffs, degenerate all-low/all-high shapes, absent terms in the
  * low-frequency gate, and end-to-end agreement with the oracle running
  * the composed query.
  */
class CommonTermsSpec extends SparkTest {
  import spark.implicits._

  test("df split, degenerate shapes, and search == oracle") {
    // 'common' in every doc, 'mid' in half, 'rare' in ~6%
    val docs = (0 until 300).map { i =>
      val parts = Seq("common alpha") ++
        (if (i % 2 == 0) Seq("mid beta") else Nil) ++
        (if (i % 16 == 0) Seq("rare gamma") else Nil)
      InputDoc(seg = i % 2, sortKey = f"$i%06d", repo = "r", path = s"p$i",
        commit = i.toString, lang = "scala", content = parts.mkString(" "))
    }
    val index = IndexBuilder.buildInMemory(spark, spark.createDataset(docs))
    val oracleDocs = NaiveOracle.fromContents(
      docs.groupBy(_.seg).toSeq.flatMap { case (seg, ds) =>
        ds.sortBy(_.sortKey).zipWithIndex.map { case (d, ord) =>
          ((seg.toLong << IndexBuilder.SegShift) | ord.toLong, d.content)
        }
      })

    // fractional cutoff 0.3: common (df 1.0) and mid (df 0.5) are high,
    // rare (df ~0.06) and the absent term gate as low frequency
    val q1 = CommonTerms.form(index, Seq("common", "mid", "rare", "zzz_absent"), 0.3)
    assert(q1 == BoolQ(
      must = Seq(BoolQ(should = Seq(TermQ("rare"), TermQ("zzz_absent")))),
      should = Seq(BoolQ(should = Seq(TermQ("common"), TermQ("mid"))))), q1.toString)

    // all terms high -> pure optional disjunction
    val q2 = CommonTerms.form(index, Seq("common", "mid"), 0.3)
    assert(q2 == BoolQ(should = Seq(TermQ("common"), TermQ("mid"))))

    // all terms low -> pure required-gate disjunction
    val q3 = CommonTerms.form(index, Seq("rare", "zzz_absent"), 0.3)
    assert(q3 == BoolQ(should = Seq(TermQ("rare"), TermQ("zzz_absent"))))

    // absolute cutoff: df > 40 docs is high (mid df=150, rare df=19)
    val q4 = CommonTerms.form(index, Seq("mid", "rare"), 40.0)
    assert(q4 == BoolQ(must = Seq(BoolQ(should = Seq(TermQ("rare")))),
      should = Seq(BoolQ(should = Seq(TermQ("mid"))))), q4.toString)

    // the composed query runs through the ordinary kernel == oracle
    Seq(q1, q2, q3, q4).foreach { q =>
      val expected = NaiveOracle.search(oracleDocs, q, 10)
      val got = Searcher.topKQ(index, q, 10).as[(Long, Float)].collect().toSeq
      assert(got == expected, s"common-terms [$q]:\n got=$got\n exp=$expected")
      assert(Searcher.countQ(index, q) ==
        NaiveOracle.matchingDocs(oracleDocs, q).size.toLong, s"count [$q]")
    }
    // the gate is real: only 'rare' docs match q1 (19 of 300)
    assert(Searcher.countQ(index, q1) == 19L)
  }
}
