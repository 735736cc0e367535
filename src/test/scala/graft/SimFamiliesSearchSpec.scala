package graft

import graft.build.{Datagen, IndexBuilder, InputDoc}
import graft.exec.Searcher
import graft.query.{BoolQ, TermQ}
import graft.util.SmallFloat

/** End-to-end engine search under the LM/DFR/Boolean similarity
  * families vs direct brute-force evaluation of each published formula
  * (float-parity semantics: each term's double score casts to float,
  * clause sums accumulate in double, collector casts at the boundary —
  * the same contract the BM25 differential pins). This is the pruning
  * equivalence proof for the non-default similarities: WAND/block-max/
  * conjunction kernels consult maxScore/globalMax bounds, and a wrong
  * bound (e.g. DFR's FINITE saturation bound) would silently clip hits
  * that brute force keeps.
  */
class SimFamiliesSearchSpec extends SparkTest {
  import spark.implicits._

  private val rows = (0L until 400L).map(i => Datagen.row(23L, i, 9, 120))
  private lazy val docs = rows.map { r =>
    val key = s"${r.repo}/${r.path}@${r.commit}"
    InputDoc(math.floorMod(key.hashCode, 3), key, r.repo, r.path, r.commit, r.lang, r.content)
  }
  private lazy val index = IndexBuilder.buildInMemory(spark, spark.createDataset(docs))
  private lazy val oracleDocs = docs.groupBy(_.seg).toSeq.flatMap { case (seg, ds) =>
    ds.sortBy(_.sortKey).zipWithIndex.map { case (d, ord) =>
      ((seg.toLong << IndexBuilder.SegShift) | ord.toLong,
        graft.analysis.CodeAnalyzer.tokenize(d.content))
    }
  }
  private lazy val nDocs = oracleDocs.size.toLong
  private lazy val sttf = oracleDocs.map(_._2.length.toLong).sum
  private def ttfOf(t: String): Long = oracleDocs.map(_._2.count(_.term == t).toLong).sum
  private def dfOf(t: String): Long = oracleDocs.count(_._2.exists(_.term == t)).toLong

  /** Brute force: per-term double score -> float, summed, collector cast;
    * `must` requires every term present (the conjunction kernel path).
    */
  private def brute(terms: Seq[String], must: Boolean, k: Int)(
      perTerm: (String, Int, Int) => Double): Seq[(Long, Float)] =
    oracleDocs.flatMap { case (id, toks) =>
      val tf = toks.groupBy(_.term).map { case (t, xs) => t -> xs.length }
      val norm = SmallFloat.intToByte4(toks.length)
      val present = terms.filter(tf.contains)
      if (present.isEmpty || (must && present.size < terms.size)) None
      else Some((id, present.map(t =>
        perTerm(t, tf(t), norm & 0xff).toFloat.toDouble).sum.toFloat))
    }.sortBy { case (id, s) => (-s, id) }.take(k)

  private def engine(terms: Seq[String], must: Boolean, k: Int,
      sim: graft.exec.SimilarityFactory): Seq[(Long, Float)] = {
    val q = if (must) BoolQ(must = terms.map(TermQ.apply))
      else BoolQ(should = terms.map(TermQ.apply), minShouldMatch = 1)
    Searcher.topKQ(index, q, k, sim = sim).as[(Long, Float)].collect().toSeq
  }

  private val queryShapes = Seq(
    (Seq("def"), false), (Seq("needle_3"), false),
    (Seq("def", "class"), false), (Seq("val", "needle_2"), false),
    (Seq("def", "class"), true), (Seq("val", "return", "if"), true))

  test("LMDirichlet engine top-k == brute force (incl. conjunctions)") {
    val mu = 2000d
    for ((ts, must) <- queryShapes) {
      val exp = brute(ts, must, 10) { (t, f, nb) =>
        val p = (ttfOf(t) + 1d) / (sttf + 1d)
        val dl = SmallFloat.LengthTable(nb).toDouble
        val s = math.log(1 + f / (mu * p)) + math.log(mu / (dl + mu))
        if (s > 0d) s else 0d
      }
      assert(engine(ts, must, 10, graft.exec.LMDirichletSim) == exp, s"lmd [$ts must=$must]")
    }
  }

  test("LMJelinekMercer engine top-k == brute force (incl. conjunctions)") {
    val lambda = 0.1d
    for ((ts, must) <- queryShapes) {
      val exp = brute(ts, must, 10) { (t, f, nb) =>
        val p = (ttfOf(t) + 1d) / (sttf + 1d)
        val dl = SmallFloat.LengthTable(nb).toDouble
        math.log(1 + ((1 - lambda) * f / dl) / (lambda * p))
      }
      assert(engine(ts, must, 10, graft.exec.LMJelinekMercerSim.Default) == exp,
        s"lmjm [$ts must=$must]")
    }
  }

  test("DFR InL2 engine top-k == brute force (finite global bound never clips)") {
    val avgdl = sttf / nDocs.toDouble
    for ((ts, must) <- queryShapes) {
      val exp = brute(ts, must, 10) { (t, f, nb) =>
        val dl = SmallFloat.LengthTable(nb).toDouble
        val tfn = f * (math.log(1 + avgdl / dl) / math.log(2d))
        val a = math.log((nDocs + 1).toDouble / (dfOf(t) + 0.5)) / math.log(2d)
        a * (1 - 1 / (1 + tfn))
      }
      assert(engine(ts, must, 10, graft.exec.DfrInL2Sim.Default) == exp, s"dfr [$ts must=$must]")
    }
  }

  test("BooleanSim engine top-k == brute force (matched-set counts)") {
    for ((ts, must) <- queryShapes) {
      val exp = brute(ts, must, 10)((_, _, _) => 1d)
      assert(engine(ts, must, 10, graft.exec.BooleanSim) == exp, s"bool [$ts must=$must]")
    }
  }
}
