package graft

import graft.build.{Datagen, IndexBuilder, IndexMerger, InputDoc}
import graft.exec.Searcher
import graft.query._
import org.apache.spark.sql.functions._

/** Mutation soak — the reference's random-index-mutation test style
  * (`tf/index/RandomIndexWriter` driving adds/deletes/merges with
  * verification between): a persistent index takes interleaved batch
  * APPENDS (new segments, resume-protocol), key DELETES (tombstones),
  * and tiered MERGES in a seeded random order; after every step the
  * engine's count/docs paths must equal a driver-side model of the live
  * document set (counts are statistics-independent, so they stay exact
  * across the merge boundary where per-term stats legitimately change),
  * and CheckIndex must stay clean.
  */
class MutationSoakSpec extends SparkTest {
  import spark.implicits._

  test("appends + deletes + merges interleaved: counts/docs match the model at every step") {
    val dir = java.nio.file.Files.createTempDirectory("graftsoak").toString
    val rnd = new scala.util.Random(20260817L)
    // model: key -> content for every LIVE doc
    val model = scala.collection.mutable.LinkedHashMap.empty[(String, String, String), String]
    var nextSeg = 0
    var nextIdx = 0L

    def appendBatch(n: Int): Unit = {
      val rows = (0 until n).map { _ =>
        val r = Datagen.row(71L, nextIdx, 9, 120)
        nextIdx += 1
        r
      }
      val segBase = nextSeg
      nextSeg += 2
      val docs = rows.map { r =>
        val key = s"${r.repo}/${r.path}@${r.commit}"
        val seg = segBase + math.floorMod(key.hashCode, 2)
        model((r.repo, r.path, r.commit)) = r.content
        InputDoc(seg, key, r.repo, r.path, r.commit, r.lang, r.content)
      }
      IndexBuilder.buildPersistent(spark, spark.createDataset(docs), dir)
    }

    def deleteSome(frac: Double): Unit = {
      val victims = model.keys.toSeq.filter(_ => rnd.nextDouble() < frac)
      if (victims.nonEmpty) {
        IndexBuilder.deleteDocs(spark, dir,
          victims.toDF("repo", "path", "commit"))
        victims.foreach(model.remove)
      }
    }

    def verify(step: String): Unit = {
      val index = IndexBuilder.open(spark, dir)
      assert(index.docmeta.count() == model.size.toLong, s"$step: docmeta count")
      val probes = Seq("def", "class", "needle_0", "ident_7", "zzz_absent")
      probes.foreach { t =>
        val expect = model.valuesIterator.count(c =>
          graft.analysis.CodeAnalyzer.terms(c).contains(t)).toLong
        assert(Searcher.countQ(index, TermQ(t)) == expect, s"$step: count[$t]")
      }
      // a conjunction and a phrase through the docs path
      val expectAnd = model.valuesIterator.count { c =>
        val ts = graft.analysis.CodeAnalyzer.terms(c)
        ts.contains("def") && ts.contains("class")
      }.toLong
      assert(Searcher.countQ(index,
        BoolQ(must = Seq(TermQ("def"), TermQ("class")))) == expectAnd, s"$step: and-count")
      // sha-256 invariant holds for every live doc
      val bad = index.docmeta
        .select($"repo", $"path", $"commit", $"sha256").as[(String, String, String, String)]
        .collect().count { case (r, p, c, sha) =>
          model.get((r, p, c)).forall(content => IndexBuilder.sha256Hex(content) != sha)
        }
      assert(bad == 0, s"$step: sha mismatch count $bad")
      assert(graft.build.CheckIndex.run(index).isEmpty, s"$step: CheckIndex")
    }

    // snapshots pinned mid-soak: each must stay FROZEN — same doc count
    // and same count-path answers — at every later step, across appends,
    // deletes, and merges (point-in-time contract under mutation)
    val frozen = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Map[String, Long])]
    val probes = Seq("def", "class", "needle_0", "ident_7", "zzz_absent")
    def pin(): Unit = {
      val id = IndexBuilder.commitSnapshot(dir)
      val s = IndexBuilder.open(spark, dir, snapshot = Some(id))
      frozen += ((id, s.docmeta.count(),
        probes.map(t => t -> Searcher.countQ(s, TermQ(t))).toMap))
    }
    def verifySnapshots(step: String): Unit = frozen.foreach { case (id, n, counts) =>
      val s = IndexBuilder.open(spark, dir, snapshot = Some(id))
      assert(s.docmeta.count() == n, s"$step: snapshot $id doc count drifted")
      counts.foreach { case (t, c) =>
        assert(Searcher.countQ(s, TermQ(t)) == c, s"$step: snapshot $id count[$t] drifted")
      }
    }

    appendBatch(220)
    verify("initial build")
    deleteSome(0.15)
    verify("after delete 1")
    pin() // snapshot 0: post-delete-1 world
    appendBatch(180)
    verify("after append 2")
    verifySnapshots("after append 2")
    IndexMerger.tieredMerge(spark, dir, segsPerTier = 3)
    verify("after merge 1")
    verifySnapshots("after merge 1")
    deleteSome(0.10)
    appendBatch(150)
    verify("after delete+append 3")
    pin() // snapshot 1: mid-soak world
    IndexMerger.tieredMerge(spark, dir, segsPerTier = 2)
    verify("after merge 2")
    verifySnapshots("after merge 2")
    deleteSome(0.20)
    verify("final deletes")
    verifySnapshots("final deletes")
  }
}
