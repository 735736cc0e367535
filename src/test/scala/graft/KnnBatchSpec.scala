package graft

import graft.build.{Datagen, IndexBuilder, InputDoc}
import graft.exec.MoreLikeThis

/** Identity proof for the batched k-NN/MLT path (VERDICT r05 task 4):
  * `selectTermsBatch` / `likeQueryBoostedBatch` / `topRoundedHitsBatch`
  * must return, per source doc, EXACTLY what the sequential
  * `selectTerms` / `likeQueryBoosted` / `topRoundedHits` path returns —
  * the batch shape (one stats job + one kernel pass for all N queries)
  * may change job structure only, never results.
  */
class KnnBatchSpec extends SparkTest {

  private val N = 600
  private lazy val rows = (0L until N).map(i => Datagen.row(11L, i, 20, 300))

  private lazy val docs: Seq[InputDoc] = rows.map { r =>
    val key = s"${r.repo}/${r.path}@${r.commit}"
    val seg = math.floorMod(scala.util.hashing.MurmurHash3.stringHash(key), 3)
    InputDoc(seg, key, r.repo, r.path, r.commit, r.lang, r.content)
  }

  private lazy val index = IndexBuilder.buildInMemory(spark, spark.createDataset(docs)(
    org.apache.spark.sql.Encoders.product[InputDoc]))

  // a deterministic spread of source docs, including one with no
  // qualifying terms (empty content edge) if the fixture yields one
  private lazy val sources: Seq[(String, String)] =
    docs.sortBy(_.sortKey).take(7).zipWithIndex.map { case (d, i) => (s"s$i", d.content) } :+
      ("sEmpty", "zz_unseen_token_only")

  test("selectTermsBatch == per-doc selectTerms for every source") {
    val p = MoreLikeThis.Params()
    val batch = MoreLikeThis.selectTermsBatch(index, sources, p)
    assert(batch.keySet == sources.map(_._1).toSet)
    sources.foreach { case (id, content) =>
      val seq = MoreLikeThis.selectTerms(index, content, p)
      assert(batch(id) == seq, s"selectTerms mismatch for $id")
    }
  }

  test("likeQueryBoostedBatch == per-doc likeQueryBoosted") {
    val batch = MoreLikeThis.likeQueryBoostedBatch(index, sources).toMap
    sources.foreach { case (id, content) =>
      assert(batch(id) == MoreLikeThis.likeQueryBoosted(index, content),
        s"boosted query mismatch for $id")
    }
  }

  test("topRoundedHitsBatch == per-query topRoundedHits (the k-NN search shape)") {
    val qs = MoreLikeThis.likeQueryBoostedBatch(index, sources)
      .filterNot(_._2 == graft.query.MatchNone)
    val batch = graft.driverapi.Queries.topRoundedHitsBatch(index, qs, 10)
    assert(batch.keySet == qs.map(_._1).toSet)
    qs.foreach { case (qid, q) =>
      val seq = graft.driverapi.Queries.topRoundedHits(index, q, 10)
      assert(batch(qid).toSeq == seq.toSeq, s"hit mismatch for $qid")
    }
  }
}
