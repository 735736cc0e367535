package graft

import graft.build.{CheckIndex, Datagen, IndexBuilder, IndexMerger}
import graft.exec.Searcher
import org.apache.spark.sql.functions._

/** Segment merge (sort-merge on term keys) — results must be identical
  * to the unmerged index modulo the order-preserving docId remap
  * (`MergeState.DocMap` analogue), including with mega-term salt splits.
  */
class MergeSpec extends SparkTest {
  import spark.implicits._

  private val queries = Seq(
    "def", "needle_0", "def AND class", "val OR needle_1",
    "ident_17 AND NOT ident_23", "\"class camelCaseName7\"", "ident_2*")

  test("forceMerge preserves results under docId remap; CheckIndex clean; salt split works") {
    val src = Datagen.corpus(spark, 900, seed = 21L)
    val index = IndexBuilder.buildInMemory(spark, Datagen.toInputDocs(src, 4))

    // order-preserving remap oracle: old docId -> rank in sorted order
    val oldIds = index.docmeta.select($"docId").as[Long].collect().sorted
    val remap = oldIds.zipWithIndex.map { case (id, i) => id -> i.toLong }.toMap

    assert(CheckIndex.run(index).isEmpty)

    for (cap <- Seq(1 << 20, 64)) { // big cap = single row per term; 64 = forced salt splits
      val merged = IndexMerger.forceMerge(spark, index, numPartitions = 8, maxPostingsPerRow = cap)
      merged.postings.persist()
      assert(CheckIndex.run(merged).isEmpty, s"cap=$cap")
      if (cap == 64) {
        // prove the salt split actually produced multiple rows for mega-terms
        val maxRows = merged.postings.groupBy($"term").count().agg(max("count")).as[Long].head()
        assert(maxRows > 1, "expected mega-terms split across rows")
      }
      queries.foreach { qs =>
        val base = Searcher.topK(index, qs, 10).as[(Long, Float)].collect().toSeq
          .map { case (d, s) => (remap(d), s) }
        val got = Searcher.topK(merged, qs, 10).as[(Long, Float)].collect().toSeq
        assert(got == base, s"query [$qs] cap=$cap")
      }
      merged.postings.unpersist()
    }
  }
}
