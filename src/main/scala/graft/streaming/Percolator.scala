package graft.streaming

import graft.build.{Datagen, Index, IndexBuilder}
import graft.exec.Searcher
import graft.model.SourceRow
import graft.query.{Query, QueryParser}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Reverse search (percolation) — the Monitor analogue
  * (`lucene/monitor/src/java/org/apache/lucene/monitor/Monitor.java:42`):
  * a registered set of standing queries is matched against batches of
  * incoming documents, reporting (query_id, doc) pairs.
  *
  * The reference indexes each doc batch into an ephemeral in-memory
  * index (`DocumentBatch`) and runs the registered queries against it,
  * pruning queries whose required terms the batch cannot satisfy (the
  * `Presearcher`). The Spark shape is the same, distributed: the batch
  * is inverted per-partition ([[IndexBuilder.buildInMemory]] — one
  * shuffle by segment), and ALL standing queries run in ONE postings
  * scan + ONE kernel pass per segment ([[Searcher.docsBatch]]); queries
  * with absent terms plan away driver-side (term-stats lookups), which
  * is exactly the Presearcher's job. For a streaming source, call
  * [[percolateBatch]] from `foreachBatch` — each micro-batch is one
  * Monitor.match round.
  */
object Percolator {
  /** A registered standing query (MonitorQuery analogue). */
  final case class Standing(id: String, query: String)

  def parse(standing: Seq[Standing]): Seq[(String, Query)] =
    standing.map(s => s.id -> QueryParser.parse(s.query))

  /** All (query_id, docId) matches of the standing set over an already-
    * open index — one batch kernel pass, no per-query jobs.
    */
  def percolate(index: Index, standing: Seq[Standing]): DataFrame =
    Searcher.docsBatch(index, parse(standing))
      .withColumnRenamed("qid", "query_id")

  /** Monitor.match for one doc batch: invert the batch in-memory (the
    * DocumentBatch analogue) and report every standing-query match as
    * (query_id, repo, path, commit).
    */
  def percolateBatch(spark: SparkSession, docs: Dataset[SourceRow],
      standing: Seq[Standing], numSegments: Int = 4): DataFrame = {
    import spark.implicits._
    val index = IndexBuilder.buildInMemory(spark, Datagen.toInputDocs(docs, numSegments))
    percolate(index, standing)
      .join(index.docmeta.select($"docId", $"repo", $"path", $"commit"), "docId")
      .select($"query_id", $"repo", $"path", $"commit")
  }
}
