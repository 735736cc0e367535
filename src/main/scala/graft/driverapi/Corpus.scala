package graft.driverapi

import graft.build.{Index, IndexBuilder, InputDoc}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adapter: the driver's `documents` table -> engine corpus.
  *
  * Segment routing is by doc_id *range* (not hash) so engine docIds are
  * monotone in doc_id — then the engine's tie-break (score desc, docId
  * asc, `core/search/HitQueue.java:76-82`) is expressible in ANSI SQL as
  * `ORDER BY score DESC, doc_id ASC` for the DuckDB oracle.
  */
object Corpus {
  val NumSegments = 4

  private val cache = scala.collection.concurrent.TrieMap.empty[String, (Index, DataFrame)]

  /** (engine index, docId->doc_id mapping) for `dir`'s documents table.
    * Keyed by (session, dir) — cached Datasets die with their session.
    */
  def get(spark: SparkSession, dir: String): (Index, DataFrame) =
    cache.getOrElseUpdate(s"${System.identityHashCode(spark)}:$dir", {
      import spark.implicits._
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val maxId = docs.agg(max($"doc_id")).head().getLong(0)
      val span = maxId / NumSegments + 1
      val input = docs.select($"doc_id", $"text", $"lang").as[(Long, String, String)]
        .map { case (id, text, lang) =>
          InputDoc(
            seg = (id / span).toInt,
            sortKey = f"$id%012d",
            repo = "documents", path = id.toString, commit = "", lang = lang,
            content = text)
        }
      val index = IndexBuilder.buildInMemory(spark, input)
      index.postings.persist()
      index.docmeta.persist()
      index.termStats.persist()
      val mapping = index.docmeta
        .select($"docId", $"path".cast("long").as("doc_id"))
        .persist()
      (index, mapping)
    })
}
