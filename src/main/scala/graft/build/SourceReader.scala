package graft.build

import graft.model.SourceRow
import org.apache.spark.sql.{Dataset, SparkSession}

/** Source-table ingestion: the engine indexes any table with the
  * Iceberg-shaped schema `(repo, path, commit, lang, content)` — the
  * driver's input contract. The format is a string swap
  * (`spark.read.format(fmt).load` / `spark.table`), so a production
  * deployment points this at an Iceberg catalog table while the
  * sandbox (no iceberg-runtime jar ships in /opt/spark/jars) reads the
  * same schema from parquet. Column pruning/pushdown behave
  * identically either way — the builder only selects the five
  * contract columns.
  */
object SourceReader {

  /** Read a source table by path (`format` = "parquet", "orc", ...,
    * "iceberg") or by catalog name (`format` = "table").
    */
  def read(spark: SparkSession, pathOrTable: String,
      format: String = "parquet"): Dataset[SourceRow] = {
    import spark.implicits._
    val df =
      if (format == "table") spark.table(pathOrTable)
      else spark.read.format(format).load(pathOrTable)
    df.select("repo", "path", "commit", "lang", "content").as[SourceRow]
  }

  /** Read + route to `numSegments` build segments (deterministic
    * primary-key hash — resume-safe, partitioning-independent).
    */
  def readDocs(spark: SparkSession, pathOrTable: String, numSegments: Int,
      format: String = "parquet"): Dataset[InputDoc] =
    Datagen.toInputDocs(read(spark, pathOrTable, format), numSegments)
}
