package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Implementations live in [[graft.driverapi.Queries]]; fulltext entries
  * run the real engine (IndexBuilder + Searcher kernels), the rest are
  * Catalyst plans over the driver's parquet tables.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * BM25 top-10 for a term through the full index pipeline.
    */
  def entry(spark: SparkSession): DataFrame =
    driverapi.Queries.all("ft_term_topk")._1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    driverapi.Queries.all.map { case (k, (fn, _)) => k -> fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    driverapi.Queries.all.collect { case (k, (_, Some(sql))) => k -> sql }
}
