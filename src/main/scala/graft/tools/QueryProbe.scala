package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: time a subset of catalog queries on an sf dir.
  * `runMain graft.tools.QueryProbe <sfDir> <name...>`
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("PROBE_PARTS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (opts, names2) = names.partition(_.startsWith("--"))
    if (opts.contains("--prewarm"))
      graft.driverapi.Queries.prewarm(spark, sfDir).foreach { case (k, v) =>
        println(f"PREP $k $v%.2f s")
      }
    names2.foreach { name =>
      val t0 = System.nanoTime()
      graft.driverapi.Queries.all(name)._1(spark, sfDir).collect()
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
