package graft.tools

import graft.build.{Datagen, IndexBuilder}
import graft.exec.Searcher
import org.apache.spark.sql.SparkSession

/** Dev-only: Bench phase-2 latency in isolation (no scaling phase).
  * `runMain graft.tools.LatencyProbe [docs]` — prints p50/p90 over the
  * reference query classes on an in-memory index.
  */
object LatencyProbe {
  def main(args: Array[String]): Unit = {
    val docs = if (args.nonEmpty) args(0).toLong else 400000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val idx = {
      val in = Datagen.toInputDocs(Datagen.corpus(spark, docs), 128)
      val i = IndexBuilder.buildInMemory(spark, in)
      i.postings.persist().count()
      i.termStats.persist().count()
      i
    }
    val qs = Seq(
      "def", "return", "needle_7", "needle_13",
      "def AND class", "val AND return AND if",
      "def OR needle_3", "val OR needle_2",
      "(def AND return) OR needle_3",
      "ident_17 AND NOT ident_23",
      "\"class camelCaseName7\"",
      "ident_17*", "camelCaseName2*")
    qs.foreach(q => Searcher.topK(idx, q, 10).collect())
    val lat = qs.flatMap { q =>
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        Searcher.topK(idx, q, 10).collect()
        (System.nanoTime() - t0) / 1e9
      }
    }.sorted
    println(f"p50=${lat(lat.length / 2)}%.4f p90=${lat((lat.length * 9) / 10)}%.4f min=${lat.head}%.4f max=${lat.last}%.4f")

    // hot-filter cache probe: the same costly FILTER subquery repeated —
    // rep 1 walks it, rep 2 materialises+caches it per segment, rep 3+
    // answer the filter from the cached docId sets (FilterCache)
    import graft.query._
    val filtered: Seq[(String, Query)] = Seq(
      ("phrase-filter", BoolQ(must = Seq(TermQ("def")),
        filter = Seq(PhraseQ(Seq("class", "camelcasename7"))))),
      ("wide-prefix-filter", BoolQ(must = Seq(TermQ("return")),
        filter = Seq(ConstScoreQ(PrefixQ("ident_"), 1f)))))
    filtered.foreach { case (name, q) =>
      val reps = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        Searcher.topKQ(idx, q, 10).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"filter-cache [$name]: " +
        reps.map(t => f"$t%.3f").mkString(" ") +
        f" (hot p50=${reps.drop(2).sorted.apply(1)}%.4f)")
    }
    spark.stop()
  }
}
