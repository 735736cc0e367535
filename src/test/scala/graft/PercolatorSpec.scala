package graft

import graft.build.{Datagen, IndexBuilder}
import graft.exec.Searcher
import graft.streaming.Percolator
import graft.streaming.Percolator.Standing

/** Reverse search: standing queries vs doc batches (Monitor analogue). */
class PercolatorSpec extends SparkTest {
  import spark.implicits._

  private val standing = Seq(
    Standing("sq_def", "def"),
    Standing("sq_and", "def AND class"),
    Standing("sq_phrase", "\"class camelCaseName7\""),
    Standing("sq_prefix", "ident_17*"),
    Standing("sq_absent", "zzz_never_indexed"))

  test("batch percolation == per-query matchingDocs singles") {
    val docs = Datagen.toInputDocs(Datagen.corpus(spark, 400, seed = 17L), 3)
    val index = IndexBuilder.buildInMemory(spark, docs)
    val batch = Percolator.percolate(index, standing)
      .as[(String, Long)].collect().toSet
    val singles = Percolator.parse(standing).flatMap { case (qid, q) =>
      Searcher.matchingDocs(index, q).collect().map(d => (qid, d.longValue()))
    }.toSet
    assert(batch == singles)
    assert(!batch.exists(_._1 == "sq_absent"), "absent-term query must prune away")
    assert(batch.exists(_._1 == "sq_def"), "common term must match")
  }

  test("percolateBatch: doc-batch inversion + key join; streaming micro-batches") {
    val in = java.nio.file.Files.createTempDirectory("graftperc-in").toString
    val ck = java.nio.file.Files.createTempDirectory("graftperc-ck").toString
    Datagen.corpus(spark, 150, seed = 41L)
      .map(r => r.copy(content = r.content + " percneedle"))
      .write.mode("append").parquet(in)

    val matches = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val q = spark.readStream.schema(
        spark.read.parquet(in).schema).parquet(in)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", ck)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = Percolator.percolateBatch(spark,
            df.as[graft.model.SourceRow],
            standing :+ Standing("sq_needle", "percneedle"))
          .select($"query_id", $"path").as[(String, String)].collect()
        matches.synchronized { matches ++= rows }
        ()
      }
      .start()
    q.awaitTermination(120000)
    val byQ = matches.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byQ("sq_needle") == 150, s"every batch doc matches the needle: $byQ")
    assert(byQ.getOrElse("sq_absent", 0) == 0)
    assert(byQ.getOrElse("sq_def", 0) > 0)
  }

  test("conflicting standing queries under one id fail fast; exact re-registration is a no-op") {
    val docs = Datagen.toInputDocs(Datagen.corpus(spark, 100, seed = 19L), 2)
    val index = IndexBuilder.buildInMemory(spark, docs)
    intercept[IllegalArgumentException] {
      Percolator.percolate(index,
        Seq(Standing("sq", "def"), Standing("sq", "class"))).count()
    }
    // identical duplicate = harmless re-registration, evaluates once
    val dupOk = Percolator.percolate(index,
      Seq(Standing("sq", "def"), Standing("sq", "def")))
    assert(dupOk.count() == Searcher.count(index, "def"))
  }
}
