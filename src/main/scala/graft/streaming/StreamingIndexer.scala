package graft.streaming

import graft.build.{IndexBuilder, InputDoc}
import graft.model.SourceRow
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Incremental index maintenance via Structured Streaming.
  *
  * The reference's near-real-time story — flushed segments become
  * searchable without a full rebuild (`core/search/SearcherManager.java`,
  * `ControlledRealTimeReopenThread.java`) — maps to: `readStream` over
  * the arriving source files, `foreachBatch` turning every micro-batch
  * into a fresh set of segments appended to the persistent index
  * (new `segments_N` generation), `Trigger.AvailableNow` for catch-up
  * runs. Readers simply re-open the index (`IndexBuilder.open`) to see
  * the new segments — segment immutability makes this safe, exactly like
  * the reference's commit-point protocol.
  *
  * Segment ids are allocated above the current maximum so batches never
  * collide; the per-segment manifests keep the build resumable and audited
  * (docs/postings/bytes per batch).
  */
object StreamingIndexer {

  private def nextSegBase(indexDir: String): Int = {
    val dir = new java.io.File(s"$indexDir/manifest")
    if (!dir.exists()) 0
    else {
      val segs = dir.listFiles().toSeq
        .map(_.getName).collect { case s if s.startsWith("seg_") =>
          s.stripPrefix("seg_").stripSuffix(".json").toInt
        }
      if (segs.isEmpty) 0 else segs.max + 1
    }
  }

  /** Process all currently-available input files into the index, then
    * stop (AvailableNow). Call again as new files arrive; the stream
    * checkpoint guarantees exactly-once per input file.
    */
  def runAvailableNow(
      spark: SparkSession,
      inputDir: String,
      indexDir: String,
      segsPerBatch: Int = 4
  ): Unit = {
    import spark.implicits._
    val schema = org.apache.spark.sql.Encoders.product[SourceRow].schema
    val stream = spark.readStream.schema(schema).parquet(inputDir)
    val query = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$indexDir/_stream_checkpoint")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val base = nextSegBase(indexDir)
        val docs = df.as[SourceRow].map { r =>
          val key = s"${r.repo}/${r.path}@${r.commit}"
          val seg = base + math.floorMod(
            scala.util.hashing.MurmurHash3.stringHash(key), segsPerBatch)
          InputDoc(seg, key, r.repo, r.path, r.commit, r.lang, r.content)
        }
        IndexBuilder.buildPersistent(spark, docs, indexDir, resume = true)
        (): Unit
      }
      .start()
    query.awaitTermination()
  }
}
