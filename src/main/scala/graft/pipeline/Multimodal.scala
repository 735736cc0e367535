package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline.
  *
  * Media (image/audio/video) ride as opaque `binary` columns with typed
  * metadata. The expensive decode/feature step runs batched per
  * partition (`mapPartitions` — the Scala analogue of `mapInPandas`
  * batch UDFs): partition-sized batches amortise model/codec
  * initialisation, and the schema contract keeps Catalyst planning the
  * scan/shuffle around the opaque payload. The actual codec is STUBBED
  * (no image/audio libraries in this environment) with a deterministic
  * fake — the Spark-side plumbing (schema, batching, partitioning) is
  * real and tested.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, mediaType: String, payload: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long,
      mediaType: String,
      byteLen: Int,
      // stubbed "decoded" metadata a real codec would produce:
      width: Int,
      height: Int,
      channels: Int,
      embedding: Array[Float] // stubbed feature vector (deterministic)
  )

  /** Deterministic stub codec: a real implementation would hand `payload`
    * to an image/audio codec here (???-equivalent boundary). The stub is
    * a PURE function of the payload bytes at fixed offsets —
    * width = 16 + (bytes[0..1] mod 2033), height = 16 + (bytes[2..3] mod
    * 2033), channels = 1 + (bytes[4] mod 4) — so an external oracle can
    * reproduce the "decode" from the same bytes and the whole pipeline
    * stays differentially checkable even though no media library exists
    * in this environment.
    */
  private def stubDecode(r: MediaRow): MediaFeatures = {
    @inline def b(i: Int): Int =
      if (r.payload.isEmpty) 0 else r.payload(i % r.payload.length) & 0xff
    MediaFeatures(
      doc_id = r.doc_id,
      mediaType = r.mediaType,
      byteLen = r.payload.length,
      width = 16 + ((b(0) << 8 | b(1)) % 2033),
      height = 16 + ((b(2) << 8 | b(3)) % 2033),
      channels = 1 + (b(4) % 4),
      embedding = Array.tabulate(8)(i => b(i) / 255.0f)
    )
  }

  /** Batched decode/feature-extract over the opaque payload column. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // per-partition init happens here in a real codec (load model, ...)
      batch.map(stubDecode)
    }
  }

  /** Build a deterministic media table from the documents table (fake
    * payloads derived from text) — test/driver harness input.
    */
  def fromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id",
        when($"doc_id" % 3 === 0, "image").when($"doc_id" % 3 === 1, "audio")
          .otherwise("video").as("mediaType"),
        unhex(md5($"text")).as("payload"))
      .as[MediaRow]
  }

  final case class ResizedFeatures(
      doc_id: Long,
      width: Int,
      height: Int,
      rWidth: Int,
      rHeight: Int,
      rByteLen: Long
  )

  /** Resize stage (stub codec, real plumbing): aspect-preserving fit into
    * (maxW, maxH); the "resized payload size" scales with the area ratio.
    * Batched like decode — a real implementation re-encodes pixels here.
    */
  def resizeTo(features: Dataset[MediaFeatures], maxW: Int, maxH: Int): Dataset[ResizedFeatures] = {
    import features.sparkSession.implicits._
    features.mapPartitions { batch =>
      batch.map { f =>
        val scale = math.min(1.0, math.min(maxW.toDouble / f.width, maxH.toDouble / f.height))
        val rw = math.max(1, math.floor(f.width * scale).toInt)
        val rh = math.max(1, math.floor(f.height * scale).toInt)
        val rLen = math.max(1L, (f.byteLen.toLong * rw * rh) / (f.width.toLong * f.height))
        ResizedFeatures(f.doc_id, f.width, f.height, rw, rh, rLen)
      }
    }
  }

  final case class Frame(doc_id: Long, frame_idx: Int, frame_key: String)

  /** Frame sampling for video rows: 1 + doc_id % 4 frames per video, each
    * identified by a deterministic md5 over (hex(payload), frame index) —
    * a real codec would seek+decode the frame here. flatMap = one output
    * row per frame (the generator/UDTF shape).
    */
  def sampleFrames(media: Dataset[MediaRow]): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.mediaType == "video").flatMap { r =>
      val hexPayload = r.payload.map("%02x".format(_)).mkString
      val n = 1 + (r.doc_id % 4).toInt
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until n).map { j =>
        md.reset()
        val d = md.digest(s"$hexPayload-$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        Frame(r.doc_id, j, d.map("%02x".format(_)).mkString)
      }
    }
  }
}
