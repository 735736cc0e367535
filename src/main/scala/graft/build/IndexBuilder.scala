package graft.build

import graft.analysis.CodeAnalyzer
import graft.codec.PostingCodec
import graft.model._
import graft.util.SmallFloat
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** A document routed to a build segment.
  *
  * `seg` is the document-partition id (disjoint docId ranges per segment,
  * SURVEY.md §1.1 "Segment"); `sortKey` fixes ingestion order inside a
  * segment so docId assignment is deterministic and resume-safe (no
  * `zipWithIndex`, SURVEY.md §7.4.4).
  */
final case class InputDoc(
    seg: Int,
    sortKey: String,
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String
)

/** Unified single-pass build output: each input row is tokenized exactly
  * once (like Lucene's indexing chain, `core/index/IndexingChain.java:553`)
  * and fans out into one `meta` row + one `post` row per distinct term.
  * Reading it back filtered by `kind` gives the doc-meta table and the
  * postings table without re-tokenizing.
  */
final case class BuildRow(
    kind: String, // "m" (doc meta) | "p" (posting list)
    seg: Int,
    // meta fields (kind = "m")
    docId: Long,
    repo: String,
    path: String,
    commit: String,
    lang: String,
    sha256: String,
    tokenCount: Int,
    norm: Byte,
    // posting fields (kind = "p")
    term: String,
    df: Int,
    ttf: Long,
    blocks: Array[PostingBlock]
)

/** In-memory (or Parquet-backed) index handle. */
final class Index(
    val postings: Dataset[PostingList],
    val docmeta: Dataset[DocMeta],
    val termStats: Dataset[TermStats],
    val fieldStats: FieldStats
) extends Serializable

/** Inverted-index builder: one shuffle, one tokenize pass, per-segment
  * in-memory inversion.
  *
  * Lifecycle mirrors SURVEY.md §3.1's Spark restatement of the reference
  * indexing chain: route rows to segments (shuffle on `seg`) -> sort
  * within segment by `sortKey` (index-time sort,
  * `core/index/IndexWriterConfig.setIndexSort`) -> assign docIds as
  * (seg << 40 | localOrd) -> tokenize once -> invert into per-term
  * posting arrays (`core/index/TermsHashPerField.java:35,190`) -> encode
  * 128-doc blocks with impacts (`Lucene103PostingsWriter.java:388-401`)
  * -> emit terms in sorted order (flush walks terms sorted,
  * `core/index/FreqProxTermsWriter.java:43,83`).
  *
  * Scale notes: a segment is the unit of build memory and of query
  * parallelism; at 10^12 files the segment count is chosen so one
  * segment's docs fit an executor (the analogue of the reference's
  * 16 MB RAM-buffer flush trigger, `core/index/IndexWriterConfig.java:83`).
  * Skewed mega-terms (keywords in ~every file) cost O(segmentDocs) per
  * segment — bounded, because the skew is spread across all segments by
  * doc-partitioning rather than concentrated on one term key.
  */
object IndexBuilder {
  val SegShift = 40 // docId = seg << 40 | ord; 2^40 docs per segment max

  val DocBits: Long = (1L << SegShift) - 1

  def segOf(docId: Long): Int = (docId >> SegShift).toInt
  def ordOf(docId: Long): Long = docId & DocBits

  def sha256Hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
  }

  /** Invert one segment; emits the meta row then sorted posting rows. */
  private[build] def buildSegment(seg: Int, docs: Iterator[InputDoc]): Iterator[BuildRow] = {
    val sorted = docs.toArray.sortBy(_.sortKey)
    // per-term growable postings (docIds ascending by construction)
    final class Buf {
      val docIds = new mutable.ArrayBuffer[Long](4)
      val freqs = new mutable.ArrayBuffer[Int](4)
      val norms = new mutable.ArrayBuffer[Byte](4)
      val positions = new mutable.ArrayBuffer[Array[Int]](4)
      var ttf = 0L
    }
    val inv = new java.util.HashMap[String, Buf]()
    val metas = new mutable.ArrayBuffer[BuildRow](sorted.length)
    var ord = 0L
    sorted.foreach { d =>
      val docId = (seg.toLong << SegShift) | ord
      ord += 1
      val tokens = CodeAnalyzer.tokenize(d.content)
      val norm = SmallFloat.intToByte4(tokens.length)
      // per-doc term -> positions
      val byTerm = new java.util.HashMap[String, mutable.ArrayBuffer[Int]]()
      tokens.foreach { t =>
        var ps = byTerm.get(t.term)
        if (ps == null) { ps = new mutable.ArrayBuffer[Int](2); byTerm.put(t.term, ps) }
        ps += t.pos
      }
      byTerm.forEach { (term, ps) =>
        var buf = inv.get(term)
        if (buf == null) { buf = new Buf; inv.put(term, buf) }
        buf.docIds += docId
        buf.freqs += ps.length
        buf.norms += norm
        buf.positions += ps.toArray
        buf.ttf += ps.length
      }
      metas += BuildRow(
        kind = "m", seg = seg, docId = docId, repo = d.repo, path = d.path,
        commit = d.commit, lang = d.lang, sha256 = sha256Hex(d.content),
        tokenCount = tokens.length, norm = norm,
        term = null, df = 0, ttf = 0L, blocks = null
      )
    }
    val terms = inv.keySet().toArray(new Array[String](0))
    java.util.Arrays.sort(terms.asInstanceOf[Array[Object]])
    val posts = terms.iterator.map { term =>
      val buf = inv.get(term)
      val blocks = PostingCodec.encode(
        buf.docIds.toArray, buf.freqs.toArray, buf.norms.toArray, buf.positions.toArray)
      BuildRow(
        kind = "p", seg = seg, docId = -1L, repo = null, path = null, commit = null,
        lang = null, sha256 = null, tokenCount = 0, norm = 0,
        term = term, df = buf.docIds.length, ttf = buf.ttf, blocks = blocks
      )
    }
    metas.iterator ++ posts
  }

  private def toIndex(spark: SparkSession, out: Dataset[BuildRow]): Index = {
    import spark.implicits._
    val postings = out.filter(_.kind == "p")
      .map(r => PostingList(r.seg, r.term, r.df, r.ttf, r.blocks))
    val docmeta = out.filter(_.kind == "m")
      .map(r => DocMeta(r.docId, r.repo, r.path, r.commit, r.lang, r.sha256, r.tokenCount, r.norm))
    // global term stats: partial (per-seg df/ttf already aggregated) -> final
    val termStats = postings.groupBy($"term")
      .agg(sum($"df").as("df"), sum($"ttf").as("ttf"))
      .as[TermStats]
    val fs = docmeta.agg(count(lit(1)), coalesce(sum($"tokenCount".cast("long")), lit(0L)))
      .as[(Long, Long)].head()
    new Index(postings, docmeta, termStats, FieldStats(fs._1, fs._2))
  }

  /** Build fully in memory (cached) — test/driver-query path. */
  def buildInMemory(spark: SparkSession, docs: Dataset[InputDoc]): Index = {
    import spark.implicits._
    val out = docs.groupByKey(_.seg)
      .flatMapGroups((seg, it) => buildSegment(seg, it))
      .persist()
    toIndex(spark, out)
  }

  // ---------- persistent, resumable build (north rule: checkpoint + lineage) ----------

  /** Config hash for lineage: analyzer + codec + layout version. */
  val CodeConfigHash: String = sha256Hex(
    s"analyzer=word+lower+max${CodeAnalyzer.MaxTokenLength};codec=vbyte-delta-b${PostingCodec.BlockSize};layout=v1"
  ).take(16)

  /** Order-independent fingerprint of a segment's input slice
    * (xor+count of per-row key hashes; commit pins content).
    */
  private def fingerprints(docs: Dataset[InputDoc]): Map[Int, String] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select($"seg",
        xxhash64(concat_ws("|", $"repo", $"path", $"commit")).as("h"))
      .groupBy($"seg")
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("s"))
      .as[(Int, Long, Long)].collect()
      .map { case (seg, n, s) => seg -> s"$n:${java.lang.Long.toHexString(s)}" }
      .toMap
  }

  private def manifestPath(dir: String, seg: Int) = s"$dir/manifest/seg_$seg.json"

  private def readManifest(dir: String, seg: Int): Option[SegmentManifest] = {
    val p = java.nio.file.Paths.get(manifestPath(dir, seg))
    if (!java.nio.file.Files.exists(p)) None
    else {
      // minimal JSON parse of our own flat writes
      val s = java.nio.file.Files.readString(p)
      def f(k: String): String = {
        val m = ("\"" + k + "\"\\s*:\\s*\"?([^\",}]*)\"?").r.findFirstMatchIn(s)
        m.map(_.group(1)).getOrElse("")
      }
      try Some(SegmentManifest(f("seg").toInt, f("status"), f("docs").toLong,
        f("postings").toLong, f("bytes").toLong, f("inputFingerprint"), f("codeConfigHash")))
      catch { case _: Exception => None }
    }
  }

  private def writeManifest(dir: String, m: SegmentManifest): Unit = {
    val p = java.nio.file.Paths.get(manifestPath(dir, m.seg))
    java.nio.file.Files.createDirectories(p.getParent)
    val json =
      s"""{"seg":${m.seg},"status":"${m.status}","docs":${m.docs},"postings":${m.postings},""" +
        s""""bytes":${m.bytes},"inputFingerprint":"${m.inputFingerprint}","codeConfigHash":"${m.codeConfigHash}"}"""
    java.nio.file.Files.writeString(p, json)
  }

  /** Resumable persistent build.
    *
    * Layout: `dir/segments/` parquet partitioned by (kind, seg);
    * `dir/manifest/seg_K.json` per-segment checkpoint rows with lineage
    * (input fingerprint + code/config hash) and metrics (docs, postings,
    * bytes) — the `segments_N` analogue (`core/index/SegmentInfos.java:55-106`).
    * A segment is only believed if its manifest row exists, matches the
    * recomputed input fingerprint and the current code/config hash;
    * partial parquet output from a killed run is overwritten via dynamic
    * partition overwrite. Returns per-segment manifests.
    */
  def buildPersistent(
      spark: SparkSession,
      docs: Dataset[InputDoc],
      dir: String,
      resume: Boolean = true
  ): Seq[SegmentManifest] = {
    import spark.implicits._
    val fps = fingerprints(docs)
    val todo = fps.filter { case (seg, fp) =>
      !resume || !readManifest(dir, seg).exists(m =>
        m.status == "complete" && m.inputFingerprint == fp && m.codeConfigHash == CodeConfigHash)
    }.keySet

    if (todo.nonEmpty) {
      val out = docs.filter($"seg".isin(todo.toSeq: _*))
        .as[InputDoc]
        .groupByKey(_.seg)
        .flatMapGroups((seg, it) => buildSegment(seg, it))
      out.write
        .partitionBy("kind", "seg")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(s"$dir/segments")

      // metrics per rebuilt segment (column-pruned scan of what was written)
      val built = spark.read.parquet(s"$dir/segments")
        .filter($"kind" === "p" && $"seg".isin(todo.toSeq: _*))
        .select($"seg", $"df".cast("long").as("df"),
          (aggregate(transform($"blocks", b =>
            octet_length(b("docIds")) + octet_length(b("freqs")) +
              octet_length(b("norms")) + octet_length(b("positions"))),
            lit(0L), (acc, x) => acc + x)).as("bytes"))
        .groupBy($"seg").agg(sum($"df").as("postings"), sum($"bytes").as("bytes"))
        .as[(Int, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      val docsPerSeg = spark.read.parquet(s"$dir/segments")
        .filter($"kind" === "m" && $"seg".isin(todo.toSeq: _*))
        .groupBy($"seg").count().as[(Int, Long)].collect().toMap

      todo.foreach { seg =>
        val (postings, bytes) = built.getOrElse(seg, (0L, 0L))
        writeManifest(dir, SegmentManifest(seg, "complete", docsPerSeg.getOrElse(seg, 0L),
          postings, bytes, fps(seg), CodeConfigHash))
      }
      // refresh global stats (invalid once any segment changed)
      writeStats(spark, dir)
    } else if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/stats/field.json"))) {
      writeStats(spark, dir)
    }
    fps.keys.toSeq.sorted.flatMap(seg => readManifest(dir, seg))
  }

  private def writeStats(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    val posts = spark.read.parquet(s"$dir/segments").filter($"kind" === "p")
    posts.groupBy($"term").agg(sum($"df").as("df"), sum($"ttf").as("ttf"))
      .write.mode("overwrite").parquet(s"$dir/stats/terms")
    val metas = spark.read.parquet(s"$dir/segments").filter($"kind" === "m")
    val (n, sttf) = metas.agg(count(lit(1)), coalesce(sum($"tokenCount".cast("long")), lit(0L)))
      .as[(Long, Long)].head()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/stats/field.json"),
      s"""{"docCount":$n,"sumTotalTermFreq":$sttf}""")
  }

  /** Open a persistent index. */
  def open(spark: SparkSession, dir: String): Index = {
    import spark.implicits._
    val seg = spark.read.parquet(s"$dir/segments")
    val postings = seg.filter($"kind" === "p")
      .select($"seg", $"term", $"df", $"ttf", $"blocks").as[PostingList]
    val docmeta = seg.filter($"kind" === "m")
      .select($"docId", $"repo", $"path", $"commit", $"lang", $"sha256", $"tokenCount", $"norm")
      .as[DocMeta]
    val termStats = spark.read.parquet(s"$dir/stats/terms").as[TermStats]
    val fsJson = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$dir/stats/field.json"))
    def num(k: String): Long =
      ("\"" + k + "\"\\s*:\\s*(\\d+)").r.findFirstMatchIn(fsJson).map(_.group(1).toLong).getOrElse(0L)
    new Index(postings, docmeta, termStats, FieldStats(num("docCount"), num("sumTotalTermFreq")))
  }
}
