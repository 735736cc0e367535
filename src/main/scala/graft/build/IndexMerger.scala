package graft.build

import graft.codec.PostingCodec
import graft.model._
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Segment merge — the north rule's "sort-merge of segments on term keys".
  *
  * Spark restatement of `SegmentMerger.merge` (SURVEY.md §3.3,
  * `core/index/SegmentMerger.java:113-146`): docIds are remapped through
  * per-segment base offsets (the `MergeState.DocMap` analogue — order
  * preserving, so posting arrays stay sorted), then posting rows are
  * range-partitioned by term and merged streamingly within each
  * partition — Spark's sort-merge shuffle IS the reference's
  * `MultiTermsEnum` k-way priority queue (`core/index/MultiTermsEnum.java:266`).
  *
  * Skew (mega-terms like language keywords): the merged list for one term
  * is emitted as MULTIPLE rows capped at `maxPostingsPerRow` postings
  * (the salt split of SURVEY.md §7.4.3) — legal because posting blocks
  * are self-contained (each carries its delta base) and the query kernel
  * concatenates same-term rows by docId range. No single reducer ever
  * materialises an unbounded posting list.
  */
object IndexMerger {

  /** forceMerge(1)-style compaction: one logical segment (seg = 0) with
    * contiguous docIds 0..N-1 in (old seg, old ord) order.
    */
  def forceMerge(
      spark: SparkSession,
      index: Index,
      numPartitions: Int = 32,
      maxPostingsPerRow: Int = 1 << 20
  ): Index = {
    import spark.implicits._

    // doc-base offsets per old segment (tiny; driver + closure broadcast)
    // integer shift (not SQL division, which promotes to double and loses
    // precision for docIds >= 2^53) — must match segOf exactly
    val perSeg = index.docmeta
      .select(shiftright(col("docId"), IndexBuilder.SegShift).cast("int").as("seg"))
      .groupBy($"seg").count().as[(Int, Long)].collect().sortBy(_._1)
    val bases: Map[Int, Long] = {
      var acc = 0L
      perSeg.map { case (seg, n) => val b = seg -> acc; acc += n; b }.toMap
    }

    def remap(docId: Long): Long =
      bases(IndexBuilder.segOf(docId)) + IndexBuilder.ordOf(docId)

    val docmeta2 = index.docmeta.map(m => m.copy(docId = remap(m.docId)))

    val cap = maxPostingsPerRow
    val postings2: Dataset[PostingList] = index.postings
      .repartitionByRange(numPartitions, $"term")
      .sortWithinPartitions($"term", $"seg")
      .mapPartitions { rows =>
        // streaming k-way merge: rows arrive sorted by (term, seg); same-term
        // runs are concatenated with docIds remapped, re-encoded, and split
        // into <= cap-posting rows
        new Iterator[PostingList] {
          val it = rows.buffered
          val out = scala.collection.mutable.Queue.empty[PostingList]

          private def emit(term: String, ids: Array[Long], freqs: Array[Int],
                           norms: Array[Byte], poss: Array[Array[Int]]): Unit = {
            var from = 0
            while (from < ids.length) {
              val until = math.min(from + cap, ids.length)
              out += PostingCodec.encode(0, term,
                ids.slice(from, until), freqs.slice(from, until),
                norms.slice(from, until), if (poss == null) null else poss.slice(from, until))
              from = until
            }
          }

          private def fill(): Unit = {
            while (out.isEmpty && it.hasNext) {
              val term = it.head.term
              val idsB = Array.newBuilder[Long]
              val fqB = Array.newBuilder[Int]
              val nmB = Array.newBuilder[Byte]
              val psB = Array.newBuilder[Array[Int]]
              var hasPos = true
              while (it.hasNext && it.head.term == term) {
                val pl = it.next()
                val d = PostingCodec.decodeAll(pl, withPositions = true)
                var i = 0
                while (i < d.docIds.length) {
                  idsB += remap(d.docIds(i))
                  fqB += d.freqs(i)
                  nmB += d.norms(i)
                  if (d.positions != null) psB += d.positions(i) else hasPos = false
                  i += 1
                }
              }
              emit(term, idsB.result(), fqB.result(), nmB.result(),
                if (hasPos) psB.result() else null)
            }
          }

          def hasNext: Boolean = { fill(); out.nonEmpty }
          def next(): PostingList = { fill(); out.dequeue() }
        }
      }

    new Index(postings2, docmeta2, index.termStats, index.fieldStats)
  }
}

/** Index invariant checker — the `CheckIndex` analogue
  * (`core/index/CheckIndex.java:114,571`) as a distributed job.
  * Returns human-readable violations (empty = healthy).
  */
object CheckIndex {
  def run(index: Index): Seq[String] = {
    val spark = index.postings.sparkSession
    import spark.implicits._

    val postingViolations = index.postings.flatMap { pl =>
      val d = PostingCodec.decodeAll(pl)
      val errs = scala.collection.mutable.ArrayBuffer.empty[String]
      if (d.docIds.length != pl.df)
        errs += s"term=${pl.term} seg=${pl.seg}: df=${pl.df} != postings=${d.docIds.length}"
      if (d.freqs.map(_.toLong).sum != pl.ttf)
        errs += s"term=${pl.term} seg=${pl.seg}: ttf mismatch"
      var i = 1
      while (i < d.docIds.length) {
        if (d.docIds(i) <= d.docIds(i - 1)) {
          errs += s"term=${pl.term} seg=${pl.seg}: docIds not strictly ascending at $i"
          i = d.docIds.length
        }
        i += 1
      }
      if (d.freqs.exists(_ < 1)) errs += s"term=${pl.term} seg=${pl.seg}: freq < 1"
      errs
    }.take(20).toSeq

    // stats consistency: sum of per-row df/ttf per term == global term stats
    val agg = index.postings.groupBy($"term")
      .agg(sum($"df").as("adf"), sum($"ttf").as("attf"))
    val statViolations = agg.join(index.termStats, "term")
      .filter($"adf" =!= $"df" || $"attf" =!= $"ttf")
      .select($"term").as[String].take(20)
      .map(t => s"term=$t: global stats != sum of segment stats")

    postingViolations ++ statViolations
  }
}
