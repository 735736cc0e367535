package graft.codec

import graft.model.PostingList
import scala.collection.mutable.ArrayBuffer

/** Posting codec: delta + variable-byte encoding in 128-doc blocks over a
  * flat binary payload with primitive-array block metadata (see
  * [[graft.model.PostingList]] for the layout rationale).
  *
  * Mirrors the reference codec's *structure* — 128-doc blocks
  * (`core/codecs/lucene103/ForUtil.java:32`), docIds stored as deltas
  * (`ForDeltaUtil.java:67-139`), positions as per-doc deltas
  * (`Lucene103PostingsWriter.java:300`), per-block skip/impact metadata
  * (`Lucene103PostingsFormat.java:343-353`) — with a variable-byte
  * payload instead of SIMD FOR bit-packing (self-consistent codec; scores
  * never depend on the encoding, only on decoded (docId, freq, norm)).
  */
object PostingCodec {
  val BlockSize = 128

  // ---- varint primitives ------------------------------------------------

  @inline private def writeVLong(buf: ArrayBuffer[Byte], value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) {
      buf += ((v & 0x7f) | 0x80).toByte
      v >>>= 7
    }
    buf += v.toByte
  }

  /** Mutable byte reader over a payload region. */
  final class Reader(bytes: Array[Byte], var pos: Int) {
    @inline def readVLong(): Long = {
      var shift = 0
      var v = 0L
      var b: Byte = 0
      do {
        b = bytes(pos); pos += 1
        v |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    @inline def readByte(): Byte = { val b = bytes(pos); pos += 1; b }
  }

  // ---- encode -------------------------------------------------------------

  /** Encode a full posting list (ascending docIds) for a (seg, term). */
  def encode(
      seg: Int,
      term: String,
      docIds: Array[Long],
      freqs: Array[Int],
      norms: Array[Byte],
      positions: Array[Array[Int]] = null
  ): PostingList = {
    val n = docIds.length
    val numBlocks = (n + BlockSize - 1) / BlockSize
    val counts = new Array[Int](numBlocks)
    val bases = new Array[Long](numBlocks)
    val maxDocs = new Array[Long](numBlocks)
    val maxFreqs = new Array[Int](numBlocks)
    val minNorms = new Array[Byte](numBlocks)
    val offsets = new Array[Int](numBlocks + 1)
    val buf = new ArrayBuffer[Byte](n * 3)
    var ttf = 0L
    var from = 0
    var prevBlockLast = -1L
    var b = 0
    while (from < n) {
      val until = math.min(from + BlockSize, n)
      counts(b) = until - from
      bases(b) = prevBlockLast
      maxDocs(b) = docIds(until - 1)
      var prev = prevBlockLast
      var maxFreq = 0
      var minNormLen = Int.MaxValue
      var minNorm: Byte = 0
      var i = from
      while (i < until) { // docId deltas
        writeVLong(buf, docIds(i) - prev - (if (prev < 0) 0 else 1))
        prev = docIds(i)
        i += 1
      }
      i = from
      while (i < until) { // freqs - 1
        val f = freqs(i)
        writeVLong(buf, (f - 1).toLong)
        if (f > maxFreq) maxFreq = f
        ttf += f
        i += 1
      }
      i = from
      while (i < until) { // norm bytes
        val nb = norms(i)
        buf += nb
        val len = graft.util.SmallFloat.byte4ToInt(nb)
        if (len < minNormLen) { minNormLen = len; minNorm = nb }
        i += 1
      }
      if (positions != null) {
        i = from
        while (i < until) { // position deltas per posting
          val ps = positions(i)
          var prevPos = -1
          var j = 0
          while (j < ps.length) {
            writeVLong(buf, (ps(j) - prevPos - 1).toLong)
            prevPos = ps(j)
            j += 1
          }
          i += 1
        }
      }
      maxFreqs(b) = maxFreq
      minNorms(b) = minNorm
      offsets(b + 1) = buf.length
      prevBlockLast = docIds(until - 1)
      from = until
      b += 1
    }
    PostingList(seg, term, n, ttf, counts, bases, maxDocs, maxFreqs, minNorms,
      offsets, buf.toArray)
  }

  /** Decoded postings of one block. `positions` null unless requested. */
  final case class Decoded(
      docIds: Array[Long],
      freqs: Array[Int],
      norms: Array[Byte],
      positions: Array[Array[Int]]
  )

  /** Decode block `b` of `pl`. */
  def decodeBlock(pl: PostingList, b: Int, withPositions: Boolean = false): Decoded = {
    val count = pl.counts(b)
    val r = new Reader(pl.payload, pl.offsets(b))
    val ids = new Array[Long](count)
    var prev = pl.baseDocIds(b)
    var i = 0
    while (i < count) {
      ids(i) = prev + r.readVLong() + (if (prev < 0) 0 else 1)
      prev = ids(i)
      i += 1
    }
    val freqs = new Array[Int](count)
    var totalFreq = 0
    i = 0
    while (i < count) {
      freqs(i) = (r.readVLong() + 1).toInt
      totalFreq += freqs(i)
      i += 1
    }
    val norms = new Array[Byte](count)
    i = 0
    while (i < count) { norms(i) = r.readByte(); i += 1 }
    var poss: Array[Array[Int]] = null
    if (withPositions) {
      poss = new Array[Array[Int]](count)
      i = 0
      while (i < count) {
        val ps = new Array[Int](freqs(i))
        var prevPos = -1
        var j = 0
        while (j < ps.length) {
          ps(j) = prevPos + r.readVLong().toInt + 1
          prevPos = ps(j)
          j += 1
        }
        poss(i) = ps
        i += 1
      }
    }
    Decoded(ids, freqs, norms, poss)
  }

  /** Decode a whole posting list (test/oracle/merge path; kernels decode
    * block-at-a-time to preserve skipping).
    */
  def decodeAll(pl: PostingList, withPositions: Boolean = false): Decoded = {
    val total = pl.df
    val ids = new Array[Long](total)
    val freqs = new Array[Int](total)
    val norms = new Array[Byte](total)
    val poss = if (withPositions) new Array[Array[Int]](total) else null
    var off = 0
    var b = 0
    while (b < pl.numBlocks) {
      val d = decodeBlock(pl, b, withPositions)
      System.arraycopy(d.docIds, 0, ids, off, d.docIds.length)
      System.arraycopy(d.freqs, 0, freqs, off, d.freqs.length)
      System.arraycopy(d.norms, 0, norms, off, d.norms.length)
      if (withPositions) System.arraycopy(d.positions, 0, poss, off, d.positions.length)
      off += d.docIds.length
      b += 1
    }
    Decoded(ids, freqs, norms, poss)
  }

  /** Concatenate same-term rows whose docId ranges are disjoint; caller
    * passes rows sorted by first docId. Blocks are self-contained, so this
    * is metadata-array concat + payload concat with offset shifting.
    */
  def concat(rows: Seq[PostingList]): PostingList = {
    if (rows.size == 1) return rows.head
    val head = rows.head
    val numBlocks = rows.map(_.numBlocks).sum
    val counts = new Array[Int](numBlocks)
    val bases = new Array[Long](numBlocks)
    val maxDocs = new Array[Long](numBlocks)
    val maxFreqs = new Array[Int](numBlocks)
    val minNorms = new Array[Byte](numBlocks)
    val offsets = new Array[Int](numBlocks + 1)
    val payload = new Array[Byte](rows.map(_.payload.length).sum)
    var b = 0
    var pOff = 0
    rows.foreach { pl =>
      System.arraycopy(pl.counts, 0, counts, b, pl.numBlocks)
      System.arraycopy(pl.baseDocIds, 0, bases, b, pl.numBlocks)
      System.arraycopy(pl.maxDocIds, 0, maxDocs, b, pl.numBlocks)
      System.arraycopy(pl.maxFreqs, 0, maxFreqs, b, pl.numBlocks)
      System.arraycopy(pl.minNorms, 0, minNorms, b, pl.numBlocks)
      var i = 0
      while (i < pl.numBlocks) {
        offsets(b + i + 1) = pOff + pl.offsets(i + 1)
        i += 1
      }
      System.arraycopy(pl.payload, 0, payload, pOff, pl.payload.length)
      pOff += pl.payload.length
      b += pl.numBlocks
    }
    PostingList(head.seg, head.term, rows.map(_.df).sum, rows.map(_.ttf).sum,
      counts, bases, maxDocs, maxFreqs, minNorms, offsets, payload)
  }
}
