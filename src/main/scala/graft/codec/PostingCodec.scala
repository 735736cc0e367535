package graft.codec

import graft.model.PostingBlock
import scala.collection.mutable.ArrayBuffer

/** Posting-block codec: delta + variable-byte encoding in 128-doc blocks.
  *
  * Mirrors the reference codec's *structure* — 128-doc blocks
  * (`core/codecs/lucene103/ForUtil.java:32`), docIds stored as deltas
  * (`ForDeltaUtil.java:67-139`), positions as per-doc deltas
  * (`Lucene103PostingsWriter.java:300`), per-block skip/impact metadata
  * (`Lucene103PostingsFormat.java:343-353`) — with a variable-byte
  * payload instead of SIMD FOR bit-packing (self-consistent codec; scores
  * never depend on the encoding, only on decoded (docId, freq, norm)).
  * Freqs are stored as (freq - 1) since freq >= 1. Norm bytes ride along
  * raw (see PostingList scaladoc for why norms are denormalised into
  * blocks).
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

  /** Decode exactly `n` vlongs from `bytes` starting at offset 0. */
  private def readVLongs(bytes: Array[Byte], out: Array[Long], n: Int): Unit = {
    var i = 0
    var k = 0
    while (k < n) {
      var shift = 0
      var v = 0L
      var b: Byte = 0
      do {
        b = bytes(i); i += 1
        v |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      out(k) = v
      k += 1
    }
  }

  // ---- block encode/decode ----------------------------------------------

  /** Encode one block (<= 128 postings) of ascending docIds with aligned
    * freqs, norm bytes and per-posting ascending positions. `prevDocId`
    * is the last docId of the previous block (or -1), so doc deltas chain
    * across blocks like the reference's doc-delta stream; positions
    * restart per document.
    */
  def encodeBlock(
      docIds: Array[Long],
      freqs: Array[Int],
      norms: Array[Byte],
      positions: Array[Array[Int]], // may be null => no positions indexed
      from: Int,
      until: Int,
      prevDocId: Long
  ): PostingBlock = {
    val dBuf = new ArrayBuffer[Byte]((until - from) * 2)
    val fBuf = new ArrayBuffer[Byte](until - from)
    val pBuf = new ArrayBuffer[Byte](if (positions == null) 0 else (until - from) * 2)
    var prev = prevDocId
    var maxFreq = 0
    var minNormLen = Int.MaxValue
    var minNorm: Byte = 0
    val nBytes = new Array[Byte](until - from)
    var i = from
    while (i < until) {
      writeVLong(dBuf, docIds(i) - prev - (if (prev < 0) 0 else 1))
      prev = docIds(i)
      val f = freqs(i)
      writeVLong(fBuf, (f - 1).toLong)
      if (f > maxFreq) maxFreq = f
      val nb = norms(i)
      val len = graft.util.SmallFloat.byte4ToInt(nb)
      if (len < minNormLen) { minNormLen = len; minNorm = nb }
      nBytes(i - from) = nb
      if (positions != null) {
        val ps = positions(i)
        var prevPos = -1
        var j = 0
        while (j < ps.length) {
          writeVLong(pBuf, (ps(j) - prevPos - 1).toLong)
          prevPos = ps(j)
          j += 1
        }
      }
      i += 1
    }
    PostingBlock(
      maxDocId = docIds(until - 1),
      maxFreq = maxFreq,
      minNorm = minNorm,
      docIds = dBuf.toArray,
      freqs = fBuf.toArray,
      norms = nBytes,
      positions = pBuf.toArray
    )
  }

  /** Encode a full posting list (ascending docIds) into 128-doc blocks. */
  def encode(
      docIds: Array[Long],
      freqs: Array[Int],
      norms: Array[Byte],
      positions: Array[Array[Int]] = null
  ): Array[PostingBlock] = {
    val n = docIds.length
    val blocks = new ArrayBuffer[PostingBlock](n / BlockSize + 1)
    var from = 0
    var prev = -1L
    while (from < n) {
      val until = math.min(from + BlockSize, n)
      blocks += encodeBlock(docIds, freqs, norms, positions, from, until, prev)
      prev = docIds(until - 1)
      from = until
    }
    blocks.toArray
  }

  /** Decoded postings of one block. `positions(i)` is non-null only when
    * decoded with positions.
    */
  final case class Decoded(
      docIds: Array[Long],
      freqs: Array[Int],
      norms: Array[Byte],
      positions: Array[Array[Int]]
  )

  /** Decode one block given the previous block's last docId (or -1). */
  def decodeBlock(b: PostingBlock, prevDocId: Long, withPositions: Boolean = false): Decoded = {
    val count = b.norms.length
    val deltas = new Array[Long](count)
    readVLongs(b.docIds, deltas, count)
    val fs = new Array[Long](count)
    readVLongs(b.freqs, fs, count)
    val ids = new Array[Long](count)
    val freqs = new Array[Int](count)
    var prev = prevDocId
    var i = 0
    var totalFreq = 0
    while (i < count) {
      ids(i) = prev + deltas(i) + (if (prev < 0) 0 else 1)
      prev = ids(i)
      freqs(i) = (fs(i) + 1).toInt
      totalFreq += freqs(i)
      i += 1
    }
    var poss: Array[Array[Int]] = null
    if (withPositions && b.positions.nonEmpty) {
      val flat = new Array[Long](totalFreq)
      readVLongs(b.positions, flat, totalFreq)
      poss = new Array[Array[Int]](count)
      var k = 0
      i = 0
      while (i < count) {
        val ps = new Array[Int](freqs(i))
        var prevPos = -1
        var j = 0
        while (j < ps.length) {
          ps(j) = prevPos + flat(k).toInt + 1
          prevPos = ps(j)
          k += 1
          j += 1
        }
        poss(i) = ps
        i += 1
      }
    }
    Decoded(ids, freqs, b.norms, poss)
  }

  /** Decode a whole posting list (test/oracle path; kernels decode
    * block-at-a-time to preserve skipping).
    */
  def decodeAll(blocks: Array[PostingBlock], withPositions: Boolean = false): Decoded = {
    var total = 0
    blocks.foreach(b => total += b.norms.length)
    val ids = new Array[Long](total)
    val freqs = new Array[Int](total)
    val norms = new Array[Byte](total)
    val poss = if (withPositions) new Array[Array[Int]](total) else null
    var off = 0
    var prev = -1L
    blocks.foreach { b =>
      val d = decodeBlock(b, prev, withPositions)
      System.arraycopy(d.docIds, 0, ids, off, d.docIds.length)
      System.arraycopy(d.freqs, 0, freqs, off, d.freqs.length)
      System.arraycopy(d.norms, 0, norms, off, d.norms.length)
      if (withPositions && d.positions != null)
        System.arraycopy(d.positions, 0, poss, off, d.positions.length)
      off += d.docIds.length
      if (d.docIds.length > 0) prev = d.docIds(d.docIds.length - 1)
    }
    Decoded(ids, freqs, norms, poss)
  }
}
