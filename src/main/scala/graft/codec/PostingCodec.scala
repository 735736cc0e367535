package graft.codec

import graft.model.PostingList
import scala.collection.mutable.ArrayBuffer

/** Posting codec: delta + FOR bit-packing in 128-doc blocks over a
  * flat binary payload with primitive-array block metadata (see
  * [[graft.model.PostingList]] for the layout rationale).
  *
  * Mirrors the reference codec's *structure* — 128-doc blocks
  * (`core/codecs/lucene103/ForUtil.java:32`), docIds stored as deltas
  * then frame-of-reference bit-packed (`ForDeltaUtil.java:67-139`),
  * positions as per-doc deltas (`Lucene103PostingsWriter.java:300`),
  * per-block skip/impact metadata (`Lucene103PostingsFormat.java:343-353`).
  *
  * Block payload layout (each packed run via [[writePacked]]: plain FOR
  * `[width][pack]` or PFOR-patched
  * `[0x80|width][numEx][pack][(idx,hi) pairs]`,
  * `core/codecs/lucene103/PForUtil.java:28`):
  *   [varint firstDocDelta][packed run: n-1 doc deltas]
  *   [packed run: n freq-1 values]
  *   [n norm bytes]
  *   [packed run: sum(freq) position deltas]   (when positions kept)
  *   [per position: varint payLen + payLen bytes]  (when payload lane on)
  * The first doc delta is varint because it can carry the absolute
  * (seg << 40)-based docId; all in-block deltas fit well under the
  * packer's 57-bit ceiling. A width of 0 costs zero bytes — blocks of
  * all-freq-1 postings store no freq payload at all.
  *
  * Payload lane (round 6 — the PAYLOADS IndexOptions analogue,
  * `core/index/PostingsEnum.java` PAYLOADS): OPTIONAL per row. A row
  * with per-position payloads carries a 2-byte header
  * `[format id][flags]` with `offsets(0) = 2` and flags bit 0 set;
  * payload-less rows keep the 1-byte header — byte-identical to the
  * pre-payload layout, so every existing index decodes unchanged.
  * Readers that don't ask for payloads never touch the lane (blocks
  * are bounded by `offsets`), so the kernel hot paths are unaffected.
  */
object PostingCodec {
  val BlockSize = 128

  /** Does this row carry the per-position payload lane? */
  def hasPayloads(pl: PostingList): Boolean =
    pl.offsets.length > 0 && pl.offsets(0) >= 2 && (pl.payload(1) & 1) != 0

  // ---- varint + bit-packing primitives -----------------------------------

  @inline private def writeVLong(buf: ArrayBuffer[Byte], value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) {
      buf += ((v & 0x7f) | 0x80).toByte
      v >>>= 7
    }
    buf += v.toByte
  }

  @inline private def bitsNeeded(v: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(v)

  /** Append `n` values starting at `from`, each `width` bits (LE bit
    * order). Caller guarantees width <= 57 (in-block deltas are < 2^40).
    */
  private def packBits(buf: ArrayBuffer[Byte], values: Array[Long], from: Int, n: Int, width: Int): Unit = {
    if (width == 0 || n == 0) return
    var acc = 0L
    var accBits = 0
    var i = from
    val until = from + n
    while (i < until) {
      acc |= values(i) << accBits
      accBits += width
      while (accBits >= 8) {
        buf += (acc & 0xff).toByte
        acc >>>= 8
        accBits -= 8
      }
      i += 1
    }
    if (accBits > 0) buf += (acc & 0xff).toByte
  }

  /** PFOR exception patching (`core/codecs/lucene103/PForUtil.java:28,48-104`):
    * at most 7 outliers per packed run are stored as (index, high-bits)
    * byte pairs so one large delta no longer widens the whole run. The
    * patched width is never more than 8 bits below the max width (the
    * high bits must fit one byte), exactly the reference's constraint.
    */
  private val MaxExceptions = 7

  /** Write one packed run, choosing plain FOR or PFOR:
    *   plain:   [width byte (0..63)] [pack(n values at width)]
    *   patched: [0x80 | patchedWidth] [numExceptions byte]
    *            [pack(n masked values)] [(idx, highBits) byte pairs]
    * Patch only when it saves bytes and n <= 256 (idx fits a byte);
    * position runs longer than 256 fall back to plain FOR. MUTATES
    * `values` (masks exception slots) — all call sites pass per-block
    * scratch buffers.
    */
  private def writePacked(buf: ArrayBuffer[Byte], values: Array[Long], from: Int, n: Int): Unit = {
    var wMax = 0
    var i = from
    val until = from + n
    while (i < until) { val w = bitsNeeded(values(i)); if (w > wMax) wMax = w; i += 1 }
    var patched = -1
    if (n > 1 && n <= 256 && wMax > 1) {
      // the (MaxExceptions+1)-th largest value bounds the patched width
      // (<= 7 values can exceed it); tiny ascending top-8 buffer
      val top = new Array[Long](MaxExceptions + 1)
      var filled = 0
      i = from
      while (i < until) {
        val v = values(i)
        if (filled < top.length) {
          var j = filled
          top(j) = v
          while (j > 0 && top(j) < top(j - 1)) {
            val t = top(j); top(j) = top(j - 1); top(j - 1) = t; j -= 1
          }
          filled += 1
        } else if (v > top(0)) {
          top(0) = v
          var j = 0
          while (j + 1 < top.length && top(j) > top(j + 1)) {
            val t = top(j); top(j) = top(j + 1); top(j + 1) = t; j += 1
          }
        }
        i += 1
      }
      val p = math.max(bitsNeeded(top(0)), wMax - 8)
      if (p < wMax) {
        val maxUnpatched = (1L << p) - 1
        var numEx = 0
        i = from
        while (i < until) { if (values(i) > maxUnpatched) numEx += 1; i += 1 }
        // bytes saved by the narrower width vs the count byte + pairs
        val saved = ((n * wMax + 7) / 8) - ((n * p + 7) / 8) - 1 - 2 * numEx
        if (saved > 0) patched = p
      }
    }
    if (patched < 0) {
      buf += wMax.toByte
      packBits(buf, values, from, n, wMax)
    } else {
      val maxUnpatched = (1L << patched) - 1
      buf += (0x80 | patched).toByte
      // collect + mask exceptions, then pack, then append the pairs
      val exIdx = new Array[Int](MaxExceptions)
      val exHi = new Array[Byte](MaxExceptions)
      var numEx = 0
      i = from
      while (i < until) {
        if (values(i) > maxUnpatched) {
          exIdx(numEx) = i - from
          exHi(numEx) = (values(i) >>> patched).toByte
          values(i) &= maxUnpatched
          numEx += 1
        }
        i += 1
      }
      buf += numEx.toByte
      packBits(buf, values, from, n, patched)
      i = 0
      while (i < numEx) {
        buf += exIdx(i).toByte
        buf += exHi(i)
        i += 1
      }
    }
  }

  /** Mutable byte reader over a payload region. */
  final class Reader(bytes: Array[Byte], var pos: Int) {
    /** Raw backing bytes (payload-lane slicing). */
    def bytesRef: Array[Byte] = bytes
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

    /** Read one [[writePacked]] run: plain FOR or PFOR-patched. */
    def readPacked(out: Array[Long], offset: Int, n: Int): Unit = {
      val token = readByte() & 0xff
      if ((token & 0x80) == 0) unpackBits(out, offset, n, token)
      else {
        val width = token & 0x3f
        val numEx = readByte() & 0xff
        unpackBits(out, offset, n, width)
        var e = 0
        while (e < numEx) {
          val idx = readByte() & 0xff
          val hi = readByte() & 0xffL
          out(offset + idx) |= hi << width
          e += 1
        }
      }
    }

    /** Unpack `n` width-bit values into `out(offset until offset+n)`. */
    def unpackBits(out: Array[Long], offset: Int, n: Int, width: Int): Unit = {
      if (n == 0) return
      if (width == 0) { java.util.Arrays.fill(out, offset, offset + n, 0L); return }
      val mask = if (width == 64) -1L else (1L << width) - 1
      var acc = 0L
      var accBits = 0
      var i = 0
      while (i < n) {
        while (accBits < width) {
          acc |= (bytes(pos) & 0xffL) << accBits
          pos += 1
          accBits += 8
        }
        out(offset + i) = acc & mask
        acc >>>= width
        accBits -= width
        i += 1
      }
    }
  }

  // ---- encode -------------------------------------------------------------

  /** Encode a full posting list (ascending docIds) for a (seg, term).
    * `payloads(i)(j)` = posting i's j-th position's payload bytes (null
    * row/element = none); requires positions when supplied.
    */
  def encode(
      seg: Int,
      term: String,
      docIds: Array[Long],
      freqs: Array[Int],
      norms: Array[Byte],
      positions: Array[Array[Int]] = null,
      payloads: Array[Array[Array[Byte]]] = null
  ): PostingList = {
    require(payloads == null || positions != null, "payloads need positions")
    val n = docIds.length
    val numBlocks = (n + BlockSize - 1) / BlockSize
    val counts = new Array[Int](numBlocks)
    val bases = new Array[Long](numBlocks)
    val maxDocs = new Array[Long](numBlocks)
    val maxFreqs = new Array[Int](numBlocks)
    val minNorms = new Array[Byte](numBlocks)
    val offsets = new Array[Int](numBlocks + 1)
    val buf = new ArrayBuffer[Byte](n * 3)
    buf += PForFormat.id // self-describing payload (see PostingFormat)
    if (payloads != null) { buf += 1.toByte; offsets(0) = 2 } // flags: payload lane
    else offsets(0) = 1
    // per-block scratch, reused across blocks (encode is the build hot path)
    val deltas = new Array[Long](BlockSize)
    val fvals = new Array[Long](BlockSize)
    var pvals = new Array[Long](4 * BlockSize)
    var ttf = 0L
    var from = 0
    var prevBlockLast = -1L
    var b = 0
    while (from < n) {
      val until = math.min(from + BlockSize, n)
      counts(b) = until - from
      bases(b) = prevBlockLast
      maxDocs(b) = docIds(until - 1)
      val count = until - from
      var maxFreq = 0
      var minNormLen = Int.MaxValue
      var minNorm: Byte = 0
      // docId deltas: first varint (may carry the absolute seg-based id),
      // rest FOR bit-packed at the block's max delta width
      var prev = prevBlockLast
      var i = from
      while (i < until) {
        deltas(i - from) = docIds(i) - prev - (if (prev < 0) 0 else 1)
        prev = docIds(i)
        i += 1
      }
      writeVLong(buf, deltas(0))
      writePacked(buf, deltas, 1, count - 1)
      // freqs - 1, bit-packed (all-1 freq blocks cost zero payload bytes)
      i = from
      while (i < until) {
        val f = freqs(i)
        fvals(i - from) = (f - 1).toLong
        if (f > maxFreq) maxFreq = f
        ttf += f
        i += 1
      }
      writePacked(buf, fvals, 0, count)
      i = from
      while (i < until) { // norm bytes
        val nb = norms(i)
        buf += nb
        val len = graft.util.SmallFloat.byte4ToInt(nb)
        if (len < minNormLen) { minNormLen = len; minNorm = nb }
        i += 1
      }
      if (positions != null) {
        // per-posting position deltas, bit-packed as ONE run (the count is
        // derivable from the decoded freqs, so no length prefix is needed)
        var total = 0
        i = from
        while (i < until) { total += positions(i).length; i += 1 }
        if (pvals.length < total) pvals = new Array[Long](total)
        var o = 0
        i = from
        while (i < until) {
          val ps = positions(i)
          var prevPos = -1
          var j = 0
          while (j < ps.length) {
            pvals(o) = (ps(j) - prevPos - 1).toLong
            prevPos = ps(j)
            j += 1
            o += 1
          }
          i += 1
        }
        writePacked(buf, pvals, 0, total)
        if (payloads != null) {
          i = from
          while (i < until) {
            val pays = payloads(i)
            var j = 0
            while (j < positions(i).length) {
              val p = if (pays == null) null else pays(j)
              if (p == null) writeVLong(buf, 0L)
              else {
                writeVLong(buf, p.length.toLong)
                var bi = 0
                while (bi < p.length) { buf += p(bi); bi += 1 }
              }
              j += 1
            }
            i += 1
          }
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

  /** [[encode]] over FLAT position storage (one shared int buffer with
    * per-posting offsets) — the inversion hot path writes positions this
    * way to avoid one array allocation per posting. Produces byte-for-byte
    * the same PostingList as [[encode]] with nested positions.
    * `posOff(i)` is posting i's start in `posFlat`; posting n-1 ends at
    * `posEnd`. Flat payload lane (optional): position j's payload bytes
    * are `payFlat(payOff(j) until end)` with end = payOff(j+1) (or
    * `payEnd` for the last position).
    */
  def encodeFlat(
      seg: Int,
      term: String,
      docIds: Array[Long],
      freqs: Array[Int],
      norms: Array[Byte],
      n: Int,
      posFlat: Array[Int],
      posOff: Array[Int],
      posEnd: Int,
      payFlat: Array[Byte] = null,
      payOff: Array[Int] = null,
      payEnd: Int = 0
  ): PostingList = {
    val numBlocks = (n + BlockSize - 1) / BlockSize
    val counts = new Array[Int](numBlocks)
    val bases = new Array[Long](numBlocks)
    val maxDocs = new Array[Long](numBlocks)
    val maxFreqs = new Array[Int](numBlocks)
    val minNorms = new Array[Byte](numBlocks)
    val offsets = new Array[Int](numBlocks + 1)
    val buf = new ArrayBuffer[Byte](n * 3)
    buf += PForFormat.id // self-describing payload (see PostingFormat)
    if (payOff != null) { buf += 1.toByte; offsets(0) = 2 } // flags: payload lane
    else offsets(0) = 1
    val deltas = new Array[Long](BlockSize)
    val fvals = new Array[Long](BlockSize)
    var pvals = new Array[Long](4 * BlockSize)
    var ttf = 0L
    var from = 0
    var prevBlockLast = -1L
    var b = 0
    while (from < n) {
      val until = math.min(from + BlockSize, n)
      counts(b) = until - from
      bases(b) = prevBlockLast
      maxDocs(b) = docIds(until - 1)
      val count = until - from
      var maxFreq = 0
      var minNormLen = Int.MaxValue
      var minNorm: Byte = 0
      var prev = prevBlockLast
      var i = from
      while (i < until) {
        deltas(i - from) = docIds(i) - prev - (if (prev < 0) 0 else 1)
        prev = docIds(i)
        i += 1
      }
      writeVLong(buf, deltas(0))
      writePacked(buf, deltas, 1, count - 1)
      i = from
      while (i < until) {
        val f = freqs(i)
        fvals(i - from) = (f - 1).toLong
        if (f > maxFreq) maxFreq = f
        ttf += f
        i += 1
      }
      writePacked(buf, fvals, 0, count)
      i = from
      while (i < until) {
        val nb = norms(i)
        buf += nb
        val len = graft.util.SmallFloat.byte4ToInt(nb)
        if (len < minNormLen) { minNormLen = len; minNorm = nb }
        i += 1
      }
      // positions for this block: posFlat[posOff(from) .. blockPosEnd)
      val blockPosStart = posOff(from)
      val blockPosEnd = if (until < n) posOff(until) else posEnd
      val total = blockPosEnd - blockPosStart
      if (pvals.length < total) pvals = new Array[Long](total)
      var o = 0
      i = from
      while (i < until) {
        val pStart = posOff(i)
        val pEnd = if (i + 1 < n) posOff(i + 1) else posEnd
        var prevPos = -1
        var j = pStart
        while (j < pEnd) {
          pvals(o) = (posFlat(j) - prevPos - 1).toLong
          prevPos = posFlat(j)
          j += 1
          o += 1
        }
        i += 1
      }
      writePacked(buf, pvals, 0, total)
      if (payOff != null) {
        var j = blockPosStart
        while (j < blockPosEnd) {
          val pEndB = if (j + 1 < posEnd) payOff(j + 1) else payEnd
          val len = pEndB - payOff(j)
          writeVLong(buf, len.toLong)
          var bi = payOff(j)
          while (bi < pEndB) { buf += payFlat(bi); bi += 1 }
          j += 1
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

  /** Decoded postings of one block. `positions` null unless requested;
    * `payloads(i)(j)` (aligned with positions) null unless requested AND
    * the row carries the lane — a position with no payload decodes to
    * null.
    */
  final case class Decoded(
      docIds: Array[Long],
      freqs: Array[Int],
      norms: Array[Byte],
      positions: Array[Array[Int]],
      payloads: Array[Array[Array[Byte]]] = null
  )

  /** Decode block `b` of `pl` — dispatches on the row's self-described
    * format (the Codec SPI read side, see [[PostingFormat]]).
    */
  def decodeBlock(pl: PostingList, b: Int, withPositions: Boolean = false,
      withPayloads: Boolean = false): Decoded =
    PostingFormats.of(pl).decodeBlockImpl(pl, b,
      withPositions || (withPayloads && hasPayloads(pl)),
      withPayloads && hasPayloads(pl))

  /** PFOR block decode (legacy prefix-less rows and PForFormat rows). */
  private[codec] def decodeBlockPFor(pl: PostingList, b: Int, withPositions: Boolean,
      withPayloads: Boolean = false): Decoded = {
    val count = pl.counts(b)
    val r = new Reader(pl.payload, pl.offsets(b))
    // docIds: varint first delta + packed rest, then prefix-sum
    val deltas = new Array[Long](count)
    deltas(0) = r.readVLong()
    r.readPacked(deltas, 1, count - 1)
    val ids = new Array[Long](count)
    var prev = pl.baseDocIds(b)
    var i = 0
    while (i < count) {
      ids(i) = prev + deltas(i) + (if (prev < 0) 0 else 1)
      prev = ids(i)
      i += 1
    }
    // freqs
    val fvals = new Array[Long](count)
    r.readPacked(fvals, 0, count)
    val freqs = new Array[Int](count)
    var totalFreq = 0
    i = 0
    while (i < count) {
      freqs(i) = (fvals(i) + 1).toInt
      totalFreq += freqs(i)
      i += 1
    }
    val norms = new Array[Byte](count)
    i = 0
    while (i < count) { norms(i) = r.readByte(); i += 1 }
    var poss: Array[Array[Int]] = null
    if (withPositions) {
      val pvals = new Array[Long](totalFreq)
      r.readPacked(pvals, 0, totalFreq)
      poss = new Array[Array[Int]](count)
      var o = 0
      i = 0
      while (i < count) {
        val ps = new Array[Int](freqs(i))
        var prevPos = -1
        var j = 0
        while (j < ps.length) {
          ps(j) = prevPos + pvals(o).toInt + 1
          prevPos = ps(j)
          j += 1
          o += 1
        }
        poss(i) = ps
        i += 1
      }
    }
    var pays: Array[Array[Array[Byte]]] = null
    if (withPayloads) {
      pays = new Array[Array[Array[Byte]]](count)
      i = 0
      while (i < count) {
        val pa = new Array[Array[Byte]](freqs(i))
        var j = 0
        while (j < pa.length) {
          val len = r.readVLong().toInt
          if (len > 0) {
            pa(j) = java.util.Arrays.copyOfRange(r.bytesRef, r.pos, r.pos + len)
            r.pos += len
          }
          j += 1
        }
        pays(i) = pa
        i += 1
      }
    }
    Decoded(ids, freqs, norms, poss, pays)
  }

  /** Decode a whole posting list (test/oracle/merge path; kernels decode
    * block-at-a-time to preserve skipping).
    */
  def decodeAll(pl: PostingList, withPositions: Boolean = false,
      withPayloads: Boolean = false): Decoded = {
    val wPay = withPayloads && hasPayloads(pl)
    val total = pl.df
    val ids = new Array[Long](total)
    val freqs = new Array[Int](total)
    val norms = new Array[Byte](total)
    val poss = if (withPositions || wPay) new Array[Array[Int]](total) else null
    val pays = if (wPay) new Array[Array[Array[Byte]]](total) else null
    var off = 0
    var b = 0
    while (b < pl.numBlocks) {
      val d = decodeBlock(pl, b, withPositions || wPay, wPay)
      System.arraycopy(d.docIds, 0, ids, off, d.docIds.length)
      System.arraycopy(d.freqs, 0, freqs, off, d.freqs.length)
      System.arraycopy(d.norms, 0, norms, off, d.norms.length)
      if (poss != null) System.arraycopy(d.positions, 0, poss, off, d.positions.length)
      if (wPay) System.arraycopy(d.payloads, 0, pays, off, d.payloads.length)
      off += d.docIds.length
      b += 1
    }
    Decoded(ids, freqs, norms, poss, pays)
  }

  /** Concatenate same-term rows whose docId ranges are disjoint; caller
    * passes rows sorted by first docId. Blocks are self-contained, so this
    * is metadata-array concat + payload concat with offset shifting.
    */
  def concat(rows: Seq[PostingList]): PostingList = {
    if (rows.size == 1) return rows.head
    val head = rows.head
    val fmt = PostingFormats.of(head)
    val headPay = hasPayloads(head)
    if (rows.exists(r => !(PostingFormats.of(r) eq fmt) || hasPayloads(r) != headPay)) {
      // rare: the same term written under different codecs (mixed-codec
      // generations) or mixed payload-lane presence — decode and
      // re-encode once with the head's format; the lane survives iff any
      // row carries it (missing positions decode to null payloads)
      val withPay = rows.exists(hasPayloads)
      val withPos = graft.build.IndexBuilder.hasPositions(head.term)
      val ds = rows.map(r => decodeAll(r, withPos, withPay))
      val ids = ds.flatMap(_.docIds).toArray
      val freqs = ds.flatMap(_.freqs).toArray
      val norms = ds.flatMap(_.norms).toArray
      val poss = if (withPos) ds.flatMap(_.positions).toArray else null
      val pays =
        if (!withPay) null
        else ds.flatMap(d =>
          if (d.payloads != null) d.payloads
          else new Array[Array[Array[Byte]]](d.docIds.length)).toArray
      return fmt.encode(head.seg, head.term, ids, freqs, norms, poss, pays)
    }
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
      // each row's block 0 starts AFTER its own format prefix byte —
      // re-anchor the start offset per row (head: keeps the prefix
      // visible to the format dispatch; later rows: their embedded
      // prefix bytes become dead padding)
      offsets(b) = pOff + pl.offsets(0)
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
