package graft.util

/** Byte-quantised positive-int encoding used for document-length norms.
  *
  * Semantics re-implemented from the reference
  * (`core/util/SmallFloat.java:103-169`): values below a threshold are
  * exact; above it, a 4-bit-mantissa floating encoding keeps the 4 most
  * significant bits. BM25 rank-identity to the reference requires
  * byte-for-byte identical norms (`BM25Similarity.java:111-117` builds a
  * 256-entry decoded LENGTH_TABLE from exactly this encoding).
  */
object SmallFloat {

  /** Float-like encoding for positive longs preserving order, 4
    * significant bits. Ref: `core/util/SmallFloat.java:103` longToInt4.
    */
  def longToInt4(i: Long): Int = {
    require(i >= 0, s"Only supports positive values, got $i")
    val numBits = 64 - java.lang.Long.numberOfLeadingZeros(i)
    if (numBits < 4) {
      // subnormal value
      i.toInt
    } else {
      // normal value: keep top 4 bits, drop the implicit leading one
      val shift = numBits - 4
      var encoded = (i >>> shift).toInt
      encoded &= 0x07
      encoded |= (shift + 1) << 3
      encoded
    }
  }

  /** Inverse of [[longToInt4]]. Ref: `core/util/SmallFloat.java:125`. */
  def int4ToLong(i: Int): Long = {
    val bits: Long = i & 0x07
    val shift = (i >>> 3) - 1
    if (shift == -1) bits // subnormal
    else (bits | 0x08L) << shift // normal
  }

  private val MaxInt4 = longToInt4(Int.MaxValue)

  /** Number of low values encoded exactly (= 24 for this scheme). */
  val NumFreeValues: Int = 255 - MaxInt4

  /** Encode a positive int to one byte; low values exact.
    * Ref: `core/util/SmallFloat.java:147` intToByte4.
    */
  def intToByte4(i: Int): Byte = {
    require(i >= 0, s"Only supports positive values, got $i")
    if (i < NumFreeValues) i.toByte
    else (NumFreeValues + longToInt4((i - NumFreeValues).toLong)).toByte
  }

  /** Decode [[intToByte4]]. Ref: `core/util/SmallFloat.java:159`. */
  def byte4ToInt(b: Byte): Int = {
    val i = java.lang.Byte.toUnsignedInt(b)
    if (i < NumFreeValues) i
    else {
      val decoded = NumFreeValues + int4ToLong(i - NumFreeValues)
      Math.toIntExact(decoded)
    }
  }

  /** Decoded length per norm byte — the scoring-side lookup table
    * (`BM25Similarity.java:111-117`).
    */
  val LengthTable: Array[Float] = Array.tabulate(256)(i => byte4ToInt(i.toByte).toFloat)
}
