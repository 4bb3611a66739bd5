package graft.core

/** 2D Morton (Z-order) space-filling-curve kernel.
  *
  * Re-expresses the reference's numba bit-interleave kernels
  * (reference: pcsfc/encoder.py:8-48, pcsfc/decoder.py:4-80) as pure
  * static Scala so Catalyst codegen (see graft.functions.MortonEncode2D)
  * can call straight into JIT-friendly long arithmetic.
  *
  * Inputs are quantized non-negative grid coordinates of up to 31 bits
  * per dimension; the interleaved key occupies up to 62 bits of a Long
  * (the reference caps at 31 bits/dim too, encoder.py:27-33, but stores
  * heads in a pg INT which can overflow — we keep everything 64-bit).
  */
object Morton {

  /** Spread the low 32 bits of v so bit i lands at bit 2i
    * (magic-mask divide and conquer; reference encoder.py:8-33). */
  def expand(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Inverse of expand: gather even bits of v into the low 32 bits
    * (reference decoder.py:24-36). */
  def compact(v: Long): Long = {
    var x = v & 0x5555555555555555L
    x = (x | (x >>> 1)) & 0x3333333333333333L
    x = (x | (x >>> 2)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x >>> 4)) & 0x00FF00FF00FF00FFL
    x = (x | (x >>> 8)) & 0x0000FFFF0000FFFFL
    x = (x | (x >>> 16)) & 0x00000000FFFFFFFFL
    x
  }

  /** Interleave (x, y) -> Morton key; x occupies even bits, y odd bits
    * (reference encoder.py:48: EncodeMorton2D = Expand2D(x) + (Expand2D(y) << 1)).
    * Negative input is a caller bug (reference raises, encoder.py:24-25);
    * we validate at the quantize stage and here only in encodeChecked. */
  def encode(x: Long, y: Long): Long = expand(x) | (expand(y) << 1)

  def encodeChecked(x: Long, y: Long): Long = {
    require(x >= 0 && y >= 0, s"Morton encode requires non-negative input, got ($x, $y)")
    require(x < (1L << 31) && y < (1L << 31), s"Morton encode caps at 31 bits/dim, got ($x, $y)")
    encode(x, y)
  }

  /** x component (even bits) of a Morton key (reference decoder.py:68-80). */
  def decodeX(m: Long): Long = compact(m)

  /** y component (odd bits) of a Morton key. */
  def decodeY(m: Long): Long = compact(m >>> 1)

  /** Number of bits needed to represent v (0 -> 0). */
  def bitLength(v: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(v)

  /** Head/tail split lengths for a grid with max quantized coords
    * (xMax, yMax) and a head ratio knob (reference
    * pcsfc/point_processor.py:11-21: head = int(bitlen * ratio) forced
    * even by subtracting 1 if odd; tail = rest).
    */
  def splitLengths(xMax: Long, yMax: Long, ratio: Double): (Int, Int) = {
    val total = bitLength(encode(xMax, yMax)).max(2)
    var head = (total * ratio).toInt
    if (head % 2 != 0) head -= 1
    if (head < 0) head = 0
    if (head > total) head = total
    (head, total - head)
  }
}
