package graft.core

/** 3D Morton (Z-order) kernel — the volumetric extension the reference
  * never needed (its height queries post-filter z, retrieve_data.py:
  * 85-101). With a 3D key, a zmin/zmax-selective query prunes blocks
  * in z exactly like x/y: the round-7 path to SFC-pruned height
  * selections (suites B10–B12) instead of post-explode filters.
  *
  * 21 bits per dimension -> 63-bit keys; every-3rd-bit spread via
  * magic masks (the standard 3D generalization of [[Morton.expand]]).
  */
object Morton3 {

  private final val Mask21 = (1L << 21) - 1

  /** Spread the low 21 bits of v so bit i lands at bit 3i. */
  def expand3(v: Long): Long = {
    var x = v & Mask21
    x = (x | (x << 32)) & 0x1F00000000FFFFL
    x = (x | (x << 16)) & 0x1F0000FF0000FFL
    x = (x | (x << 8)) & 0x100F00F00F00F00FL
    x = (x | (x << 4)) & 0x10C30C30C30C30C3L
    x = (x | (x << 2)) & 0x1249249249249249L
    x
  }

  /** Inverse of expand3: gather every 3rd bit into the low 21 bits. */
  def compact3(v: Long): Long = {
    var x = v & 0x1249249249249249L
    x = (x | (x >>> 2)) & 0x10C30C30C30C30C3L
    x = (x | (x >>> 4)) & 0x100F00F00F00F00FL
    x = (x | (x >>> 8)) & 0x1F0000FF0000FFL
    x = (x | (x >>> 16)) & 0x1F00000000FFFFL
    x = (x | (x >>> 32)) & Mask21
    x
  }

  /** Interleave (x, y, z) -> 63-bit key; x bits 0,3,6,…; y offset 1;
    * z offset 2. */
  def encode(x: Long, y: Long, z: Long): Long =
    expand3(x) | (expand3(y) << 1) | (expand3(z) << 2)

  def encodeChecked(x: Long, y: Long, z: Long): Long = {
    require(x >= 0 && y >= 0 && z >= 0,
      s"Morton3 encode requires non-negative input, got ($x, $y, $z)")
    require(x <= Mask21 && y <= Mask21 && z <= Mask21,
      s"Morton3 encode caps at 21 bits/dim, got ($x, $y, $z)")
    encode(x, y, z)
  }

  def decodeX(m: Long): Long = compact3(m)
  def decodeY(m: Long): Long = compact3(m >>> 1)
  def decodeZ(m: Long): Long = compact3(m >>> 2)
}
