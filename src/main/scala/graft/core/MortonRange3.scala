package graft.core

import scala.collection.mutable.ArrayBuffer

/** Inclusive 3D box in quantized grid coordinates (possibly fractional
  * bounds, e.g. a sphere's enclosing box). */
final case class Box3(xMin: Double, xMax: Double, yMin: Double, yMax: Double,
    zMin: Double, zMax: Double)

/** Octree descent over 3D Morton prefixes — the volumetric
  * [[MortonRange]]: same one-bit-per-level frontier walk, same budget
  * flush, relying on the identical invariant that a bit-aligned Morton
  * interval [p·2^r, (p+1)·2^r) decodes to an axis-aligned BOX (min key
  * -> min corner, max key -> max corner, any r). Feeds a z-selective
  * head predicate so height queries (suites B10–B12) prune storage in
  * z exactly like x/y instead of post-filtering. */
object MortonRange3 {

  def decompose(box: Box3, totalBits: Int, tailBits: Int,
      maxCells: Int = 2048): HeadRanges = {
    require(totalBits >= tailBits && tailBits >= 0, s"bad split $totalBits/$tailBits")
    require(totalBits <= 63, s"key space too deep: $totalBits bits")
    val contained = ArrayBuffer.empty[(Long, Long)]
    val partial = ArrayBuffer.empty[(Long, Long)]

    def headRange(prefix: Long, r: Int): (Long, Long) =
      (prefix << (r - tailBits), ((prefix + 1L) << (r - tailBits)) - 1L)

    var frontier = ArrayBuffer[Long](0L)
    var r = totalBits
    while (frontier.nonEmpty && r > tailBits) {
      val next = ArrayBuffer.empty[Long]
      val rc = r - 1
      var i = 0
      while (i < frontier.length) {
        val p = frontier(i)
        var c = 0
        while (c < 2) {
          val child = (p << 1) | c
          val lo = child << rc
          val hi = ((child + 1L) << rc) - 1L
          val (cx0, cy0, cz0) =
            (Morton3.decodeX(lo).toDouble, Morton3.decodeY(lo).toDouble,
              Morton3.decodeZ(lo).toDouble)
          val (cx1, cy1, cz1) =
            (Morton3.decodeX(hi).toDouble, Morton3.decodeY(hi).toDouble,
              Morton3.decodeZ(hi).toDouble)
          val disjoint = cx1 < box.xMin || cx0 > box.xMax ||
            cy1 < box.yMin || cy0 > box.yMax ||
            cz1 < box.zMin || cz0 > box.zMax
          if (!disjoint) {
            val inside = cx0 >= box.xMin && cx1 <= box.xMax &&
              cy0 >= box.yMin && cy1 <= box.yMax &&
              cz0 >= box.zMin && cz1 <= box.zMax
            if (inside) contained += headRange(child, rc)
            else next += child
          }
          c += 1
        }
        i += 1
      }
      frontier = next
      r = rc
      if (contained.length + frontier.length > maxCells) {
        frontier.foreach(p => partial += headRange(p, r))
        frontier.clear()
      }
    }
    frontier.foreach(p => partial += ((p, p)))
    HeadRanges(MortonRange.mergeRanges(contained.toVector),
      MortonRange.mergeRanges(partial.toVector))
  }
}
