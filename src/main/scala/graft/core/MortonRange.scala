package graft.core

import scala.collection.mutable.ArrayBuffer

/** Result of the quadtree decomposition of a query bbox into block-key
  * (sfc_head) ranges.
  *
  * @param contained head ranges whose every point is inside the bbox —
  *                   points from these blocks need no exact test
  * @param partial    head ranges that straddle the bbox boundary — their
  *                   points need tail-level (exact x/y) refinement
  *
  * Mirrors the reference's (ranges, overlaps) pair
  * (pcsfc/range_search.py:45-47) generalized so an early-terminated
  * descent can hand back coarse partial *ranges*, not just single heads —
  * that bounds the size of the pushed scan predicate at any data scale.
  */
final case class HeadRanges(contained: Vector[(Long, Long)], partial: Vector[(Long, Long)]) {
  def isEmpty: Boolean = contained.isEmpty && partial.isEmpty
  def all: Vector[(Long, Long)] = MortonRange.mergeRanges(contained ++ partial)
}

/** Driver-side quadtree descent over Morton prefixes
  * (re-derivation of reference pcsfc/range_search.py:4-47, with its two
  * bugs fixed: the odd-body_len loop that never reaches full depth, and
  * the `overlaps` leak when the loop body never runs — see SURVEY.md §2.8).
  *
  * A contiguous Morton key interval [p·2^r, (p+1)·2^r) always decodes to
  * an axis-aligned rectangle (min key -> (xMin,yMin), max key ->
  * (xMax,yMax)), for either parity of r, so we descend one bit per level:
  * classify each cell against the bbox as contained / disjoint / partial
  * and split partial cells until the head/tail boundary.
  */
object MortonRange {

  /** Decompose bbox (in quantized grid coordinates, inclusive, possibly
    * fractional e.g. a circle's enclosing box) into sfc_head ranges.
    *
    * @param totalBits bit length of the full Morton key space (headBits + tailBits)
    * @param tailBits  in-block offset bits; heads are keys >> tailBits
    * @param maxCells  budget on emitted ranges: when exceeded, remaining
    *                  partial cells are flushed as coarse partial ranges
    *                  (a correct superset — exact refinement still applies)
    */
  def decompose(bbox: Bbox, totalBits: Int, tailBits: Int, maxCells: Int = 2048): HeadRanges = {
    require(totalBits >= tailBits && tailBits >= 0, s"bad split $totalBits/$tailBits")
    require(totalBits <= 62, s"key space too deep: $totalBits bits")
    val contained = ArrayBuffer.empty[(Long, Long)]
    val partial = ArrayBuffer.empty[(Long, Long)]

    def headRange(prefix: Long, r: Int): (Long, Long) =
      (prefix << (r - tailBits), ((prefix + 1L) << (r - tailBits)) - 1L)

    // frontier of partial cells, processed one bit-level at a time
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
          val cXMin = Morton.decodeX(lo).toDouble
          val cYMin = Morton.decodeY(lo).toDouble
          val cXMax = Morton.decodeX(hi).toDouble
          val cYMax = Morton.decodeY(hi).toDouble
          val disjoint = cXMax < bbox.xMin || cXMin > bbox.xMax ||
            cYMax < bbox.yMin || cYMin > bbox.yMax
          if (!disjoint) {
            val inside = cXMin >= bbox.xMin && cXMax <= bbox.xMax &&
              cYMin >= bbox.yMin && cYMax <= bbox.yMax
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
        // budget hit: flush the remaining frontier as coarse partial ranges
        frontier.foreach(p => partial += headRange(p, r))
        frontier.clear()
      }
    }
    // cells that reached the head/tail boundary still straddling the bbox
    frontier.foreach(p => partial += ((p, p)))
    HeadRanges(mergeRanges(contained.toVector), mergeRanges(partial.toVector))
  }

  /** Sort + coalesce adjacent/overlapping ranges to shrink the pushed
    * scan predicate. */
  def mergeRanges(rs: Seq[(Long, Long)]): Vector[(Long, Long)] = {
    if (rs.isEmpty) return Vector.empty
    val sorted = rs.sortBy(_._1)
    val out = ArrayBuffer[(Long, Long)](sorted.head)
    sorted.tail.foreach { case (lo, hi) =>
      val (plo, phi) = out.last
      if (lo <= phi + 1) out(out.length - 1) = (plo, math.max(phi, hi))
      else out += ((lo, hi))
    }
    out.toVector
  }
}
