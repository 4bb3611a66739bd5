package graft.core

import org.scalatest.funsuite.AnyFunSuite

class MortonRangeSpec extends AnyFunSuite {
  private val rng = new scala.util.Random(4242)

  /** Brute-force oracle: the exact set of keys whose decoded (x, y) lies
    * in the bbox, over a small grid. */
  private def bruteKeys(bbox: Bbox, totalBits: Int): Set[Long] =
    (0L until (1L << totalBits)).filter { k =>
      bbox.contains(Morton.decodeX(k).toDouble, Morton.decodeY(k).toDouble)
    }.toSet

  /** Keys admitted by a decomposition: all keys under contained head
    * ranges, plus keys under partial ranges that pass the exact test. */
  private def admittedKeys(hr: HeadRanges, bbox: Bbox, tailBits: Int): Set[Long] = {
    val fromContained = hr.contained.flatMap { case (lo, hi) =>
      (lo << tailBits) until ((hi + 1) << tailBits)
    }
    val fromPartial = hr.partial.flatMap { case (lo, hi) =>
      ((lo << tailBits) until ((hi + 1) << tailBits)).filter { k =>
        bbox.contains(Morton.decodeX(k).toDouble, Morton.decodeY(k).toDouble)
      }
    }
    // contained ranges must be *exactly* inside: re-check, don't filter
    fromContained.foreach { k =>
      assert(bbox.contains(Morton.decodeX(k).toDouble, Morton.decodeY(k).toDouble),
        s"contained range leaked outside bbox: key $k")
    }
    (fromContained ++ fromPartial).toSet
  }

  test("decomposition ≡ brute force on small grids (8 bits, varying tail)") {
    for (_ <- 1 to 200) {
      val Seq(a, b, p, q) = Seq.fill(4)(rng.nextInt(16))
      val tail = Seq(0, 2, 4)(rng.nextInt(3))
      val bbox = Bbox(math.min(a, b), math.max(a, b), math.min(p, q), math.max(p, q))
      val hr = MortonRange.decompose(bbox, totalBits = 8, tailBits = tail)
      assert(admittedKeys(hr, bbox, tail) == bruteKeys(bbox, 8), s"bbox=$bbox tail=$tail")
    }
  }

  test("full-space bbox collapses to one contained range") {
    val hr = MortonRange.decompose(Bbox(0, 15, 0, 15), 8, 4)
    assert(hr.contained == Vector((0L, 15L)))
    assert(hr.partial.isEmpty)
  }

  test("1-cell bbox") {
    val hr = MortonRange.decompose(Bbox(5, 5, 7, 7), 8, 2)
    assert(admittedKeys(hr, Bbox(5, 5, 7, 7), 2) == Set(Morton.encode(5, 7)))
  }

  test("bbox outside the grid yields empty") {
    val hr = MortonRange.decompose(Bbox(100, 200, 100, 200), 8, 2)
    assert(hr.isEmpty)
  }

  test("odd total bits (the reference's odd-body_len bug territory)") {
    for (_ <- 1 to 100) {
      val a = rng.nextInt(32); val b = rng.nextInt(32); val y0 = rng.nextInt(8)
      val bbox = Bbox(math.min(a, b), math.max(a, b), y0, math.min(y0 + 3, 15))
      val hr = MortonRange.decompose(bbox, totalBits = 9, tailBits = 3)
      assert(admittedKeys(hr, bbox, 3) == bruteKeys(bbox, 9), s"bbox=$bbox")
    }
  }

  test("maxCells budget still yields a correct (coarser) cover") {
    val bbox = Bbox(3, 200, 7, 180)
    val fine = MortonRange.decompose(bbox, 16, 4)
    val coarse = MortonRange.decompose(bbox, 16, 4, maxCells = 4)
    assert(admittedKeys(coarse, bbox, 4) == admittedKeys(fine, bbox, 4))
    assert(coarse.contained.length + coarse.partial.length <=
      fine.contained.length + fine.partial.length)
  }

  test("mergeRanges coalesces adjacent and overlapping") {
    assert(MortonRange.mergeRanges(Seq((5L, 7L), (0L, 2L), (3L, 4L), (10L, 12L), (11L, 15L))) ==
      Vector((0L, 7L), (10L, 15L)))
  }
}
