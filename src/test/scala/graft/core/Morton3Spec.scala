package graft.core

import org.scalatest.funsuite.AnyFunSuite

class Morton3Spec extends AnyFunSuite {
  private val rng = new scala.util.Random(42)
  private def coord(): Long = rng.nextLong() & ((1L << 21) - 1)

  /** Bit-by-bit reference implementation for the magic-mask kernels. */
  private def naiveEncode(x: Long, y: Long, z: Long): Long = {
    var m = 0L
    var i = 0
    while (i < 21) {
      m |= ((x >> i) & 1L) << (3 * i)
      m |= ((y >> i) & 1L) << (3 * i + 1)
      m |= ((z >> i) & 1L) << (3 * i + 2)
      i += 1
    }
    m
  }

  test("known vectors") {
    assert(Morton3.encode(0, 0, 0) == 0L)
    assert(Morton3.encode(1, 0, 0) == 1L)
    assert(Morton3.encode(0, 1, 0) == 2L)
    assert(Morton3.encode(0, 0, 1) == 4L)
    assert(Morton3.encode(1, 1, 1) == 7L)
    assert(Morton3.encode(2, 0, 0) == 8L)
    assert(Morton3.encode(2, 1, 1) == 14L)
  }

  test("matches the naive bit loop and round-trips (randomized property)") {
    (1 to 2000).foreach { _ =>
      val (x, y, z) = (coord(), coord(), coord())
      val m = Morton3.encode(x, y, z)
      assert(m == naiveEncode(x, y, z))
      assert(Morton3.decodeX(m) == x)
      assert(Morton3.decodeY(m) == y)
      assert(Morton3.decodeZ(m) == z)
    }
  }

  test("per-dimension monotonicity along each axis") {
    (1 to 500).foreach { _ =>
      val x = rng.nextLong() & ((1L << 21) - 2)
      assert(Morton3.encode(x + 1, 0, 0) > Morton3.encode(x, 0, 0))
      assert(Morton3.encode(0, x + 1, 0) > Morton3.encode(0, x, 0))
      assert(Morton3.encode(0, 0, x + 1) > Morton3.encode(0, 0, x))
    }
  }

  test("checked encode rejects out-of-range input") {
    intercept[IllegalArgumentException](Morton3.encodeChecked(-1, 0, 0))
    intercept[IllegalArgumentException](Morton3.encodeChecked(1L << 21, 0, 0))
  }
}
