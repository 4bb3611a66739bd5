package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalatest.funsuite.AnyFunSuite

class HashKernelsSpec extends AnyFunSuite {

  private def arr(xs: Long*): ArrayData = ArrayData.toArrayData(xs.toArray)
  private def sig(xs: Seq[Long], k: Int): Seq[Long] =
    HashKernels.minHashSig(arr(xs: _*), k).toLongArray().toSeq

  test("mix64 is deterministic and seed-sensitive") {
    assert(HashKernels.mix64(42L, 0L) == HashKernels.mix64(42L, 0L))
    assert(HashKernels.mix64(42L, 0L) != HashKernels.mix64(42L, 1L))
    assert(HashKernels.mix64(42L, 0L) != HashKernels.mix64(43L, 0L))
  }

  test("minhash signature of a union is the elementwise min") {
    val a = Seq(1L, 2L, 3L)
    val b = Seq(9L, 10L)
    val u = sig(a ++ b, 32)
    val mins = sig(a, 32).zip(sig(b, 32)).map { case (x, y) => math.min(x, y) }
    assert(u == mins)
  }

  test("identical sets share every band key; disjoint sets share none") {
    val s1 = sig(Seq(5L, 6L, 7L, 8L), 64)
    val k1 = HashKernels.bandKeys(ArrayData.toArrayData(s1.toArray), 16).toLongArray().toSeq
    val k2 = HashKernels.bandKeys(ArrayData.toArrayData(s1.toArray), 16).toLongArray().toSeq
    assert(k1 == k2 && k1.length == 16)
    val other = sig(Seq(100L, 200L), 64)
    val k3 = HashKernels.bandKeys(ArrayData.toArrayData(other.toArray), 16).toLongArray().toSeq
    assert(k1.intersect(k3).isEmpty)
  }

  test("simhash: all-ones tokens set every majority bit") {
    assert(HashKernels.simHash(arr(-1L, -1L, -1L)) == -1L)
    assert(HashKernels.simHash(arr(0L, 0L)) == 0L)
    // exact half does NOT set the bit (sum of +-1 is 0, not > 0)
    assert(HashKernels.simHash(arr(-1L, 0L)) == 0L)
    // 2 of 3 set -> majority sets the bit
    assert(HashKernels.simHash(arr(1L, 1L, 0L)) == 1L)
  }
}
