package graft.queries

/** DuckDB renderings of the cross-engine-portable primitives
  * (graft.functions.HashKernels.lehmer3 and friends). Every formula
  * here is kept textually in lockstep with a Scala kernel whose
  * arithmetic fits 47 bits, so the oracle engine reproduces each value
  * bit-for-bit with plain BIGINT `*`/`%` — this is what lets the
  * "approximate" operators (simhash, RHP-LSH, IVF, PQ) carry full
  * hash-compared oracles instead of rows-only checks. */
object PortableSql {

  /** [[graft.functions.HashKernels.lehmer3]]: 3 Lehmer rounds over
    * Z_{2^31-1} after pre-reduction into [1, 2^31-2]. */
  def lehmer3(x: String): String = {
    // DuckDB does not give * and % equal left-assoc precedence —
    // parenthesize every multiply-mod step fully
    val seeded = s"(((($x) % 2147483646 + 2147483646) % 2147483646) + 1)"
    s"(((((($seeded * 48271) % 2147483647) * 48271) % 2147483647) * 48271) % 2147483647)"
  }

  /** graft.functions.hashes.hash62: two lehmer3 streams packed into a
    * 62-bit non-negative BIGINT. */
  def hash62(x: String): String =
    s"(${lehmer3(x)} * 2147483648 + ${lehmer3(s"($x) + 700001")})"

  /** Parity of [[lehmer3]] as a +-1.0 hyperplane sign
    * ([[graft.functions.VectorKernels.rhpBucket]]'s sign source). */
  def rhpSign(bitTimes2p20PlusJ: String): String =
    s"(CASE WHEN ${lehmer3(bitTimes2p20PlusJ)} % 2 = 1 THEN 1.0 ELSE -1.0 END)"

  /** RHP-LSH fingerprint of a float-list column: bit b set iff the
    * strictly sequential double fold of v[j] * sign(b, j) is positive —
    * the exact op sequence of VectorKernels.rhpFingerprint. */
  def rhpFingerprint(vec: String, nBits: Int): String =
    s"""list_sum(list_transform(range(0, $nBits), b ->
       CASE WHEN list_reduce(list_prepend(0.0::DOUBLE,
         list_transform(range(0, len($vec)), j ->
           ($vec)[j + 1]::DOUBLE * ${rhpSign("b * 1048576 + j")})),
         (acc, v) -> acc + v) > 0 THEN (1::BIGINT << b) ELSE 0 END))"""

  /** Int-typed [[rhpFingerprint]] (VectorKernels.rhpBucket). */
  def rhpBucket(vec: String, nBits: Int): String =
    s"CAST(${rhpFingerprint(vec, nBits)} AS INT)"

  /** [[graft.functions.TextKernels.wordPortableHashes]] of one word:
    * two code-point polynomial folds, each lehmer3-avalanched, packed
    * hi31 * 2^31 + lo31. */
  def wordHash(w: String): String = {
    def fold(mult: Long, mod: Long) =
      s"""list_reduce(list_prepend(0::BIGINT,
         list_transform(list_filter(string_split($w, ''), c -> c != ''),
           c -> ord(c)::BIGINT)),
         (a, c) -> ((a * $mult) + c) % $mod)"""
    s"(${lehmer3(fold(48271L, 2147483647L))} * 2147483648 + ${lehmer3(fold(16807L, 2147483629L))})"
  }

  /** 64-bit simhash of a BIGINT-list column of token hashes: bit j set
    * iff strictly more than half the tokens have bit j set
    * (HashKernels.simHash). Token hashes are 62-bit, so folding 62
    * bits covers every settable bit. */
  def simhash(hashesList: String): String =
    s"""list_sum(list_transform(range(0, 62), j ->
       CASE WHEN 2 * len(list_filter($hashesList, h -> ((h >> j) & 1) = 1))
            > len($hashesList)
       THEN (1::BIGINT << j) ELSE 0 END))"""

  /** floor(v * 2^20 + 0.5) — the exact grid quantization behind the
    * IVF/PQ integer centroid means (Similarity.meanByList). */
  def q20(v: String): String =
    s"CAST(floor(($v)::DOUBLE * 1048576.0 + 0.5) AS BIGINT)"

  /** Exact mean from (sum of q20, count): CAST(s AS DOUBLE) / n
    * / 2^20 — two correctly-rounded IEEE divisions, engine-identical. */
  def meanFromQ20(sumQ: String, n: String): String =
    s"(CAST($sumQ AS DOUBLE) / ($n) / 1048576.0)"

  /** Cosine of a float-list against a double-list centroid, with the
    * three independent sequential folds and the zero-guard of
    * VectorKernelsCentroid.nearest: dot/(sqrt(nc)*sqrt(na)), -2.0 when
    * either norm is zero. */
  def centroidCosine(vec: String, cent: String): String = {
    val dot =
      s"""list_reduce(list_prepend(0.0::DOUBLE,
         list_transform(range(0, len($vec)), i ->
           ($vec)[i + 1]::DOUBLE * ($cent)[i + 1])),
         (acc, v) -> acc + v)"""
    val nc =
      s"""list_reduce(list_prepend(0.0::DOUBLE,
         list_transform($cent, v -> v * v)),
         (acc, v) -> acc + v)"""
    val na =
      s"""list_reduce(list_prepend(0.0::DOUBLE,
         list_transform($vec, v -> v::DOUBLE * v::DOUBLE)),
         (acc, v) -> acc + v)"""
    s"""(CASE WHEN $nc = 0 OR $na = 0 THEN -2.0
        ELSE $dot / (sqrt($nc) * sqrt($na)) END)"""
  }
}
