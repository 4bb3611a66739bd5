package graft.core

/** Primitive union-find over long ids: open-addressed long→slot table
  * + parent array, union by min root, path halving. ~20 B per distinct
  * id (vs ~70 B/entry for a boxed HashMap) so a task can resolve a
  * multi-million-edge slice in tens of MB — the per-partition
  * contraction pass of
  * [[graft.operators.Dedup.duplicateClusters]] runs one of these per
  * task. The root of a component is always its minimum id. */
final class LongUnionFind(initialCapacity: Int = 1 << 12) {
  private var cap = Integer.highestOneBit(math.max(initialCapacity, 16) * 2 - 1) << 1
  private var keys = new Array[Long](cap)
  private var used = new Array[Boolean](cap)
  private var slotOf = new Array[Int](cap) // key slot -> parent index
  private var parent = new Array[Int](cap) // dense node index -> parent node index
  private var ids = new Array[Long](cap)   // dense node index -> id
  private var n = 0

  private def grow(): Unit = {
    val ok = keys; val ou = used; val os = slotOf
    cap <<= 1
    keys = new Array[Long](cap); used = new Array[Boolean](cap)
    slotOf = new Array[Int](cap)
    parent = java.util.Arrays.copyOf(parent, cap)
    ids = java.util.Arrays.copyOf(ids, cap)
    var i = 0
    while (i < ok.length) {
      if (ou(i)) {
        var h = java.lang.Long.hashCode(ok(i) * -7046029254386353131L) & (cap - 1)
        while (used(h)) h = (h + 1) & (cap - 1)
        keys(h) = ok(i); used(h) = true; slotOf(h) = os(i)
      }
      i += 1
    }
  }

  /** Dense index of `id`, inserting it as its own singleton if new. */
  private def indexOf(id: Long): Int = {
    var h = java.lang.Long.hashCode(id * -7046029254386353131L) & (cap - 1)
    while (used(h)) {
      if (keys(h) == id) return slotOf(h)
      h = (h + 1) & (cap - 1)
    }
    if ((n + 1) * 4 > cap * 3) { grow(); return indexOf(id) }
    keys(h) = id; used(h) = true; slotOf(h) = n
    parent(n) = n; ids(n) = id
    n += 1
    n - 1
  }

  private def findIdx(x0: Int): Int = {
    var x = x0
    while (parent(x) != x) {
      parent(x) = parent(parent(x))
      x = parent(x)
    }
    x
  }

  def union(a: Long, b: Long): Unit = {
    val ra = findIdx(indexOf(a))
    val rb = findIdx(indexOf(b))
    if (ra != rb) {
      // min-ID root keeps find(x) == the cluster label
      if (ids(ra) < ids(rb)) parent(rb) = ra else parent(ra) = rb
    }
  }

  def size: Int = n

  /** (id, root id) for every id ever touched. */
  def entries(): Iterator[(Long, Long)] = new Iterator[(Long, Long)] {
    private var i = 0
    def hasNext: Boolean = i < n
    def next(): (Long, Long) = { val r = (ids(i), ids(findIdx(i))); i += 1; r }
  }
}
