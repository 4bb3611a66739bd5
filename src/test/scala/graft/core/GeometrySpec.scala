package graft.core

import org.scalatest.funsuite.AnyFunSuite

class GeometrySpec extends AnyFunSuite {

  test("WKT parse: simple polygon") {
    val p = Geometry.parseWktPolygon("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert(p.rings.length == 1)
    assert(p.bbox == Bbox(0, 10, 0, 10))
    assert(p.contains(5, 5))
    assert(!p.contains(11, 5))
    assert(!p.contains(-1, -1))
  }

  test("WKT parse: polygon with hole (even-odd handles holes)") {
    val p = Geometry.parseWktPolygon(
      "POLYGON ((0 0, 100 0, 100 100, 0 100, 0 0), (40 40, 60 40, 60 60, 40 60, 40 40))")
    assert(p.rings.length == 2)
    assert(p.contains(10, 10))
    assert(!p.contains(50, 50)) // inside the hole
    assert(p.contains(39.5, 50)) // between shell and hole
  }

  test("two holes (mirrors B8 shape class, scripts/query_210m.json)") {
    val p = Geometry.parseWktPolygon(
      "POLYGON ((0 0, 100 0, 100 100, 0 100, 0 0), " +
        "(10 10, 20 10, 20 20, 10 20, 10 10), (70 70, 90 70, 90 90, 70 90, 70 70))")
    assert(!p.contains(15, 15))
    assert(!p.contains(80, 80))
    assert(p.contains(50, 50))
  }

  test("non-convex polygon (diagonal thin rect-as-polygon, A7 shape class)") {
    val p = Geometry.parseWktPolygon("POLYGON ((0 0, 10 10, 11 9, 1 -1, 0 0))")
    assert(p.contains(5.5, 4.9))
    assert(!p.contains(5, 8))
  }

  test("L-shaped rectilinear polygon matches its two-rect decomposition") {
    val p = Geometry.parseWktPolygon(
      "POLYGON ((500.5 500.5, 3000.5 500.5, 3000.5 1500.5, 1500.5 1500.5, " +
        "1500.5 3000.5, 500.5 3000.5, 500.5 500.5))")
    for (x <- 400 to 3100 by 33; y <- 400 to 3100 by 33) {
      val expect = (x >= 501 && x <= 3000 && y >= 501 && y <= 1500) ||
        (x >= 501 && x <= 1500 && y >= 501 && y <= 3000)
      assert(p.contains(x, y) == expect, s"($x, $y)")
    }
  }

  test("circle bbox and containment") {
    val c = Circle(10, 20, 5)
    assert(c.bbox == Bbox(5, 15, 15, 25))
    assert(c.contains(10, 24.9))
    assert(!c.contains(10, 25.1))
    assert(c.contains(13, 16)) // 9+16 = 25 = r^2, on-circle counts (<=)
  }

  test("scientific/extra whitespace WKT tolerated") {
    val p = Geometry.parseWktPolygon("polygon((0 0,4 0,4 4,0 4,0 0))")
    assert(p.contains(2, 2))
  }
}
